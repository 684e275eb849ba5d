"""The small darknet CLI tools (utils/netviz.py): ops/speed FLOP
accounting, print, statistics, visualize, mkimg, imtest, 3d. Gates are
literal numpy transcriptions of the cited C loops."""

import numpy as np
import pytest

import jax

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine, specs as S
from yolo_tensorflow_tpu.utils import netviz as V


# --------------------------------------------------------------------------
# numops (examples/darknet.c:80)

def test_numops_matches_hand_count():
    specs = (S.Conv(8, 3, stride=2, bn=True),          # 32x32 out
             S.MaxPool(2, 2),                          # 16x16
             S.TransposeFlatten(),
             S.Dense(10, act="linear"),
             S.Rnn(6), S.Gru(5), S.Lstm(4))
    got = V.numops(specs, 64)
    conv = 2 * 8 * 3 * 3 * 3 * 32 * 32
    dense_in = 16 * 16 * 8
    dense = 2 * dense_in * 10
    rnn = 2 * (10 * 6 + 6 * 6 + 6 * 6)
    gru = 2 * (3 * 6 * 5 + 3 * 5 * 5)
    lstm = 2 * (4 * 5 * 4 + 4 * 4 * 4)
    assert got == conv + dense + rnn + gru + lstm


def test_numops_agrees_with_count_flops_on_counted_types():
    """numops is the C-counted subset of the ONE layer_flops arithmetic;
    on a net with only counted types the two are equal."""
    specs = (S.Conv(8, 3, stride=2, bn=True), S.MaxPool(2, 2),
             S.TransposeFlatten(), S.Dense(10, act="linear"))
    assert V.numops(specs, 64) == int(engine.count_flops(
        specs, (1, 64, 64, 3)))


def test_mkimg_rejects_too_small_canvas():
    specs = (S.Conv(6, 3, stride=1, bn=True), S.Detect(()))
    params, _ = engine.init_params(specs, (1, 32, 32, 3),
                                   jax.random.PRNGKey(3), folded=True)
    with pytest.raises(ValueError, match="must exceed"):
        V.mkimg(specs, jax.tree.map(np.asarray, params), 3, 3, 1)


def test_composite_3d_bounds_truncate_toward_zero():
    """C's -a.h/100 truncates toward zero: a 250-row image searches
    [-2, 2], never -3 (a Python -h//100 floor would widen the bound and
    find the out-of-range -3 here)."""
    rng = np.random.default_rng(6)
    a = rng.random((250, 20, 3)).astype(np.float32)
    b = V.crop_image(a, 0, 3, 20, 250)     # true alignment shift is -3
    shift, _ = V.composite_3d(a, b)
    assert shift >= -2                      # clamped to the C's range
    # and the in-range true shift is still found exactly
    b2 = V.crop_image(a, 0, 2, 20, 250)
    shift2, _ = V.composite_3d(a, b2)
    assert shift2 == -2


def test_numops_skips_uncounted_types_like_the_c():
    """The C's numops type switch has no LOCAL/DECONV/CRNN arms — those
    layers contribute zero (darknet.c:80-113)."""
    base = (S.Conv(4, 3, stride=1, bn=True),)
    with_extra = base + (S.Crnn(4, 4),)
    assert V.numops(with_extra, 16) == V.numops(base, 16)


# --------------------------------------------------------------------------
# print_statistics (src/utils.c:507) + statistics_net (darknet.c:305)

def test_print_statistics_is_rms_mean_biasedvar():
    a = np.array([1.0, -2.0, 3.0, 0.5], np.float32)
    line = V.print_statistics(a)
    rms = np.sqrt(np.mean(a ** 2))
    m = a.mean()
    var = np.mean((a - m) ** 2)
    assert line == f"MSE: {rms:.6f}, Mean: {m:.6f}, Variance: {var:.6f}"


def test_statistics_lines_structure_and_weight_slice():
    """Dense-BN and GRU-BN blocks in the C's order; the weights line
    summarizes only the first `outputs` floats of the darknet-order
    (out, in) array — the C's l.outputs count quirk."""
    specs = (S.Dense(3, act="logistic", bn=True), S.Gru(2, bn=True))
    params, _ = engine.init_params(specs, (1, 5), jax.random.PRNGKey(1),
                                   folded=False)
    params = jax.tree.map(np.asarray, params)
    lines = V.statistics_lines(specs, params)
    assert lines[0] == "Connected Layer 0"
    assert lines[1].startswith("Scales ")
    assert lines[2].startswith("Biases ")
    assert lines[3].startswith("Weights ")
    w = params["L000"]["w"]            # (in=5, out=3)
    expect = "Weights " + V.print_statistics(w.T.ravel()[:3])
    assert lines[3] == expect
    assert lines[4] == ""              # the C's unconditional per-layer \n
    assert lines[5] == "GRU Layer 1"
    # Input Z/R/H (u*) before State Z/R/H (w*), each a 3-line block
    labels = [lines[6 + 4 * k] for k in range(6)]
    assert labels == ["Input Z", "Input R", "Input H",
                      "State Z", "State R", "State H"]


def test_conv_weight_rows_darknet_order():
    w = np.arange(2 * 2 * 3 * 4, dtype=np.float32).reshape(2, 2, 3, 4)
    rows = V.conv_weight_rows(w)
    assert rows.shape == (4, 12)
    # filter 0, darknet (c,h,w) flat: c-major, then h, then w
    want = [w[h_, w_, c_, 0] for c_ in range(3) for h_ in range(2)
            for w_ in range(2)]
    np.testing.assert_array_equal(rows[0], want)


# --------------------------------------------------------------------------
# image primitives vs literal C transcriptions

def test_rotate_cw_matches_c_element_mapping():
    """rotate_image_cw's 4-cycle: one step sends old[c, n-1-r] -> new[r, c]
    (src/image.c:328)."""
    rng = np.random.default_rng(0)
    im = rng.random((5, 5, 3), np.float32)
    got = V.rotate_cw(im, 1)
    n = 5
    want = np.empty_like(im)
    for r in range(n):
        for c in range(n):
            want[r, c] = im[c, n - 1 - r]
    np.testing.assert_array_equal(got, want)
    # 4 turns = identity; times wraps mod 4 like (times+400)%4
    np.testing.assert_array_equal(V.rotate_cw(im, 4), im)
    np.testing.assert_array_equal(V.rotate_cw(im, 5), got)


def test_distort_image_matches_per_pixel_transcription():
    """distort_image (src/image.c:1315) via the C's own rgb<->hsv pair,
    looped per pixel."""
    rng = np.random.default_rng(1)
    im = rng.random((4, 6, 3)).astype(np.float32)
    im[0, 0] = [0.5, 0.5, 0.5]          # gray pixel (delta==0 path)
    im[0, 1] = [0.0, 0.0, 0.0]          # black pixel (max==0 path)
    dhue, dsat, dexp = 0.12, 1.3, 0.8
    got = V.distort_image(im, dhue, dsat, dexp)

    def px_rgb_to_hsv(r, g, b):
        mx, mn = max(r, g, b), min(r, g, b)
        delta = mx - mn
        v = mx
        if mx == 0:
            return 0.0, 0.0, v
        s = delta / mx
        if delta == 0:
            h = 0.0                      # C hits 0/0; s==0 masks it
        elif r == mx:
            h = (g - b) / delta
        elif g == mx:
            h = 2 + (b - r) / delta
        else:
            h = 4 + (r - g) / delta
        if h < 0:
            h += 6
        return h / 6.0, s, v

    def px_hsv_to_rgb(h, s, v):
        if s == 0:
            return v, v, v
        h6 = 6 * h
        i = int(np.floor(h6))
        f = h6 - i
        p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
        return [(v, t, p), (q, v, p), (p, v, t),
                (p, q, v), (t, p, v), (v, p, q)][i if 0 <= i <= 5 else 5]

    want = np.empty_like(im)
    for y in range(im.shape[0]):
        for x in range(im.shape[1]):
            h, s, v = px_rgb_to_hsv(*im[y, x])
            s *= dsat
            v *= dexp
            h += dhue
            if h > 1:
                h -= 1
            if h < 0:
                h += 1
            want[y, x] = np.clip(px_hsv_to_rgb(h, s, v), 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ghost_image_matches_transcription():
    rng = np.random.default_rng(2)
    src = rng.random((3, 3, 3)).astype(np.float32)
    dest = rng.random((8, 8, 3)).astype(np.float32)
    want = dest.copy()
    got = dest.copy()
    V.ghost_image(src, got, 2, 4)
    max_dist = np.sqrt((-src.shape[1] / 2.0 + 0.5) ** 2)
    for y in range(3):
        for x in range(3):
            dist = np.sqrt((x - 1.5 + 0.5) ** 2 + (y - 1.5 + 0.5) ** 2)
            alpha = max(1 - dist / max_dist, 0)
            want[4 + y, 2 + x] = (alpha * src[y, x]
                                  + (1 - alpha) * want[4 + y, 2 + x])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_crop_image_edge_clamp():
    im = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    out = V.crop_image(im, -1, 2, 3, 3)
    assert out.shape == (3, 3, 1)
    assert out[0, 0, 0] == im[2, 0, 0]          # col clamped at left
    assert out[2, 2, 0] == im[3, 1, 0]          # row clamped at bottom


def test_collapse_images_vert_color_and_gray():
    color = [np.full((2, 2, 3), v, np.float32) for v in (0.2, 0.8)]
    grid = V.collapse_images_vert(color)
    assert grid.shape == (5, 2, 3)               # (2+1)*2-1 rows
    assert (grid[2] == 0).all()                  # border row is 0
    gray = [np.full((2, 2, 4), v, np.float32) for v in (0.3, 0.6)]
    g = V.collapse_images_vert(gray)
    assert g.shape == (5, 11, 1)                 # (2+1)*4-1 cols
    assert (g[:, 2] == 0).all()                  # border col


def test_visualize_network_one_grid_per_conv():
    cfg = C.get_config("yolov2-tiny-voc", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    grids = V.visualize_network(specs, jax.tree.map(np.asarray, params))
    n_conv = sum(isinstance(sp, S.Conv) for sp in specs)
    assert len(grids) == n_conv
    g0 = grids[min(grids)]
    assert g0.min() >= 0 and g0.max() <= 1 and g0.shape[-1] == 3


def test_mkimg_produces_canvases():
    specs = (S.Conv(6, 3, stride=1, bn=True), S.Detect(()))
    params, _ = engine.init_params(specs, (1, 32, 32, 3),
                                   jax.random.PRNGKey(3), folded=True)
    outs = V.mkimg(specs, jax.tree.map(np.asarray, params), 32, 48, 2,
                   seed=7)
    assert len(outs) == 2
    for im in outs:
        assert im.shape == (32, 48, 3)
        assert 0 <= im.min() and im.max() <= 1
        assert not np.allclose(im, 0.5)          # something was pasted


def test_grayscale_and_imtest():
    rng = np.random.default_rng(4)
    im = rng.random((5, 7, 3)).astype(np.float32)
    g = V.grayscale_image(im)
    np.testing.assert_allclose(
        g[..., 0], 0.299 * im[..., 0] + 0.587 * im[..., 1]
        + 0.114 * im[..., 2], atol=1e-6)
    mag, outs = V.imtest_images(im)
    assert abs(mag - np.sqrt((im.astype(np.float64) ** 2).sum())) < 1e-9
    assert set(outs) == {"Original", "Gray", "C1", "C2", "C3", "C4"}


def test_composite_3d_recovers_shift():
    rng = np.random.default_rng(5)
    a = rng.random((200, 40, 3)).astype(np.float32)
    true_shift = 1
    # b shifted so that crop(b, 0, true_shift) == a in the interior
    b = V.crop_image(a, 0, -true_shift, 40, 200)
    shift, comp = V.composite_3d(a, b)
    assert shift == true_shift
    np.testing.assert_array_equal(comp[..., 0], a[..., 0])
    # green/blue channels come from the aligned b
    np.testing.assert_allclose(comp[5:-5, :, 1],
                               a[5:-5, :, 1], atol=1e-6)


# --------------------------------------------------------------------------
# CLI smoke

def test_cli_ops_speed_print_statistics(tmp_path, capsys):
    from yolo_tensorflow_tpu import cli
    cli.main(["ops", "--model", "yolov2-tiny-voc"])
    out = capsys.readouterr().out
    assert "Floating Point Operations:" in out and "Bn" in out

    cli.main(["speed", "--model", "yolov2-tiny-voc", "--tics", "2"])
    out = capsys.readouterr().out
    assert "2 evals," in out and "Speed:" in out and "Hz" in out

    cli.main(["print", "--model", "yolov2-tiny-voc", "--layer", "0"])
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines() if l.strip()]
    assert len(rows) == 16 and len(rows[0].split()) == 27  # 16 3x3x3

    cli.main(["statistics", "--cfg", _write_stat_cfg(tmp_path)])
    out = capsys.readouterr().out
    assert "Connected Layer" in out and "MSE:" in out

    # npz checkpoints are BN-folded; the raw-weights commands must refuse
    # them instead of silently showing folded values
    with pytest.raises(SystemExit, match="unfolded"):
        cli.main(["statistics", "--cfg", _write_stat_cfg(tmp_path),
                  "--weights", "whatever.npz"])


def _write_stat_cfg(tmp_path):
    p = tmp_path / "stat.cfg"
    p.write_text("""
[net]
height=8
width=8
channels=3

[connected]
output=4
batch_normalize=1
activation=logistic
""")
    return str(p)


def test_cli_visualize_mkimg_imtest_3d(tmp_path, capsys):
    import cv2
    from yolo_tensorflow_tpu import cli
    out = tmp_path / "viz"
    cli.main(["visualize", "--model", "yolov2-tiny-voc",
              "--prefix", str(out)])
    capsys.readouterr()
    pngs = sorted(out.iterdir())
    assert (out / "Layer 0.png").exists() and len(pngs) == 9

    cli.main(["mkimg", "--model", "yolov2-tiny-voc", "--height", "32",
              "--width", "32", "--num", "1", "--prefix",
              str(tmp_path / "mk")])
    capsys.readouterr()
    assert (tmp_path / "mk" / "gen_0.png").exists()

    img = tmp_path / "in.png"
    rng = np.random.default_rng(0)
    cv2.imwrite(str(img), rng.integers(0, 255, (20, 30, 3)).astype(np.uint8))
    cli.main(["imtest", "--image", str(img), "--prefix",
              str(tmp_path / "it")])
    out_txt = capsys.readouterr().out
    assert "L2 Norm:" in out_txt
    assert (tmp_path / "it" / "Gray.png").exists()

    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    base = rng.integers(0, 255, (200, 40, 3)).astype(np.uint8)
    cv2.imwrite(str(a), base)
    cv2.imwrite(str(b), np.roll(base, 1, axis=0))
    cli.main(["3d", str(a), str(b), "--out",
              str(tmp_path / "anaglyph.png")])
    capsys.readouterr()
    assert (tmp_path / "anaglyph.png").exists()
