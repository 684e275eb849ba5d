"""Feature visualization / inversion (dream.py) — the examples/nightmare.c
demo. No C oracle (a visualization demo, stochastic by design); the gates
are the optimization contracts: dream ASCENDS its masked-activation
objective, reconstruct DESCENDS the feature-matching distance, both stay
in [0,1], and the CLI writes the per-round artifacts."""

import numpy as np
import pytest

import jax

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu import dream as D
from yolo_tensorflow_tpu.models import engine, specs as S

SIZE = 64


@pytest.fixture(scope="module")
def model():
    cfg = C.get_config("yolov2-tiny-voc", input_size=SIZE)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, SIZE, SIZE, 3),
                                   jax.random.PRNGKey(7), folded=True)
    params = jax.tree.map(np.asarray, params)
    return cfg, specs, params


def _image(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)


def test_shift_crop_is_darknet_crop_image():
    """Edge-clamped shift crop (src/image.c:857 crop_image semantics)."""
    img = np.arange(16, dtype=np.float32).reshape(4, 4)[..., None]
    out = D._shift_crop(img, 1, -1)
    # out[y,x] = img[clamp(y-1), clamp(x+1)]
    assert out[0, 0, 0] == img[0, 1, 0]
    assert out[0, 3, 0] == img[0, 3, 0]   # col clamp at right edge
    assert out[3, 0, 0] == img[2, 1, 0]
    inv = D._shift_crop(out, -1, 1)
    # interior pixels survive the round trip
    np.testing.assert_array_equal(inv[1:3, 1:3], img[1:3, 1:3])


def test_dream_ascends_objective(model):
    """Gradient ascent on the masked-activation objective raises it; the
    image stays a valid [0,1] picture and actually changes."""
    cfg, specs, params = model
    img = _image()
    out, hist = D.dream(cfg, specs, params, img, layer=4, rounds=2,
                        iters=5, octaves=1, rate=0.05, seed=3)
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert np.isfinite(hist).all()
    # same layer/scale throughout (octaves=1): objective must trend up
    assert np.mean(hist[-3:]) > np.mean(hist[:3]), hist
    assert np.abs(out.astype(int) - img.astype(int)).max() > 3


def test_dream_octaves_and_flip_paths(model):
    """Multi-octave dreaming exercises the per-shape jit cache and the
    flip/unflip + resize-back plumbing without shape errors."""
    cfg, specs, params = model
    out, hist = D.dream(cfg, specs, params, _image(1), layer=2, rounds=1,
                        iters=6, octaves=3, rate=0.02, seed=0)
    assert out.shape == (SIZE, SIZE, 3)
    assert len(hist) == 6 and np.isfinite(hist).all()


def test_dream_rejects_octaves_over_dense_prefix():
    cfg = C.get_config("yolov1-tiny")
    specs = C.build_specs(cfg)
    dense_i = next(i for i, sp in enumerate(specs)
                   if isinstance(sp, S.Dense))
    with pytest.raises(ValueError, match="fully-convolutional"):
        D.dream(cfg, specs, {}, _image(), layer=dense_i, octaves=4)
    # the layer-range jitter can REACH the dense layer from below the
    # checked target — the guard must cover the jitter window too
    with pytest.raises(ValueError, match="fully-convolutional"):
        D.dream(cfg, specs, {}, _image(), layer=dense_i - 2, octaves=4,
                layer_range=6)
    # fixed-size prefix at octaves=1 demands an exactly net-sized image
    with pytest.raises(ValueError, match="must be exactly"):
        D.dream(cfg, specs, {}, _image(), layer=dense_i, octaves=1)


def test_dream_and_reconstruct_iters0_no_crash(model):
    """iters=0 must behave like the C's zero-trip loop (save the input),
    not crash on the verbose round summary."""
    cfg, specs, params = model
    img = _image(9)
    out, hist = D.dream(cfg, specs, params, img, layer=2, rounds=1,
                        iters=0, octaves=1, verbose=True)
    assert hist == [] and np.array_equal(out, img)
    final, mags = D.reconstruct(cfg, specs, params, img, 2, rounds=0,
                                iters=2, verbose=True)
    assert mags == []


def test_reconstruct_descends_feature_distance(model):
    """Feature inversion from a random start closes in on the target's
    feature map (the momentum update loop, reconstruct_picture)."""
    cfg, specs, params = model
    layer = 4
    img = _image(2)
    final, mags = D.reconstruct(cfg, specs, params, img, layer,
                                rounds=3, iters=8, rate=0.05,
                                momentum=0.9, random_start=True, seed=1)
    assert final.shape == (SIZE, SIZE, 3)
    assert np.isfinite(mags).all() and len(mags) == 24
    # distance to the target features shrinks from start to finish
    feats_fn, _ = D.make_reconstruct(cfg, specs, layer)
    from yolo_tensorflow_tpu.data.augment import letterbox
    boxed, _, _, _ = letterbox(img, cfg.input_size)
    target = np.asarray(feats_fn(params,
                                 boxed[None].astype(np.float32) / 255.0))
    rng = np.random.default_rng(1)
    u0 = rng.random((1, cfg.input_size, cfg.input_size, 3),
                    np.float32)
    d0 = np.sum((np.asarray(feats_fn(params, u0)) - target) ** 2)
    dN = np.sum((np.asarray(
        feats_fn(params, final[None].astype(np.float32) / 255.0))
        - target) ** 2)
    assert dN < 0.5 * d0, (dN, d0)


def test_reconstruct_zeroes_head_objectness(model):
    """Targeting the Detect marker zeroes each anchor's objectness channel
    in the recorded features (zero_objectness, region_layer.c:497)."""
    cfg, specs, params = model
    det_i = next(i for i, sp in enumerate(specs)
                 if isinstance(sp, S.Detect))
    # run one round; the head-target path must execute without error
    final, mags = D.reconstruct(cfg, specs, params, _image(3), det_i,
                                rounds=1, iters=2, rate=0.01)
    assert np.isfinite(mags).all()


def test_smooth_term_matches_direct_window():
    """lax.reduce_window smoothness == the C's clipped-window loop
    (nightmare.c:115-133)."""
    rng = np.random.default_rng(0)
    u = rng.standard_normal((1, 5, 6, 2)).astype(np.float32)
    num = 1
    got = np.asarray(D._smooth_term(u, num))
    want = np.zeros_like(u)
    h, w = u.shape[1:3]
    for j in range(h):
        for i in range(w):
            for jj in range(max(j - num, 0), min(j + num, h - 1) + 1):
                for ii in range(max(i - num, 0), min(i + num, w - 1) + 1):
                    want[:, j, i] += u[:, jj, ii] - u[:, j, i]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nightmare_cli_smoke(tmp_path, model):
    """`nightmare` end to end: per-round images written with the C's
    naming scheme; --reconstruct path too."""
    import cv2
    from yolo_tensorflow_tpu import cli
    from yolo_tensorflow_tpu.io import weights as W

    cfg, specs, params = model
    # CLI needs a weights file — emit folded params as npz
    wfile = tmp_path / "m.npz"
    cli._save_npz_params(params, str(wfile))
    ifile = tmp_path / "pic.jpg"
    cv2.imwrite(str(ifile), _image(5))
    outdir = tmp_path / "out"
    cli.main(["nightmare", "--model", "yolov2-tiny-voc",
              "--weights", str(wfile), "--image", str(ifile),
              "--layer", "3", "--iters", "2", "--rounds", "2",
              "--octaves", "1", "--prefix", str(outdir)])
    made = sorted(p.name for p in outdir.iterdir())
    assert made == ["pic_yolov2-tiny-voc_3_000000.jpg",
                    "pic_yolov2-tiny-voc_3_000001.jpg"], made
    cli.main(["nightmare", "--model", "yolov2-tiny-voc",
              "--weights", str(wfile), "--image", str(ifile),
              "--layer", "3", "--iters", "2", "--reconstruct",
              "--prefix", str(outdir)])
    assert (outdir / "pic_yolov2-tiny-voc_3_000000.jpg").exists()
