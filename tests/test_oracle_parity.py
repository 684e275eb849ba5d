"""C-oracle parity gates.

Compiles the reference's own vendored darknet (CPU-only, into /tmp — never
into this repo), feeds it (cfg, weights) pairs emitted by THIS framework
(io/cfg.py + io/weights.py), and diffs raw head activations against our
engine. This automates SURVEY.md §4 item 6 ("the vendored darknet binary is
the oracle") into a numeric gate. Skipped when the reference tree or a C
toolchain is unavailable.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.io import weights as W
from yolo_tensorflow_tpu.io.cfg import specs_to_cfg
from yolo_tensorflow_tpu.models import engine, specs as S

REFERENCE = "/root/reference/Darknet2Tensorflow/darknet-master"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REFERENCE) and shutil.which("gcc")),
    reason="darknet oracle needs the reference tree and gcc")


@pytest.fixture(scope="module")
def oracle():
    from darknet_oracle import Oracle
    try:
        return Oracle()
    except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
        pytest.skip(f"oracle build failed: {e}")


def _make_model(name, rng):
    cfg = C.get_config(name)
    specs = C.build_specs(cfg)
    size = cfg.input_size
    params, stats = engine.init_params(specs, (1, size, size, 3),
                                       jax.random.PRNGKey(0))
    params = jax.tree.map(np.asarray, params)
    for k in stats:
        n = stats[k]["mean"].shape[0]
        stats[k] = {"mean": rng.standard_normal(n).astype(np.float32) * 0.1,
                    "var": rng.random(n).astype(np.float32) * 0.5 + 0.75}
    return cfg, specs, params, stats


@pytest.mark.parametrize("name,rel_tol", [
    ("yolov2-tiny-voc", 1e-4),
    ("yolov3-tiny", 1e-4),
    ("yolov2", 2e-4),        # exercises the darknet reorg quirk
    ("yolov1-tiny", 1e-4),   # exercises connected + CHW flatten
    ("yolov1", 5e-4),        # 24 convs + dropout(inference-noop) + 3 FCs
])
def test_head_activations_match_c_oracle(oracle, name, rel_tol, rng,
                                         tmp_path):
    cfg, specs, params, stats = _make_model(name, rng)
    size = cfg.input_size
    wpath = str(tmp_path / "m.weights")
    W.save_darknet_weights(specs, size, params, stats, wpath)

    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    folded = W.fold_params(params, stats, cfg.bn_eps, "darknet")
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    dets, _ = engine.apply(specs, folded, x, bn_eps=cfg.bn_eps)
    ours = [np.asarray(f[0]) for f, _ in dets]

    head_idx = [i - 1 for i, s in enumerate(specs) if isinstance(s, S.Detect)]
    for hi, (idx, mine) in enumerate(zip(head_idx, ours)):
        tcfg = str(tmp_path / f"h{hi}.cfg")
        with open(tcfg, "w") as f:
            f.write(specs_to_cfg(cfg, specs[:idx + 1]))
        net = oracle.load(tcfg, wpath)
        if mine.ndim == 1:
            ref = oracle.predict_raw(net, img, mine.size)
        else:
            H, Wd, Ch = mine.shape
            ref = oracle.predict_raw(net, img, Ch * H * Wd) \
                .reshape(Ch, H, Wd).transpose(1, 2, 0)
        scale = np.abs(ref).mean() + 1e-6
        rel = np.abs(ref - mine).max() / scale
        assert rel < rel_tol, f"{name} head{hi}: rel diff {rel:.2e}"


def test_reorg_matches_c_semantics(rng):
    """darknet_reorg vs a direct transcription of reorg_cpu (blas.c:9,
    forward=0 as called by forward_reorg_layer for the v2 passthrough)."""
    from yolo_tensorflow_tpu.ops.layers import darknet_reorg
    b, h, w, c, s = 2, 6, 6, 8, 2
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)

    x_chw = x.transpose(0, 3, 1, 2)
    out_c = c // (s * s)
    flat_in = x_chw.reshape(b, -1)
    flat_out = np.zeros((b, c * h * w), np.float32)
    for k in range(c):
        for j in range(h):
            for i in range(w):
                in_index = i + w * (j + h * k)
                c2 = k % out_c
                offset = k // out_c
                w2 = i * s + offset % s
                h2 = j * s + offset // s
                out_index = w2 + w * s * (h2 + h * s * c2)
                flat_out[:, in_index] = flat_in[:, out_index]
    want = flat_out.reshape(b, c * s * s, h // s, w // s).transpose(0, 2, 3, 1)

    got = np.asarray(darknet_reorg(jnp.asarray(x), s))
    np.testing.assert_array_equal(got, want)


def test_cfg_emitter_structure():
    cfg = C.get_config("yolov3-tiny")
    text = specs_to_cfg(cfg)
    assert text.count("[convolutional]") == 13
    assert text.count("[maxpool]") == 6
    assert text.count("[yolo]") == 2
    assert text.count("[route]") == 2
    assert text.count("[upsample]") == 1
    assert "mask=3,4,5" in text and "mask=0,1,2" in text


def test_classifier_matches_c_oracle(oracle, rng, tmp_path):
    """darknet19 classifier (conv stack + avgpool + softmax) vs the C
    oracle's full forward including its [avgpool]/[softmax] layers."""
    cfg = C.get_config("darknet19-classifier", input_size=128)
    specs = C.build_specs(cfg)
    params, stats = engine.init_params(specs, (1, 128, 128, 3),
                                       jax.random.PRNGKey(0))
    params = jax.tree.map(np.asarray, params)
    for k in stats:
        n = stats[k]["mean"].shape[0]
        stats[k] = {"mean": rng.standard_normal(n).astype(np.float32) * 0.1,
                    "var": rng.random(n).astype(np.float32) * 0.5 + 0.75}
    wpath = str(tmp_path / "c.weights")
    W.save_darknet_weights(specs, 128, params, stats, wpath)
    cpath = str(tmp_path / "c.cfg")
    with open(cpath, "w") as f:
        f.write(specs_to_cfg(cfg, specs))

    img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    folded = W.fold_params(params, stats, cfg.bn_eps, "darknet")
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    dets, _ = engine.apply(specs, folded, x, bn_eps=cfg.bn_eps)
    (ours, _), = dets

    net = oracle.load(cpath, wpath)
    ref = oracle.predict_raw(net, img, 1000)
    np.testing.assert_allclose(np.asarray(ours[0]), ref, rtol=5e-3,
                               atol=1e-6)
    np.testing.assert_allclose(ref.sum(), 1.0, rtol=1e-4)


def test_parse_cfg_roundtrip_runs_identically(rng, tmp_path):
    """Emit cfg -> parse_cfg -> apply: identical outputs to the original
    specs (the parse_network_cfg equivalence gate)."""
    from yolo_tensorflow_tpu.io.cfg import parse_cfg
    cfg = C.get_config("yolov3-tiny", input_size=64)
    specs = C.build_specs(cfg)
    text = specs_to_cfg(cfg, specs)
    specs2, net, heads = parse_cfg(text)
    assert int(net["height"]) == 64
    assert len(heads) == 2 and heads[0]["_type"] == "yolo"

    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3), dtype=np.float32))
    d1, _ = engine.apply(specs, params, x)
    d2, _ = engine.apply(specs2, params, x)
    for (a, sa), (b, sb) in zip(d1, d2):
        assert sa.anchor_mask == sb.anchor_mask
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


WEIRD_CFG = """[net]
height=64
width=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
activation=leaky

[maxpool]
stride=2

[convolutional]
filters=24
size=3
stride=1
pad=1
activation=logistic

[convolutional]
filters=8
size=1
stride=1
activation=linear
"""


def test_parsed_cfg_geometry_matches_c_oracle(oracle, rng, tmp_path):
    """cfgs using darknet DEFAULTS (conv without pad => no padding, maxpool
    without size => size=stride, logistic activation) run identically in
    both runtimes — the fidelity the parser must preserve for arbitrary
    cfgs, not just ones this framework emitted."""
    from yolo_tensorflow_tpu.io.cfg import parse_cfg
    cpath = str(tmp_path / "w.cfg")
    with open(cpath, "w") as f:
        f.write(WEIRD_CFG)
    specs, net, _ = parse_cfg(WEIRD_CFG)
    assert specs[0].pad == 0          # conv without pad: NO padding
    assert specs[1].size == 2 and specs[1].stride == 2  # maxpool defaults
    assert specs[2].act == "logistic"

    params, stats = engine.init_params(specs, (1, 64, 64, 3),
                                       jax.random.PRNGKey(0))
    params = jax.tree.map(np.asarray, params)
    for k in stats:
        n = stats[k]["mean"].shape[0]
        stats[k] = {"mean": rng.standard_normal(n).astype(np.float32) * 0.1,
                    "var": rng.random(n).astype(np.float32) * 0.5 + 0.75}
    wpath = str(tmp_path / "w.weights")
    W.save_darknet_weights(specs, 64, params, stats, wpath)

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    folded = W.fold_params(params, stats, 1e-5, "darknet")
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    outs, _ = engine.apply(specs + (S.Detect(()),), folded, x)
    (mine, _), = outs
    mine = np.asarray(mine[0])

    net_h = oracle.load(cpath, wpath)
    H, Wd, Ch = mine.shape
    ref = oracle.predict_raw(net_h, img, Ch * H * Wd) \
        .reshape(Ch, H, Wd).transpose(1, 2, 0)
    rel = np.abs(ref - mine).max() / (np.abs(ref).mean() + 1e-6)
    assert rel < 1e-4, rel


# --------------------------------------------------------------------------
# Final decoded-box parity: get_network_boxes (the C detect path) vs our
# decode — boxes, objectness, and per-class probs, in darknet's own det
# ordering (fill_network_boxes, src/network.c:542-560).
# --------------------------------------------------------------------------

from yolo_tensorflow_tpu.models import heads


def _my_dets_darknet_order(cfg, specs, dets_out, thresh):
    """Replicate get_yolo/region/detection_detections' extraction + ordering
    from our decoded heads (square input => identity box correction)."""
    out = []
    for feat, det in dets_out:
        if cfg.head == 3:
            anchors = [cfg.anchors[i] for i in det.anchor_mask]
            b, conf, probs = heads.decode_v3_scale(
                feat, anchors, cfg.input_size, cfg.num_classes)
        elif cfg.head == 2:
            b, conf, probs = heads.decode_v2(feat, cfg)
        else:
            b, conf, probs = heads.decode_v1(feat, cfg)
        b, conf, probs = (np.asarray(b)[0], np.asarray(conf)[0],
                          np.asarray(probs)[0])
        if cfg.head == 3:
            # get_yolo_detections (yolo_layer.c:316): cell-major anchor-minor
            # scan, count-compacted by objectness > thresh; prob = obj*p
            # zeroed at <= thresh
            for k in range(b.shape[0]):
                if conf[k] <= thresh:
                    continue
                pr = conf[k] * probs[k]
                pr[pr <= thresh] = 0.0
                out.append((b[k], conf[k], pr))
        elif cfg.head == 2:
            # get_region_detections (region_layer.c:364): dets[n*HW + i] —
            # anchor-major; objectness zeroed at <= thresh, probs only
            # written when objectness survives
            HW_A = b.shape[0]
            A = cfg.num_anchors
            HW = HW_A // A
            for n in range(A):
                for i in range(HW):
                    k = i * A + n           # our cell-major index
                    obj = conf[k] if conf[k] > thresh else 0.0
                    pr = np.zeros(cfg.num_classes, np.float32)
                    if obj:
                        pr = conf[k] * probs[k]
                        pr[pr <= thresh] = 0.0
                    out.append((b[k], obj, pr))
        else:
            # get_detection_detections (detection_layer.c:225): dets[i*n+j]
            # cell-major (our order); objectness is the RAW conf (can be
            # negative); boxes scaled to pixels of (w,h) with NO correction
            for k in range(b.shape[0]):
                pr = conf[k] * probs[k]
                pr[pr <= thresh] = 0.0
                px = b[k] * cfg.input_size
                out.append((px, conf[k], pr))
    return out


@pytest.mark.parametrize("name,thresh", [
    ("yolov3-tiny", 0.3),
    ("yolov2-tiny-voc", 0.3),
    ("yolov1-tiny", 0.1),
])
def test_decoded_boxes_match_c_oracle(oracle, name, thresh, rng, tmp_path):
    cfg, specs, params, stats = _make_model(name, rng)
    size = cfg.input_size
    wpath = str(tmp_path / "m.weights")
    W.save_darknet_weights(specs, size, params, stats, wpath)
    cpath = str(tmp_path / "m.cfg")
    with open(cpath, "w") as f:
        f.write(specs_to_cfg(cfg, specs))

    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    folded = W.fold_params(params, stats, cfg.bn_eps, "darknet")
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    dets_out, _ = engine.apply(specs, folded, x, bn_eps=cfg.bn_eps)

    net = oracle.load(cpath, wpath)
    ref = oracle.boxes(net, img, cfg.num_classes, thresh=thresh)
    mine = _my_dets_darknet_order(cfg, specs, dets_out, thresh)

    assert len(ref) == len(mine), (len(ref), len(mine))
    assert any(r["objectness"] > 0 for r in ref), "no live dets in sample"
    # v1 boxes are pixel-space through 3 FCs — compare in relative units so
    # the float32 matmul noise isn't amplified by the x448 scaling
    bscale = 1.0 / cfg.input_size if cfg.head == 1 else 1.0
    atol = 1e-4 if cfg.head == 1 else 2e-5
    for r, (mb, mobj, mpr) in zip(ref, mine):
        np.testing.assert_allclose(np.asarray(r["box"]) * bscale,
                                   mb * bscale, rtol=1e-4, atol=atol)
        np.testing.assert_allclose(r["objectness"], mobj,
                                   rtol=1e-4, atol=atol)
        np.testing.assert_allclose(np.asarray(r["prob"]), mpr,
                                   rtol=1e-4, atol=atol)


def test_letterbox_unmapping_matches_correct_yolo_boxes(oracle, rng,
                                                        tmp_path):
    """Boxes on a letterboxed non-square image: get_network_boxes with the
    ORIGINAL (w,h) runs correct_yolo_boxes (yolo_layer.c:247); our
    unletterbox_boxes must agree. 416x208 keeps the pad offset integral so
    darknet's float-centre and its int embed agree exactly."""
    from yolo_tensorflow_tpu.data.augment import letterbox, unletterbox_boxes
    name = "yolov3-tiny"
    thresh = 0.3
    cfg, specs, params, stats = _make_model(name, rng)
    size = cfg.input_size
    wpath = str(tmp_path / "m.weights")
    W.save_darknet_weights(specs, size, params, stats, wpath)
    cpath = str(tmp_path / "m.cfg")
    with open(cpath, "w") as f:
        f.write(specs_to_cfg(cfg, specs))

    w0, h0 = 416, 208
    orig = rng.integers(0, 255, (h0, w0, 3), dtype=np.uint8)
    boxed, scale, px, py = letterbox(orig, size)
    assert (scale, px, py) == (1.0, 0, 104)

    folded = W.fold_params(params, stats, cfg.bn_eps, "darknet")
    x = jnp.asarray(boxed[None]).astype(jnp.float32) / 255.0
    dets_out, _ = engine.apply(specs, folded, x, bn_eps=cfg.bn_eps)
    mine = _my_dets_darknet_order(cfg, specs, dets_out, thresh)

    net = oracle.load(cpath, wpath)
    ref = oracle.boxes(net, boxed, cfg.num_classes, thresh=thresh,
                       orig_wh=(w0, h0))
    assert len(ref) == len(mine) and len(ref) > 0

    for r, (mb, mobj, _) in zip(ref, mine):
        # correct_yolo_boxes transcription applied to our network-space box
        nw, nh = size, (h0 * size) // w0
        ex = (mb[0] - (size - nw) / 2.0 / size) / (nw / size)
        ey = (mb[1] - (size - nh) / 2.0 / size) / (nh / size)
        ew = mb[2] * size / nw
        eh = mb[3] * size / nh
        np.testing.assert_allclose(np.asarray(r["box"]), [ex, ey, ew, eh],
                                   rtol=1e-4, atol=2e-5)
        # and the pipeline's own un-mapping agrees (pre-clip boxes)
        xyxy = np.asarray([[mb[0] - mb[2]/2, mb[1] - mb[3]/2,
                            mb[0] + mb[2]/2, mb[1] + mb[3]/2]], np.float32)
        got = unletterbox_boxes(xyxy, w0, h0, size, scale, px, py)[0]
        rx, ry, rw, rh = r["box"]
        want = np.array([(rx - rw/2) * w0, (ry - rh/2) * h0,
                         (rx + rw/2) * w0, (ry + rh/2) * h0])
        want = np.clip(want, 0, [w0, h0, w0, h0])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-2)


@pytest.mark.parametrize("h,w", [(100, 300), (64, 64), (97, 211),
                                 (500, 333)])
def test_device_letterbox_matches_c_library(oracle, h, w, rng):
    """ops/preprocess.letterbox_device vs the compiled letterbox_image
    itself (src/image.c:960) — settles the float32 edge-rounding semantics
    definitively, incl. the last-row dy-skip rule."""
    from yolo_tensorflow_tpu.ops import preprocess as P
    size = 96
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    canvas_side = 512
    canvas = np.zeros((canvas_side, canvas_side, 3), np.uint8)
    canvas[:h, :w] = img

    got = np.asarray(jax.jit(
        lambda c, hh, ww: P.letterbox_device(c, hh, ww, size))(
            jnp.asarray(canvas), jnp.int32(h), jnp.int32(w)))
    want = oracle.letterbox(img, size)
    np.testing.assert_allclose(got, want, atol=3e-5)


# NOTE on layer ordering: darknet's make_local_layer sizes its workspace in
# FLOATS where every other layer uses BYTES (src/local_layer.c:63 vs
# convolutional_layer.c:86) — an upstream bug that segfaults any cfg whose
# local layer needs more than a quarter of the largest conv workspace. The
# real yolov1 cfg masks it with huge convs; this cfg does the same.
EXOTIC_CFG = """[net]
height=64
width=64
channels=3

[crop]
crop_height=56
crop_width=56

[convolutional]
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=relu

[normalization]
size=5

[local]
filters=4
size=3
stride=1
pad=1
activation=leaky

[deconvolutional]
filters=6
size=4
stride=2
padding=1
activation=leaky

[l2norm]

[logistic]
"""


def test_exotic_layers_match_c_oracle(oracle, rng, tmp_path):
    """crop / LRN(normalization) / deconvolutional / local / l2norm /
    logistic — every previously-missing layer family in one network,
    activation-gated against the C runtime. Exercises the LRN init quirk,
    darknet's local pad-as-amount quirk, the deconv IOHW weight layout,
    and the crop x*2-1 inference branch."""
    from yolo_tensorflow_tpu.io.cfg import parse_cfg
    specs, net, _ = parse_cfg(EXOTIC_CFG)
    assert isinstance(specs[0], S.Crop) and specs[0].crop_height == 56
    assert isinstance(specs[4], S.LRN)
    assert isinstance(specs[5], S.Local) and specs[5].pad == 1
    assert isinstance(specs[6], S.Deconv) and specs[6].pad == 1
    assert isinstance(specs[7], S.L2Norm)
    assert isinstance(specs[8], S.Logistic)

    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(3), folded=True)
    params = jax.tree.map(np.asarray, params)
    wpath = str(tmp_path / "x.weights")
    W.save_darknet_weights(specs, 64, params, {}, wpath)
    cpath = str(tmp_path / "x.cfg")
    with open(cpath, "w") as f:
        f.write(EXOTIC_CFG)

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    outs, _ = engine.apply(specs + (S.Detect(()),), params, x)
    (mine, _), = outs
    mine = np.asarray(mine[0])
    assert mine.shape == (56, 56, 6), mine.shape

    net_h = oracle.load(cpath, wpath)
    H, Wd, Ch = mine.shape
    ref = oracle.predict_raw(net_h, img, Ch * H * Wd) \
        .reshape(Ch, H, Wd).transpose(1, 2, 0)
    rel = np.abs(ref - mine).max() / (np.abs(ref).mean() + 1e-6)
    assert rel < 2e-4, rel


def test_exotic_cfg_roundtrip(rng, tmp_path):
    """specs -> cfg text -> parse -> identical outputs, and .weights
    round-trip for Local + Deconv params."""
    from yolo_tensorflow_tpu.io.cfg import parse_cfg
    specs, _, _ = parse_cfg(EXOTIC_CFG)
    cfg = C.get_config("yolov2-tiny-voc", input_size=64)
    text = specs_to_cfg(cfg, specs)
    specs2, _, _ = parse_cfg(text)
    assert specs2 == specs

    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = jax.tree.map(np.asarray, params)
    wpath = str(tmp_path / "rt.weights")
    W.save_darknet_weights(specs, 64, params, {}, wpath)
    params2, _, _ = W.load_darknet_weights(specs, 64, wpath, fold=True)
    for k in params:
        for f in params[k]:
            np.testing.assert_array_equal(params[k][f], params2[k][f])


TREE_TEXT = """n0 -1
n1 -1
n2 0
n3 0
n4 1
n5 3
n6 3
"""


def test_region_tree_c_oracle_documented_divergence(oracle, rng, tmp_path):
    """The vendored darknet CANNOT serve as a tree-mode oracle: its
    forward_region_layer tree softmax (region_layer.c:173-181) calls
    softmax_cpu with count = coords+1 (an ELEMENT offset) and stride
    n*w*h, which under the layer's anchor-major plane layout (entry_index,
    region_layer.c:151) lands inside anchor 0's x/y/w/h planes and
    overwrites them — corrupting its own boxes (NaNs observed below). Our
    tree path instead applies the per-anchor group softmax that
    get_region_detections' reader expects, and is gated against
    transcriptions of the (sane) tree.c functions in tests/test_tree.py.
    This test pins the divergence: our detections are finite and
    normalized; the C's are self-corrupted."""
    from yolo_tensorflow_tpu.models.tree import (SoftmaxTree,
                                                 region_tree_detections)
    tree = SoftmaxTree.parse(TREE_TEXT)
    tpath = tmp_path / "t.tree"
    tpath.write_text(TREE_TEXT)
    A = 2
    anchors = ((1.0, 1.5), (2.0, 2.5))
    anchors_flat = ",".join(f"{a:g},{b:g}" for a, b in anchors)
    cfgtext = f"""[net]
height=32
width=32
channels=3

[convolutional]
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters={A * (5 + tree.n)}
size=1
stride=1
activation=linear

[region]
tree={tpath}
anchors={anchors_flat}
classes={tree.n}
coords=4
num={A}
softmax=1
"""
    from yolo_tensorflow_tpu.io.cfg import parse_cfg
    specs, _, heads_opt = parse_cfg(cfgtext)
    assert heads_opt[0].get("tree") == str(tpath)
    params, _ = engine.init_params(specs, (1, 32, 32, 3),
                                   jax.random.PRNGKey(5), folded=True)
    params = jax.tree.map(np.asarray, params)
    wpath = str(tmp_path / "t.weights")
    W.save_darknet_weights(specs, 32, params, {}, wpath)
    cpath = str(tmp_path / "t.cfg")
    with open(cpath, "w") as f:
        f.write(cfgtext)

    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    outs, _ = engine.apply(specs, params, x)
    (feat, _), = outs
    raw = np.asarray(feat[0])

    mine = region_tree_detections(raw, anchors, tree, thresh=0.2,
                                  tree_thresh=0.5)
    net = oracle.load(cpath, wpath)
    ref = oracle.boxes(net, img, tree.n, thresh=0.2)
    assert len(ref) == len(mine) > 0
    # ours: finite boxes, per-group probabilities that sum to 1 on the
    # group-softmax side (checked in test_tree), exactly one top class
    live = 0
    for m in mine:
        assert np.isfinite(np.asarray(m["box"])).all()
        assert (np.asarray(m["prob"]) > 0).sum() <= 1
        live += m["objectness"] > 0
    assert live > 0, "no live tree detections in sample"
    # the C runtime corrupted its own output buffer (the documented bug)
    ref_boxes = np.asarray([r["box"] for r in ref], np.float32)
    assert not np.isfinite(ref_boxes).all(), (
        "vendored darknet's region-tree forward no longer corrupts its "
        "boxes — revisit: a bit-exact oracle gate may now be possible")


def test_random_mixed_nets_match_c_oracle(oracle, rng, tmp_path):
    """Fuzz the WHOLE interop surface at once: random layer chains
    (spatial conv/pool/LRN/CRNN, optional flatten into
    connected/RNN/GRU/LSTM/softmax) are emitted as (cfg, weights) pairs,
    loaded by the reference's own compiled darknet, and diffed against the
    engine — any layer-combination semantic mismatch in the parser,
    emitter, weights walker, or a kernel shows up here, not just the
    combinations the hand-written gates pick."""
    import dataclasses
    from yolo_tensorflow_tpu.io.cfg import parse_cfg, specs_to_cfg

    size, T = 16, 2
    carrier = dataclasses.replace(C.get_config("darknet19-classifier"),
                                  input_size=size)

    def rand_spatial():
        k = int(rng.integers(0, 4))
        if k == 0:
            ks = int(rng.choice([1, 3]))
            return S.Conv(int(rng.integers(2, 7)), ks, 1,
                          bn=bool(rng.integers(0, 2)),
                          act=str(rng.choice(["leaky", "logistic"])),
                          pad=ks // 2)
        if k == 1:
            return S.MaxPool(2, 2)
        if k == 2:
            return S.LRN(5, 1e-4, 0.75, 1.0)
        return S.Crnn(int(rng.integers(2, 5)), int(rng.integers(2, 4)),
                      act=str(rng.choice(["leaky", "logistic"])),
                      bn=bool(rng.integers(0, 2)),
                      shortcut=bool(rng.integers(0, 2)))

    def rand_flat():
        k = int(rng.integers(0, 4))
        if k == 0:
            return S.Dense(int(rng.integers(4, 33)),
                           act=str(rng.choice(["leaky", "linear",
                                               "logistic", "tanh"])),
                           bn=bool(rng.integers(0, 2)))
        if k == 1:
            return S.Rnn(int(rng.integers(4, 17)),
                         act=str(rng.choice(["logistic", "tanh"])),
                         bn=bool(rng.integers(0, 2)),
                         shortcut=bool(rng.integers(0, 2)))
        if k == 2:
            return S.Gru(int(rng.integers(4, 17)),
                         tanh=bool(rng.integers(0, 2)))
        return S.Lstm(int(rng.integers(4, 17)))

    for trial in range(8):
        chain = [rand_spatial() for _ in range(int(rng.integers(1, 4)))]
        # at most one pooling halving chain from 16px; drop extra pools
        pools = [i for i, s in enumerate(chain) if isinstance(s, S.MaxPool)]
        for i in pools[2:]:
            chain[i] = S.LRN(5, 1e-4, 0.75, 1.0)
        if any(isinstance(s, S.Crnn) for s in chain):
            # darknet bug: CRNN never propagates its conv sublayers'
            # workspace_size, so without a big-enough REAL conv in the net
            # the C runtime im2cols into a NULL workspace and segfaults
            # (see test_crnn_matches_c_oracle) — lead with a 5x5 conv
            chain.insert(0, S.Conv(4, 5, bn=False, act="linear", pad=2))
        if rng.integers(0, 2):
            chain.append(S.TransposeFlatten())
            chain += [rand_flat() for _ in range(int(rng.integers(1, 3)))]
            if rng.integers(0, 2):
                chain.append(S.Softmax())
        specs = tuple(chain) + (S.Detect(()),)

        params, stats = engine.init_params(specs, (T, size, size, 3),
                                           jax.random.PRNGKey(trial))
        params = jax.tree.map(np.asarray, params)
        stats = jax.tree.map(
            lambda a: np.asarray(a) + 0.5 * rng.random(a.shape
                                                       ).astype(np.float32),
            stats)
        wpath = str(tmp_path / f"fz{trial}.weights")
        W.save_darknet_weights(specs, size, params, stats, wpath)
        cpath = str(tmp_path / f"fz{trial}.cfg")
        text = specs_to_cfg(carrier, specs, time_steps=T)
        with open(cpath, "w") as f:
            f.write(text)
        reparsed, _, _ = parse_cfg(text)
        assert reparsed == specs[:-1] or reparsed == specs, trial

        img = rng.random((T, size, size, 3)).astype(np.float32)
        folded = W.fold_params(params, stats, 1e-5, "darknet")
        dets, _ = engine.apply(specs, folded, jnp.asarray(img),
                               time_steps=T)
        mine = np.asarray(dets[0][0])

        flat = np.concatenate([f.transpose(2, 0, 1).ravel() for f in img])
        net = oracle.load(cpath, wpath)
        ref = oracle.predict_flat(net, flat, mine.size)
        if mine.ndim == 4:  # spatial output: darknet is CHW per frame
            Hh, Ww, Cc = mine.shape[1:]
            ref = ref.reshape(T, Cc, Hh, Ww).transpose(0, 2, 3, 1)
        else:
            ref = ref.reshape(mine.shape)
        rel = np.abs(ref - mine).max() / (np.abs(ref).mean() + 1e-6)
        assert rel < 1e-4, (trial, rel, text)


@pytest.mark.parametrize("name,thresh", [
    ("yolov3-tiny", 0.0),       # avg_flipped_yolo (yolo_layer.c:290)
    ("yolov2-tiny-voc", 0.3),   # region batch==2 path (region_layer.c:368)
])
def test_flip_tta_boxes_match_c_oracle(oracle, name, thresh, rng, tmp_path):
    """The C binary's OWN flip-TTA (set_batch_network(net, 2), image +
    mirror, get_network_boxes averaging internally — the valid2 eval path)
    vs our activate+flip_tta+decode, det by det. This upgrades the TTA
    gates from transcription-level to compiled-C-level, odd 13/26-wide
    grids included.

    thresh=0 for the yolo head is load-bearing: the vendored C has a
    LATENT HEAP OVERFLOW in this path — num_detections counts objectness
    on the PRE-average batch-0 output (yolo_layer.c:272), but
    get_yolo_detections emits per POST-average objectness (:316 after
    avg_flipped_yolo), so any cell the mirror pushes above the threshold
    writes past the alloc (reproducibly segfaults with random weights at
    thresh 0.3). At thresh 0 every sigmoid objectness qualifies on both
    sides, the count is exact, and the averaging math itself can be
    diffed. (Region heads allocate the full grid and are immune.)"""
    cfg, specs, params, stats = _make_model(name, rng)
    size = cfg.input_size
    wpath = str(tmp_path / "m.weights")
    W.save_darknet_weights(specs, size, params, stats, wpath)
    cpath = str(tmp_path / "m.cfg")
    with open(cpath, "w") as f:
        # batch=2 in [net]: darknet sizes layer buffers at PARSE time, and
        # set_batch_network never reallocates — a batch-1 cfg would
        # overflow under the 2-image flip predict (validate_detector_flip
        # relies on the training cfg's large batch the same way)
        f.write(specs_to_cfg(cfg, specs, batch=2))

    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    folded = W.fold_params(params, stats, cfg.bn_eps, "darknet")
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    x2 = jnp.concatenate([x, x[:, :, ::-1]], axis=0)
    dets_out, _ = engine.apply(specs, folded, x2, bn_eps=cfg.bn_eps)

    mine = []
    for feat, det in dets_out:
        if cfg.head == 3:
            anchors = [cfg.anchors[i] for i in det.anchor_mask]
            A = len(anchors)
            act = heads.activate_v3(feat, A, cfg.num_classes)
            avg = heads.yolo_flip_tta(act[:1], act[1:], A,
                                      cfg.num_classes, mode="darknet")
            b, sc, lb = heads.decode_v3_scale_activated(
                avg, anchors, cfg.input_size, cfg.num_classes)
            # full conf/probs for the det-by-det diff
            d = np.asarray(avg).reshape(1, -1, A, 5 + cfg.num_classes)
            conf = d[0, :, :, 4].reshape(-1)
            probs = d[0, :, :, 5:].reshape(-1, cfg.num_classes)
            b = np.asarray(b)[0]
            for k in range(b.shape[0]):
                if conf[k] <= thresh:
                    continue
                pr = conf[k] * probs[k]
                pr[pr <= thresh] = 0.0
                mine.append((b[k], conf[k], pr))
        else:
            act = heads.activate_v2(feat, cfg)
            avg = heads.region_flip_tta(act[:1], act[1:], cfg,
                                        mode="darknet")
            b, conf, probs = heads.decode_v2_activated(avg, cfg)
            b, conf, probs = (np.asarray(b)[0], np.asarray(conf)[0],
                              np.asarray(probs)[0])
            A = cfg.num_anchors
            HW = b.shape[0] // A
            for n_ in range(A):
                for i in range(HW):
                    k = i * A + n_
                    obj = conf[k] if conf[k] > thresh else 0.0
                    pr = np.zeros(cfg.num_classes, np.float32)
                    if obj:
                        pr = conf[k] * probs[k]
                        pr[pr <= thresh] = 0.0
                    mine.append((b[k], obj, pr))

    net = oracle.load(cpath, wpath)
    ref = oracle.boxes_flip(net, img, cfg.num_classes, thresh=thresh)
    assert len(ref) == len(mine), (len(ref), len(mine))
    assert any(r["objectness"] > 0 for r in ref), "no live dets in sample"
    for r, (mb, mobj, mpr) in zip(ref, mine):
        np.testing.assert_allclose(np.asarray(r["box"]), mb,
                                   rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(r["objectness"], mobj, rtol=1e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(r["prob"]), mpr,
                                   rtol=1e-4, atol=2e-5)
