"""Decode heads vs numpy oracles transcribing the reference math:
v1 YOLO_V1_Inference.py:213-270, v2 decode.py:13-48,
v3 YOLOV3.py:168-238 (_ratio_detection_layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import heads


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_decode_v2_oracle(rng):
    cfg = C.get_config("yolov2")
    H = W = 13
    A, Cn = cfg.num_anchors, cfg.num_classes
    feat = rng.standard_normal((2, H, W, A * (5 + Cn)), dtype=np.float32)

    boxes, conf, probs = heads.decode_v2(jnp.asarray(feat), cfg)

    det = feat.reshape(2, H * W, A, 5 + Cn)
    xy = _sigmoid(det[..., 0:2])
    wh = np.exp(det[..., 2:4])
    want_conf = _sigmoid(det[..., 4])
    want_probs = _softmax(det[..., 5:])
    anchors = np.asarray(cfg.anchors, np.float32)
    # x_cell[idx] = column, y_cell[idx] = row (tf.meshgrid semantics)
    cols = np.tile(np.arange(W, dtype=np.float32), H).reshape(1, H * W, 1)
    rows = np.repeat(np.arange(H, dtype=np.float32), W).reshape(1, H * W, 1)
    bx = (cols + xy[..., 0]) / W
    by = (rows + xy[..., 1]) / H
    bw = anchors[:, 0] * wh[..., 0] / W
    bh = anchors[:, 1] * wh[..., 1] / H
    want = np.stack([bx, by, bw, bh], -1).reshape(2, -1, 4)

    np.testing.assert_allclose(np.asarray(boxes), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(conf),
                               want_conf.reshape(2, -1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(probs),
                               want_probs.reshape(2, -1, Cn), rtol=1e-5,
                               atol=1e-6)


def test_decode_v3_scale_oracle(rng):
    cfg = C.get_config("yolov3")
    G, A, Cn = 13, 3, cfg.num_classes
    anchors_px = [cfg.anchors[i] for i in (6, 7, 8)]
    feat = rng.standard_normal((1, G, G, A * (5 + Cn)), dtype=np.float32)

    boxes, conf, probs = heads.decode_v3_scale(
        jnp.asarray(feat), anchors_px, cfg.input_size, Cn)

    det = feat.reshape(1, G * G, A, 5 + Cn)
    xy = _sigmoid(det[..., 0:2])
    wh = np.exp(det[..., 2:4])
    want_conf = _sigmoid(det[..., 4]).reshape(1, -1)
    want_probs = _sigmoid(det[..., 5:]).reshape(1, -1, Cn)
    stride = cfg.input_size // G
    anchors = np.asarray(anchors_px, np.float32) / stride
    cols = np.tile(np.arange(G, dtype=np.float32), G).reshape(1, G * G, 1)
    rows = np.repeat(np.arange(G, dtype=np.float32), G).reshape(1, G * G, 1)
    bx = (cols + xy[..., 0]) / G
    by = (rows + xy[..., 1]) / G
    bw = anchors[:, 0] * wh[..., 0] / G
    bh = anchors[:, 1] * wh[..., 1] / G
    want = np.stack([bx, by, bw, bh], -1).reshape(1, -1, 4)

    np.testing.assert_allclose(np.asarray(boxes), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(conf), want_conf, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(probs), want_probs, rtol=1e-5, atol=1e-6)
    # spot-check the anchor grid-unit constants printed in YOLOV3.py:226
    np.testing.assert_allclose(anchors[0], [3.625, 2.8125])


def test_decode_v1_oracle(rng):
    cfg = C.get_config("yolov1")
    S, B, Cn = cfg.grid, cfg.boxes_per_cell, cfg.num_classes
    pred = rng.standard_normal((1, S * S * (Cn + B * 5)), dtype=np.float32)

    boxes, conf, probs = heads.decode_v1(jnp.asarray(pred), cfg)

    i1 = S * S * Cn
    i2 = i1 + S * S * B
    class_probs = pred[:, :i1].reshape(1, S, S, Cn)
    confs = pred[:, i1:i2].reshape(1, S, S, B)
    raw = pred[:, i2:].reshape(1, S, S, B, 4)
    # x_offset[i,j,b] = j (column), y_offset[i,j,b] = i (row)
    col = np.tile(np.arange(S, dtype=np.float32).reshape(1, S, 1), (S, 1, B))
    row = col.transpose(1, 0, 2)
    x = (raw[..., 0] + col) / S
    y = (raw[..., 1] + row) / S
    w = raw[..., 2] ** 2
    h = raw[..., 3] ** 2
    want_boxes = np.stack([x, y, w, h], -1).reshape(1, -1, 4)
    want_conf = confs.reshape(1, -1)
    want_probs = np.broadcast_to(class_probs[:, :, :, None, :],
                                 (1, S, S, B, Cn)).reshape(1, -1, Cn)

    np.testing.assert_allclose(np.asarray(boxes), want_boxes, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(conf), want_conf, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(probs), want_probs, rtol=1e-6)


def test_xywh_to_xyxy():
    b = jnp.asarray([[[0.5, 0.5, 0.2, 0.4]]])
    out = np.asarray(heads.xywh_to_xyxy(b))
    np.testing.assert_allclose(out, [[[0.4, 0.3, 0.6, 0.7]]], atol=1e-7)


# --------------------------------------------------------------------------
# v2 flip-TTA (get_region_detections batch==2 path, region_layer.c:368-390)
# --------------------------------------------------------------------------

def _avg_flipped_region_np(out_flat, flip_flat, H, W, A, E):
    """Literal transcription of the C averaging loop on darknet-ordered
    flat activated buffers ([anchor][entry][h][w]), incl. its z==0-under-
    [entry][anchor]-indexing negation quirk."""
    flip = flip_flat.copy()
    for j in range(H):
        for i in range(W // 2):
            for n in range(A):
                for z in range(E):
                    i1 = z * W * H * A + n * W * H + j * W + i
                    i2 = z * W * H * A + n * W * H + j * W + (W - i - 1)
                    flip[i1], flip[i2] = flip[i2], flip[i1]
                    if z == 0:
                        flip[i1] = -flip[i1]
                        flip[i2] = -flip[i2]
    return (out_flat + flip) / 2.0


def _to_darknet_flat(act_nhwc, A, E):
    """(H, W, A*E) NHWC cell-anchor-major -> darknet [anchor][entry][hw]."""
    H, W, _ = act_nhwc.shape
    return act_nhwc.reshape(H, W, A, E).transpose(2, 3, 0, 1).reshape(-1)


@pytest.mark.parametrize("W", [4, 13])
def test_region_flip_tta_matches_c_transcription(rng, W):
    """Odd W (13 — the real 416 grid) exercises the C's ``i < w/2`` loop
    bound: the middle column is never swapped NOR negated."""
    from yolo_tensorflow_tpu.models.heads import activate_v2, region_flip_tta
    cfg = C.get_config("yolov2-tiny-voc")
    H = W
    A, Cn = cfg.num_anchors, cfg.num_classes
    E = 5 + Cn
    raw = rng.standard_normal((1, H, W, A * E), dtype=np.float32)
    raw_f = rng.standard_normal((1, H, W, A * E), dtype=np.float32)

    act = activate_v2(jnp.asarray(raw), cfg)
    act_f = activate_v2(jnp.asarray(raw_f), cfg)
    got = np.asarray(region_flip_tta(act, act_f, cfg, mode="darknet"))[0]

    want_flat = _avg_flipped_region_np(
        _to_darknet_flat(np.asarray(act)[0], A, E),
        _to_darknet_flat(np.asarray(act_f)[0], A, E), H, W, A, E)
    want = want_flat.reshape(A, E, H, W).transpose(2, 3, 0, 1).reshape(
        H, W, A * E)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


# --------------------------------------------------------------------------
# v3 flip-TTA (avg_flipped_yolo, yolo_layer.c:290-313; the valid2 eval path
# validate_detector_flip, examples/detector.c:234)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("W", [4, 13])
def test_yolo_flip_tta_matches_c_transcription(rng, W):
    """avg_flipped_yolo has the identical loop structure to the region flip
    (same misindexed z==0 negation, same odd-width middle-column skip) —
    pin yolo_flip_tta against the same literal transcription with v3's
    A=3, E=85 geometry."""
    from yolo_tensorflow_tpu.models.heads import activate_v3, yolo_flip_tta
    A, Cn = 3, 80
    E = 5 + Cn
    H = W
    raw = rng.standard_normal((1, H, W, A * E), dtype=np.float32)
    raw_f = rng.standard_normal((1, H, W, A * E), dtype=np.float32)
    act = activate_v3(jnp.asarray(raw), A, Cn)
    act_f = activate_v3(jnp.asarray(raw_f), A, Cn)
    got = np.asarray(yolo_flip_tta(act, act_f, A, Cn, mode="darknet"))[0]
    want_flat = _avg_flipped_region_np(
        _to_darknet_flat(np.asarray(act)[0], A, E),
        _to_darknet_flat(np.asarray(act_f)[0], A, E), H, W, A, E)
    want = want_flat.reshape(A, E, H, W).transpose(2, 3, 0, 1).reshape(
        H, W, A * E)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_v3_tta_detector_end_to_end():
    """Detector(tta=True) on a v3 head: deterministic bias-only model —
    corrected-mode TTA must reproduce the single-pass detections (uniform
    outputs are mirror-symmetric)."""
    from yolo_tensorflow_tpu.models import engine as E
    cfg = C.get_config("yolov3-tiny", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = E.init_params(specs, (1, 64, 64, 3), jax.random.PRNGKey(0),
                              folded=True)
    params = jax.tree.map(lambda a: np.zeros_like(a), params)
    from yolo_tensorflow_tpu.models import specs as S
    for i, sp in enumerate(specs):
        # both scale heads: obj logit 3, class 5 logit 5
        if isinstance(sp, S.Detect):
            head = E.layer_key(i - 1)
            b = np.zeros_like(params[head]["b"])
            b[4] = 3.0
            b[5 + 5] = 5.0
            params[head]["b"] = b
    from yolo_tensorflow_tpu.pipeline import Detector
    det = Detector(cfg, params=params, specs=specs, num_candidates=32,
                   max_detections=5, tta=True, tta_mode="corrected")
    img = np.full((64, 64, 3), 100, np.uint8)
    res = det.detect(img)
    assert res and all(r["class_id"] == 5 for r in res)
    det0 = Detector(cfg, params=params, specs=specs, num_candidates=32,
                    max_detections=5)
    res0 = det0.detect(img)
    got = sorted(tuple(round(v, 3) for v in r["box"]) for r in res)
    want = sorted(tuple(round(v, 3) for v in r["box"]) for r in res0)
    assert got == want
    # darknet mode also runs end-to-end under jit
    det_dk = Detector(cfg, params=params, specs=specs, num_candidates=32,
                      max_detections=5, tta=True, tta_mode="darknet")
    assert det_dk.detect(img)


def test_region_flip_tta_corrected_mode(rng):
    """corrected mode: every anchor's x becomes the reflected cell offset
    1-sigmoid(tx) of the mirrored column; nothing is negated."""
    from yolo_tensorflow_tpu.models.heads import activate_v2, region_flip_tta
    cfg = C.get_config("yolov2-tiny-voc")
    H = W = 4
    A, Cn = cfg.num_anchors, cfg.num_classes
    raw = rng.standard_normal((1, H, W, A * (5 + Cn)), dtype=np.float32)
    act = np.asarray(activate_v2(jnp.asarray(raw), cfg))
    got = np.asarray(region_flip_tta(
        jnp.asarray(act), jnp.asarray(act), cfg, mode="corrected"))[0]
    a = act[0].reshape(H, W, A, 5 + Cn)
    g = got.reshape(H, W, A, 5 + Cn)
    np.testing.assert_allclose(
        g[..., 0], (a[..., 0] + (1.0 - a[:, ::-1, :, 0])) / 2, rtol=1e-6)
    np.testing.assert_allclose(g[..., 4], (a[..., 4] + a[:, ::-1, :, 4]) / 2,
                               rtol=1e-6)


def test_tta_detector_end_to_end():
    """Detector(tta=True) runs the doubled-batch path; on the deterministic
    bias-only model (spatially uniform outputs) the corrected-mode TTA
    average reproduces the single-pass detections exactly for every entry
    except x, whose average of offset and mirrored offset is 0.5."""
    from yolo_tensorflow_tpu.models import engine as E
    cfg = C.get_config("yolov2-tiny-voc", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = E.init_params(specs, (1, 64, 64, 3), jax.random.PRNGKey(0),
                              folded=True)
    params = jax.tree.map(lambda a: np.zeros_like(a), params)
    head = sorted(params)[-1]
    bias = np.zeros_like(params[head]["b"])
    bias[4] = 4.0
    bias[5 + 7] = 6.0
    params[head]["b"] = bias
    from yolo_tensorflow_tpu.pipeline import Detector
    det = Detector(cfg, params=params, specs=specs, num_candidates=32,
                   max_detections=5, tta=True, tta_mode="corrected")
    res = det.detect(np.full((64, 64, 3), 100, np.uint8))
    assert res and all(r["class_id"] == 7 for r in res)
    import math
    exp = 1 / (1 + math.exp(-4.0)) * (math.exp(6.0) / (math.exp(6.0) + 19))
    assert all(abs(r["score"] - exp) < 1e-3 for r in res)
    # uniform outputs: sigmoid(0)=0.5 offset and its mirror average to 0.5
    # -> box centers sit exactly at cell centers, same as non-TTA
    det0 = Detector(cfg, params=params, specs=specs, num_candidates=32,
                    max_detections=5)
    res0 = det0.detect(np.full((64, 64, 3), 100, np.uint8))
    got = sorted(tuple(round(v, 3) for v in r["box"]) for r in res)
    want = sorted(tuple(round(v, 3) for v in r["box"]) for r in res0)
    assert got == want


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov2-tiny-voc",
                                  "yolov1-tiny"])
def test_decode_scored_equals_decode_plus_scoring(name, rng):
    """decode_scored (the serving fast path: max/argmax on raw logits, no
    (N, C) activation materialized) must score and label EXACTLY like
    decode() + batched_nms's factored scoring, for every head family."""
    cfg = C.get_config(name)
    specs = C.build_specs(cfg)
    from yolo_tensorflow_tpu.models import engine as E
    shapes = E.infer_shapes(specs, (2, cfg.input_size, cfg.input_size, 3))
    from yolo_tensorflow_tpu.models import specs as S
    dets = []
    for i, s in enumerate(specs):
        if isinstance(s, S.Detect):
            sh = shapes[i - 1]
            feat = jnp.asarray(
                rng.standard_normal((2,) + tuple(sh[1:])) * 2,
                jnp.float32)
            dets.append((feat, s))

    boxes_a, conf, probs = heads.decode(dets, cfg)
    labels_a = np.argmax(np.asarray(probs), axis=-1)
    scores_a = np.asarray(conf) * np.max(np.asarray(probs), axis=-1)

    boxes_b, scores_b, labels_b = heads.decode_scored(dets, cfg)
    np.testing.assert_allclose(np.asarray(boxes_b), np.asarray(boxes_a),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(labels_b), labels_a)
    # v3/v1 are bit-exact (same ops, same elements); v2's softmax-max
    # shortcut differs only in reduction order
    np.testing.assert_allclose(np.asarray(scores_b), scores_a,
                               rtol=2e-6, atol=1e-7)
