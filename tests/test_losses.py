"""Loss gates: the v3 delta vs a direct numpy transcription of
yolo_layer.c:132-240, the gradient-equals-minus-delta contract, and the v2
weighted-MSE vs a numpy Loss.py oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.train import losses


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def _iou_xywh_np(a, b):
    ax0, ay0, ax1, ay1 = a[0]-a[2]/2, a[1]-a[3]/2, a[0]+a[2]/2, a[1]+a[3]/2
    bx0, by0, bx1, by1 = b[0]-b[2]/2, b[1]-b[3]/2, b[0]+b[2]/2, b[1]+b[3]/2
    iw = max(min(ax1, bx1) - max(ax0, bx0), 0.0)
    ih = max(min(ay1, by1) - max(ay0, by0), 0.0)
    inter = iw * ih
    union = a[2]*a[3] + b[2]*b[3] - inter
    return inter / max(union, 1e-9)


def _v3_delta_oracle(raw, truths, anchors_all, mask, input_size,
                     ignore_thresh, num_classes):
    """Sequential transcription of forward_yolo_layer (single image)."""
    G = raw.shape[0]
    A, Cn = len(mask), num_classes
    p = raw.reshape(G, G, A, 5 + Cn)
    out = p.copy()
    out[..., 0:2] = _sig(p[..., 0:2])
    out[..., 4:] = _sig(p[..., 4:])
    delta = np.zeros_like(out)
    valid_truths = [t for t in truths if t[2] > 0]

    for j in range(G):
        for i in range(G):
            for n in range(A):
                an = anchors_all[mask[n]]
                pred = np.array([
                    (i + out[j, i, n, 0]) / G,
                    (j + out[j, i, n, 1]) / G,
                    np.exp(p[j, i, n, 2]) * an[0] / input_size,
                    np.exp(p[j, i, n, 3]) * an[1] / input_size])
                best_iou = 0.0
                for t in valid_truths:
                    best_iou = max(best_iou, _iou_xywh_np(pred, t[:4]))
                delta[j, i, n, 4] = 0 - out[j, i, n, 4]
                if best_iou > ignore_thresh:
                    delta[j, i, n, 4] = 0.0

    for t in valid_truths:
        best_n, best_iou = 0, 0.0
        for n, a in enumerate(anchors_all):
            iou = _iou_xywh_np(np.array([0, 0, t[2], t[3]]),
                               np.array([0, 0, a[0]/input_size, a[1]/input_size]))
            if iou > best_iou:
                best_iou, best_n = iou, n
        if best_n not in mask:
            continue
        slot = list(mask).index(best_n)
        ci, cj = int(t[0] * G), int(t[1] * G)
        scale = 2.0 - t[2] * t[3]
        an = anchors_all[best_n]
        delta[cj, ci, slot, 0] = scale * ((t[0]*G - ci) - out[cj, ci, slot, 0])
        delta[cj, ci, slot, 1] = scale * ((t[1]*G - cj) - out[cj, ci, slot, 1])
        delta[cj, ci, slot, 2] = scale * (np.log(t[2]*input_size/an[0]) - p[cj, ci, slot, 2])
        delta[cj, ci, slot, 3] = scale * (np.log(t[3]*input_size/an[1]) - p[cj, ci, slot, 3])
        delta[cj, ci, slot, 4] = 1 - out[cj, ci, slot, 4]
        cls = int(t[4])
        for c in range(Cn):
            delta[cj, ci, slot, 5 + c] = (1.0 if c == cls else 0.0) - out[cj, ci, slot, 5 + c]
    return delta


def _sample_truths(rng, T, n_valid, num_classes):
    truths = np.zeros((T, 5), np.float32)
    for k in range(n_valid):
        truths[k, 0:2] = rng.random(2) * 0.9 + 0.05
        truths[k, 2:4] = rng.random(2) * 0.4 + 0.05
        truths[k, 4] = rng.integers(0, num_classes)
    return truths


@pytest.mark.parametrize("mask", [(6, 7, 8), (0, 1, 2)])
def test_v3_scale_delta_matches_oracle(mask, rng):
    cfg = C.get_config("yolov3", input_size=96)
    G = 96 // 32 if mask == (6, 7, 8) else 96 // 8
    Cn = 4  # small class count for speed
    raw = rng.standard_normal((G, G, 3 * (5 + Cn)), dtype=np.float32)
    truths = _sample_truths(rng, 6, 3, Cn)
    anchors = np.asarray(cfg.anchors, np.float32)

    delta, _ = losses._v3_scale_delta(
        jnp.asarray(raw), jnp.asarray(truths), jnp.asarray(anchors),
        mask, 96, 0.5, 1.0, Cn)
    want = _v3_delta_oracle(raw, truths, anchors, mask, 96, 0.5, Cn)
    np.testing.assert_allclose(np.asarray(delta), want, rtol=2e-4, atol=2e-5)


def test_v3_loss_gradient_is_minus_delta(rng):
    """The autodiff gradient w.r.t. the raw feature map must equal
    -delta/batch — darknet's exact backward (backward_yolo_layer propagates
    delta; update_network applies learning_rate/batch)."""
    cfg = C.get_config("yolov3", input_size=64)
    Cn = cfg.num_classes
    G = 2
    raw = rng.standard_normal((1, G, G, 3 * (5 + Cn)), dtype=np.float32)
    truths = _sample_truths(rng, 4, 2, Cn)[None]
    anchors = np.asarray(cfg.anchors, np.float32)

    def f(r):
        loss, _ = losses.yolo_v3_loss([r], jnp.asarray(truths), cfg,
                                      anchor_masks=[(6, 7, 8)])
        return loss

    grad = np.asarray(jax.grad(f)(jnp.asarray(raw)))
    delta, _ = losses._v3_scale_delta(
        jnp.asarray(raw[0]), jnp.asarray(truths[0]), jnp.asarray(anchors),
        (6, 7, 8), 64, 0.5, 1.0, Cn)
    np.testing.assert_allclose(grad[0], -np.asarray(delta).reshape(G, G, -1),
                               rtol=1e-4, atol=1e-6)  # batch==1 here


def test_v3_loss_value_is_delta_sq(rng):
    cfg = C.get_config("yolov3", input_size=416)
    G, Cn = 2, cfg.num_classes
    raw = rng.standard_normal((1, G, G, 3 * (5 + Cn)), dtype=np.float32)
    truths = _sample_truths(rng, 4, 2, Cn)[None]
    truths[0, :2, 2:4] = 0.5 + truths[0, :2, 2:4] * 0.5   # large objects -> anchors 6:9
    loss, metrics = losses.yolo_v3_loss(
        [jnp.asarray(raw)], jnp.asarray(truths), cfg, anchor_masks=[(6, 7, 8)])
    delta, _ = losses._v3_scale_delta(
        jnp.asarray(raw[0]), jnp.asarray(truths[0]),
        jnp.asarray(np.asarray(cfg.anchors, np.float32)),
        (6, 7, 8), 416, 0.5, 1.0, Cn)
    np.testing.assert_allclose(float(loss), float(jnp.sum(delta**2)), rtol=1e-5)
    assert metrics["count"] >= 1


def test_v2_loss_oracle(rng):
    """yolo_v2_loss vs a numpy transcription of Loss.py:10-79."""
    cfg = C.get_config("yolov2-tiny-voc")
    H = W = 5
    A, Cn = cfg.num_anchors, cfg.num_classes
    raw = rng.standard_normal((2, H, W, A * (5 + Cn)), dtype=np.float32)
    truths = np.stack([_sample_truths(rng, 5, 2, Cn) for _ in range(2)])

    targets = losses.build_v2_targets(jnp.asarray(truths), cfg, H)
    loss, _ = losses.yolo_v2_loss(jnp.asarray(raw), targets, cfg, grid=H)

    # numpy oracle
    sprob, sconf, snoob, scoor = 1.0, 5.0, 1.0, 1.0
    anchors = np.asarray(cfg.anchors, np.float32).reshape(1, 1, A, 2)
    p = raw.reshape(2, H * W, A, 5 + Cn)
    cxy = _sig(p[..., 0:2])
    cwh = np.sqrt(np.exp(p[..., 2:4]) * anchors / np.array([W, H], np.float32))
    coords = np.concatenate([cxy, cwh], -1)
    confs = _sig(p[..., 4:5])
    e = np.exp(p[..., 5:] - p[..., 5:].max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)

    _coords = np.asarray(targets["coords"])
    _confs = np.asarray(targets["confs"])
    _probs = np.asarray(targets["probs"])

    def corners(c):
        wh = np.square(c[..., 2:4]) * np.array([W, H], np.float32)
        ctr = c[..., 0:2]
        return ctr - wh/2, ctr + wh/2, wh[..., 0]*wh[..., 1]

    ul, dr, area = corners(coords)
    _ul, _dr, _area = corners(_coords)
    iw = np.maximum(np.minimum(dr, _dr) - np.maximum(ul, _ul), 0.0)
    inter = iw[..., 0] * iw[..., 1]
    ious = inter / np.maximum(area + _area - inter, 1e-9)
    best = (ious >= ious.max(2, keepdims=True)).astype(np.float32)
    mask = (best * _confs)[..., None]
    weights = np.concatenate([
        np.broadcast_to(scoor * mask, coords.shape),
        np.broadcast_to(snoob * (1 - mask) + sconf * mask, confs.shape),
        np.broadcast_to(sprob * mask, probs.shape)], -1)
    preds = np.concatenate([coords, confs, probs], -1)
    tr = np.concatenate([_coords, _confs[..., None], _probs], -1)
    want = 0.5 * np.mean(np.sum(np.square(preds - tr) * weights, axis=(1, 2, 3)))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_v2_targets_placement():
    cfg = C.get_config("yolov2-tiny-voc")
    truths = np.zeros((1, 3, 5), np.float32)
    truths[0, 0] = [0.5, 0.5, 0.2, 0.3, 7]       # cell (6,6) of 13
    t = losses.build_v2_targets(jnp.asarray(truths), cfg, 13)
    cell = 6 * 13 + 6
    assert float(t["confs"][0, cell, 0]) == 1.0
    assert float(t["probs"][0, cell, 0, 7]) == 1.0
    np.testing.assert_allclose(np.asarray(t["coords"][0, cell, 0]),
                               [0.5, 0.5, np.sqrt(0.2), np.sqrt(0.3)],
                               rtol=1e-6)
    assert float(jnp.sum(t["confs"])) == cfg.num_anchors  # only one cell set
