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


@pytest.mark.parametrize("mask", [(6, 7, 8), (0, 1, 2)])
def test_v3_vectorized_assign_equals_scan(mask, rng):
    """truth_assign='vectorized' (one-shot scatter with an explicit
    last-writer-wins mask) must reproduce the sequential scan's delta to
    1 ulp (XLA fuses the two forms differently, so a handful of elements
    round once more), including when two truths collide on the same
    (cell, anchor-slot) — the C overwrites, so the later truth wins."""
    cfg = C.get_config("yolov3", input_size=96)
    G = 96 // 32 if mask == (6, 7, 8) else 96 // 8
    Cn = 4
    raw = rng.standard_normal((G, G, 3 * (5 + Cn)), dtype=np.float32)
    truths = _sample_truths(rng, 8, 5, Cn)
    if mask == (6, 7, 8):   # big boxes so the large-anchor scale owns them
        truths[:5, 2:4] = 0.5 + truths[:5, 2:4]
    # force a same-slot collision: same center cell, identical wh (same best
    # anchor), different class — truth 4 must overwrite truth 1
    truths[4] = truths[1]
    truths[4, 4] = (truths[1, 4] + 1) % Cn
    anchors = np.asarray(cfg.anchors, np.float32)

    args = (jnp.asarray(raw), jnp.asarray(truths), jnp.asarray(anchors),
            mask, 96, 0.5, 1.0, Cn)
    d_scan, m_scan = losses._v3_scale_delta(*args, truth_assign="scan")
    d_vec, m_vec = losses._v3_scale_delta(*args, truth_assign="vectorized")
    np.testing.assert_allclose(np.asarray(d_scan), np.asarray(d_vec),
                               rtol=3e-7, atol=5e-7)
    for k in m_scan:
        np.testing.assert_allclose(float(m_scan[k]), float(m_vec[k]),
                                   rtol=1e-6, atol=1e-7)
    # the collision actually exercised the overwrite path
    assert float(m_scan["count"]) >= 2.0


def test_v3_loss_truth_assign_grad_identical(rng):
    """yolo_v3_loss gradients match across truth_assign modes to 1 ulp
    (grad == -delta/batch and the deltas agree to fusion-level rounding)."""
    cfg = C.get_config("yolov3", input_size=64)
    Cn = cfg.num_classes
    G = 2
    raw = rng.standard_normal((2, G, G, 3 * (5 + Cn)), dtype=np.float32)
    truths = np.stack([_sample_truths(rng, 4, 2, Cn),
                       _sample_truths(rng, 4, 3, Cn)])

    def f(r, mode):
        loss, _ = losses.yolo_v3_loss([r], jnp.asarray(truths), cfg,
                                      anchor_masks=[(6, 7, 8)],
                                      truth_assign=mode)
        return loss

    g_scan = np.asarray(jax.grad(lambda r: f(r, "scan"))(jnp.asarray(raw)))
    g_vec = np.asarray(
        jax.grad(lambda r: f(r, "vectorized"))(jnp.asarray(raw)))
    np.testing.assert_allclose(g_scan, g_vec, rtol=3e-7, atol=5e-7)


# --------------------------------------------------------------------------
# v2 darknet region loss vs a transcription of forward_region_layer
# --------------------------------------------------------------------------

def _region_delta_oracle(raw, truths, anchors, seen, hy, Cn):
    """Sequential transcription of forward_region_layer
    (src/region_layer.c:158-320), single image."""
    H, W = raw.shape[0], raw.shape[1]
    A = anchors.shape[0]
    p = raw.reshape(H, W, A, 5 + Cn).astype(np.float64)
    sxy = _sig(p[..., 0:2])
    sobj = _sig(p[..., 4])
    if hy.softmax:
        e = np.exp(p[..., 5:] - p[..., 5:].max(-1, keepdims=True))
        cls = e / e.sum(-1, keepdims=True)
    else:
        cls = _sig(p[..., 5:])
    delta = np.zeros_like(p)
    valid = [t for t in truths if t[2] > 0]

    def pred_box(j, i, nn):
        return np.array([
            (i + sxy[j, i, nn, 0]) / W, (j + sxy[j, i, nn, 1]) / H,
            np.exp(p[j, i, nn, 2]) * anchors[nn, 0] / W,
            np.exp(p[j, i, nn, 3]) * anchors[nn, 1] / H])

    for j in range(H):
        for i in range(W):
            for nn in range(A):
                pred = pred_box(j, i, nn)
                best_iou = 0.0
                for t in valid:
                    best_iou = max(best_iou, _iou_xywh_np(pred, t[:4]))
                delta[j, i, nn, 4] = hy.noobject_scale * (0 - sobj[j, i, nn])
                if best_iou > hy.thresh:
                    delta[j, i, nn, 4] = 0.0
                if seen < 12800:
                    # delta_region_box toward the cell-centered anchor, .01
                    delta[j, i, nn, 0] = .01 * (0.5 - sxy[j, i, nn, 0])
                    delta[j, i, nn, 1] = .01 * (0.5 - sxy[j, i, nn, 1])
                    delta[j, i, nn, 2] = .01 * (0.0 - p[j, i, nn, 2])
                    delta[j, i, nn, 3] = .01 * (0.0 - p[j, i, nn, 3])

    for t in valid:
        i, j = int(t[0] * W), int(t[1] * H)
        best_iou, best_n = 0.0, 0
        for nn in range(A):
            if hy.bias_match:
                cand = np.array([0, 0, anchors[nn, 0] / W, anchors[nn, 1] / H])
            else:
                pb = pred_box(j, i, nn)
                cand = np.array([0, 0, pb[2], pb[3]])
            iou = _iou_xywh_np(np.array([0, 0, t[2], t[3]]), cand)
            if iou > best_iou:
                best_iou, best_n = iou, nn
        scale = hy.coord_scale * (2 - t[2] * t[3])
        delta[j, i, best_n, 0] = scale * ((t[0]*W - i) - sxy[j, i, best_n, 0])
        delta[j, i, best_n, 1] = scale * ((t[1]*H - j) - sxy[j, i, best_n, 1])
        delta[j, i, best_n, 2] = scale * (np.log(t[2]*W/anchors[best_n, 0]) -
                                          p[j, i, best_n, 2])
        delta[j, i, best_n, 3] = scale * (np.log(t[3]*H/anchors[best_n, 1]) -
                                          p[j, i, best_n, 3])
        iou = _iou_xywh_np(pred_box(j, i, best_n), t[:4])
        tgt = iou if hy.rescore else 1.0
        delta[j, i, best_n, 4] = hy.object_scale * (tgt - sobj[j, i, best_n])
        c = int(t[4])
        for k in range(Cn):
            delta[j, i, best_n, 5 + k] = hy.class_scale * (
                (1.0 if k == c else 0.0) - cls[j, i, best_n, k])
    return delta


@pytest.mark.parametrize("seen,bias_match,rescore", [
    (0, True, True),         # warmup active, yolov2.cfg flags
    (20000, True, True),     # past warmup
    (20000, False, False),   # parser defaults (bias_match=0, rescore=0)
])
def test_region_delta_matches_oracle(seen, bias_match, rescore, rng):
    cfg = C.get_config("yolov2-tiny-voc")
    H = W = 5
    Cn = 6
    A = cfg.num_anchors
    anchors = np.asarray(cfg.anchors, np.float32)
    hy = losses.RegionHyper(bias_match=bias_match, rescore=rescore)
    raw = rng.standard_normal((H, W, A * (5 + Cn)), dtype=np.float32)
    truths = _sample_truths(rng, 6, 3, Cn)

    delta, met = losses._region_delta(
        jnp.asarray(raw), jnp.asarray(truths), jnp.asarray(anchors),
        jnp.int32(seen), hy, Cn)
    want = _region_delta_oracle(raw, truths, anchors, seen, hy, Cn)
    np.testing.assert_allclose(np.asarray(delta), want, rtol=2e-4, atol=3e-5)
    assert float(met["count"]) == 3


def test_region_loss_gradient_is_minus_delta(rng):
    cfg = C.get_config("yolov2-tiny-voc")
    H = W = 3
    A, Cn = cfg.num_anchors, cfg.num_classes
    raw = rng.standard_normal((2, H, W, A * (5 + Cn)), dtype=np.float32)
    truths = np.stack([_sample_truths(rng, 4, 2, Cn) for _ in range(2)])

    def f(r):
        loss, _ = losses.yolo_v2_region_loss(
            r, jnp.asarray(truths), cfg, seen=jnp.int32(0))
        return loss

    grad = np.asarray(jax.grad(f)(jnp.asarray(raw)))
    anchors = jnp.asarray(np.asarray(cfg.anchors, np.float32))
    for b in range(2):
        delta, _ = losses._region_delta(
            jnp.asarray(raw[b]), jnp.asarray(truths[b]), anchors,
            jnp.int32(0), losses.RegionHyper(), Cn)
        np.testing.assert_allclose(
            grad[b], -np.asarray(delta).reshape(H, W, -1) / 2,
            rtol=1e-4, atol=1e-7)


def test_region_loss_value_and_metrics(rng):
    cfg = C.get_config("yolov2-tiny-voc")
    raw = rng.standard_normal((1, 4, 4, cfg.num_anchors * 25), np.float32)
    truths = _sample_truths(rng, 3, 2, 20)[None]
    loss, met = losses.yolo_v2_region_loss(
        jnp.asarray(raw), jnp.asarray(truths), cfg, seen=jnp.int32(20000))
    anchors = jnp.asarray(np.asarray(cfg.anchors, np.float32))
    delta, _ = losses._region_delta(
        jnp.asarray(raw[0]), jnp.asarray(truths[0]), anchors,
        jnp.int32(20000), losses.RegionHyper(), 20)
    np.testing.assert_allclose(float(loss), float(jnp.sum(delta ** 2)),
                               rtol=1e-5)
    assert float(met["count"]) == 2
    assert 0.0 <= float(met["recall"]) <= 1.0


# --------------------------------------------------------------------------
# v1 detection loss vs a transcription of forward_detection_layer
# --------------------------------------------------------------------------

def _v1_delta_oracle(pred, grid, hy, S, n, Cn):
    """Sequential transcription of forward_detection_layer
    (src/detection_layer.c:50-222), single image."""
    locs = S * S
    probs = pred[:locs * Cn].reshape(locs, Cn).astype(np.float64)
    if hy.softmax:
        e = np.exp(probs - probs.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
    confs = pred[locs * Cn:locs * (Cn + n)].reshape(locs, n)
    boxes = pred[locs * (Cn + n):].reshape(locs, n, 4)
    dp = np.zeros_like(probs)
    dc = np.zeros_like(confs)
    db = np.zeros_like(boxes)
    for i in range(locs):
        for j in range(n):
            dc[i, j] = hy.noobject_scale * (0 - confs[i, j])
        if not grid[i, 0]:
            continue
        for c in range(Cn):
            dp[i, c] = hy.class_scale * (grid[i, 1 + c] - probs[i, c])
        truth = np.array([grid[i, 1 + Cn] / S, grid[i, 2 + Cn] / S,
                          grid[i, 3 + Cn], grid[i, 4 + Cn]])
        best_index, best_iou, best_rmse = -1, 0.0, 20.0
        for j in range(n):
            out = boxes[i, j].copy()
            out[0] /= S
            out[1] /= S
            if hy.sqrt:
                out[2] *= out[2]
                out[3] *= out[3]
            iou = _iou_xywh_np(out, truth)
            rmse = np.sqrt(np.sum(np.square(out - truth)))
            if best_iou > 0 or iou > 0:
                if iou > best_iou:
                    best_iou, best_index = iou, j
            else:
                if rmse < best_rmse:
                    best_rmse, best_index = rmse, j
        j = max(best_index, 0)
        out = boxes[i, j].copy()
        out[0] /= S
        out[1] /= S
        if hy.sqrt:
            out[2] *= out[2]
            out[3] *= out[3]
        iou = _iou_xywh_np(out, truth)
        tgt = iou if hy.rescore else 1.0
        dc[i, j] = hy.object_scale * (tgt - confs[i, j])
        db[i, j, 0] = hy.coord_scale * (grid[i, 1 + Cn] - boxes[i, j, 0])
        db[i, j, 1] = hy.coord_scale * (grid[i, 2 + Cn] - boxes[i, j, 1])
        tw, th = grid[i, 3 + Cn], grid[i, 4 + Cn]
        if hy.sqrt:
            tw, th = np.sqrt(tw), np.sqrt(th)
        db[i, j, 2] = hy.coord_scale * (tw - boxes[i, j, 2])
        db[i, j, 3] = hy.coord_scale * (th - boxes[i, j, 3])
    return np.concatenate([dp.reshape(-1), dc.reshape(-1), db.reshape(-1)])


@pytest.mark.parametrize("sqrt,rescore", [(True, True), (False, False)])
def test_v1_delta_matches_oracle(sqrt, rescore, rng):
    S, n, Cn = 4, 2, 5
    hy = losses.DetectionHyper(sqrt=sqrt, rescore=rescore)
    pred = rng.standard_normal((S * S * (Cn + n * 5),)).astype(np.float32)
    truths = _sample_truths(rng, 4, 3, Cn)
    grid = np.asarray(losses.build_v1_truth_grid(
        jnp.asarray(truths)[None], Cn, S))[0]

    delta, met = losses._v1_delta(
        jnp.asarray(pred), jnp.asarray(grid),
        jnp.zeros((S * S,), jnp.int32), jnp.asarray(False),
        hy, S, n, Cn)
    want = _v1_delta_oracle(pred, grid, hy, S, n, Cn)
    np.testing.assert_allclose(np.asarray(delta), want, rtol=2e-4, atol=3e-5)
    assert float(met["count"]) == float(grid[:, 0].sum())


def test_v1_forced_and_random_responsibility(rng):
    """detection_layer.c:137-145: forced pins box 1 for small truths /
    box 0 for large ones; random draws uniformly while seen<64000 and is
    inert afterwards."""
    S, n, Cn = 4, 2, 5
    pred = rng.standard_normal((S * S * (Cn + n * 5),)).astype(np.float32)
    truths = _sample_truths(rng, 4, 3, Cn)
    grid = np.asarray(losses.build_v1_truth_grid(
        jnp.asarray(truths)[None], Cn, S))[0]
    locs = S * S
    zero_idx = jnp.zeros((locs,), jnp.int32)

    # forced: the responsible box's coord delta must sit at index
    # 1 (area < .1) or 0 per truth area, regardless of IoU
    hy_f = losses.DetectionHyper(forced=True)
    delta, _ = losses._v1_delta(jnp.asarray(pred), jnp.asarray(grid),
                                zero_idx, jnp.asarray(False), hy_f, S, n, Cn)
    db = np.asarray(delta)[locs * (Cn + n):].reshape(locs, n, 4)
    for i in range(locs):
        if grid[i, 0] == 0:
            continue
        area = grid[i, 3 + Cn] * grid[i, 4 + Cn]
        want_j = 1 if area < 0.1 else 0
        assert np.any(db[i, want_j] != 0)
        assert np.all(db[i, 1 - want_j] == 0)

    # random: with use_random=True the given indices are authoritative
    hy_r = losses.DetectionHyper(random=True)
    ridx = jnp.asarray(rng.integers(0, n, locs), jnp.int32)
    delta_r, _ = losses._v1_delta(jnp.asarray(pred), jnp.asarray(grid),
                                  ridx, jnp.asarray(True), hy_r, S, n, Cn)
    db_r = np.asarray(delta_r)[locs * (Cn + n):].reshape(locs, n, 4)
    for i in range(locs):
        if grid[i, 0] == 0:
            continue
        j = int(ridx[i])
        assert np.any(db_r[i, j] != 0)
        assert np.all(db_r[i, 1 - j] == 0)

    # past the warmup (use_random=False) random is inert
    delta_off, _ = losses._v1_delta(jnp.asarray(pred), jnp.asarray(grid),
                                    ridx, jnp.asarray(False), hy_r,
                                    S, n, Cn)
    base, _ = losses._v1_delta(jnp.asarray(pred), jnp.asarray(grid),
                               zero_idx, jnp.asarray(False),
                               losses.DetectionHyper(), S, n, Cn)
    np.testing.assert_array_equal(np.asarray(delta_off), np.asarray(base))

    # end-to-end: yolo_v1_loss with seen gating (traced counter)
    cfg = C.get_config("yolov1-tiny")
    import dataclasses as _dc
    cfg = _dc.replace(cfg, grid=S, boxes_per_cell=n,
                      custom_classes=tuple(f"c{i}" for i in range(Cn)))
    loss_warm, _ = losses.yolo_v1_loss(
        jnp.asarray(pred)[None], jnp.asarray(truths)[None], cfg,
        hyper=hy_r, seen=jnp.int32(100))
    loss_done, _ = losses.yolo_v1_loss(
        jnp.asarray(pred)[None], jnp.asarray(truths)[None], cfg,
        hyper=hy_r, seen=jnp.int32(64000))
    assert np.isfinite(float(loss_warm)) and np.isfinite(float(loss_done))


def test_v1_truth_grid():
    truths = np.zeros((1, 4, 5), np.float32)
    truths[0, 0] = [0.5, 0.5, 0.2, 0.3, 3]    # cell (3,3) of 7
    truths[0, 1] = [0.52, 0.52, 0.1, 0.1, 1]  # same cell: first wins
    truths[0, 2] = [0.1, 0.9, 0.001, 0.5, 2]  # w < .005: skipped
    g = np.asarray(losses.build_v1_truth_grid(jnp.asarray(truths), 20, 7))
    cell = 3 * 7 + 3
    assert g[0, cell, 0] == 1.0
    assert g[0, cell, 1 + 3] == 1.0 and g[0, cell, 1 + 1] == 0.0
    np.testing.assert_allclose(
        g[0, cell, 21:], [0.5 * 7 - 3, 0.5 * 7 - 3, 0.2, 0.3], rtol=1e-6)
    assert g[0].sum(0)[0] == 1.0   # only one object cell


def test_v1_loss_gradient_is_minus_delta(rng):
    cfg = C.get_config("yolov1-tiny")
    S, n, Cn = cfg.grid, cfg.boxes_per_cell, cfg.num_classes
    pred = rng.standard_normal((2, S * S * (Cn + n * 5))).astype(np.float32)
    truths = np.stack([_sample_truths(rng, 3, 2, Cn) for _ in range(2)])

    def f(r):
        loss, _ = losses.yolo_v1_loss(r, jnp.asarray(truths), cfg)
        return loss

    grad = np.asarray(jax.grad(f)(jnp.asarray(pred)))
    grids = losses.build_v1_truth_grid(jnp.asarray(truths), Cn, S)
    for b in range(2):
        delta, _ = losses._v1_delta(jnp.asarray(pred[b]), grids[b],
                                    jnp.zeros((S * S,), jnp.int32),
                                    jnp.asarray(False),
                                    losses.DetectionHyper(), S, n, Cn)
        np.testing.assert_allclose(grad[b], -np.asarray(delta) / 2,
                                   rtol=1e-4, atol=1e-7)


def test_hyper_from_options():
    hy = losses.RegionHyper.from_options(
        {"thresh": "0.6", "object_scale": "5", "bias_match": "1",
         "rescore": "1", "softmax": "1", "coord_scale": "1"})
    assert hy.thresh == 0.6 and hy.object_scale == 5.0 and hy.bias_match
    dy = losses.DetectionHyper.from_options(
        {"coord_scale": "5", "noobject_scale": ".5", "sqrt": "1",
         "rescore": "1"})
    assert dy.coord_scale == 5.0 and dy.noobject_scale == 0.5 and dy.sqrt


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
