"""On-device static-shape NMS vs a sequential numpy greedy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tensorflow_tpu.post import nms as N


def _iou_np(a, b):
    ix0 = max(a[0], b[0]); iy0 = max(a[1], b[1])
    ix1 = min(a[2], b[2]); iy1 = min(a[3], b[3])
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    ar_a = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
    ar_b = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
    return inter / max(ar_a + ar_b - inter, 1e-9)


def _greedy_np(boxes, scores, labels, conf_t, iou_t, class_aware):
    order = np.argsort(-scores, kind="stable")
    kept = []
    for i in order:
        if scores[i] <= conf_t:
            continue
        ok = True
        for j in kept:
            if class_aware and labels[i] != labels[j]:
                continue
            if _iou_np(boxes[i], boxes[j]) > iou_t:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


def _random_boxes(rng, n):
    ctr = rng.random((n, 2)) * 0.8 + 0.1
    wh = rng.random((n, 2)) * 0.3 + 0.02
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32)


@pytest.mark.parametrize("class_aware", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_nms_matches_greedy_oracle(class_aware, seed):
    rng = np.random.default_rng(seed)
    n = 120
    boxes = _random_boxes(rng, n)
    scores = rng.random(n).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)
    conf_t, iou_t, max_d = 0.3, 0.45, 30

    want = _greedy_np(boxes, scores, labels, conf_t, iou_t, class_aware)
    want = want[:max_d]

    got_b, got_s, got_l, got_v, got_n = N._nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        conf_threshold=conf_t, iou_threshold=iou_t, max_detections=max_d,
        num_candidates=128, class_aware=class_aware)
    got_n = int(got_n)
    assert got_n == len(want)
    np.testing.assert_allclose(np.asarray(got_s)[:got_n], scores[want],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_b)[:got_n], boxes[want],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_l)[:got_n], labels[want])


def test_batched_nms_shapes_and_scoring():
    rng = np.random.default_rng(7)
    B, n, C = 3, 50, 5
    boxes = jnp.asarray(np.stack([_random_boxes(rng, n) for _ in range(B)]))
    conf = jnp.asarray(rng.random((B, n)).astype(np.float32))
    probs = jnp.asarray(rng.random((B, n, C)).astype(np.float32))
    dets = N.batched_nms(boxes, conf, probs, conf_threshold=0.2,
                         iou_threshold=0.5, max_detections=10,
                         num_candidates=64)
    assert dets.boxes.shape == (B, 10, 4)
    assert dets.scores.shape == (B, 10)
    assert dets.classes.shape == (B, 10)
    assert dets.valid.shape == (B, 10)
    # score = conf * max class prob
    s = np.asarray(conf)[..., None] * np.asarray(probs)
    for b in range(B):
        if int(dets.num[b]) > 0:
            assert float(dets.scores[b, 0]) <= s[b].max() + 1e-6


def test_nms_all_below_threshold():
    boxes = jnp.asarray(_random_boxes(np.random.default_rng(0), 10))
    scores = jnp.full((10,), 0.01)
    labels = jnp.zeros((10,), jnp.int32)
    b, s, l, v, n = N._nms_single(
        boxes, scores, labels, conf_threshold=0.5, iou_threshold=0.5,
        max_detections=5, num_candidates=8, class_aware=False)
    assert int(n) == 0
    assert not bool(jnp.any(v))


def test_nms_jits():
    fn = jax.jit(lambda b, c, p: N.batched_nms(b, c, p, conf_threshold=0.3,
                                               max_detections=8,
                                               num_candidates=32))
    rng = np.random.default_rng(1)
    boxes = jnp.asarray(_random_boxes(rng, 40)[None])
    conf = jnp.asarray(rng.random((1, 40)).astype(np.float32))
    probs = jnp.asarray(rng.random((1, 40, 3)).astype(np.float32))
    dets = fn(boxes, conf, probs)
    assert dets.boxes.shape == (1, 8, 4)


def test_candidate_topk_exactness(rng):
    """The ApproxTopK exact-mode selection (recall_target=1.0) in
    _nms_single must return the IDENTICAL values and indices as
    lax.top_k — the perf swap is only legal because it's not actually
    approximate (is_fallback=true in the lowered HLO)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    scores = jnp.asarray(rng.standard_normal((8, 10647)), jnp.float32)
    v1, i1 = jax.jit(lambda s: lax.top_k(s, 256))(scores)
    v2, i2 = jax.jit(
        lambda s: lax.approx_max_k(s, 256, recall_target=1.0))(scores)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
