"""Fused Pallas decode kernel vs the XLA decode path (interpret mode on the
CPU test backend; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import heads, specs as S
from yolo_tensorflow_tpu.ops.pallas.decode import decode_fused, decode_scale_fused


def test_v3_scale_matches_xla_decode(rng):
    cfg = C.get_config("yolov3")
    G, A, Cn = 13, 3, cfg.num_classes
    anchors = [cfg.anchors[i] for i in (6, 7, 8)]
    feat = jnp.asarray(rng.standard_normal((2, G, G, A * (5 + Cn)),
                                           dtype=np.float32))

    boxes, score, label = decode_scale_fused(
        feat, anchors, cfg.input_size, Cn, class_softmax=False,
        interpret=True)

    bx, conf, probs = heads.decode_v3_scale(feat, anchors, cfg.input_size, Cn)
    want_boxes = heads.xywh_to_xyxy(bx)
    want_scores = np.asarray(conf)[..., None] * np.asarray(probs)
    want_label = want_scores.argmax(-1)
    want_max = want_scores.max(-1)

    np.testing.assert_allclose(np.asarray(boxes), np.asarray(want_boxes),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(score), want_max, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(label), want_label)


def test_v2_matches_xla_decode(rng):
    cfg = C.get_config("yolov2-tiny-voc")
    G, A, Cn = 13, cfg.num_anchors, cfg.num_classes
    feat = jnp.asarray(rng.standard_normal((1, G, G, A * (5 + Cn)),
                                           dtype=np.float32))
    fake_det = [(feat, S.Detect(tuple(range(A))))]

    boxes, score, label = decode_fused(fake_det, cfg, interpret=True)

    bx, conf, probs = heads.decode(fake_det, cfg)
    want_boxes = heads.xywh_to_xyxy(bx)
    want_scores = np.asarray(conf)[..., None] * np.asarray(probs)

    np.testing.assert_allclose(np.asarray(boxes), np.asarray(want_boxes),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(score), want_scores.max(-1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(label), want_scores.argmax(-1))


def test_full_pipeline_fused_matches_unfused(rng):
    """End-to-end: Detections from the fused path == the XLA path."""
    from yolo_tensorflow_tpu.models import engine
    from yolo_tensorflow_tpu.pipeline import make_forward
    cfg = C.get_config("yolov3-tiny", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)

    # interpret-mode fused on CPU: patch the flag through decode_fused
    import yolo_tensorflow_tpu.ops.pallas.decode as PD
    orig = PD.decode_fused
    PD_fused_interp = lambda dets, c, interpret=True: orig(dets, c,
                                                           interpret=True)
    PD.decode_fused = PD_fused_interp
    try:
        fwd_fused = make_forward(cfg, specs, num_candidates=64,
                                 fused_decode=True)
        got = jax.jit(fwd_fused)(params, imgs)
    finally:
        PD.decode_fused = orig
    fwd = make_forward(cfg, specs, num_candidates=64, fused_decode=False)
    want = jax.jit(fwd)(params, imgs)

    np.testing.assert_array_equal(np.asarray(got.num), np.asarray(want.num))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.boxes), np.asarray(want.boxes),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.classes),
                                  np.asarray(want.classes))
