"""Int8 serving path gates: kernel accuracy, calibration, end-to-end
pipeline with quantized convs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine, specs as S
from yolo_tensorflow_tpu.ops import layers as L
from yolo_tensorflow_tpu.ops import quant as Q
from yolo_tensorflow_tpu.pipeline import Detector


def test_conv2d_int8_close_to_f32(rng):
    x = rng.standard_normal((2, 8, 8, 16), dtype=np.float32)
    w = rng.standard_normal((3, 3, 16, 32), dtype=np.float32) * 0.1
    b = rng.standard_normal(32).astype(np.float32) * 0.01

    ref = np.asarray(L.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))

    s_x = np.abs(x).max() / 127.0
    s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    got = np.asarray(Q.conv2d_int8(jnp.asarray(x), jnp.asarray(w_q),
                                   jnp.float32(s_x), jnp.asarray(s_w),
                                   jnp.asarray(b)))
    err = np.abs(got - ref).max() / (np.abs(ref).std() + 1e-6)
    assert err < 0.12, err  # w8a8 noise bound (max-err over signal std)


def test_head_convs_are_skipped():
    cfg = C.get_config("yolov3-tiny")
    specs = C.build_specs(cfg)
    heads = Q.head_conv_layers(specs)
    for i in heads:
        assert isinstance(specs[i], S.Conv)
        assert isinstance(specs[i + 1], S.Detect)
    assert len(heads) == 2


def test_quantized_pipeline_end_to_end(rng):
    """Calibrate -> quantize -> Detector: detections stay close to the f32
    pipeline on the same inputs."""
    cfg = C.get_config("yolov3-tiny", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = jax.tree.map(np.asarray, params)

    calib = [rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
             for _ in range(3)]
    scales = Q.calibrate_activations(specs, params, calib, cfg=cfg)
    assert all(v > 0 for v in scales.values())
    qparams = Q.quantize_params(specs, params, scales)
    n_q = sum(1 for v in qparams.values() if "w_q" in v)
    assert n_q == 11  # 13 convs - 2 head convs

    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    det_f32 = Detector("yolov3-tiny", params=params, input_size=64,
                       num_candidates=64, conf_threshold=0.35)
    det_q = Detector("yolov3-tiny", params=qparams, input_size=64,
                     num_candidates=64, conf_threshold=0.35)
    a = det_f32.detect_batch(imgs)
    b = det_q.detect_batch(imgs)
    # same shape contract; scores of the top detection within quant noise
    assert b.boxes.shape == a.boxes.shape
    sa, sb = np.asarray(a.scores), np.asarray(b.scores)
    if int(a.num[0]) and int(b.num[0]):
        assert abs(float(sa[0, 0]) - float(sb[0, 0])) < 0.15


def test_quantize_rejects_without_calibration():
    cfg = C.get_config("yolov2-tiny-voc", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(1), folded=True)
    q = Q.quantize_params(specs, jax.tree.map(np.asarray, params), {})
    # without scales nothing quantizes; pipeline still runs f32
    assert all("w_q" not in v for v in q.values())


def test_int8_activation_pipeline_close_to_mixed(rng):
    """Full int8-activation path vs the mixed (bf16-between-layers) int8
    path: same model, same calibration data, similar detections."""
    import jax
    cfg = C.get_config("yolov3-tiny", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = jax.tree.map(np.asarray, params)
    calib = [rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
             for _ in range(3)]

    scales_in = Q.calibrate_activations(specs, params, calib, cfg=cfg)
    qparams = Q.quantize_params(specs, params, scales_in)
    out_scales = Q.calibrate_outputs(specs, params, calib, cfg=cfg)

    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    fwd_i8 = jax.jit(Q.make_int8_forward(cfg, specs, out_scales,
                                         num_candidates=64,
                                         conf_threshold=0.3))
    got = fwd_i8(qparams, imgs)

    det_mixed = Detector("yolov3-tiny", params=qparams, input_size=64,
                         num_candidates=64, conf_threshold=0.3)
    want = det_mixed.detect_batch(imgs)

    assert got.boxes.shape == want.boxes.shape
    # both paths should agree on the rough detection picture
    if int(want.num[0]) and int(got.num[0]):
        assert abs(float(got.scores[0, 0]) - float(want.scores[0, 0])) < 0.2
    # raw head parity: int8-act head features close to f32 head features
    from yolo_tensorflow_tpu.pipeline import normalize_images
    import jax.numpy as jnp
    x = normalize_images(jnp.asarray(imgs), cfg)
    d_f32, _ = engine.apply(specs, params, x, bn_eps=cfg.bn_eps)
    d_i8 = Q.apply_int8(specs, qparams, out_scales, x)
    for (a, _sa), (b, _sb) in zip(d_f32, d_i8):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).mean() / (np.abs(a).std() + 1e-6)
        assert rel < 0.15, rel
