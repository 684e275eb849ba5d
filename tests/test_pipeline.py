"""End-to-end pipeline gates: every model variant runs uint8 -> Detections
under jit with random weights (the minimum-slice test of SURVEY.md §7.2)."""

import numpy as np
import pytest

import jax

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.io import weights as W
from yolo_tensorflow_tpu.models import engine
from yolo_tensorflow_tpu.pipeline import Detector, make_forward


def _random_detector(name, **kw):
    cfg = C.get_config(name)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(
        specs, (1, cfg.input_size, cfg.input_size, 3),
        jax.random.PRNGKey(0), folded=True)
    return Detector(name, params=params, **kw)


@pytest.mark.parametrize("name", ["yolov2-tiny-voc", "yolov3-tiny"])
def test_detector_end_to_end(name):
    det = _random_detector(name, num_candidates=64)
    img = np.random.default_rng(0).integers(
        0, 255, (300, 500, 3), dtype=np.uint8)
    results = det.detect(img)
    for r in results:
        assert 0 <= r["class_id"] < det.cfg.num_classes
        x0, y0, x1, y1 = r["box"]
        assert x0 <= x1 and y0 <= y1
        assert 0.0 <= r["score"] <= 1.0


def test_detector_batch_shapes():
    det = _random_detector("yolov2-tiny-voc", num_candidates=64,
                           max_detections=10)
    imgs = np.zeros((4, 416, 416, 3), np.uint8)
    out = det.detect_batch(imgs)
    assert out.boxes.shape == (4, 10, 4)
    assert out.num.shape == (4,)


def test_forward_from_weights_file(tmp_path, rng):
    """Full L1->L4 slice: synth .weights file -> parse+fold -> jit detect."""
    cfg = C.get_config("yolov2-tiny-voc")
    specs = C.build_specs(cfg)
    params, stats = engine.init_params(
        specs, (1, cfg.input_size, cfg.input_size, 3), jax.random.PRNGKey(1))
    params = jax.tree.map(np.asarray, params)
    path = tmp_path / "model.weights"
    W.save_darknet_weights(specs, cfg.input_size, params, stats, path)

    det = Detector("yolov2-tiny-voc", str(path), num_candidates=64)
    imgs = np.random.default_rng(1).integers(
        0, 255, (2, 416, 416, 3), dtype=np.uint8)
    out = det.detect_batch(imgs)
    assert out.boxes.shape[0] == 2
    assert np.all(np.asarray(out.num) >= 0)


def test_normalization_modes():
    from yolo_tensorflow_tpu.pipeline import normalize_images
    import jax.numpy as jnp
    x = jnp.full((1, 2, 2, 3), 255, jnp.uint8)
    v1 = C.get_config("yolov1")
    v3 = C.get_config("yolov3")
    np.testing.assert_allclose(np.asarray(normalize_images(x, v1)), 1.0)
    np.testing.assert_allclose(np.asarray(normalize_images(x, v3)), 1.0)
    # the reference numpy-path /225 quirk is reproducible
    q = C.get_config("yolov2", input_scale=225.0)
    np.testing.assert_allclose(np.asarray(normalize_images(x, q)), 255 / 225)


def test_yolov1_full_pipeline_end_to_end():
    """v1 grid head through the public Detector (FC head, symmetric
    normalization, class-agnostic NMS) at its native 448 input."""
    cfg = C.get_config("yolov1-tiny")
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 448, 448, 3),
                                   jax.random.PRNGKey(5), folded=True)
    det = Detector("yolov1-tiny", params=params, num_candidates=32)
    img = np.random.default_rng(0).integers(0, 255, (200, 320, 3),
                                            dtype=np.uint8)
    results = det.detect(img)
    for r in results:
        assert 0 <= r["class_id"] < 20
        x0, y0, x1, y1 = r["box"]
        assert x0 <= x1 and y0 <= y1
