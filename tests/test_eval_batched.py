"""Batched evaluation pipeline gates: eval/batched.py must reproduce the
serial per-image Detector.detect path exactly, in every preprocessing mode
(stretch / host letterbox / fused letterbox) — the batched replacement for
validate_detector's buffered pipeline (examples/detector.c:388-430)."""

import numpy as np
import pytest

import jax

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.eval.batched import (detect_images, detect_paths,
                                              evaluate_samples)
from yolo_tensorflow_tpu.models import engine
from yolo_tensorflow_tpu.pipeline import Detector


def _random_detector(name="yolov2-tiny-voc", **kw):
    cfg = C.get_config(name)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(
        specs, (1, cfg.input_size, cfg.input_size, 3),
        jax.random.PRNGKey(0), folded=True)
    return Detector(name, params=params, num_candidates=64,
                    conf_threshold=0.2, **kw)


def _images(n=5, seed=0):
    rng = np.random.default_rng(seed)
    sizes = [(300, 400), (220, 350), (500, 260), (416, 416), (180, 180)]
    return [rng.integers(0, 255, sizes[i % len(sizes)] + (3,),
                         dtype=np.uint8) for i in range(n)]


def _assert_same(batched, serial):
    assert len(batched) == len(serial)
    for b, s in zip(batched, serial):
        assert len(b) == len(s)
        for rb, rs in zip(b, s):
            assert rb["class_id"] == rs["class_id"]
            np.testing.assert_allclose(rb["score"], rs["score"], rtol=1e-6)
            np.testing.assert_allclose(rb["box"], rs["box"], rtol=1e-5,
                                       atol=1e-3)


@pytest.mark.parametrize("mode", ["stretch", "letterbox", "fused"])
def test_batched_matches_serial(mode):
    det = _random_detector(letterbox=mode != "stretch",
                           fused=mode == "fused")
    imgs = _images(5)
    serial = [det.detect(im) for im in imgs]
    # batch 2 -> exercises multi-batch + padded tail
    batched = detect_images(det, imgs, batch_size=2, num_workers=2)
    _assert_same(batched, serial)


def test_detect_paths_and_sizes(tmp_path):
    import cv2
    det = _random_detector()
    imgs = _images(3, seed=1)
    paths = []
    for i, im in enumerate(imgs):
        p = str(tmp_path / f"img_{i}.png")
        cv2.imwrite(p, cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
        paths.append(p)
    results, sizes = detect_paths(det, paths, batch_size=2, num_workers=2)
    assert sizes == [im.shape[:2] for im in imgs]
    serial = [det.detect(im) for im in imgs]
    _assert_same(results, serial)


def test_evaluate_samples_format(tmp_path):
    import cv2
    from yolo_tensorflow_tpu.data.datasets import Sample
    det = _random_detector()
    imgs = _images(3, seed=2)
    samples = []
    for i, im in enumerate(imgs):
        p = str(tmp_path / f"s_{i}.png")
        cv2.imwrite(p, cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
        boxes = np.asarray([[0.5, 0.5, 0.4, 0.4, i % 3]], np.float32)
        samples.append(Sample(image_path=p, boxes=boxes))
    dets, gts, results, sizes = evaluate_samples(det, samples, batch_size=2)
    assert len(dets) == len(gts) == len(results) == 3
    for g, im in zip(gts, imgs):
        h, w = im.shape[:2]
        # normalized xywh gt -> pixel xyxy
        np.testing.assert_allclose(
            g["boxes"][0],
            [0.3 * w, 0.3 * h, 0.7 * w, 0.7 * h], rtol=1e-5)
    from yolo_tensorflow_tpu.eval.map import evaluate_detections
    out = evaluate_detections(dets, gts, det.cfg.num_classes)
    assert 0.0 <= out["map"] <= 1.0
