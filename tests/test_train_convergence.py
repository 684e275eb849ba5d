"""Training convergence gates: both loss families optimize a synthetic
single-object task end to end (overfit one batch), and the trained model
detects through the public Detector surface after BN folding."""

import numpy as np
import pytest

import jax

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.io.weights import fold_params
from yolo_tensorflow_tpu.pipeline import Detector
from yolo_tensorflow_tpu.train import loop as T

SIZE = 64


def _batch(n, rng):
    imgs = np.full((n, SIZE, SIZE, 3), 30, np.uint8)
    truths = np.zeros((n, 2, 5), np.float32)
    for b in range(n):
        w, h = int(rng.integers(28, 48)), int(rng.integers(28, 48))
        x0 = int(rng.integers(0, SIZE - w))
        y0 = int(rng.integers(0, SIZE - h))
        imgs[b, y0:y0 + h, x0:x0 + w] = 220
        truths[b, 0] = [(x0 + w / 2) / SIZE, (y0 + h / 2) / SIZE,
                        w / SIZE, h / SIZE, 0]
    return imgs, truths


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


@pytest.mark.parametrize("model,steps,lr", [
    ("yolov3-tiny", 120, 1e-3),
    ("yolov2-tiny-voc", 150, 5e-4),       # darknet region loss (default)
])
def test_overfit_then_detect(model, steps, lr, rng):
    cfg = C.get_config(model, input_size=SIZE)
    tx = T.make_optimizer(T.darknet_lr_schedule(lr, burn_in=15),
                          weight_decay=0)
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                 input_size=SIZE)
    step = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE))
    imgs, truths = _batch(4, rng)
    costs = []
    for _ in range(steps):
        state, m = step(state, imgs, truths)
        costs.append(float(m["cost"]))
    assert costs[-1] < costs[5] * 0.2, (costs[5], costs[-1])

    folded = fold_params(state.params, state.batch_stats, cfg.bn_eps)
    det = Detector(model, params=folded, input_size=SIZE,
                   conf_threshold=0.3, num_candidates=64)
    res = det.detect(imgs[0])
    assert res, "no detections after overfitting"
    t = truths[0, 0]
    tb = ((t[0] - t[2] / 2) * SIZE, (t[1] - t[3] / 2) * SIZE,
          (t[0] + t[2] / 2) * SIZE, (t[1] + t[3] / 2) * SIZE)
    best = max(_iou(r["box"], tb) for r in res)
    assert best > 0.45, best


def test_overfit_v1_then_detect(rng):
    """v1 detection-layer loss (detection_layer.c:50) trains yolov1-tiny on
    the synthetic task end to end; grid head decodes through Detector."""
    import dataclasses
    cfg = dataclasses.replace(C.get_config("yolov1-tiny"), input_size=SIZE,
                              custom_classes=("obj",), grid=4,
                              boxes_per_cell=2)
    tx = T.make_optimizer(T.darknet_lr_schedule(2e-4, burn_in=20),
                          weight_decay=0)
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(1),
                                 input_size=SIZE)
    step = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE))
    imgs, truths = _batch(4, rng)
    costs = []
    for _ in range(200):
        state, m = step(state, imgs, truths)
        costs.append(float(m["cost"]))
    assert costs[-1] < costs[5] * 0.2, (costs[5], costs[-1])

    folded = fold_params(state.params, state.batch_stats, cfg.bn_eps)
    det = Detector(cfg, params=folded, conf_threshold=0.25,
                   num_candidates=32)
    res = det.detect(imgs[0])
    assert res, "no detections after overfitting"
    t = truths[0, 0]
    tb = ((t[0] - t[2] / 2) * SIZE, (t[1] - t[3] / 2) * SIZE,
          (t[0] + t[2] / 2) * SIZE, (t[1] + t[3] / 2) * SIZE)
    best = max(_iou(r["box"], tb) for r in res)
    assert best > 0.4, best
