"""Classifier family gates (head=0, darknet classifier path equivalent)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine
from yolo_tensorflow_tpu.pipeline import Classifier
from yolo_tensorflow_tpu.train import losses


def test_classifier_shapes_and_flops():
    cfg = C.get_config("darknet19-classifier")
    specs = C.build_specs(cfg)
    shapes = engine.infer_shapes(specs, (1, 256, 256, 3))
    assert shapes[-1] == (1, 1000)
    # darknet19 at 256x256 is ~7.3 BFLOPs (pjreddie model table)
    bflops = engine.count_flops(specs, (1, 256, 256, 3)) / 1e9
    assert abs(bflops - 7.3) < 0.5


def test_classifier_pipeline(rng):
    cfg = C.get_config("darknet19-classifier", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    clf = Classifier("darknet19-classifier", params=params, input_size=64)
    img = rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
    results = clf.classify(img, top_k=3)
    assert len(results) == 3
    assert results[0]["prob"] >= results[1]["prob"] >= results[2]["prob"]
    probs = np.asarray(clf.classify_batch(
        np.zeros((2, 64, 64, 3), np.uint8)))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_classifier_loss_and_grad(rng):
    probs = jnp.asarray(np.full((4, 10), 0.1, np.float32))
    labels = jnp.asarray([1, 2, 3, 4])
    loss, metrics = losses.classifier_loss(probs, labels)
    np.testing.assert_allclose(float(loss), -np.log(0.1), rtol=1e-5)
    # training on one batch reduces the loss
    cfg = C.get_config("darknet19-classifier", input_size=32)
    from yolo_tensorflow_tpu.train import loop as T
    tx = T.make_optimizer(T.darknet_lr_schedule(5e-2, burn_in=2),
                          weight_decay=0)
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                 input_size=32)
    step = jax.jit(T.make_train_step(cfg, tx, input_size=32))
    images = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    labels = np.asarray([0, 1, 2, 3], np.float32)
    costs = []
    for _ in range(8):
        state, m = step(state, images, labels)
        costs.append(float(m["cost"]))
    assert costs[-1] < costs[0]
