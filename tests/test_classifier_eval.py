"""Classifier validation gates.

Covers validate_classifier_single (examples/classifier.c:303-360): the
center_crop_image preprocessing (src/image.c center_crop_image =
min-side center crop + resize_image), the C's label-from-path and top_k
conventions, the running top-1/top-k accuracies, and the `eval` CLI
dispatch for headless (classifier) targets — registry and arbitrary-cfg.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.eval.classify import (read_validation_list,
                                               topk_indices,
                                               validate_classifier)
from yolo_tensorflow_tpu.models import engine, specs as S

from tests.test_preprocess import _resize_image_np


TINY_CLS_CFG = """
[net]
batch=4
height=64
width=64
channels=3
learning_rate=0.001

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=3
size=1
stride=1
pad=1
activation=linear

[avgpool]

[softmax]
"""


def _write_cfg(tmp_path):
    p = tmp_path / "tiny-cls.cfg"
    p.write_text(TINY_CLS_CFG)
    return str(p)


def test_headless_cfg_loads_as_classifier(tmp_path):
    cfg, specs = C.config_from_cfg(_write_cfg(tmp_path))
    assert cfg.head == 0
    # classes inferred from the last conv's filters
    assert cfg.num_classes == 3
    assert isinstance(specs[-1], S.Detect)


def test_center_crop_matches_c_transcription():
    """The device center-crop path IS center_crop_image: square min-side
    crop (host slice) + resize_image — a square image letterboxed to SxS
    has no padding, so letterbox_device degenerates to the exact
    darknet bilinear."""
    from yolo_tensorflow_tpu.ops import preprocess as P
    rng = np.random.default_rng(3)
    S_out = 64
    for h, w in [(97, 131), (131, 97), (64, 64), (65, 200)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        m = min(h, w)
        y0, x0 = (h - m) // 2, (w - m) // 2
        crop = img[y0:y0 + m, x0:x0 + m]
        # C: resize_image(crop, S, S) on the /255 floats
        want = _resize_image_np(crop.astype(np.float32) / 255.0,
                                S_out, S_out)
        canvas = np.zeros((1, 256, 256, 3), np.uint8)
        canvas[0, :m, :m] = crop
        got = np.asarray(P.letterbox_device_batch(
            jnp.asarray(canvas), jnp.asarray([[m, m]], np.int32), S_out))
        np.testing.assert_allclose(got[0], want, rtol=0, atol=1e-6)


def test_read_validation_list_c_conventions(tmp_path):
    """First matching label wins (the C loop breaks); no match -> -1."""
    lst = tmp_path / "val.txt"
    lst.write_text("data/cat/img1.jpg\n"
                   "data/dogcat/img2.jpg\n"      # 'cat' first in labels
                   "data/unknown/img3.jpg\n")
    samples = read_validation_list(str(lst), ("cat", "dog"))
    assert samples == [("data/cat/img1.jpg", 0),
                       ("data/dogcat/img2.jpg", 0),
                       ("data/unknown/img3.jpg", -1)]


def test_topk_ties_to_lowest_index():
    probs = np.asarray([[0.3, 0.4, 0.4, 0.1]], np.float32)
    idx = topk_indices(probs, 3)
    assert idx.tolist() == [[1, 2, 0]]


class _StubClassifier:
    """Fixed-probability classifier: class 0 always wins, class given by
    the call order comes second."""

    def __init__(self, n_classes=3):
        self.n = n_classes

    def classify_batch_center_crop(self, images):
        p = np.zeros((len(images), self.n), np.float32)
        p[:, 0] = 0.6
        p[:, 1] = 0.3
        p[:, 2] = 0.1
        return p


def _write_images(tmp_path, names):
    import cv2
    paths = []
    for i, n in enumerate(names):
        p = tmp_path / f"{n}_{i}.jpg"
        cv2.imwrite(str(p), np.full((40, 50, 3), 90, np.uint8))
        paths.append(str(p))
    return paths


def test_validate_classifier_accuracy_math(tmp_path):
    # labels: cat cat dog bird none -> top1 hits = the two cats; top2
    # additionally counts the dog (class 1 is always second)
    paths = _write_images(tmp_path, ["cat", "cat", "dog", "bird", "zzz"])
    labels = ("cat", "dog", "bird")
    lst = tmp_path / "val.txt"
    lst.write_text("\n".join(paths) + "\n")
    samples = read_validation_list(str(lst), labels)
    res = validate_classifier(_StubClassifier(), samples, top_k=2,
                              batch_size=2)
    assert res["images"] == 5
    assert res["top1"] == pytest.approx(2 / 5)
    assert res["top2"] == pytest.approx(3 / 5)


def test_cli_classifier_eval_end_to_end(tmp_path, capsys):
    """eval --cfg <headless cfg> dispatches to the classifier validator
    and reports top-1/top-N — the darknet `classifier valid` twin."""
    from yolo_tensorflow_tpu.cli import main
    from yolo_tensorflow_tpu.io import weights as W

    cfg_path = _write_cfg(tmp_path)
    cfg, specs = C.config_from_cfg(cfg_path)
    params, stats = engine.init_params(specs, (1, 64, 64, 3),
                                       jax.random.PRNGKey(0), folded=False)
    wpath = tmp_path / "tiny-cls.weights"
    W.save_darknet_weights(specs, 64, params, stats, str(wpath), head=0)

    names = tmp_path / "names.txt"
    names.write_text("cat\ndog\nbird\n")
    paths = _write_images(tmp_path, ["cat", "dog", "bird", "cat"])
    lst = tmp_path / "val.txt"
    lst.write_text("\n".join(paths) + "\n")

    main(["eval", "--cfg", cfg_path, "--names", str(names),
          "--weights", str(wpath), "--list", str(lst),
          "--top", "2", "--batch-size", "2"])
    out = capsys.readouterr().out
    assert "top 1: " in out and "top 2: " in out
    res = json.loads(out.strip().splitlines()[-1])
    assert res["images"] == 4
    assert 0.0 <= res["top1"] <= res["top2"] <= 1.0


def test_train_headless_cfg_classifier(tmp_path, capsys):
    """A headless (classifier) cfg now trains through train --cfg — the
    darknet `classifier train` twin for arbitrary cfgs (train_classifier,
    examples/classifier.c:26): labels from class-name path match, CE loss
    on the softmax output, [net] schedule honored."""
    from yolo_tensorflow_tpu.cli import main
    cfg_path = _write_cfg(tmp_path)
    names = tmp_path / "names.txt"
    names.write_text("cat\ndog\nbird\n")
    paths = _write_images(tmp_path, ["cat", "dog", "bird", "cat"])
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")
    main(["train", "--cfg", cfg_path, "--names", str(names),
          "--list", str(lst), "--ckpt-dir", str(tmp_path / "ck"),
          "--steps", "2", "--save-every", "2", "--log-every", "1",
          "--num-data", "1"])
    out = capsys.readouterr().out
    assert "step 2" in out
