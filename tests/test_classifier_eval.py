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


def _random_classifier(tmp_path, seed=7):
    """Tiny headless-cfg Classifier with random params + its raw pieces."""
    from yolo_tensorflow_tpu.pipeline import Classifier
    cfg, specs = C.config_from_cfg(_write_cfg(tmp_path))
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(seed), folded=True)
    return Classifier(cfg, params=params, specs=specs), cfg, specs


def _probs_np(cfg, specs, params, x_float):
    """Forward probs from an exact (B, H, W, 3) /255 float input — the
    oracle side of the mode gates (bypasses the device resize)."""
    dets, _ = engine.apply(specs, params, jnp.asarray(x_float),
                           bn_eps=cfg.bn_eps)
    (probs, _), = dets
    return np.asarray(probs, np.float32)


def _crop_image_np(im, dx, dy, w, h):
    """crop_image (src/image.c:857-875): out[j,i] = im[clamp(j+dy),
    clamp(i+dx)] — replicate-edge for out-of-range reads."""
    rr = np.clip(np.arange(h) + dy, 0, im.shape[0] - 1)
    cc = np.clip(np.arange(w) + dx, 0, im.shape[1] - 1)
    return im[rr][:, cc]


def test_classify_batch_resize_matches_transcription(tmp_path):
    """mode='crop' == load_image_color(path, w, h) stretch (load_data_old,
    src/data.c:1122) + forward: the device resize path must equal the
    numpy resize_image transcription fed through the same net."""
    clf, cfg, specs = _random_classifier(tmp_path)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8)
            for h, w in [(40, 50), (64, 64), (100, 30)]]
    got = np.asarray(clf.classify_batch_resize(imgs), np.float32)
    want = _probs_np(cfg, specs, clf.params, np.stack([
        _resize_image_np(im.astype(np.float32) / 255.0, 64, 64)
        for im in imgs]))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_classify_batch_10crop_matches_transcription(tmp_path):
    """mode='10crop' == validate_classifier_10 (examples/classifier.c:
    234-305): stretch to (S+32, S+32), ten clamped S-crops — corners +
    center, then the same five of the mirror — probs summed."""
    clf, cfg, specs = _random_classifier(tmp_path)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (70, 90, 3), np.uint8)
    S_net, shift = 64, 32
    base = _resize_image_np(img.astype(np.float32) / 255.0,
                            S_net + shift, S_net + shift)
    views = []
    for im in (base, base[:, ::-1]):   # flip_image = width mirror
        views += [_crop_image_np(im, dx, dy, S_net, S_net)
                  for dx, dy in [(-shift, -shift), (shift, -shift),
                                 (0, 0), (-shift, shift), (shift, shift)]]
    want = _probs_np(cfg, specs, clf.params, np.stack(views)).sum(0)
    got = np.asarray(clf.classify_batch_10crop([img]), np.float32)[0]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_classify_fullconv_matches_transcription(tmp_path):
    """mode='full' == validate_classifier_full (examples/classifier.c:
    303-358): resize_min (shorter side -> S, integer //), fully-conv
    forward at the resized shape."""
    from yolo_tensorflow_tpu.eval.classify import _chunk_probs
    clf, cfg, specs = _random_classifier(tmp_path)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (80, 100, 3), np.uint8)
    nh, nw = clf._resize_min_shape(80, 100, 64)
    assert (nh, nw) == (64, (100 * 64) // 80)
    want = _probs_np(cfg, specs, clf.params, _resize_image_np(
        img.astype(np.float32) / 255.0, nw, nh)[None])
    got = _chunk_probs(clf, [img], "full")
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_classify_multi_matches_transcription(tmp_path):
    """mode='multi' == validate_classifier_multi (examples/classifier.c:
    419-480): resize_max at scales {224,256,288,320}, prediction + mirror
    prediction summed over all scales. Tiny net: scales stay the C's —
    the dispatch table is the spec, not the net size."""
    from yolo_tensorflow_tpu.eval.classify import MULTI_SCALES, _chunk_probs
    assert MULTI_SCALES == (224, 256, 288, 320)
    clf, cfg, specs = _random_classifier(tmp_path)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (60, 45, 3), np.uint8)
    want = np.zeros((3,), np.float32)
    for sc in MULTI_SCALES:
        nh, nw = clf._resize_max_shape(60, 45, sc)
        assert nh == sc and nw == (45 * sc) // 60
        r = _resize_image_np(img.astype(np.float32) / 255.0, nw, nh)
        want += _probs_np(cfg, specs, clf.params,
                          np.stack([r, r[:, ::-1]])).sum(0)
    got = _chunk_probs(clf, [img], "multi")[0]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_multi_groups_mixed_shapes(tmp_path):
    """Images with different resize targets in one chunk must come back
    in order (the group-by-shape scatter)."""
    from yolo_tensorflow_tpu.eval.classify import _chunk_probs
    clf, cfg, specs = _random_classifier(tmp_path)
    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8)
            for h, w in [(60, 45), (45, 60), (60, 45)]]
    batch = _chunk_probs(clf, imgs, "full")
    singles = np.concatenate([_chunk_probs(clf, [im], "full")
                              for im in imgs])
    np.testing.assert_allclose(batch, singles, rtol=0, atol=1e-5)


def _color_classifier(tmp_path):
    """Classifier whose logits are (scaled) per-channel means: class =
    dominant RGB channel — robust to the <=16px resize deviation of the
    snap32 bucketing policy, so exact-vs-bucketed parity is deterministic."""
    clf, cfg, specs = _random_classifier(tmp_path)
    params = {k: dict(v) for k, v in clf.params.items()}
    for k, v in params.items():
        w = np.asarray(v["w"])
        if w.shape == (3, 3, 3, 8):          # conv0: center-tap identity
            nw = np.zeros_like(w)
            for c in range(3):
                nw[1, 1, c, c] = 1.0
        elif w.shape == (1, 1, 8, 3):        # head: channel c -> class c
            nw = np.zeros_like(w)
            for c in range(3):
                nw[0, 0, c, c] = 10.0
        else:
            nw = np.zeros_like(w)
        params[k] = {"w": nw, "b": np.zeros_like(np.asarray(v["b"]))}
    from yolo_tensorflow_tpu.pipeline import Classifier
    return Classifier(cfg, params=params, specs=specs), cfg, specs


def test_shape_bucket_parity_mixed_ratios(tmp_path):
    """snap32 vs exact on mixed aspect ratios: same predictions on a
    resize-robust task, and O(buckets) — not O(ratios) — compilations
    (the VERDICT order-4 done-gate). Deviation documented at
    eval/classify.snap_shape_32."""
    from yolo_tensorflow_tpu.eval.classify import (_chunk_probs,
                                                   snap_shape_32)
    rng = np.random.default_rng(11)
    # near-identical ratios that are DISTINCT shapes exactly (4 compiles
    # each on the exact path) but one stride-32 bucket snapped
    shapes = [(100, 75), (101, 76), (99, 74), (102, 77), (98, 73)]
    imgs = []
    for i, (h, w) in enumerate(shapes):
        im = rng.integers(0, 40, (h, w, 3), np.uint8)
        im[..., i % 3] = 200 + (rng.integers(0, 40, (h, w)))
        imgs.append(im.astype(np.uint8))

    clf, cfg, specs = _color_classifier(tmp_path)
    exact = _chunk_probs(clf, imgs, "full", None)
    n_exact = len(clf._mode_jits)

    clf2, _, _ = _color_classifier(tmp_path)
    snapped = _chunk_probs(clf2, imgs, "full", "snap32")
    n_snap = len(clf2._mode_jits)

    assert exact.argmax(1).tolist() == snapped.argmax(1).tolist() == \
        [i % 3 for i in range(len(shapes))]
    # exact: one executable per distinct ratio; snap32: one bucket
    exact_shapes = {clf._resize_min_shape(h, w, 64) for h, w in shapes}
    snap_shapes = {snap_shape_32(*s) for s in exact_shapes}
    assert n_exact == len(exact_shapes) > len(snap_shapes) == n_snap == 1
    # multi mode: one executable per scale, not per (scale, ratio)
    clf3, _, _ = _color_classifier(tmp_path)
    multi = _chunk_probs(clf3, imgs, "multi", "snap32")
    from yolo_tensorflow_tpu.eval.classify import MULTI_SCALES
    n_buckets = len({snap_shape_32(*clf3._resize_max_shape(h, w, sc))
                     for h, w in shapes for sc in MULTI_SCALES})
    # one executable per bucket; bucket count rides the scale table (a
    # rounding boundary may split one scale), never the ratio count
    assert len(clf3._mode_jits) == n_buckets <= 2 * len(MULTI_SCALES)
    assert n_buckets < len(shapes) * len(MULTI_SCALES)
    assert multi.argmax(1).tolist() == [i % 3 for i in range(len(shapes))]


def test_snap_shape_32_geometry():
    from yolo_tensorflow_tpu.eval.classify import snap_shape_32
    assert snap_shape_32(224, 168) == (224, 160)
    assert snap_shape_32(10, 5000) == (32, 2048)   # clamped both ends
    assert snap_shape_32(256, 256) == (256, 256)   # grid points unchanged


def test_mode_jit_cache_is_lru_capped():
    from yolo_tensorflow_tpu.pipeline import _LRUCache
    c = _LRUCache(cap=3)
    for i in range(5):
        c[i] = i * 10
    assert len(c) == 3 and 0 not in c and 1 not in c and c[2] == 20
    _ = c[2]          # touch 2 -> 3 becomes LRU
    c[9] = 90
    assert 3 not in c and 2 in c and 9 in c


def test_cli_classifier_mode_flag(tmp_path, capsys):
    """eval --classifier-mode 10crop drives the 10-crop validator end to
    end (the C's `classifier valid10` dispatch, classifier.c:1086)."""
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
    paths = _write_images(tmp_path, ["cat", "dog"])
    lst = tmp_path / "val.txt"
    lst.write_text("\n".join(paths) + "\n")
    main(["eval", "--cfg", cfg_path, "--names", str(names),
          "--weights", str(wpath), "--list", str(lst),
          "--top", "2", "--classifier-mode", "10crop"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["images"] == 2 and res["mode"] == "10crop"


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
