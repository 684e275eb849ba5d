"""Native preprocessing kernel (native/yolodata.cpp) vs the python/cv2
pixel path: same geometry, near-identical pixels."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from yolo_tensorflow_tpu.data import augment as A

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module")
def native():
    from yolo_tensorflow_tpu.data import native as N
    if not N.available():
        if shutil.which("make") and shutil.which("g++"):
            subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                           capture_output=True)
            N._tried = False  # re-probe
        if not N.available():
            pytest.skip("libyolodata.so unavailable")
    return N


def test_identity_resize_matches_cv2(native, rng):
    import cv2
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    out = native.process_batch(
        [img], [dict(crop_x0=0, crop_y0=0, crop_w=640, crop_h=480)], 416)[0]
    want = cv2.resize(img, (416, 416), interpolation=cv2.INTER_LINEAR)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_crop_pad_flip_matches_python(native, rng):
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    crop = dict(crop_x0=-30, crop_y0=20, crop_w=350, crop_h=160)
    out = native.process_batch(
        [img], [dict(crop, flip=1)], 128)[0]
    want = A.apply_crop_pixels(img, crop, 128)[:, ::-1]
    diff = np.abs(out.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()


def test_hsv_close_to_cv2_path(native, rng):
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    p = dict(crop_x0=0, crop_y0=0, crop_w=64, crop_h=64,
             dhue=0.05, dsat=1.3, dexp=0.8)
    out = native.process_batch([img], [p], 64)[0]
    want = A.apply_hsv(img, 0.05, 1.3, 0.8)
    diff = np.abs(out.astype(int) - want.astype(int))
    # different HSV implementations (darknet float vs cv2 uint8): allow a
    # few levels, require agreement in the mean
    assert diff.mean() < 3.0, diff.mean()
    assert np.median(diff) <= 2


def test_batch_threads_deterministic(native, rng):
    imgs = [rng.integers(0, 255, (100 + i, 120, 3), dtype=np.uint8)
            for i in range(8)]
    augs = [dict(crop_x0=i - 4, crop_y0=2, crop_w=110, crop_h=95,
                 dhue=0.02 * i, dsat=1.1, dexp=0.9, flip=i % 2)
            for i in range(8)]
    a = native.process_batch(imgs, augs, 96, nthreads=1)
    b = native.process_batch(imgs, augs, 96, nthreads=8)
    np.testing.assert_array_equal(a, b)


def test_loader_native_toggle(native, rng, monkeypatch):
    """The loader produces valid batches with the native path forced on."""
    from yolo_tensorflow_tpu.data.datasets import Sample
    from yolo_tensorflow_tpu.data.loader import DetectionLoader
    samples = [Sample(f"mem://{i}", np.asarray([[0.5, 0.5, 0.4, 0.4, 1]],
                                               np.float32)) for i in range(8)]

    def read_fn(path):
        i = int(path.split("//")[1])
        return np.full((90, 110, 3), (i * 30) % 255, np.uint8)

    monkeypatch.setenv("YOLO_NATIVE_LOADER", "1")
    loader = DetectionLoader(samples, batch_size=4, size=64, train=True,
                             num_workers=2, read_fn=read_fn)
    imgs, truths = next(loader.epoch())
    assert imgs.shape == (4, 64, 64, 3)
    assert truths.shape == (4, 30, 5)
    assert (truths[:, 0, 2] > 0).all()  # boxes survived augmentation
