"""Data pipeline gates: augmentation geometry, dataset parsers, loader."""

import os
import textwrap

import numpy as np
import pytest

from yolo_tensorflow_tpu.data import augment as A
from yolo_tensorflow_tpu.data import datasets as D
from yolo_tensorflow_tpu.data.loader import DetectionLoader


def test_letterbox_roundtrip():
    img = np.zeros((300, 600, 3), np.uint8)
    out, scale, px, py = A.letterbox(img, 416)
    assert out.shape == (416, 416, 3)
    assert px == 0 and py == (416 - 208) // 2
    # a box covering the whole image maps back to the whole image
    boxes = np.asarray([[0.0, py / 416, 1.0, (py + 208) / 416]])
    back = A.unletterbox_boxes(boxes, 600, 300, 416, scale, px, py)
    np.testing.assert_allclose(back[0], [0, 0, 600, 300], atol=1.5)


def test_flip_boxes():
    rng = np.random.default_rng(3)  # seed chosen so flip triggers
    img = np.zeros((10, 10, 3), np.uint8)
    img[:, 0] = 255
    boxes = np.asarray([[0.2, 0.5, 0.1, 0.2, 3]], np.float32)
    for _ in range(20):
        out, b = A.random_flip(img, boxes, rng)
        if out[0, -1, 0] == 255:  # flipped
            np.testing.assert_allclose(b[0, 0], 0.8, atol=1e-6)
            return
    pytest.fail("flip never triggered")


def test_crop_place_keeps_center_box(rng):
    img = np.full((100, 100, 3), 7, np.uint8)
    boxes = np.asarray([[0.5, 0.5, 0.3, 0.3, 2]], np.float32)
    out, b = A.random_crop_place(img, boxes, rng, 64, jitter=0.1)
    assert out.shape == (64, 64, 3)
    assert len(b) == 1 and b[0, 4] == 2
    assert 0.3 < b[0, 0] < 0.7 and 0.2 < b[0, 2] < 0.45


def test_pad_truths():
    b = np.ones((3, 5), np.float32)
    out = A.pad_truths(b, 8)
    assert out.shape == (8, 5)
    assert out[3:].sum() == 0


def test_voc_xml_parse(tmp_path):
    xml = textwrap.dedent("""\
        <annotation>
          <size><width>200</width><height>100</height><depth>3</depth></size>
          <object><name>dog</name><difficult>0</difficult>
            <bndbox><xmin>50</xmin><ymin>25</ymin><xmax>150</xmax><ymax>75</ymax></bndbox>
          </object>
          <object><name>person</name><difficult>1</difficult>
            <bndbox><xmin>0</xmin><ymin>0</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
          </object>
        </annotation>""")
    p = tmp_path / "a.xml"
    p.write_text(xml)
    boxes = D.parse_voc_xml(str(p))
    assert boxes.shape == (1, 5)  # difficult object skipped
    np.testing.assert_allclose(boxes[0], [0.5, 0.5, 0.5, 0.5, 11], atol=1e-6)


def test_coco_json_parse(tmp_path):
    import json
    coco = {
        "images": [{"id": 1, "file_name": "x.jpg", "width": 100, "height": 50}],
        "annotations": [
            {"image_id": 1, "category_id": 18, "bbox": [10, 10, 20, 20],
             "iscrowd": 0},
            {"image_id": 1, "category_id": 18, "bbox": [0, 0, 0.5, 9],
             "iscrowd": 0},  # degenerate, dropped
        ],
        "categories": [{"id": 18, "name": "dog"}],
    }
    p = tmp_path / "i.json"
    p.write_text(json.dumps(coco))
    samples = D.load_coco(str(p), str(tmp_path))
    assert len(samples) == 1
    assert samples[0].boxes.shape == (1, 5)
    np.testing.assert_allclose(samples[0].boxes[0],
                               [0.2, 0.4, 0.2, 0.4, 0], atol=1e-6)


def test_darknet_list(tmp_path):
    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir(); lab_dir.mkdir()
    (img_dir / "a.jpg").write_bytes(b"")
    (lab_dir / "a.txt").write_text("3 0.5 0.5 0.2 0.2\n")
    lst = tmp_path / "train.txt"
    lst.write_text(str(img_dir / "a.jpg") + "\n")
    samples = D.load_darknet_list(str(lst))
    assert len(samples) == 1
    np.testing.assert_allclose(samples[0].boxes[0],
                               [0.5, 0.5, 0.2, 0.2, 3], atol=1e-6)


def test_loader_batches_and_order():
    rng = np.random.default_rng(0)
    samples = []
    for i in range(20):
        # synthetic in-memory "images" via a custom reader
        samples.append(D.Sample(f"mem://{i}",
                                np.asarray([[0.5, 0.5, 0.4, 0.4, i % 3]],
                                           np.float32)))

    def read_fn(path):
        i = int(path.split("//")[1])
        img = np.full((80, 120, 3), i * 10 % 255, np.uint8)
        return img

    loader = DetectionLoader(samples, batch_size=4, size=64, train=True,
                             num_workers=3, read_fn=read_fn, seed=1)
    batches = list(loader.epoch())
    assert len(batches) == 5
    for imgs, truths in batches:
        assert imgs.shape == (4, 64, 64, 3)
        assert truths.shape == (4, 30, 5)

    # eval mode: plain resize, deterministic
    loader_eval = DetectionLoader(samples, batch_size=4, size=32, train=False,
                                  num_workers=2, read_fn=read_fn)
    imgs, truths = next(loader_eval.epoch(shuffle=False))
    assert imgs.shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(np.unique(imgs[0]), [0])  # image 0 constant


def test_loader_deterministic_across_runs():
    """Same seed -> identical batches regardless of worker count — the
    deterministic replacement for darknet's racy buffer-swap loader."""
    samples = [D.Sample(f"mem://{i}",
                        np.asarray([[0.5, 0.5, 0.5, 0.5, 0]], np.float32))
               for i in range(12)]

    def read_fn(path):
        i = int(path.split("//")[1])
        rng = np.random.default_rng(i)
        return rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)

    def run(workers):
        loader = DetectionLoader(samples, batch_size=4, size=48, train=True,
                                 num_workers=workers, seed=7,
                                 read_fn=read_fn)
        return list(loader.epoch())

    a, b = run(1), run(4)
    assert len(a) == len(b) == 3
    for (ia, ta), (ib, tb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)


def test_loader_multiscale_resize():
    samples = [D.Sample(f"mem://{i}", np.zeros((0, 5), np.float32))
               for i in range(8)]
    read_fn = lambda p: np.zeros((60, 60, 3), np.uint8)
    loader = DetectionLoader(samples, batch_size=4, size=32, train=True,
                             num_workers=1, prefetch=1, read_fn=read_fn)
    gen = loader.epoch()
    first = next(gen)[0]
    assert first.shape[1] == 32
    loader.set_size(64)
    second = next(gen)[0]
    assert second.shape[1] in (32, 64)  # prefetched batch may be old size


def test_loader_early_abandon_reaps_threads():
    """Closing the epoch() generator early must stop and join every worker
    (a worker blocked publishing a ready batch still observes stop)."""
    import threading
    import time
    samples = [D.Sample(f"mem://{i}", np.zeros((0, 5), np.float32))
               for i in range(64)]

    def read_fn(path):
        return np.zeros((32, 32, 3), np.uint8)

    base = threading.active_count()
    ld = DetectionLoader(samples, batch_size=2, size=32, train=True,
                         num_workers=6, prefetch=2, read_fn=read_fn)
    for _ in range(3):
        gen = ld.epoch()
        next(gen)          # take one batch, workers race ahead
        gen.close()        # abandon: finally sets stop + joins
    time.sleep(0.3)
    assert threading.active_count() <= base + 1, threading.active_count()


def test_loader_worker_error_propagates():
    """A failing read must raise in the consumer, not hang the epoch."""
    samples = [D.Sample(f"mem://{i}", np.zeros((0, 5), np.float32))
               for i in range(8)]

    def read_fn(path):
        raise OSError(f"boom {path}")

    ld = DetectionLoader(samples, batch_size=2, size=32, train=True,
                         num_workers=2, prefetch=2, read_fn=read_fn)
    with pytest.raises(OSError, match="boom"):
        for _ in ld.epoch():
            pass


def test_voc_label_writer_roundtrip(tmp_path):
    """write_darknet_labels emits voc_label.py's outputs; the darknet-list
    loader reads them back to the same boxes."""
    import textwrap
    base = tmp_path / "VOC2007"
    (base / "Annotations").mkdir(parents=True)
    (base / "ImageSets" / "Main").mkdir(parents=True)
    (base / "JPEGImages").mkdir()
    xml = textwrap.dedent("""\
        <annotation>
          <size><width>200</width><height>100</height><depth>3</depth></size>
          <object><name>dog</name><difficult>0</difficult>
            <bndbox><xmin>50</xmin><ymin>25</ymin><xmax>150</xmax><ymax>75</ymax></bndbox>
          </object>
        </annotation>""")
    for img_id in ("000001", "000002"):
        (base / "Annotations" / f"{img_id}.xml").write_text(xml)
    (base / "ImageSets" / "Main" / "train.txt").write_text(
        "000001\n000002\n")

    lists = D.write_darknet_labels(str(tmp_path), "train",
                                   out_list_dir=str(tmp_path / "lists"))
    assert len(lists) == 1
    lab = (base / "labels" / "000001.txt").read_text().split()
    assert int(lab[0]) == 11  # dog
    np.testing.assert_allclose([float(v) for v in lab[1:]],
                               [0.5, 0.5, 0.5, 0.5], atol=1e-6)
    samples = D.load_darknet_list(lists[0])
    assert len(samples) == 2
    np.testing.assert_allclose(samples[0].boxes[0],
                               [0.5, 0.5, 0.5, 0.5, 11], atol=1e-6)


def test_loader_image_cache_decodes_once_and_stays_exact():
    """--cache-images gate: epoch 2+ never re-hits the codec, cached
    pixels are immutable (augmenters write into fresh canvases), and the
    batch stream is bit-identical to the uncached loader. Also pins the
    byte budget: past it, reads fall through to the codec instead of
    growing without bound."""
    samples = [D.Sample(f"mem://{i}",
                        np.asarray([[0.5, 0.5, 0.5, 0.5, 0]], np.float32))
               for i in range(8)]
    calls = {"n": 0}

    def read_fn(path):
        calls["n"] += 1
        i = int(path.split("//")[1])
        rng = np.random.default_rng(i)
        return rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)

    def run(cache, epochs, **kw):
        loader = DetectionLoader(samples, batch_size=4, size=48, train=True,
                                 num_workers=2, seed=7, read_fn=read_fn,
                                 cache_images=cache, **kw)
        out = []
        for _ in range(epochs):
            out.extend(loader.epoch())
        return out

    calls["n"] = 0
    plain = run(False, 2)
    assert calls["n"] == 16  # every epoch decodes every image

    calls["n"] = 0
    cached = run(True, 2)
    assert calls["n"] == 8  # second epoch served from RAM

    for (ia, ta), (ib, tb) in zip(plain, cached):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)

    # budget: room for ~2 frames (70*90*3 = 18900 B) -> the rest re-decode
    calls["n"] = 0
    run(True, 2, cache_bytes=40_000)
    assert 8 < calls["n"] <= 14
