"""Spec/shape/FLOP gates — the automated version of the reference's
layer-table eyeball checks (yolov1.txt/yolov2.txt/yolov3.txt vs
print_activations)."""

import numpy as np
import pytest

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine, specs as S


@pytest.mark.parametrize("name", C.MODEL_NAMES)
def test_specs_validate(name):
    cfg = C.get_config(name)
    specs = C.build_specs(cfg)
    S.validate(specs)


def _detect_shapes(name):
    cfg = C.get_config(name)
    specs = C.build_specs(cfg)
    shapes = engine.infer_shapes(specs, (1, cfg.input_size, cfg.input_size, 3))
    return [shapes[i - 1] for i, s in enumerate(specs) if isinstance(s, S.Detect)]


def test_yolov3_head_shapes():
    # 13x13, 26x26, 52x52 x 255 (YOLOV3.py:206-208: 507+2028+8112=10647 boxes)
    shapes = _detect_shapes("yolov3")
    assert shapes == [(1, 13, 13, 255), (1, 26, 26, 255), (1, 52, 52, 255)]


def test_yolov3_tiny_head_shapes():
    shapes = _detect_shapes("yolov3-tiny")
    assert shapes == [(1, 13, 13, 255), (1, 26, 26, 255)]


def test_yolov2_head_shape():
    # (1,13,13,425) (model_darknet19.py comment at __main__)
    assert _detect_shapes("yolov2") == [(1, 13, 13, 425)]


def test_yolov2_tiny_head_shape():
    assert _detect_shapes("yolov2-tiny-voc") == [(1, 13, 13, 125)]


def test_yolov1_head_shapes():
    assert _detect_shapes("yolov1") == [(1, 1470)]
    assert _detect_shapes("yolov1-tiny") == [(1, 1470)]


@pytest.mark.parametrize("name,expected_bflops,tol", [
    # Darknet-printed totals (BASELINE.md): v2 ~29.4, v3 ~65.9 at 416; v1 ~39.5 at 448.
    ("yolov2", 29.4, 0.8),
    ("yolov3", 65.9, 1.5),
    ("yolov1", 39.5, 1.5),
])
def test_flop_counts(name, expected_bflops, tol):
    cfg = C.get_config(name)
    specs = C.build_specs(cfg)
    bflops = engine.count_flops(specs, (1, cfg.input_size, cfg.input_size, 3)) / 1e9
    assert abs(bflops - expected_bflops) < tol, bflops


def test_yolov3_608_shapes():
    """Fully-convolutional at any multiple of 32 (multi-scale inference)."""
    cfg = C.get_config("yolov3", input_size=608)
    specs = C.build_specs(cfg)
    shapes = engine.infer_shapes(specs, (1, 608, 608, 3))
    got = [shapes[i - 1] for i, s in enumerate(specs)
           if isinstance(s, S.Detect)]
    assert got == [(1, 19, 19, 255), (1, 38, 38, 255), (1, 76, 76, 255)]
    bflops = engine.count_flops(specs, (1, 608, 608, 3)) / 1e9
    assert abs(bflops - 140.7) < 3  # darknet prints ~140.7 for yolov3-608
