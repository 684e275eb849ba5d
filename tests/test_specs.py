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


def test_cfg_roundtrip_fuzz(rng):
    """Random spec chains (parser-convention shaped: a 4D spatial section,
    then optionally flat layers) must survive specs -> cfg text -> specs
    exactly — emit/parse asymmetries in any layer's options would show up
    here before they corrupt a real model.
    """
    import dataclasses
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.io.cfg import parse_cfg, specs_to_cfg
    from yolo_tensorflow_tpu.models import specs as S

    carrier = dataclasses.replace(C.get_config("darknet19-classifier"),
                                  input_size=32)

    def rand_spatial():
        k = int(rng.integers(0, 6))
        if k == 0:
            size = int(rng.choice([1, 3, 5]))
            return S.Conv(int(rng.integers(1, 9)), size,
                          int(rng.choice([1, 2])),
                          bn=bool(rng.integers(0, 2)),
                          act=str(rng.choice(["leaky", "linear",
                                              "logistic", "relu"])),
                          pad=size // 2)
        if k == 1:
            return S.MaxPool(2, 2)
        if k == 2:
            return S.LRN(5, 1e-4, 0.75, 1.0)
        if k == 3:
            return S.Crnn(int(rng.integers(1, 5)), int(rng.integers(1, 5)),
                          act=str(rng.choice(["leaky", "logistic"])),
                          bn=bool(rng.integers(0, 2)),
                          shortcut=bool(rng.integers(0, 2)))
        if k == 4:
            return S.L2Norm()
        return S.Logistic()

    def rand_flat():
        k = int(rng.integers(0, 5))
        if k == 0:
            return S.Dense(int(rng.integers(1, 65)),
                           act=str(rng.choice(["leaky", "linear",
                                               "logistic", "tanh"])),
                           bn=bool(rng.integers(0, 2)))
        if k == 1:
            return S.Rnn(int(rng.integers(1, 33)),
                         act=str(rng.choice(["logistic", "tanh", "leaky"])),
                         bn=bool(rng.integers(0, 2)),
                         shortcut=bool(rng.integers(0, 2)))
        if k == 2:
            return S.Gru(int(rng.integers(1, 33)),
                         bn=bool(rng.integers(0, 2)),
                         tanh=bool(rng.integers(0, 2)))
        if k == 3:
            return S.Lstm(int(rng.integers(1, 33)),
                          bn=bool(rng.integers(0, 2)))
        return S.Softmax(groups=1,
                         temperature=float(rng.choice([1.0, 2.0, 0.5])))

    needs_flatten = (S.Dense, S.Rnn, S.Gru, S.Lstm)
    for trial in range(25):
        chain = [rand_spatial() for _ in range(int(rng.integers(1, 4)))]
        if rng.integers(0, 2):
            flats = [rand_flat() for _ in range(int(rng.integers(1, 4)))]
            # the parser auto-inserts TransposeFlatten only before layers
            # that consume flat rows (not e.g. a bare softmax on 4D)
            if isinstance(flats[0], needs_flatten):
                chain.append(S.TransposeFlatten())
            chain += flats
        specs = tuple(chain)
        text = specs_to_cfg(carrier, specs, time_steps=2)
        parsed, net, _ = parse_cfg(text)
        assert parsed == specs, (trial, text, parsed, specs)
