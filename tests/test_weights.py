"""Round-trip and offset gates for the darknet .weights parser —
the automated version of the reference's printed-byte-offset checking
(YOLO_V3_convert...py:143-168)."""

import io
import struct

import numpy as np
import pytest

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.io import weights as W
from yolo_tensorflow_tpu.models import engine, specs as S


def _random_unfolded(specs, input_size, rng):
    import jax
    params, stats = engine.init_params(
        specs, (1, input_size, input_size, 3), jax.random.PRNGKey(0))
    # randomize stats so folding is non-trivial
    for k in stats:
        n = stats[k]["mean"].shape[0]
        stats[k] = {"mean": rng.standard_normal(n).astype(np.float32),
                    "var": (rng.random(n).astype(np.float32) + 0.2)}
    params = jax.tree.map(np.asarray, params)
    return params, stats


@pytest.mark.parametrize("name", ["yolov2-tiny-voc", "yolov3-tiny", "yolov1-tiny"])
def test_weights_roundtrip(name, rng, tmp_path):
    cfg = C.get_config(name)
    specs = C.build_specs(cfg)
    params, stats = _random_unfolded(specs, cfg.input_size, rng)
    path = tmp_path / "w.weights"
    W.save_darknet_weights(specs, cfg.input_size, params, stats, path, seen=42)

    # file size check: header + payload floats
    expected_floats = W.param_count(specs, cfg.input_size)
    assert path.stat().st_size == 12 + 8 + 4 * expected_floats

    loaded, lstats, header = W.load_darknet_weights(
        specs, cfg.input_size, str(path), fold=False)
    assert header["seen"] == 42
    for k in params:
        for field in params[k]:
            np.testing.assert_array_equal(loaded[k][field], params[k][field],
                                          err_msg=f"{k}/{field}")
    for k in stats:
        np.testing.assert_array_equal(lstats[k]["mean"], stats[k]["mean"])
        np.testing.assert_array_equal(lstats[k]["var"], stats[k]["var"])


def test_fold_on_load_matches_manual_fold(rng, tmp_path):
    cfg = C.get_config("yolov2-tiny-voc")
    specs = C.build_specs(cfg)
    params, stats = _random_unfolded(specs, cfg.input_size, rng)
    path = tmp_path / "w.weights"
    W.save_darknet_weights(specs, cfg.input_size, params, stats, path)
    folded, fstats, _ = W.load_darknet_weights(
        specs, cfg.input_size, str(path), fold=True, bn_eps=cfg.bn_eps)
    assert fstats == {}
    for i, spec in enumerate(specs):
        if isinstance(spec, S.Conv) and spec.bn:
            k = engine.layer_key(i)
            wf, bf = W.fold_bn(params[k]["w"], params[k]["gamma"],
                               params[k]["beta"], stats[k]["mean"],
                               stats[k]["var"], cfg.bn_eps)
            np.testing.assert_allclose(folded[k]["w"], wf, rtol=1e-6)
            np.testing.assert_allclose(folded[k]["b"], bf, rtol=1e-6)


def test_trailing_floats_rejected(rng, tmp_path):
    cfg = C.get_config("yolov1-tiny")
    specs = C.build_specs(cfg)
    params, stats = _random_unfolded(specs, cfg.input_size, rng)
    path = tmp_path / "w.weights"
    W.save_darknet_weights(specs, cfg.input_size, params, stats, path)
    data = path.read_bytes() + struct.pack("<f", 1.0)
    with pytest.raises(W.WeightsFormatError):
        W.load_darknet_weights(specs, cfg.input_size, data, fold=False)


def test_truncated_rejected(rng, tmp_path):
    cfg = C.get_config("yolov1-tiny")
    specs = C.build_specs(cfg)
    params, stats = _random_unfolded(specs, cfg.input_size, rng)
    path = tmp_path / "w.weights"
    W.save_darknet_weights(specs, cfg.input_size, params, stats, path)
    data = path.read_bytes()[:-8]
    with pytest.raises(W.WeightsFormatError):
        W.load_darknet_weights(specs, cfg.input_size, data, fold=False)


def test_header_era_rules():
    # v3-era header: major=0 minor=2 -> seen is int64
    buf = io.BytesIO(struct.pack("<3i", 0, 2, 0) + struct.pack("<q", 7))
    h = W.read_header(buf)
    assert h["seen"] == 7
    # pre-v3 era: major=0 minor=1 -> seen int32
    buf = io.BytesIO(struct.pack("<3i", 0, 1, 0) + struct.pack("<i", 9))
    h = W.read_header(buf)
    assert h["seen"] == 9
    # forced count=5 like the reference v3 converters
    buf = io.BytesIO(struct.pack("<3i", 0, 1, 0) + struct.pack("<q", 3))
    h = W.read_header(buf, header_ints=5)
    assert h["seen"] == 3


def test_dense_layout_matches_reference_semantics(rng, tmp_path):
    """darknet connected weights are (out, in) row-major; reference loads
    via reshape(out,in).T (YOLO_V2_Tiny_Voc...py:196-198 Fc branch)."""
    cfg = C.get_config("yolov1-tiny")
    specs = C.build_specs(cfg)
    params, stats = _random_unfolded(specs, cfg.input_size, rng)
    path = tmp_path / "w.weights"
    W.save_darknet_weights(specs, cfg.input_size, params, stats, path)

    raw = np.frombuffer(path.read_bytes()[20:], dtype="<f4")
    # find the dense layer and verify its slice
    shapes = engine.infer_shapes(specs, (1, cfg.input_size, cfg.input_size, 3))
    ptr = 0
    prev = (1, cfg.input_size, cfg.input_size, 3)
    for i, spec in enumerate(specs):
        if isinstance(spec, S.Conv):
            cin = prev[3]
            ptr += spec.filters * (4 if spec.bn else 1)
            ptr += spec.filters * cin * spec.size ** 2
        elif isinstance(spec, S.Dense):
            k = engine.layer_key(i)
            fan_in = prev[1]
            np.testing.assert_array_equal(raw[ptr:ptr + spec.units],
                                          params[k]["b"])
            ptr += spec.units
            w_file = raw[ptr:ptr + fan_in * spec.units].reshape(
                spec.units, fan_in)
            np.testing.assert_array_equal(w_file.T, params[k]["w"])
            ptr += fan_in * spec.units
        prev = shapes[i]
