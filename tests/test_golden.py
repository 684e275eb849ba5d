"""Golden-detection regression gate.

The reference's verification currency was golden artifacts (checked-in
detection images/boxes.txt, SURVEY.md §4). Here: a deterministically
crafted model whose detections were hand-computed and verified against the
compiled C oracle in round 1 — the expected values below are CONSTANTS;
if any framework change moves them, that's a numerics regression, not a
test to update casually.
"""

import numpy as np
import pytest

import jax

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine
from yolo_tensorflow_tpu.pipeline import Detector


def _crafted_params():
    """All-zero convs; head bias: anchor 0 predicts class 7 at every cell
    with obj logit 4, class logit 6 (verified drive of round 1)."""
    cfg = C.get_config("yolov2-tiny-voc")
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 416, 416, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = jax.tree.map(lambda a: np.zeros_like(np.asarray(a)), params)
    head = sorted(params)[-1]
    bias = np.full(125, -10.0, np.float32)
    for a in range(5):
        blk = a * 25
        bias[blk:blk + 4] = 0.0
        bias[blk + 4] = 4.0 if a == 0 else -10.0
        bias[blk + 5:blk + 25] = 0.0
        bias[blk + 5 + 7] = 6.0 if a == 0 else 0.0
    params[head]["b"] = bias
    return params


GOLDEN_SCORE = 0.93784  # sigmoid(4) * softmax(6 vs 19 zeros)
GOLDEN_W = 1.08 / 13    # anchor0 w in normalized units
GOLDEN_H = 1.19 / 13


def test_golden_crafted_detections():
    det = Detector("yolov2-tiny-voc", params=_crafted_params(),
                   max_detections=10)
    img = np.random.default_rng(0).integers(0, 255, (600, 800, 3),
                                            dtype=np.uint8)
    res = det.detect(img)
    assert len(res) == 10
    for r in res:
        assert r["class"] == "cat"
        assert abs(r["score"] - GOLDEN_SCORE) < 1e-3
        w = (r["box"][2] - r["box"][0]) / 800
        h = (r["box"][3] - r["box"][1]) / 600
        # interior boxes keep exact anchor geometry (edge boxes clip)
        if 0.06 < (r["box"][0] + r["box"][2]) / 2 / 800 < 0.94:
            assert abs(w - GOLDEN_W) < 2e-3, w
    # deterministic across runs
    res2 = det.detect(img)
    assert [r["box"] for r in res] == [r["box"] for r in res2]


def test_quantize_cli(tmp_path, capsys):
    """quantize CLI: weights -> calibrated int8 npz -> detect loads it."""
    import cv2
    from yolo_tensorflow_tpu import cli
    from yolo_tensorflow_tpu.io import weights as W
    cfg = C.get_config("yolov2-tiny-voc", input_size=64)
    specs = C.build_specs(cfg)
    params, stats = engine.init_params(specs, (1, 64, 64, 3),
                                       jax.random.PRNGKey(0))
    wfile = tmp_path / "m.weights"
    W.save_darknet_weights(specs, 64, jax.tree.map(np.asarray, params),
                           stats, wfile)
    calib = tmp_path / "calib"
    calib.mkdir()
    for i in range(3):
        cv2.imwrite(str(calib / f"c{i}.jpg"),
                    np.random.default_rng(i).integers(
                        0, 255, (80, 80, 3), dtype=np.uint8))
    qfile = tmp_path / "q.npz"
    cli.main(["quantize", "--model", "yolov2-tiny-voc", "--input-size", "64",
              "--weights", str(wfile), "--calib-dir", str(calib),
              "--out", str(qfile)])
    out = capsys.readouterr().out
    assert "8 int8 convs" in out  # 9 convs - 1 head conv

    qparams = cli._load_npz_params(str(qfile))
    det = Detector("yolov2-tiny-voc", params=qparams, input_size=64,
                   num_candidates=32)
    d = det.detect_batch(np.zeros((1, 64, 64, 3), np.uint8))
    assert d.boxes.shape[0] == 1
