"""CPU gate for the backbone-transfer tool (tools/transfer_pretrain.py).

The real run — darknet19 classifier pretrain at 224, `partial --upto 23`
(the darknet19_448.conv.23 cutoff), then the yolov2-416 scratch-vs-
transfer A/B at equal steps — happens on the chip; its table lives in
tools/synthetic_train_demo.py's header. This test drives the SAME phases
tiny so a refactor that breaks any leg — classifier dataset emit with
collision-free path labels, classifier CLI training, the new
export-darknet --ckpt (training checkpoint -> .weights), partial
truncation, --partial-weights detector init, curve parsing — fails here
instead of mid-hardware-run. Reference workflow: examples/detector.c:16-23
(darknet19_448.conv.23 load) + src/parser.c:992 (save_weights_upto).
"""

import json
import os
import subprocess
import sys

import pytest

pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_transfer_phases_end_to_end(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update({
        "JAX_PLATFORMS": "cpu",
        "TRANSFER_PLATFORM": "cpu",
        "TRANSFER_CLF_SIZE": "64",
        "TRANSFER_DET_SIZE": "96",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    })
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "transfer_pretrain.py"),
         "--root", str(tmp_path), "--clf-steps", "4", "--det-steps", "4",
         "--eval-every", "2", "--batch", "4",
         "--n-train", "24", "--n-val", "8"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2400)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    # the truncated backbone file exists and ends at the conv.23 boundary
    backbone = tmp_path / "darknet19-shapes.conv.23"
    assert backbone.exists()
    full = tmp_path / "darknet19-shapes.weights"
    assert backbone.stat().st_size < full.stat().st_size

    # the transfer leg really initialized from the partial file
    det_log = (tmp_path / "det_transfer.log").read_text()
    assert "partial" in det_log and "keep init" in det_log, det_log[-2000:]

    # the A/B table of record: both legs evaluated at the same steps
    out = json.loads(r.stdout.strip().splitlines()[-1])
    table = out["transfer_ab"]
    assert [row["step"] for row in table] == [2, 4]
    for row in table:
        assert 0.0 <= row["scratch"] <= 1.0
        assert 0.0 <= row["transfer"] <= 1.0
        assert abs(row["delta"] -
                   (row["transfer"] - row["scratch"])) < 1e-6

    # classifier top-1 curve was parsed from the training log
    saved = json.loads((tmp_path / "transfer_ab.json").read_text())
    assert saved["clf_top1_curve"], saved.keys()
