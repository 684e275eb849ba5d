"""CPU gate for the flagship-scale training tool (tools/flagship_train.py).

The real run — FULL yolov3 at 416 on the hard 12-class task, through the
production CLI with a mid-run interruption+resume, a --qat fine-tune, and
the six-way eval suite — happens on the chip and its numbers live in
tools/synthetic_train_demo.py's header. This test drives the SAME phases
end-to-end tiny (yolov3-tiny at 96px, a handful of steps) so a refactor
that breaks any leg of the workflow — darknet-layout dataset emit, cfg
emit, CLI train, cross-process resume, QAT npz export, checkpoint-of-record
restore, the batched eval suite — fails here instead of 30 minutes into a
hardware run. Reference workflow: examples/detector.c:6 train_detector +
save_weights/resume at detector.c:130.
"""

import json
import os
import subprocess
import sys

import pytest

pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_flagship_phases_end_to_end(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update({
        "JAX_PLATFORMS": "cpu",
        "FLAGSHIP_SIZE": "96",
        "FLAGSHIP_MODEL": "yolov3-tiny",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    })
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "flagship_train.py"),
         "--root", str(tmp_path), "--steps", "6", "--batch", "4",
         "--n-train", "12", "--n-val", "6", "--qat-steps", "2",
         "--eval-every", "3", "--save-every", "3"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1500)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    # the three CLI phases really ran as separate processes, and phase 2
    # resumed from phase 1's checkpoint rather than restarting
    log = (tmp_path / "train.log").read_text()
    assert log.count("\n$ ") == 3, log
    assert "resumed from step 3" in log, log
    # the QAT phase shipped the int8 artifact the suite consumes
    assert (tmp_path / "ckpts" / "int8-qat.npz").exists()

    # the final line is the results-of-record JSON with every suite leg
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["flagship"] == "yolov3-tiny-96 hard12"
    assert out["step"] == 6
    legs = {"float bf16", "flip-TTA[darknet]", "flip-TTA[corrected]",
            "int8 PTQ", "int8 QAT"}
    assert legs <= set(out["results"]), out["results"]
    assert all(0.0 <= v <= 1.0 for v in out["results"].values())
