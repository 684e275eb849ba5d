"""Backbone-pretrain transfer: darknet19 classifier -> `partial` cutoff
-> yolov2 detector fine-tune, A/B'd against from-scratch at equal steps.

This is the reference's canonical training recipe run end-to-end: darknet
pretrains a classifier backbone, truncates it with the `partial` command
(`save_weights_upto`, /root/reference/Darknet2Tensorflow/darknet-master/
src/parser.c:992) into files like darknet19_448.conv.23, and detector
training loads that prefix as its init (`examples/detector.c:16-23`).
Here every phase goes through the production CLI in a fresh process:

  1. render a 12-class single-shape CLASSIFICATION set to disk in the
     darknet path-label layout (fill_truth's strstr convention,
     src/data.c:504) — label tokens are collision-free (c00..c11) since
     the task's shape names collide as substrings (circle/semicircle);
     the classifier head is discarded at `partial` so the names are
     internal to this phase;
  2. emit a 12-class darknet19 classifier .cfg and `train` it; record
     held-out top-1;
  3. `partial --upto 23` the trained weights — the exact cutoff of
     darknet19_448.conv.23 (spec prefix 0..22 is layer-for-layer
     identical between darknet19-classifier and yolov2, verified here);
  4. `train` the yolov2 12-class detector twice at EQUAL steps on the
     same detection scenes: (a) from scratch, (b) --weights backbone
     --partial-weights; --eval-every gives the early-mAP curve;
  5. print the A/B table (mAP@0.5 per eval step, scratch vs transfer).

Usage: python tools/transfer_pretrain.py [--root DIR]
           [--clf-steps 1500] [--det-steps 1500] [--eval-every 250]

Results of record go in tools/synthetic_train_demo.py's header and
bench.py extras.
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.synthetic_train_demo import HARD_CLASSES, make_scene  # noqa: E402

# full scale; env overrides exist so the CPU gate can drive the SAME
# phases tiny and fast (the flagship_train.py pattern)
CLF_SIZE = int(os.environ.get("TRANSFER_CLF_SIZE", "224"))
DET_SIZE = int(os.environ.get("TRANSFER_DET_SIZE", "416"))
CUTOFF = 23             # darknet19_448.conv.23's layer cutoff
# collision-free path-label tokens (fill_truth strstr semantics would
# double-match circle/semicircle); index-aligned with HARD_CLASSES
CLF_TOKENS = tuple(f"c{i:02d}x" for i in range(len(HARD_CLASSES)))


def gen_classifier_set(root, n_train, n_val):
    """Single-shape crops from the SAME scene distribution the detector
    trains on, labeled via the darknet path convention."""
    import cv2
    for split, n, seed in (("train", n_train, 21), ("valid", n_val, 787)):
        d = os.path.join(root, "clf", split)
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(seed)
        paths = []
        i = 0
        while i < n:
            img, boxes = make_scene(rng, hard=True, size=DET_SIZE)
            for cx, cy, w, h, c in boxes:
                if i >= n:
                    break
                # square crop around the object with context padding
                s = int(max(w, h) * DET_SIZE * 1.6)
                x0 = int(cx * DET_SIZE - s / 2)
                y0 = int(cy * DET_SIZE - s / 2)
                x0 = max(0, min(x0, DET_SIZE - s))
                y0 = max(0, min(y0, DET_SIZE - s))
                if s < 12 or x0 < 0 or y0 < 0:
                    continue
                crop = img[y0:y0 + s, x0:x0 + s]
                crop = cv2.resize(crop, (CLF_SIZE, CLF_SIZE),
                                  interpolation=cv2.INTER_LINEAR)
                p = os.path.abspath(os.path.join(
                    d, f"{CLF_TOKENS[int(c)]}_{i:05d}.png"))
                cv2.imwrite(p, crop[..., ::-1])
                paths.append(p)
                i += 1
        with open(os.path.join(root, f"clf_{split}.txt"), "w") as f:
            f.write("\n".join(paths) + "\n")
    tokens = os.path.join(root, "clf.names")
    with open(tokens, "w") as f:
        f.write("\n".join(CLF_TOKENS) + "\n")
    return tokens


def gen_detection_set(root, n_train, n_val):
    """Detection scenes in darknet layout (same as flagship_train)."""
    import cv2
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    for split, n, seed in (("train", n_train, 31), ("valid", n_val, 797)):
        rng = np.random.default_rng(seed)
        paths = []
        for i in range(n):
            img, boxes = make_scene(rng, hard=True, size=DET_SIZE)
            name = f"{split}_{i:05d}"
            p = os.path.abspath(os.path.join(root, "images", name + ".png"))
            cv2.imwrite(p, img[..., ::-1])
            with open(os.path.join(root, "labels", name + ".txt"), "w") as f:
                for cx, cy, w, h, c in boxes:
                    f.write(f"{int(c)} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}\n")
            paths.append(p)
        with open(os.path.join(root, split + ".txt"), "w") as f:
            f.write("\n".join(paths) + "\n")
    names = os.path.join(root, "shapes.names")
    with open(names, "w") as f:
        f.write("\n".join(HARD_CLASSES) + "\n")


def emit_cfg(root, model, size, names, fname, max_batches=None):
    """max_batches scales the steps-policy LR drops to the run length
    (x0.1 at 80%/90% — the stock-cfg proportions; see flagship_train)."""
    import dataclasses
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.io.cfg import specs_to_cfg
    cfg = dataclasses.replace(C.get_config(model, input_size=size),
                              custom_classes=tuple(names))
    path = os.path.join(root, fname)
    with open(path, "w") as f:
        f.write(specs_to_cfg(cfg, batch=32, max_batches=max_batches))
    return path


def run_cli(args_list, log_path):
    import subprocess
    cmd = [sys.executable, "-m", "yolo_tensorflow_tpu.cli"]
    if os.environ.get("TRANSFER_PLATFORM"):
        cmd += ["--platform", os.environ["TRANSFER_PLATFORM"]]
    cmd += args_list
    print(f"$ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    with open(log_path, "a") as lf:
        lf.write(f"\n$ {' '.join(cmd)}\n")
        lf.flush()
        r = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT,
                           cwd=os.path.join(os.path.dirname(__file__), ".."))
    print(f"  -> exit {r.returncode} in {time.time()-t0:.0f}s", flush=True)
    if r.returncode != 0:
        with open(log_path) as lf:
            print(lf.read()[-4000:])
        raise SystemExit(f"CLI phase failed: {' '.join(args_list[:4])}")


def parse_curve(log_path, marker):
    """[(step, value)] for 'step N: val <marker> = V' lines."""
    pat = re.compile(rf"step (\d+): val {re.escape(marker)} = ([0-9.]+)")
    with open(log_path) as f:
        return [(int(m.group(1)), float(m.group(2)))
                for m in (pat.search(line) for line in f) if m]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/transfer12")
    ap.add_argument("--clf-steps", type=int, default=1500)
    ap.add_argument("--det-steps", type=int, default=1500)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-train", type=int, default=2000)
    ap.add_argument("--n-val", type=int, default=160)
    ap.add_argument("--skip-clf", action="store_true",
                    help="backbone file already exists: A/B only")
    args = ap.parse_args()
    root = args.root
    os.makedirs(root, exist_ok=True)
    backbone = os.path.join(root, f"darknet19-shapes.conv.{CUTOFF}")
    out = {}

    # -- phase 1+2: classifier pretrain --------------------------------------
    clf_log = os.path.join(root, "clf.log")
    if not args.skip_clf:
        if not os.path.exists(os.path.join(root, "clf_valid.txt")):
            gen_classifier_set(root, args.n_train, max(args.n_val, 120))
        clf_cfg = emit_cfg(root, "darknet19-classifier", CLF_SIZE,
                           CLF_TOKENS, "darknet19-shapes12.cfg",
                           max_batches=args.clf_steps)
        run_cli(["train", "--cfg", clf_cfg,
                 "--list", os.path.join(root, "clf_train.txt"),
                 "--val-list", os.path.join(root, "clf_valid.txt"),
                 "--names", os.path.join(root, "clf.names"),
                 "--ckpt-dir", os.path.join(root, "clf_ckpts"),
                 "--batch-size", str(args.batch), "--bf16",
                 "--cache-images",
                 "--steps", str(args.clf_steps), "--lr", "1e-3",
                 "--burn-in", "200",
                 "--eval-every", str(args.eval_every),
                 "--save-every", str(args.clf_steps),
                 "--log-every", "100"], clf_log)
        out["clf_top1_curve"] = parse_curve(clf_log, "top-1")

        # export the trained classifier to .weights, then `partial` it —
        # the save_weights_upto workflow (src/parser.c:992)
        stem = os.path.join(root, "darknet19-shapes")
        run_cli(["export-darknet", "--cfg", clf_cfg,
                 "--ckpt", os.path.join(root, "clf_ckpts"),
                 "--out", stem], clf_log)
        run_cli(["partial", "--cfg", clf_cfg,
                 "--weights", stem + ".weights",
                 "--upto", str(CUTOFF), "--out", backbone], clf_log)

    # -- phase 4: detector A/B ----------------------------------------------
    if not os.path.exists(os.path.join(root, "valid.txt")):
        gen_detection_set(root, args.n_train, args.n_val)
    det_cfg = emit_cfg(root, "yolov2", DET_SIZE, HARD_CLASSES,
                       "yolov2-shapes12.cfg", max_batches=args.det_steps)
    common = ["train", "--cfg", det_cfg,
              "--list", os.path.join(root, "train.txt"),
              "--val-list", os.path.join(root, "valid.txt"),
              "--names", os.path.join(root, "shapes.names"),
              "--batch-size", str(args.batch), "--bf16", "--cache-images",
              "--steps", str(args.det_steps), "--lr", "1e-3",
              "--burn-in", "200",
              "--eval-every", str(args.eval_every),
              "--save-every", str(args.det_steps),
              "--log-every", "100"]
    legs = {}
    for leg, extra in (
            ("scratch", []),
            ("transfer", ["--weights", backbone, "--partial-weights"])):
        log = os.path.join(root, f"det_{leg}.log")
        run_cli(common + ["--ckpt-dir", os.path.join(root, f"det_{leg}")]
                + extra, log)
        legs[leg] = dict(parse_curve(log, "mAP@0.5"))
        out[f"det_{leg}_map_curve"] = sorted(legs[leg].items())

    steps = sorted(set(legs["scratch"]) & set(legs["transfer"]))
    print(f"\n=== transfer A/B: yolov2-{DET_SIZE} hard12, mAP@0.5 at "
          "equal steps ===")
    print(f"{'step':>6} {'scratch':>9} {'transfer':>9} {'delta':>8}")
    for s in steps:
        a, b = legs["scratch"][s], legs["transfer"][s]
        print(f"{s:>6} {a:>9.4f} {b:>9.4f} {b - a:>+8.4f}")
    out["table"] = [
        {"step": s, "scratch": legs["scratch"][s],
         "transfer": legs["transfer"][s],
         "delta": round(legs["transfer"][s] - legs["scratch"][s], 4)}
        for s in steps]
    with open(os.path.join(root, "transfer_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"transfer_ab": out["table"]}))


if __name__ == "__main__":
    main()
