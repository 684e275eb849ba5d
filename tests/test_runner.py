"""End-to-end training runner gate: real files on disk -> loader -> sharded
steps -> checkpoint -> resume, through the CLI argument surface."""

import argparse
import os

import numpy as np
import pytest


def _make_dataset(tmp_path, n=8):
    import cv2
    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = np.full((96, 128, 3), 25, np.uint8)
        w, h = int(rng.integers(40, 80)), int(rng.integers(30, 60))
        x0, y0 = int(rng.integers(0, 128 - w)), int(rng.integers(0, 96 - h))
        img[y0:y0 + h, x0:x0 + w] = 210
        p = img_dir / f"im{i}.jpg"
        cv2.imwrite(str(p), img)
        (lab_dir / f"im{i}.txt").write_text(
            f"1 {(x0+w/2)/128:.4f} {(y0+h/2)/96:.4f} {w/128:.4f} {h/96:.4f}\n")
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst)


def _args(tmp_path, lst, steps, ckpt_dir):
    return argparse.Namespace(
        model="yolov3-tiny", list=lst, val_list=None, weights=None,
        ckpt_dir=str(ckpt_dir), batch_size=4, steps=steps, lr=1e-3,
        burn_in=4, multiscale=False, num_data=2, num_spatial=1,
        save_every=3, log_every=2, input_size=64)


def test_run_training_and_resume(tmp_path, capsys):
    from yolo_tensorflow_tpu.train.runner import run_training
    lst = _make_dataset(tmp_path)
    ckpt_dir = tmp_path / "ckpts"

    run_training(_args(tmp_path, lst, steps=4, ckpt_dir=ckpt_dir))
    out = capsys.readouterr().out
    assert "8 training samples" in out
    assert "step 4" in out or "step 2" in out
    assert (ckpt_dir / "latest.json").exists()

    # resume: continues from the saved step
    run_training(_args(tmp_path, lst, steps=6, ckpt_dir=ckpt_dir))
    out = capsys.readouterr().out
    assert "resumed from step" in out
    import json
    meta = json.loads((ckpt_dir / "latest.json").read_text())
    assert meta["step"] == 6


def test_in_training_eval(tmp_path, capsys):
    """--val-list + --eval-every produce mAP lines during training."""
    from yolo_tensorflow_tpu.train.runner import run_training
    lst = _make_dataset(tmp_path)
    args = _args(tmp_path, lst, steps=2, ckpt_dir=tmp_path / "ck")
    args.val_list = lst
    args.eval_every = 2
    args.save_every = 100
    run_training(args)
    out = capsys.readouterr().out
    assert "val mAP@0.5" in out


def test_run_training_v2_region_loss(tmp_path, capsys):
    """The runner trains a v2 model through the darknet region loss
    (default since round 2), including the traced seen-counter plumbing."""
    from yolo_tensorflow_tpu.train.runner import run_training
    lst = _make_dataset(tmp_path)
    args = _args(tmp_path, lst, steps=3, ckpt_dir=tmp_path / "ck2")
    args.model = "yolov2-tiny-voc"
    run_training(args)
    out = capsys.readouterr().out
    assert "step" in out and (tmp_path / "ck2" / "latest.json").exists()


def test_run_training_classifier(tmp_path, capsys):
    """Classifier training (examples/classifier.c train_classifier): labels
    from class-name substring matching, softmax CE loss, top-1 val eval."""
    import cv2
    from yolo_tensorflow_tpu.train.runner import run_training
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        cls = i % 2
        img = np.full((64, 64, 3), 30, np.uint8)
        if cls == 0:     # "dark" class: dim noise
            img += rng.integers(0, 20, img.shape).astype(np.uint8)
        else:            # "bright" class
            img[:] = 200
        name = f"{'dark' if cls == 0 else 'bright'}_{i}.jpg"
        p = img_dir / name
        cv2.imwrite(str(p), img)
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")
    names = tmp_path / "names.txt"
    names.write_text("dark\nbright\n")

    args = _args(tmp_path, str(lst), steps=6, ckpt_dir=tmp_path / "ckc")
    args.model = "darknet19-classifier"
    args.input_size = 64
    args.names = str(names)
    args.val_list = str(lst)
    args.eval_every = 6
    args.lr = 5e-3
    run_training(args)
    out = capsys.readouterr().out
    assert "acc" in out and "val top-1" in out
    assert (tmp_path / "ckc" / "latest.json").exists()
