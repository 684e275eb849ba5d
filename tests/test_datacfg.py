"""Darknet .data file consumption (read_data_cfg, src/option_list.c:7).

Transcription gates for the parser's C-exact semantics (darknet strip,
first-'=' split, comment chars, first-occurrence-wins) plus end-to-end CLI
drives: a reference-shaped .data file supplies train/valid/names/backup to
`train` and valid/names/top/results/eval to `eval` verbatim, with explicit
flags overriding (examples/detector.c:8-10, examples/classifier.c:46-52).
"""

import argparse
import json
import os

import numpy as np
import pytest

from yolo_tensorflow_tpu.io.datacfg import (DataCfgError, apply_data_cfg,
                                            read_data_cfg)

from tests.test_train_cfg import TINY_REGION_CFG, _make_dataset


def test_reference_shaped_file(tmp_path):
    # the shape of the C repo's cfg/coco.data
    p = tmp_path / "coco.data"
    p.write_text(
        "classes= 80\n"
        "train  = /data/coco/trainvalno5k.txt\n"
        "valid = /data/coco/5k.txt\n"
        "names = data/coco.names\n"
        "backup = /backup/\n"
        "eval=coco\n")
    opts = read_data_cfg(str(p))
    assert opts == {"classes": "80", "train": "/data/coco/trainvalno5k.txt",
                    "valid": "/data/coco/5k.txt", "names": "data/coco.names",
                    "backup": "/backup/", "eval": "coco"}


def test_strip_comments_and_duplicates(tmp_path):
    p = tmp_path / "x.data"
    p.write_text(
        "# comment\n"
        "; also a comment\n"
        "\n"
        "  tr ain = a b.txt \n"      # darknet strip removes ALL whitespace
        "train=second.txt\n"          # duplicate: first insertion wins
        "top=5\n")
    opts = read_data_cfg(str(p))
    assert opts["train"] == "ab.txt"   # C strip() eats the inner spaces too
    assert opts["top"] == "5"
    assert len(opts) == 2


@pytest.mark.parametrize("bad", ["no_equals_here", "trailing="])
def test_parse_errors(tmp_path, bad):
    # read_option returns 0 for a line with no '=' or ending in '='
    # (option_list.c:64 `if(i == len-1) return 0`)
    p = tmp_path / "bad.data"
    p.write_text(bad + "\n")
    with pytest.raises(DataCfgError):
        read_data_cfg(str(p))


def test_eval_type_validated(tmp_path):
    p = tmp_path / "x.data"
    p.write_text("eval=mscoco\n")
    args = argparse.Namespace(data=str(p), names=None, list=None, top=5,
                              write_results=None, coco_results=False,
                              imagenet_results=False)
    with pytest.raises(DataCfgError):
        apply_data_cfg(args, "eval")


def test_apply_train_flags_win(tmp_path):
    p = tmp_path / "v.data"
    p.write_text("train=from_data.txt\nvalid=val.txt\nnames=n.txt\n"
                 "backup=/bk\n")
    # no explicit flags: every key lands
    args = argparse.Namespace(data=str(p), list=None, val_list=None,
                              names=None, ckpt_dir="ckpts")
    apply_data_cfg(args, "train")
    assert (args.list, args.val_list, args.names, args.ckpt_dir) == \
        ("from_data.txt", "val.txt", "n.txt", "/bk")
    # explicit flags: .data does not clobber
    args = argparse.Namespace(data=str(p), list="cli.txt", val_list=None,
                              names="cli_names.txt", ckpt_dir="/cli")
    apply_data_cfg(args, "train")
    assert (args.list, args.val_list, args.names, args.ckpt_dir) == \
        ("cli.txt", "val.txt", "cli_names.txt", "/cli")


def test_apply_eval_writer_selection(tmp_path):
    for ev, coco, imagenet in (("voc", False, False),
                               ("coco", True, False),
                               ("imagenet", False, True)):
        p = tmp_path / f"{ev}.data"
        p.write_text(f"valid=v.txt\nnames=n.txt\nresults=/res\n"
                     f"eval={ev}\ntop=3\n")
        args = argparse.Namespace(data=str(p), names=None, list=None,
                                  top=5, write_results=None,
                                  coco_results=False, imagenet_results=False)
        apply_data_cfg(args, "eval")
        assert args.list == "v.txt" and args.write_results == "/res"
        assert args.top == 3
        assert (args.coco_results, args.imagenet_results) == (coco, imagenet)


def test_classifier_labels_key_and_classes_check(tmp_path, capsys):
    # classifier .data files say labels= (classifier.c:48); get_metadata
    # falls back names -> labels (option_list.c:40-42)
    names = tmp_path / "labels.txt"
    names.write_text("cat\ndog\n")
    p = tmp_path / "c.data"
    p.write_text(f"labels={names}\nclasses=3\ntop=2\n")
    args = argparse.Namespace(data=str(p), names=None, list=None, top=5,
                              write_results=None, coco_results=False,
                              imagenet_results=False)
    apply_data_cfg(args, "eval")
    assert args.names == str(names)
    assert args.top == 2
    assert "classes=3" in capsys.readouterr().err  # mismatch warning


def test_train_cli_driven_by_data_file(tmp_path, capsys):
    """End-to-end: `train --data` with NO --list/--names/--ckpt-dir runs
    the real training loop from the .data keys alone (train_detector's
    read_data_cfg usage, examples/detector.c:8-10)."""
    from yolo_tensorflow_tpu.cli import main
    cfg_path = tmp_path / "tiny.cfg"
    cfg_path.write_text(TINY_REGION_CFG)
    names = tmp_path / "names.txt"
    names.write_text("thing\nother\n")
    lst = _make_dataset(tmp_path)
    data = tmp_path / "task.data"
    data.write_text(f"classes=2\ntrain={lst}\nnames={names}\n"
                    f"backup={tmp_path / 'bk'}\n")
    # the model still comes from --cfg/--model — the C's cfg file is its
    # own argv slot next to the .data file (darknet detector train
    # cfg/coco.data cfg/yolov3.cfg ...)
    main(["train", "--data", str(data), "--cfg", str(cfg_path),
          "--steps", "2", "--save-every", "2",
          "--log-every", "1", "--num-data", "2"])
    out = capsys.readouterr().out
    assert "step 2" in out
    meta = json.loads((tmp_path / "bk" / "latest.json").read_text())
    assert meta["step"] == 2


def test_detect_names_from_data_file(tmp_path, capsys):
    """`detect --model ... --data task.data` labels detections with the
    .data file's names list, like the C's name_list read
    (examples/detector.c:565)."""
    import cv2
    import jax
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.cli import main
    from yolo_tensorflow_tpu.io import weights as W
    from yolo_tensorflow_tpu.models import engine

    cfg = C.get_config("yolov2-tiny-voc")
    specs = C.build_specs(cfg)
    params, stats = engine.init_params(specs, (1, 416, 416, 3),
                                       jax.random.PRNGKey(0), folded=False)
    params = jax.tree.map(np.zeros_like, params)
    stats = {k: {f: (np.ones_like(a) if f == "var" else np.zeros_like(a))
                 for f, a in v.items()} for k, v in stats.items()}
    head = max((k for k in params if params[k].get("b") is not None
                and params[k]["b"].shape[0] == 125), key=len)
    b = np.zeros(125, np.float32)
    b[4], b[5 + 7] = 4.0, 6.0      # anchor-0 obj + class-7 logits
    params[head]["b"] = b
    wf = tmp_path / "m.weights"
    W.save_darknet_weights(specs, 416, params, stats, str(wf))
    names = tmp_path / "my.names"
    names.write_text("\n".join(f"n{i:02d}" for i in range(20)) + "\n")
    data = tmp_path / "task.data"
    data.write_text(f"classes=20\nnames={names}\n")
    img = tmp_path / "img.png"
    cv2.imwrite(str(img), np.full((100, 150, 3), 128, np.uint8))
    main(["detect", "--model", "yolov2-tiny-voc", "--weights", str(wf),
          "--data", str(data), "--conf-threshold", "0.3",
          "--max-detections", "4", "--out-dir", str(tmp_path / "out"),
          str(img)])
    out = capsys.readouterr().out
    assert "n07" in out and "cat" not in out


def test_train_cli_requires_list_or_data(tmp_path, capsys):
    from yolo_tensorflow_tpu.cli import main
    with pytest.raises(SystemExit) as ei:
        main(["train", "--model", "yolov3-tiny"])
    assert ei.value.code == 2
    assert "--data file with train=" in capsys.readouterr().err
