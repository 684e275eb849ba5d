"""Native checkpoint save/restore for training state.

The reference round-trips TF ckpts via Saver (YOLO_V3_convert...py:75-76)
and darknet does periodic .backup writes (examples/detector.c:132-143).
Here: a dependency-free npz format that flattens the pytree by path.
Training resume restores params, batch stats, optimizer state and step
(darknet's ``seen`` counter equivalent, src/parser.c:1259-1266).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict

import numpy as np
import jax


_SEP = "%%"


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return f"k:{p.key}"
    if hasattr(p, "idx"):
        return f"i:{p.idx}"
    return f"n:{p.name}" if hasattr(p, "name") else str(p)


def _atomic_savez(path: str, flat: Dict[str, np.ndarray]) -> None:
    """Write-to-temp + rename so a crash mid-save (the failure mode of
    darknet's in-place save_weights, src/parser.c:992) can never leave a
    truncated checkpoint under the final name. The file-object form keeps
    np.savez from appending '.npz' to the temp name."""
    tmp = path + ".tmp"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def save_pytree_npz(tree, path: str) -> None:
    _atomic_savez(path, _flatten(tree))


def load_pytree_npz(template, path: str):
    """Restore into the structure of ``template`` (values replaced)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path_elems, leaf in paths:
        key = _SEP.join(_path_str(p) for p in path_elems)
        if key not in flat:
            raise KeyError(f"checkpoint missing {key}")
        arr = flat[key]
        leaves.append(arr.astype(np.asarray(leaf).dtype)
                      if hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)


def save_params_npz(params: Dict, path: str) -> None:
    """Flat 'layer/field' npz — the CLI's params interchange format
    (convert/quantize outputs, detect/eval inputs)."""
    flat = {f"{layer}/{field}": np.asarray(v)
            for layer, d in params.items() for field, v in d.items()}
    _atomic_savez(path, flat)


def save_train_state(state, ckpt_dir: str, step: int, *, keep: int = 3) -> str:
    """Write <dir>/ckpt-<step>.npz (+ latest pointer); prune old ones —
    the .backup/periodic-save behavior of detector.c:132-143."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt-{step}.npz")
    save_pytree_npz(state, path)
    latest = os.path.join(ckpt_dir, "latest.json")
    with open(latest + ".tmp", "w") as f:
        json.dump({"step": step, "file": os.path.basename(path)}, f)
    os.replace(latest + ".tmp", latest)
    ckpts = sorted(
        (f for f in os.listdir(ckpt_dir)
         if re.fullmatch(r"ckpt-\d+\.npz", f)),
        key=lambda f: int(f.split("-")[1].split(".")[0]))
    for old in ckpts[:-keep]:
        os.remove(os.path.join(ckpt_dir, old))
    return path


def checkpoint_has_field(ckpt_dir: str, field: str) -> bool:
    """True if the newest checkpoint stores any leaf under the named
    top-level field (e.g. 'qat_scales'). Restoring into a template whose
    field is None silently drops such leaves (None is an empty pytree), so
    callers use this to detect — and warn about — a mode downgrade like
    resuming a QAT checkpoint without --qat."""
    latest = os.path.join(ckpt_dir, "latest.json")
    if not os.path.exists(latest):
        return False
    with open(latest) as f:
        meta = json.load(f)
    # NamedTuple fields flatten as GetAttrKey ('n:'), dict keys as 'k:'
    tokens = (f"n:{field}", f"k:{field}")
    with np.load(os.path.join(ckpt_dir, meta["file"])) as data:
        return any(part in tokens for k in data.files
                   for part in k.split(_SEP))


def load_train_params(path_or_dir: str):
    """(params, batch_stats, step) straight out of a training checkpoint,
    template-free — so the weight-file utilities (export-darknet ->
    partial) can consume trained checkpoints the way darknet's `partial`
    consumes its trainer's .weights output (examples/darknet.c:491 on
    classifier.c save_weights files). Accepts a ckpt-<step>.npz or a
    checkpoint dir (its latest). Arrays come back float32 (the master
    weights the trainer checkpoints)."""
    step = -1
    if os.path.isdir(path_or_dir):
        latest = os.path.join(path_or_dir, "latest.json")
        if not os.path.exists(latest):
            raise FileNotFoundError(f"no latest.json in {path_or_dir}")
        with open(latest) as f:
            meta = json.load(f)
        path, step = os.path.join(path_or_dir, meta["file"]), meta["step"]
    else:
        path = path_or_dir
        m = re.search(r"ckpt-(\d+)\.npz$", path)
        if m:
            step = int(m.group(1))
    out = {"params": {}, "batch_stats": {}}
    with np.load(path) as data:
        for key in data.files:
            parts = key.split(_SEP)
            if len(parts) != 3 or parts[0] not in ("n:params",
                                                   "n:batch_stats"):
                continue
            field = parts[0][2:]
            layer, leaf = parts[1][2:], parts[2][2:]
            out[field].setdefault(layer, {})[leaf] = data[key]
    if not out["params"]:
        raise ValueError(
            f"{path} holds no 'params' tree — not a training checkpoint "
            "(convert/quantize outputs use the flat layer/field format)")
    return out["params"], out["batch_stats"], int(step)


def restore_train_state(template, ckpt_dir: str):
    """Restore the newest checkpoint; returns (state, step) or (None, 0)."""
    latest = os.path.join(ckpt_dir, "latest.json")
    if not os.path.exists(latest):
        return None, 0
    with open(latest) as f:
        meta = json.load(f)
    state = load_pytree_npz(template, os.path.join(ckpt_dir, meta["file"]))
    return state, int(meta["step"])
