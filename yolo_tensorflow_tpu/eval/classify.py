"""Classifier validation — top-1 / top-k accuracy over a path list.

The validate_classifier_single flow (examples/classifier.c:303-360):
ground-truth class from a substring match of the label names on the image
path (same fill_truth convention as training), center_crop_image to the
net size, predict, top_k, running top-1/top-k accuracy. Here decode runs
on a worker pool and the crop+resize+forward is batched on device
(pipeline.Classifier.classify_batch_center_crop), so validation runs at
serving throughput instead of the C's one network_predict per image.

The C's top_k (src/utils.c) picks the k largest probs, first index
winning ties — matched with a stable argsort on the negated probs.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence, Tuple

import numpy as np


def read_validation_list(list_file: str,
                         class_names: Sequence[str]) -> list:
    """(path, class_id) pairs with the C's label convention for VALID
    lists (examples/classifier.c:340-346): first class name that is a
    substring of the path wins (the loop breaks), -1 when none matches
    (the image then counts as a miss). Training lists use the stricter
    data.datasets.load_classifier_list (exactly-one match)."""
    out = []
    with open(list_file) as f:
        for line in f:
            path = line.strip()
            if not path:
                continue
            cls = -1
            for j, name in enumerate(class_names):
                if name in path:
                    cls = j
                    break
            out.append((path, cls))
    return out


def topk_indices(probs: np.ndarray, k: int) -> np.ndarray:
    """(B, C) probs -> (B, k) class ids, ties to the lowest index
    (top_k, src/utils.c)."""
    return np.argsort(-probs, axis=1, kind="stable")[:, :k]


# scales of validate_classifier_multi (examples/classifier.c:437; the
# commented-out alternative {224,288,320,352,384} is not the compiled one)
MULTI_SCALES = (224, 256, 288, 320)


def snap_shape_32(oh: int, ow: int, lo: int = 32,
                  hi: int = 2048) -> Tuple[int, int]:
    """Snap a fully-conv resize target to the stride-32 grid (clamped).

    The C reallocs the net per image at the EXACT resize_min/resize_max
    geometry (examples/classifier.c:340,460 resize_network) — cheap there,
    but on TPU each distinct shape is an XLA compile, so a heterogeneous
    validation set (ImageNet aspect ratios x 4 scales x mirror) would
    compile per ratio, unbounded. Snapping each side to the nearest
    multiple of 32 bounds the compile count at O(distinct buckets) for a
    <=16px-per-side resize deviation — an eval-protocol deviation from the
    C, gated against the exact path in tests/test_classifier_eval.py and
    opt-out via shape_buckets=None / `--shape-buckets exact`."""
    def snap(v):
        return min(max(lo, int(round(v / 32.0)) * 32), hi)
    return snap(oh), snap(ow)


def _chunk_probs(clf, imgs, mode: str,
                 shape_buckets: Optional[str] = None) -> np.ndarray:
    """(B, classes) prob scores for one decoded chunk under an eval mode.

    Modes, each the named reference flow with its exact preprocessing
    (device-side, darknet-bilinear resize_device):
      single - center_crop_image, validate_classifier_single (:361)
      crop   - stretch resize via load_data_old, validate_classifier_crop
               (:170). The C chunks m/1000 splits (and divides by zero on
               <1000 images); accuracy is image-mean either way.
      10crop - ten summed corner/center/mirror crops of the (S+32)
               stretch, validate_classifier_10 (:234)
      full   - resize_min + fully-conv forward at the resized shape,
               validate_classifier_full (:303); each distinct shape in
               the chunk is its own sub-batch (one compile per shape,
               where the C reallocs the net per image)
      multi  - resize_max at scales {224,256,288,320} + mirror, probs
               summed over all 8 views, validate_classifier_multi (:419)

    shape_buckets (full/multi only): None = the C's exact per-ratio
    geometry (one compile per distinct shape); "snap32" = snap targets to
    the stride-32 grid (snap_shape_32) so compiles are O(buckets).
    """
    if mode == "single":
        return np.asarray(clf.classify_batch_center_crop(imgs), np.float32)
    if mode == "crop":
        return np.asarray(clf.classify_batch_resize(imgs), np.float32)
    if mode == "10crop":
        return np.asarray(clf.classify_batch_10crop(imgs), np.float32)
    if mode not in ("full", "multi"):
        raise ValueError(f"unknown classifier eval mode {mode!r}")
    if shape_buckets not in (None, "snap32"):
        raise ValueError(f"unknown shape_buckets {shape_buckets!r}")
    n_cls = len(clf.cfg.classes)
    out = np.zeros((len(imgs), n_cls), np.float32)
    scales = MULTI_SCALES if mode == "multi" else (clf.cfg.input_size,)
    for scale in scales:
        shape_of = (clf._resize_max_shape if mode == "multi"
                    else clf._resize_min_shape)
        groups: dict = {}
        for i, im in enumerate(imgs):
            hw = shape_of(im.shape[0], im.shape[1], scale)
            if shape_buckets == "snap32":
                hw = snap_shape_32(*hw)
            groups.setdefault(hw, []).append(i)
        for out_hw, idxs in groups.items():
            probs = clf.classify_group_fullconv([imgs[i] for i in idxs],
                                                out_hw,
                                                flip=(mode == "multi"))
            out[np.asarray(idxs)] += np.asarray(probs, np.float32)
    return out


def validate_classifier(clf, samples: Sequence[Tuple[str, int]], *,
                        top_k: int = 5, batch_size: int = 32,
                        num_workers: int = 4, mode: str = "single",
                        shape_buckets: Optional[str] = None,
                        progress: Optional[Callable] = None) -> dict:
    """samples: (image_path, class_id) pairs (data.datasets.
    load_classifier_list). Returns running accuracies exactly as the C
    accumulates them: top1 = mean(argmax == class), top{k} = mean(class
    in top-k). Images whose path matched no label (class_id < 0) count
    as misses, like the C's class = -1. ``mode`` selects which of the
    five validate_classifier_* flows runs (see _chunk_probs) — the C
    dispatches them by name at examples/classifier.c:1085-1089.

    Decode overlaps compute: chunk k+1 decodes on the worker pool while
    the device classifies chunk k (the dispatch is async; only the probs
    readback blocks), so wall-clock is ~max(decode, compute) per chunk,
    the same shape as eval/batched.py's detector pipeline."""
    from yolo_tensorflow_tpu.eval.batched import read_rgb

    chunks = [samples[s:s + batch_size]
              for s in range(0, len(samples), batch_size)]
    n = t1 = tk = 0
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        def decode(chunk):
            return list(pool.map(read_rgb, [p for p, _ in chunk]))

        imgs = decode(chunks[0]) if chunks else None
        for ci, chunk in enumerate(chunks):
            probs = _chunk_probs(clf, imgs, mode, shape_buckets)
            # decode the NEXT chunk while the device runs this one
            imgs = decode(chunks[ci + 1]) if ci + 1 < len(chunks) else None
            idx = topk_indices(probs, top_k)
            for (path, cls), row in zip(chunk, idx):
                t1 += int(row[0] == cls)
                tk += int((row == cls).any())
                n += 1
            if progress is not None:
                progress(n, len(samples))
    return {"top1": t1 / max(n, 1), f"top{top_k}": tk / max(n, 1),
            "images": n, "mode": mode}
