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


def validate_classifier(clf, samples: Sequence[Tuple[str, int]], *,
                        top_k: int = 5, batch_size: int = 32,
                        num_workers: int = 4,
                        progress: Optional[Callable] = None) -> dict:
    """samples: (image_path, class_id) pairs (data.datasets.
    load_classifier_list). Returns running accuracies exactly as the C
    accumulates them: top1 = mean(argmax == class), top{k} = mean(class
    in top-k). Images whose path matched no label (class_id < 0) count
    as misses, like the C's class = -1.

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
            probs_dev = clf.classify_batch_center_crop(imgs)
            # decode the NEXT chunk while the device runs this one
            imgs = decode(chunks[ci + 1]) if ci + 1 < len(chunks) else None
            probs = np.asarray(probs_dev, np.float32)
            idx = topk_indices(probs, top_k)
            for (path, cls), row in zip(chunk, idx):
                t1 += int(row[0] == cls)
                tk += int((row == cls).any())
                n += 1
            if progress is not None:
                progress(n, len(samples))
    return {"top1": t1 / max(n, 1), f"top{top_k}": tk / max(n, 1),
            "images": n}
