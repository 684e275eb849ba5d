"""Detection mAP evaluation.

The quantitative half the reference only sketches: examples/detector.c:364
(validate_detector) writes VOC/COCO result files for *external* scorers and
:489 (validate_detector_recall) prints IoU/recall. Here the scoring is
built in: VOC-style AP per class (both VOC2007 11-point and continuous
area-under-PR) and COCO-style mAP@[.5:.95].
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def box_iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) -> (N,M) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    ix0 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy0 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix1 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy1 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
    aa = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    ab = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)


def average_precision(recall, precision, *, eleven_point=False) -> float:
    """VOC AP. eleven_point=True: VOC2007 11-point interpolation; else
    continuous area under the monotonized PR curve (VOC2010+/COCO style)."""
    if eleven_point:
        ap = 0.0
        for t in np.linspace(0, 1, 11):
            mask = recall >= t
            ap += (precision[mask].max() if mask.any() else 0.0) / 11.0
        return float(ap)
    r = np.concatenate([[0.0], recall, [1.0]])
    p = np.concatenate([[0.0], precision, [0.0]])
    p = np.maximum.accumulate(p[::-1])[::-1]
    idx = np.where(r[1:] != r[:-1])[0]
    return float(np.sum((r[idx + 1] - r[idx]) * p[idx + 1]))


def evaluate_detections(
        detections: Sequence[Dict], groundtruth: Sequence[Dict],
        num_classes: int, iou_thresholds: Sequence[float] = (0.5,),
        eleven_point: bool = False) -> Dict:
    """Score detections against ground truth.

    detections: per image {"boxes": (D,4) xyxy px, "scores": (D,),
    "classes": (D,)}. groundtruth: per image {"boxes": (G,4), "classes": (G,)}.
    Returns {"map": mean over classes & thresholds, "ap_per_class": ...,
    "map_per_threshold": ...}.
    """
    assert len(detections) == len(groundtruth)
    aps = np.zeros((len(iou_thresholds), num_classes), np.float64)
    valid = np.zeros(num_classes, bool)

    for c in range(num_classes):
        rows = []  # (score, image_idx, det_idx)
        n_gt = 0
        gt_boxes_per_img = []
        for i, gt in enumerate(groundtruth):
            m = np.asarray(gt["classes"]) == c
            gt_boxes_per_img.append(np.asarray(gt["boxes"], np.float32)[m])
            n_gt += int(m.sum())
        for i, det in enumerate(detections):
            m = np.asarray(det["classes"]) == c
            for s, bidx in zip(np.asarray(det["scores"])[m],
                               np.where(m)[0]):
                rows.append((float(s), i, int(bidx)))
        if n_gt == 0:
            continue
        valid[c] = True
        rows.sort(key=lambda r: -r[0])

        for ti, thr in enumerate(iou_thresholds):
            matched = [np.zeros(len(g), bool) for g in gt_boxes_per_img]
            tp = np.zeros(len(rows))
            fp = np.zeros(len(rows))
            for k, (s, i, bidx) in enumerate(rows):
                box = np.asarray(detections[i]["boxes"],
                                 np.float32)[bidx:bidx + 1]
                gts = gt_boxes_per_img[i]
                if len(gts) == 0:
                    fp[k] = 1
                    continue
                ious = box_iou_xyxy(box, gts)[0]
                j = int(np.argmax(ious))
                if ious[j] >= thr and not matched[i][j]:
                    tp[k] = 1
                    matched[i][j] = True
                else:
                    fp[k] = 1
            ctp, cfp = np.cumsum(tp), np.cumsum(fp)
            recall = ctp / n_gt
            precision = ctp / np.maximum(ctp + cfp, 1e-9)
            aps[ti, c] = average_precision(recall, precision,
                                           eleven_point=eleven_point)

    per_thr = aps[:, valid].mean(axis=1) if valid.any() else np.zeros(len(iou_thresholds))
    return {
        "map": float(per_thr.mean()),
        "map_per_threshold": {float(t): float(v)
                              for t, v in zip(iou_thresholds, per_thr)},
        "ap_per_class": {c: float(aps[:, c].mean())
                         for c in range(num_classes) if valid[c]},
        "num_classes_evaluated": int(valid.sum()),
    }


def coco_map(detections, groundtruth, num_classes) -> Dict:
    """COCO mAP@[.5:.95:.05] (area under PR, continuous)."""
    thrs = np.round(np.arange(0.5, 1.0, 0.05), 2)
    return evaluate_detections(detections, groundtruth, num_classes,
                               iou_thresholds=thrs, eleven_point=False)
