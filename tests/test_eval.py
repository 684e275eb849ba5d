"""mAP evaluator gates with hand-computable cases."""

import numpy as np

from yolo_tensorflow_tpu.eval.map import (average_precision, box_iou_xyxy,
                                          coco_map, evaluate_detections)


def test_iou_matrix():
    a = np.asarray([[0, 0, 10, 10]], np.float32)
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                   np.float32)
    iou = box_iou_xyxy(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_perfect_detections_map_1():
    gt = [{"boxes": np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32),
           "classes": np.asarray([0, 1])}]
    det = [{"boxes": gt[0]["boxes"].copy(),
            "scores": np.asarray([0.9, 0.8]),
            "classes": np.asarray([0, 1])}]
    out = evaluate_detections(det, gt, num_classes=2)
    assert out["map"] == 1.0


def test_false_positive_halves_precision():
    gt = [{"boxes": np.asarray([[0, 0, 10, 10]], np.float32),
           "classes": np.asarray([0])}]
    det = [{"boxes": np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
            "scores": np.asarray([0.9, 0.95]),  # FP scored higher
            "classes": np.asarray([0, 0])}]
    out = evaluate_detections(det, gt, num_classes=1)
    # recall reaches 1.0 but precision at that point is 0.5
    assert abs(out["map"] - 0.5) < 1e-6


def test_duplicate_detection_is_fp():
    gt = [{"boxes": np.asarray([[0, 0, 10, 10]], np.float32),
           "classes": np.asarray([0])}]
    det = [{"boxes": np.asarray([[0, 0, 10, 10], [0.5, 0.5, 10, 10]],
                                np.float32),
            "scores": np.asarray([0.9, 0.8]),
            "classes": np.asarray([0, 0])}]
    out = evaluate_detections(det, gt, num_classes=1)
    assert out["map"] == 1.0  # first matches; duplicate FP after recall=1


def test_eleven_point_vs_area():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 0.5])
    area = average_precision(rec, prec)
    eleven = average_precision(rec, prec, eleven_point=True)
    assert abs(area - 0.75) < 1e-6
    assert abs(eleven - (6 * 1.0 + 5 * 0.5) / 11) < 1e-6


def test_coco_map_thresholds():
    gt = [{"boxes": np.asarray([[0, 0, 10, 10]], np.float32),
           "classes": np.asarray([0])}]
    # detection with IoU ~0.68 vs gt: TP at 0.5..0.65, FP at 0.7+
    det = [{"boxes": np.asarray([[0, 2, 10, 12]], np.float32),
            "scores": np.asarray([0.9]),
            "classes": np.asarray([0])}]
    out = coco_map(det, gt, num_classes=1)
    per = out["map_per_threshold"]
    assert per[0.5] == 1.0 and per[0.95] == 0.0
    assert 0.3 < out["map"] < 0.5
