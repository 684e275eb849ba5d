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


def _reference_eval(detections, groundtruth, num_classes, iou_thresholds,
                    eleven_point=False):
    """The pre-vectorization per-row greedy walk (global score order,
    argmax-gt then taken check) — kept as the semantic oracle."""
    from yolo_tensorflow_tpu.eval.map import average_precision, box_iou_xyxy
    aps = np.zeros((len(iou_thresholds), num_classes))
    valid = np.zeros(num_classes, bool)
    for c in range(num_classes):
        rows, n_gt, gt_per_img = [], 0, []
        for i, gt in enumerate(groundtruth):
            m = np.asarray(gt["classes"]) == c
            gt_per_img.append(np.asarray(gt["boxes"], np.float32)[m])
            n_gt += int(m.sum())
        for i, det in enumerate(detections):
            m = np.asarray(det["classes"]) == c
            for s, bidx in zip(np.asarray(det["scores"])[m], np.where(m)[0]):
                rows.append((float(s), i, int(bidx)))
        if n_gt == 0:
            continue
        valid[c] = True
        rows.sort(key=lambda r: -r[0])
        for ti, thr in enumerate(iou_thresholds):
            matched = [np.zeros(len(g), bool) for g in gt_per_img]
            tp = np.zeros(len(rows))
            fp = np.zeros(len(rows))
            for k, (s, i, bidx) in enumerate(rows):
                box = np.asarray(detections[i]["boxes"],
                                 np.float32)[bidx:bidx + 1]
                gts = gt_per_img[i]
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
            aps[ti, c] = average_precision(
                ctp / n_gt, ctp / np.maximum(ctp + cfp, 1e-9),
                eleven_point=eleven_point)
    per_thr = aps[:, valid].mean(1) if valid.any() else np.zeros(len(iou_thresholds))
    return float(per_thr.mean())


def test_vectorized_eval_matches_reference_walk():
    """The cached-IoU per-image matcher must score identically to the
    row-at-a-time global greedy it replaced, across random workloads."""
    rng = np.random.default_rng(7)
    n_img, n_cls = 12, 5
    dets, gts = [], []
    for _ in range(n_img):
        ng = int(rng.integers(0, 5))
        gb = np.sort(rng.random((ng, 4)) * 100, axis=-1)
        gts.append({"boxes": gb.astype(np.float32),
                    "classes": rng.integers(0, n_cls, ng)})
        nd = int(rng.integers(0, 8))
        # half the detections perturb a gt box, half are noise
        db = []
        for k in range(nd):
            if ng and k % 2 == 0:
                b = gb[int(rng.integers(0, ng))] + rng.normal(0, 3, 4)
                db.append(np.sort(b))
            else:
                db.append(np.sort(rng.random(4) * 100))
        db = np.asarray(db, np.float32).reshape(nd, 4)
        dets.append({"boxes": db,
                     "scores": rng.random(nd).astype(np.float32),
                     "classes": rng.integers(0, n_cls, nd)})
    thrs = (0.3, 0.5, 0.75)
    got = evaluate_detections(dets, gts, n_cls, iou_thresholds=thrs)
    want = _reference_eval(dets, gts, n_cls, thrs)
    np.testing.assert_allclose(got["map"], want, rtol=1e-9)


def test_result_file_writers(tmp_path):
    from yolo_tensorflow_tpu.eval.map import (coco_image_id,
                                              write_coco_results,
                                              write_voc_results)
    results = [{"class_id": 0, "class": "a", "score": 0.9,
                "box": (-2.0, 5.0, 30.0, 40.0)},
               {"class_id": 2, "class": "c", "score": 0.5,
                "box": (10.0, 10.0, 120.0, 90.0)}]
    per_image = [("im001", 100, 80, results)]
    write_voc_results(str(tmp_path), ("a", "b", "c"), per_image)
    la = open(tmp_path / "comp4_det_test_a.txt").read().split()
    # xmin clipped to 1 (print_detector_detections' 1-based clip), +1 coords
    assert la[0] == "im001" and float(la[1]) == 0.9
    assert float(la[2]) == 1.0 and float(la[3]) == 6.0
    assert open(tmp_path / "comp4_det_test_b.txt").read() == ""
    lc = open(tmp_path / "comp4_det_test_c.txt").read().split()
    assert float(lc[4]) == 100.0  # xmax clipped to w

    import json as _json
    write_coco_results(str(tmp_path / "r.json"),
                       [(123, 100, 80, results)])
    recs = _json.load(open(tmp_path / "r.json"))
    assert recs[0]["image_id"] == 123 and recs[0]["category_id"] == 1
    assert recs[0]["bbox"] == [0.0, 5.0, 30.0, 35.0]   # clipped xywh
    assert recs[1]["category_id"] == 3                 # coco_ids[2]

    assert coco_image_id("/x/COCO_val2014_000000123.jpg") == 123
    assert coco_image_id("images/000017.jpg") == 17


def _c_print_imagenet_detections(image_id, results, classes, w, h):
    """Line-level transcription of print_imagenet_detections
    (examples/detector.c:212-233) over one-class-per-detection results:
    clamp [0, w/h] with NO 1-based shift (unlike print_detector_detections'
    +1/clip-at-1), id is the running index, class is j+1."""
    lines = []
    for r in results:
        xmin = r["box"][0] - 0.0
        ymin = r["box"][1]
        xmax = r["box"][2]
        ymax = r["box"][3]
        if xmin < 0:
            xmin = 0
        if ymin < 0:
            ymin = 0
        if xmax > w:
            xmax = w
        if ymax > h:
            ymax = h
        j = r["class_id"]
        if r["score"]:
            lines.append(f"{image_id} {j + 1} {r['score']:f} "
                         f"{xmin:f} {ymin:f} {xmax:f} {ymax:f}\n")
    return lines


def test_imagenet_results_writer(tmp_path):
    from yolo_tensorflow_tpu.eval.map import write_imagenet_results
    results = [{"class_id": 0, "class": "a", "score": 0.9,
                "box": (-2.0, 5.0, 30.0, 40.0)},
               {"class_id": 2, "class": "c", "score": 0.5,
                "box": (10.0, 10.0, 120.0, 90.0)}]
    out = tmp_path / "imagenet-detection.txt"
    # two images to pin the running-index semantics
    write_imagenet_results(str(out), [(1, 100, 80, results),
                                      (2, 100, 80, results[:1])])
    got = open(out).readlines()
    want = (_c_print_imagenet_detections(1, results, 3, 100, 80)
            + _c_print_imagenet_detections(2, results[:1], 3, 100, 80))
    assert got == want
    # semantics the transcription pins: 0-clamp (not VOC's 1), 1-based class
    f0 = got[0].split()
    assert f0[0] == "1" and f0[1] == "1" and float(f0[3]) == 0.0
    assert float(f0[4]) == 5.0   # no +1 shift on in-range coords
    f1 = got[1].split()
    assert f1[1] == "3" and float(f1[5]) == 100.0  # clamp to w


def test_recall_stats():
    from yolo_tensorflow_tpu.eval.map import recall_stats
    gt = [{"boxes": np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32),
           "classes": np.asarray([0, 1])}]
    det = [{"boxes": np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
            "scores": np.asarray([0.9, 0.8]),
            "classes": np.asarray([5, 0])}]   # class ignored (proposals)
    out = recall_stats(det, gt)
    assert out["recall"] == 0.5 and out["correct"] == 1
    assert out["proposals_per_image"] == 2.0
    assert abs(out["avg_iou"] - 0.5) < 1e-6
