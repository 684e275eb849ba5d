"""End-to-end training demonstration on real hardware.

Trains yolov3-tiny from scratch on a synthetic 3-class shapes task
(circle/square/triangle on textured backgrounds), then evaluates mAP@0.5
with eval/map.py on held-out scenes — the full train -> fold -> detect ->
score loop on one chip. The reference has no TF training pipeline at all
(SURVEY.md §0); this exercises ours for real.

Usage:  PYTHONPATH=. python tools/synthetic_train_demo.py [steps] [model]

Recorded runs (one TPU v5e chip, from-scratch, no tuning):
  yolov3-tiny (COCO anchors):
    1200 steps -> held-out mAP@0.5 = 0.52
    3500 steps -> held-out mAP@0.5 = 0.848
                 (circle 0.92, square 0.82, triangle 0.81)
  yolov2-tiny-voc (darknet region loss, round 2; shape-scaled anchors —
  a 9-conv backbone on a 5x5 grid, so expectedly below v3-tiny):
    2000 steps -> held-out mAP@0.5 = 0.545
    4500 steps -> held-out mAP@0.5 = 0.668
                 (circle 0.75, square 0.66, triangle 0.60); int8 delta -0.005
  Round 3 (yolov3-tiny, 3500 steps, batched eval pipeline):
    held-out mAP@0.5 = 0.8484
    flip-TTA[darknet]   0.8595 (delta +0.0111)   <- the C's quirky mode
    flip-TTA[corrected] 0.8768 (delta +0.0284)   <- proper mirroring wins
    int8 (w8a8)         0.8837 (delta +0.0353; saturated-toy noise —
                         the claim is "no degradation", not a gain)
  Round 3 "hard" 12-class task (append `hard`; yolov3-tiny, 3500 steps,
  bf16 mixed-precision training, 200 held-out scenes) — the non-saturated
  regime where deltas are signal, not noise:
    held-out mAP@0.5 = 0.6785
    flip-TTA[darknet]   0.6341 (delta -0.0444)   <- the C's bugs now COST
    flip-TTA[corrected] 0.7228 (delta +0.0443)   <- proper mirroring wins
    int8 (w8a8)         0.6579 (delta -0.0206)   <- the honest int8 cost:
                         ~2 mAP points from w8a8 PTQ at mid-range accuracy
  Round 4 onepass-BN convergence A/B (append `hard onepass`; same task,
  seed 0, vectorized truth assign — the 1-ulp-equal default):
    held-out mAP@0.5 = 0.6906 (vs twopass 0.6785: +0.012, inside the
    seed spread below -> the onepass stat lever costs nothing measurable
    at convergence; PERF_TRAIN.md §4-5)
    flip-TTA[darknet]   0.6089 (-0.0817)  flip-TTA[corrected] 0.7218 (+0.0312)
    int8 PTQ 0.6720 (-0.0185)   int8 QAT 0.6828 (-0.0078 vs float,
                                                 +0.0107 vs PTQ)
  Round 4 QAT seed study (`hard seed=N`, twopass, 3500 steps + 700 QAT
  fine-tune steps; held-out mAP@0.5):
    seed | float  | int8 PTQ        | int8 QAT (vs float / vs PTQ)
      0  | 0.6785 | 0.6579 (-0.021) | 0.7024 (+0.024 / +0.045)
      1  | 0.6674 | 0.6519 (-0.016) | 0.6701 (+0.003 / +0.018)
      2  | 0.6487 | 0.6387 (-0.010) | 0.6993 (+0.051 / +0.061)
    QAT recovers the FULL PTQ loss in every run (+0.041+-0.018 over PTQ)
    and lands at-or-above float in all three — but the above-float part
    is seed-noise-sized (the onepass run above shows -0.008) and partly
    the extra 700 steps; the round-3 "QAT beats float" headline is
    softened accordingly (README "Performance").
  Round 5 FLAGSHIP runs (tools/flagship_train.py: FULL yolov3@416,
  hard-12 task at 416, 4000 train / 200 held-out scenes on disk in
  darknet layout, batch 32 bf16, production CLI phases in fresh
  processes with a scripted interrupt at step 3000 + cross-process
  resume, then an 800-step QAT leg; one TPU v5e, loader on a single
  contended host core at ~45-80 img/s):
    Run A (constant-LR flaw, 2026-08-21): the emitted cfg carried the
    stock 500200-batch schedule, so 6000 steps trained at constant 1e-3;
    in-loop val mAP@0.5 rose 0.8139@1000 -> 0.8902@2000 -> 0.9066@3000
    -> 0.9142@4000 -> 0.9128@5000 then OSCILLATED DOWN to 0.7494@6000
    (train cost/IoU healthy throughout — an LR-schedule flaw, not a
    divergence). Final suite on the restored step-6000 checkpoint:
      float bf16 0.7436 | flip-TTA[darknet] 0.6360 (the C's buggy mode)
      flip-TTA[corrected] 0.7414 | int8 PTQ 0.6325
      int8 QAT 0.8032  <- the 800 fine-tune steps at 1e-4 recovered
                          +0.06 past float: exactly what a missing LR
                          drop predicts, and the clue that led to the
                          fix (io/cfg.py specs_to_cfg max_batches).
    Run B (fixed schedule: x0.1 LR drops at 4800/5400, same data/seed;
    bit-identical to Run A through step 4000 — 0.8139/0.8902/0.9066/
    0.9142 — then diverging exactly at the 4800 drop):
    in-loop val mAP@0.5 0.9277@5000 (A: 0.9128) -> 0.9275@6000
    (A: 0.7494). Final suite on the restored step-6000 checkpoint
    (200 held-out scenes, conf 0.3):
      float bf16           0.9278
      flip-TTA[darknet]    0.7572 (-0.171: the C's buggy flip mode is
                           actively harmful at high accuracy)
      flip-TTA[corrected]  0.9264 (-0.001: proper mirroring is neutral
                           here — TTA helps mid-range models, not this)
      int8 PTQ             0.8705 (-0.057: the honest w8a8 cost at 416)
      int8 QAT             0.9329 (+0.005 vs float; recovers the FULL
                           PTQ loss, consistent with the tiny-model
                           seed study above)
    Wall-clock on one v5e (remote-tunnel chip, single-core host loader):
    phase 1 (steps 0-3000 + interrupt) 2549 s, phase 2 (resume 3000->
    6000, fresh process) 2518 s, QAT leg (6000->6800) 730 s, eval suite
    5 detectors x 200 imgs ~19 min; loader-bound ~45-70 img/s after the
    decode cache warms (the pure-device training step measures ~460
    img/s at batch 128 — bench.py train extra).
  Round 5 TRANSFER A/B (tools/transfer_pretrain.py, one v5e, 2026-08-21
  — the reference's darknet19_448.conv.23 recipe end-to-end,
  examples/detector.c:16-23 / src/parser.c:992): darknet19 classifier
  pretrained on 2000 single-shape crops@224 from the SAME scene
  distribution (held-out top-1 0.2062@250 -> 0.7375@500 -> 0.8375@1500),
  exported from its training checkpoint to .weights (export-darknet
  --ckpt), truncated with `partial --upto 23`, then yolov2@416 trained
  on 2000 detection scenes scratch-vs-transfer at EQUAL steps (batch 32
  bf16, scaled LR schedule; 160 held-out scenes):
    step | scratch | transfer | delta
     250 | 0.1763  | 0.5219   | +0.3456  <- the pretrain pays here
     500 | 0.6835  | 0.7956   | +0.1121
     750 | 0.7501  | 0.7118   | -0.0383
    1000 | 0.8046  | 0.8441   | +0.0395
    1250 | 0.8644  | 0.8581   | -0.0063
    1500 | 0.8641  | 0.8559   | -0.0082  <- parity at convergence
  The textbook transfer signature: a 3x head start at 250 steps that
  washes out once the from-scratch run has seen enough data — the value
  of the recipe is wall-clock-to-accuracy, exactly why the C ships it
  as its canonical workflow. Raw artifacts checked in:
  docs/records/transfer_ab_r5.json and flagship_train_r5.json (both
  flagship runs' in-loop curves + final suites). Legs: scratch 1866 s,
  transfer 1213 s (same steps — the transfer leg's eval detectors hit
  warmer compile caches).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SIZE = 160
CLASSES = ("circle", "square", "triangle")
# The 12-class "hard" task (VERDICT r2 weak #7: don't generalize int8
# accuracy claims from a saturated 3-class toy). Regular polygons with
# adjacent vertex counts (pentagon/hexagon/circle), aspect-ambiguous pairs
# (square/rect, circle/ellipse), outline-vs-fill (circle/ring), plus
# distractor clutter and a lower size floor keep mAP mid-range at a modest
# training budget — the regime where a quantization delta is measurable.
HARD_CLASSES = ("circle", "square", "triangle", "ellipse", "rect",
                "diamond", "plus", "ring", "star", "semicircle",
                "pentagon", "hexagon")


def _poly(cx, cy, r, n, rot):
    ang = rot + 2 * np.pi * np.arange(n) / n
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                    1).astype(np.int32)


def _draw_shape(cv2, img, cls, cx, cy, s, color, rng):
    h = s // 2
    if cls == 0:
        cv2.circle(img, (cx, cy), h, color, -1)
    elif cls == 1:
        cv2.rectangle(img, (cx - h, cy - h), (cx + h, cy + h), color, -1)
    elif cls == 2:
        cv2.fillPoly(img, [np.asarray([(cx, cy - h), (cx - h, cy + h),
                                       (cx + h, cy + h)], np.int32)], color)
    elif cls == 3:  # ellipse, distinctly non-circular
        ax = (h, max(3, int(h * rng.uniform(0.45, 0.65))))
        if rng.integers(0, 2):
            ax = ax[::-1]
        cv2.ellipse(img, (cx, cy), ax, 0, 0, 360, color, -1)
        return (cx - ax[0], cy - ax[1], cx + ax[0], cy + ax[1])
    elif cls == 4:  # rect, distinctly non-square
        w2 = max(3, int(h * rng.uniform(0.45, 0.65)))
        if rng.integers(0, 2):
            cv2.rectangle(img, (cx - h, cy - w2), (cx + h, cy + w2), color, -1)
            return (cx - h, cy - w2, cx + h, cy + w2)
        cv2.rectangle(img, (cx - w2, cy - h), (cx + w2, cy + h), color, -1)
        return (cx - w2, cy - h, cx + w2, cy + h)
    elif cls == 5:  # diamond
        cv2.fillPoly(img, [np.asarray([(cx, cy - h), (cx + h, cy),
                                       (cx, cy + h), (cx - h, cy)],
                                      np.int32)], color)
    elif cls == 6:  # plus
        t = max(2, s // 6)
        cv2.rectangle(img, (cx - t, cy - h), (cx + t, cy + h), color, -1)
        cv2.rectangle(img, (cx - h, cy - t), (cx + h, cy + t), color, -1)
    elif cls == 7:  # ring
        cv2.circle(img, (cx, cy), h, color, max(2, s // 5))
    elif cls == 8:  # 5-point star
        rot = -np.pi / 2
        outer = _poly(cx, cy, h, 5, rot)
        inner = _poly(cx, cy, max(2, int(h * 0.42)), 5, rot + np.pi / 5)
        pts = np.empty((10, 2), np.int32)
        pts[0::2], pts[1::2] = outer, inner
        cv2.fillPoly(img, [pts], color)
    elif cls == 9:  # semicircle, random flat side; tight half-disc box
        r = int(rng.integers(0, 4))
        cv2.ellipse(img, (cx, cy), (h, h), r * 90, 0, 180, color, -1)
        return ((cx - h, cy, cx + h, cy + h),        # bottom half
                (cx - h, cy - h, cx, cy + h),        # left
                (cx - h, cy - h, cx + h, cy),        # top
                (cx, cy - h, cx + h, cy + h))[r]     # right
    elif cls == 10:
        cv2.fillPoly(img, [_poly(cx, cy, h, 5, -np.pi / 2)], color)
    else:
        cv2.fillPoly(img, [_poly(cx, cy, h, 6, 0)], color)
    return None


def make_scene(rng, hard=False, size=SIZE):
    """One synthetic scene at ``size``x``size``. Geometry (shape sizes,
    clutter density) scales with size/SIZE so the 416px flagship task is
    the same distribution as the 160px one, just rendered larger."""
    import cv2
    sc = size / SIZE
    img = rng.integers(0, 60, (size, size, 3), dtype=np.uint8)
    ncls = len(HARD_CLASSES) if hard else 3
    if hard:
        # clutter that is not an object: dim lines and tiny specks
        for _ in range(int(rng.integers(2, 6))):
            p0 = tuple(int(v) for v in rng.integers(0, size, 2))
            p1 = tuple(int(v) for v in rng.integers(0, size, 2))
            cv2.line(img, p0, p1,
                     tuple(int(c) for c in rng.integers(40, 100, 3)),
                     max(1, int(rng.integers(1, 3) * sc)))
        for _ in range(int(rng.integers(0, 8))):
            cv2.circle(img, tuple(int(v) for v in rng.integers(0, size, 2)),
                       max(1, int(rng.integers(1, 3) * sc)),
                       tuple(int(c) for c in rng.integers(40, 110, 3)), -1)
    boxes = []
    lo, hi = (16, 56) if hard else (24, 64)
    lo, hi = max(6, int(lo * sc)), int(hi * sc)
    for _ in range(int(rng.integers(1, 6 if hard else 4))):
        cls = int(rng.integers(0, ncls))
        s = int(rng.integers(lo, hi))
        cx = int(rng.integers(s // 2 + 2, size - s // 2 - 2))
        cy = int(rng.integers(s // 2 + 2, size - s // 2 - 2))
        color = tuple(int(c) for c in rng.integers(120, 255, 3))
        tight = _draw_shape(cv2, img, cls, cx, cy, s, color, rng)
        if tight is None:
            tight = (cx - s // 2, cy - s // 2, cx + s // 2, cy + s // 2)
        x0, y0, x1, y1 = tight
        boxes.append([(x0 + x1) / 2 / size, (y0 + y1) / 2 / size,
                      (x1 - x0) / size, (y1 - y0) / size, cls])
    return img, np.asarray(boxes, np.float32)


def make_batch(rng, n, max_boxes=8, hard=False, size=SIZE):
    from yolo_tensorflow_tpu.data.augment import pad_truths
    imgs = np.empty((n, size, size, 3), np.uint8)
    tr = np.empty((n, max_boxes, 5), np.float32)
    for i in range(n):
        imgs[i], b = make_scene(rng, hard=hard, size=size)
        tr[i] = pad_truths(b, max_boxes)
    return imgs, tr


def main(steps=1200, batch=32, model="yolov3-tiny", hard=False,
         bn_stats="twopass", seed=0):
    import dataclasses
    import jax
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.eval.map import evaluate_detections
    from yolo_tensorflow_tpu.io.weights import fold_params
    from yolo_tensorflow_tpu.pipeline import Detector
    from yolo_tensorflow_tpu.train import loop as T

    classes = HARD_CLASSES if hard else CLASSES
    if model == "yolov2-tiny-voc":
        # v2 via the darknet region loss; anchors scaled to the shapes task
        # (grid units at stride 32 -> grid 5 for 160px input)
        cfg = dataclasses.replace(
            C.get_config("yolov2-tiny-voc", input_size=SIZE),
            custom_classes=classes,
            anchors=((0.8, 0.8), (1.5, 1.5), (2.4, 2.4)))
    elif hard:
        cfg = dataclasses.replace(C.get_config(model, input_size=SIZE),
                                  custom_classes=classes)
    else:
        cfg = C.get_config(model, input_size=SIZE)
    tx = T.make_optimizer(T.darknet_lr_schedule(1e-3, burn_in=100),
                          weight_decay=5e-4)
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(seed),
                                 input_size=SIZE)
    import jax.numpy as jnp
    # the hard run trains mixed-precision (the production mode); the
    # 3-class baseline stays exact-f32 so its recorded numbers are stable
    step = jax.jit(T.make_train_step(
        cfg, tx, input_size=SIZE,
        compute_dtype=jnp.bfloat16 if hard else None,
        bn_stats=bn_stats), donate_argnums=(0,))

    rng = np.random.default_rng(seed)
    pool = [make_batch(rng, batch, hard=hard)
            for _ in range(80 if hard else 40)]  # fresh-ish data
    print(f"training {cfg.name} on synthetic shapes: {steps} steps, "
          f"batch {batch}, {SIZE}x{SIZE}, device {jax.devices()[0]}",
          flush=True)
    t0 = time.time()
    for i in range(steps):
        imgs, tr = pool[i % len(pool)]
        state, m = step(state, imgs, tr)
        if (i + 1) % 150 == 0 or i == 0:
            print(f"step {i+1:5d}: cost {float(m['cost']):9.2f} "
                  f"avg_iou {float(m['avg_iou']):.3f} "
                  f"obj {float(m['avg_obj']):.3f} "
                  f"({batch*(i+1)/(time.time()-t0):.0f} img/s)", flush=True)
    print(f"trained in {time.time()-t0:.0f}s", flush=True)

    folded = fold_params(state.params, state.batch_stats, cfg.bn_eps)

    # held-out scenes once; all evals run through the BATCHED prefetching
    # pipeline (eval/batched.py — the validate_detector-style loader)
    from yolo_tensorflow_tpu.eval.batched import detect_images
    erng = np.random.default_rng(777)
    scenes = [make_scene(erng, hard=hard) for _ in range(200 if hard else 100)]
    gts = [{
        "boxes": np.stack([(b[:, 0] - b[:, 2] / 2) * SIZE,
                           (b[:, 1] - b[:, 3] / 2) * SIZE,
                           (b[:, 0] + b[:, 2] / 2) * SIZE,
                           (b[:, 1] + b[:, 3] / 2) * SIZE], 1),
        "classes": b[:, 4].astype(np.int32)} for _, b in scenes]
    imgs_eval = [img for img, _ in scenes]

    def eval_batched(d, label):
        # warm the compile cache first so the img/s reflects steady-state
        # serving, not the one-time jit (~45 s through the axon tunnel)
        d.detect_batch(np.zeros((20, SIZE, SIZE, 3), np.uint8))
        t = time.time()
        results = detect_images(d, imgs_eval, batch_size=20,
                                num_workers=4)
        dt = time.time() - t
        dets = [{
            "boxes": np.asarray([r["box"] for r in res],
                                np.float32).reshape(-1, 4),
            "scores": np.asarray([r["score"] for r in res], np.float32),
            "classes": np.asarray([r["class_id"] for r in res], np.int32)}
            for res in results]
        out = evaluate_detections(dets, gts, len(classes))
        print(f"{label}: mAP@0.5 = {out['map']:.4f} "
              f"({len(imgs_eval)/dt:.0f} img/s batched eval)  per-class "
              f"{ {classes[c]: round(v, 3) for c, v in out['ap_per_class'].items()} }",
              flush=True)
        return out

    det = Detector(cfg, params=folded, conf_threshold=0.3,
                   iou_threshold=0.45, max_detections=10)
    out = eval_batched(det, "held-out")

    # flip-TTA eval (validate_detector_flip / region TTA) — measured delta
    for mode in ("darknet", "corrected"):
        det_tta = Detector(cfg, params=folded, conf_threshold=0.3,
                           iou_threshold=0.45, max_detections=10,
                           tta=True, tta_mode=mode)
        out_t = eval_batched(det_tta, f"flip-TTA[{mode}]")
        print(f"  flip-TTA[{mode}] mAP delta {out_t['map'] - out['map']:+.4f}",
              flush=True)

    # int8: calibrate on training scenes, quantize, re-evaluate
    from yolo_tensorflow_tpu.ops import quant as Q
    specs = C.build_specs(cfg)
    calib = [pool[i][0][:8] for i in range(8)]
    scales = Q.calibrate_activations(specs, folded, calib, cfg=cfg)
    qparams = Q.quantize_params(specs, folded, scales)
    det_q = Detector(cfg, params=qparams, conf_threshold=0.3,
                     iou_threshold=0.45, max_detections=10)
    out_q = eval_batched(det_q, "int8 (w8a8)")
    print(f"int8 mAP delta {out_q['map'] - out['map']:+.4f}", flush=True)

    # QAT: fine-tune the SAME trained weights against the int8 lattice
    # (ops/qat.py), export on the tracked scales, re-evaluate — the PTQ
    # accuracy price should come back
    from yolo_tensorflow_tpu.ops import qat as QA
    ft_steps = max(200, steps // 5)
    tx_ft = T.make_optimizer(T.darknet_lr_schedule(1e-4, burn_in=20),
                             weight_decay=5e-4)
    state_q = T.TrainState(
        params=state.params, batch_stats=state.batch_stats,
        opt_state=tx_ft.init(state.params), step=jnp.int32(0),
        rng=jax.random.PRNGKey(7 + seed), qat_scales=QA.init_scales(specs))
    step_q = jax.jit(T.make_train_step(
        cfg, tx_ft, input_size=SIZE,
        compute_dtype=jnp.bfloat16 if hard else None,
        bn_stats=bn_stats), donate_argnums=(0,))
    t0 = time.time()
    for i in range(ft_steps):
        imgs, tr = pool[i % len(pool)]
        state_q, mq = step_q(state_q, imgs, tr)
    print(f"QAT fine-tune: {ft_steps} steps in {time.time()-t0:.0f}s "
          f"(cost {float(mq['cost']):.2f}, "
          f"{batch*ft_steps/(time.time()-t0):.0f} img/s)", flush=True)
    qat_params = QA.export_int8(
        specs, jax.tree.map(np.asarray, state_q.params),
        jax.tree.map(np.asarray, state_q.batch_stats),
        jax.tree.map(np.asarray, state_q.qat_scales), bn_eps=cfg.bn_eps)
    det_qat = Detector(cfg, params=qat_params, conf_threshold=0.3,
                       iou_threshold=0.45, max_detections=10)
    out_qat = eval_batched(det_qat, "int8 (QAT fine-tune)")
    print(f"QAT int8 mAP delta vs float {out_qat['map'] - out['map']:+.4f}"
          f", vs PTQ {out_qat['map'] - out_q['map']:+.4f}", flush=True)
    return out["map"]


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1200,
         model=sys.argv[2] if len(sys.argv) > 2 else "yolov3-tiny",
         hard="hard" in sys.argv[3:],
         bn_stats="onepass" if "onepass" in sys.argv[3:] else "twopass",
         seed=next((int(a[5:]) for a in sys.argv[3:]
                    if a.startswith("seed=")), 0))
