"""Anchor/grid decode heads, batched and static-shape (runs inside jit).

Reproduces the reference decode math exactly:
  v1 grid head      YOLO_V1_Inference.py:213-270 (_build_detector)
  v2 region head    YOLO_V2/.../decode.py:13-48 and postprocess.py:10-84
  v3 ratio head     YOLOV3.py:168-238 (_ratio_detection_layer) + :344-351
All outputs are in normalized image coordinates (0..1):
  boxes_xywh (B, N, 4) center-x, center-y, w, h
  conf       (B, N)
  class_probs(B, N, C)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu.config import ModelConfig


def decode_v1(pred_flat, cfg: ModelConfig):
    """pred_flat: (B, S*S*(C + B*1 + B*4)) from the FC head.

    Layout (YOLO_V1_Inference.py:219-228): class probs first (S*S*C), then
    confidences (S*S*B), then boxes (S*S*B*4) with (x, y, sqrt-w, sqrt-h);
    x,y are cell offsets, w,h are sqrt of normalized size.
    """
    S, Bx, C = cfg.grid, cfg.boxes_per_cell, cfg.num_classes
    pred_flat = pred_flat.astype(jnp.float32)
    batch = pred_flat.shape[0]
    i1 = S * S * C
    i2 = i1 + S * S * Bx
    class_probs = pred_flat[:, :i1].reshape(batch, S, S, 1, C)
    confs = pred_flat[:, i1:i2].reshape(batch, S, S, Bx)
    boxes = pred_flat[:, i2:].reshape(batch, S, S, Bx, 4)

    col = jax.lax.broadcasted_iota(jnp.float32, (S, S, Bx), 1)  # x offset = column
    row = jax.lax.broadcasted_iota(jnp.float32, (S, S, Bx), 0)  # y offset = row
    x = (boxes[..., 0] + col) / S
    y = (boxes[..., 1] + row) / S
    w = jnp.square(boxes[..., 2])
    h = jnp.square(boxes[..., 3])
    boxes_xywh = jnp.stack([x, y, w, h], axis=-1).reshape(batch, S * S * Bx, 4)
    conf = confs.reshape(batch, S * S * Bx)
    class_probs = jnp.broadcast_to(
        class_probs, (batch, S, S, Bx, C)).reshape(batch, S * S * Bx, C)
    return boxes_xywh, conf, class_probs


def decode_v2(feat, cfg: ModelConfig):
    """feat: (B, H, W, A*(5+C)) raw conv output.

    Per-cell layout is anchor-major blocks of (x, y, w, h, obj, classes).
    xy sigmoid cell offsets; wh = exp * anchor (grid units); obj sigmoid;
    classes softmax (decode.py:24-28).
    """
    A, C = cfg.num_anchors, cfg.num_classes
    batch, H, W, _ = feat.shape
    det = feat.astype(jnp.float32).reshape(batch, H * W, A, 5 + C)

    xy = jax.nn.sigmoid(det[..., 0:2])
    wh = jnp.exp(det[..., 2:4])
    conf = jax.nn.sigmoid(det[..., 4])
    class_probs = jax.nn.softmax(det[..., 5:], axis=-1)

    col = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(1, H * W, 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(1, H * W, 1)
    anchors = jnp.asarray(cfg.anchors, jnp.float32)  # grid units

    bx = (col + xy[..., 0]) / W
    by = (row + xy[..., 1]) / H
    bw = anchors[:, 0] * wh[..., 0] / W
    bh = anchors[:, 1] * wh[..., 1] / H
    boxes_xywh = jnp.stack([bx, by, bw, bh], axis=-1)

    n = H * W * A
    return (boxes_xywh.reshape(batch, n, 4), conf.reshape(batch, n),
            class_probs.reshape(batch, n, C))


def activate_v2(feat, cfg: ModelConfig):
    """Region-layer activation (forward_region_layer, region_layer.c:163):
    sigmoid xy/obj, per-anchor softmax classes, raw wh. (B,H,W,A*(5+C)) ->
    same shape, activated — the l.output buffer get_region_detections
    reads."""
    A, C = cfg.num_anchors, cfg.num_classes
    B, H, W, _ = feat.shape
    det = feat.astype(jnp.float32).reshape(B, H, W, A, 5 + C)
    out = jnp.concatenate([
        jax.nn.sigmoid(det[..., 0:2]), det[..., 2:4],
        jax.nn.sigmoid(det[..., 4:5]),
        jax.nn.softmax(det[..., 5:], axis=-1)], -1)
    return out.reshape(B, H, W, A * (5 + C))


def region_flip_tta(act, act_flipped, cfg: ModelConfig,
                    mode: str = "darknet"):
    """Average an activated region output with the activated output of the
    horizontally flipped image — get_region_detections' batch==2 path
    (src/region_layer.c:368-390).

    mode='darknet' is the literal C loop, including ALL of its quirks:
    (1) it negates "z==0" under a [entry][anchor][hw] indexing while the
    layer buffer is laid out [anchor][entry][hw] (entry_index,
    region_layer.c:151) — so the planes actually negated are anchor 0's
    first A entries (x,y,w,h,obj for the 5-anchor v2 models), not every
    anchor's x; (2) the negation runs on the ALREADY-ACTIVATED sigmoid
    values; (3) the swap loop runs ``i < w/2``, so for ODD widths (13 at
    416!) the middle column is never negated. mode='corrected' mirrors
    properly: every anchor's x becomes 1-sigmoid(tx) (the reflected cell
    offset) and nothing else is negated.

    Both inputs/outputs are (B, H, W, A*(5+C)) activated tensors.
    """
    A, C = cfg.num_anchors, cfg.num_classes
    B, H, W, _ = act.shape
    E = 5 + C
    flip = act_flipped.reshape(B, H, W, A, E)[:, :, ::-1]   # column swap
    if mode == "darknet":
        flip = _negate_flip_planes(flip, A, E, W)
    elif mode == "corrected":
        flip = flip.at[..., 0].set(1.0 - flip[..., 0])
    else:
        raise ValueError(mode)
    avg = (act.reshape(B, H, W, A, E) + flip) / 2.0
    return avg.reshape(B, H, W, A * E)


def _negate_flip_planes(flip, A, E, W):
    """The C flip loops' negation (region_layer.c:379, yolo_layer.c:303):
    negate true-layout planes p = a*E + e with p < A (its 'z==0' under the
    wrong indexing) — EXCEPT the middle column when W is odd, which the
    ``i < w/2`` loop never touches. flip: (B, H, W, A, E)."""
    plane = (jax.lax.broadcasted_iota(jnp.int32, (A, E), 0) * E
             + jax.lax.broadcasted_iota(jnp.int32, (A, E), 1))
    neg = (plane < A)[None, None, None, :, :]
    if W % 2 == 1:
        col = jax.lax.broadcasted_iota(jnp.int32, (W,), 0)
        neg = neg & (col != W // 2)[None, None, :, None, None]
    return jnp.where(neg, -flip, flip)


def decode_v2_activated(act, cfg: ModelConfig):
    """decode_v2 for an ALREADY-ACTIVATED (possibly TTA-averaged) region
    output — the get_region_box math without re-activating."""
    A, C = cfg.num_anchors, cfg.num_classes
    batch, H, W, _ = act.shape
    det = act.astype(jnp.float32).reshape(batch, H * W, A, 5 + C)
    xy = det[..., 0:2]
    wh = jnp.exp(det[..., 2:4])
    conf = det[..., 4]
    class_probs = det[..., 5:]
    col = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(1, H * W, 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(1, H * W, 1)
    anchors = jnp.asarray(cfg.anchors, jnp.float32)
    bx = (col + xy[..., 0]) / W
    by = (row + xy[..., 1]) / H
    bw = anchors[:, 0] * wh[..., 0] / W
    bh = anchors[:, 1] * wh[..., 1] / H
    boxes_xywh = jnp.stack([bx, by, bw, bh], axis=-1)
    n = H * W * A
    return (boxes_xywh.reshape(batch, n, 4), conf.reshape(batch, n),
            class_probs.reshape(batch, n, C))


def activate_v3(feat, num_anchors: int, num_classes: int):
    """Yolo-layer activation (forward_yolo_layer, src/yolo_layer.c:132-144
    / :352-361 GPU): sigmoid on xy, obj and classes; raw wh. (B,H,W,A*(5+C))
    -> same shape, activated — the l.output buffer get_yolo_detections
    reads."""
    A, C = num_anchors, num_classes
    B, H, W, _ = feat.shape
    det = feat.astype(jnp.float32).reshape(B, H, W, A, 5 + C)
    out = jnp.concatenate([
        jax.nn.sigmoid(det[..., 0:2]), det[..., 2:4],
        jax.nn.sigmoid(det[..., 4:])], -1)
    return out.reshape(B, H, W, A * (5 + C))


def yolo_flip_tta(act, act_flipped, num_anchors: int, num_classes: int,
                  mode: str = "darknet"):
    """Average an activated yolo-scale output with the activated output of
    the horizontally flipped image — avg_flipped_yolo
    (src/yolo_layer.c:290-313), run by get_yolo_detections when batch==2
    (the validate_detector_flip 'valid2' eval, examples/detector.c:234).

    The C loop is structurally identical to the region one, with the same
    three quirks (see region_flip_tta): under the true [anchor][entry]
    layout the negated planes p < A are anchor 0's x,y,w entries for the
    3-anchor-per-scale v3 heads, the negation acts on activated values,
    and the odd-width middle column is skipped. mode='corrected' mirrors
    properly instead (every anchor's x -> 1-sigmoid(tx)).

    act, act_flipped: (B, H, W, A*(5+C)) activated tensors.
    """
    A, C = num_anchors, num_classes
    B, H, W, _ = act.shape
    E = 5 + C
    flip = act_flipped.reshape(B, H, W, A, E)[:, :, ::-1]
    if mode == "darknet":
        flip = _negate_flip_planes(flip, A, E, W)
    elif mode == "corrected":
        flip = flip.at[..., 0].set(1.0 - flip[..., 0])
    else:
        raise ValueError(mode)
    avg = (act.reshape(B, H, W, A, E) + flip) / 2.0
    return avg.reshape(B, H, W, A * E)


def decode_v3_scale_activated(act, anchors_px, input_size: int,
                              num_classes: int):
    """decode_v3_scale for an ALREADY-ACTIVATED (possibly TTA-averaged)
    yolo output: xy/conf/classes are sigmoids already, wh still raw.
    Returns (boxes_xywh (B,N,4), scores (B,N), labels (B,N)) with
    score = conf * best class prob (get_yolo_detections' objectness*prob,
    src/yolo_layer.c:334-338)."""
    A, C = len(anchors_px), num_classes
    batch, Gh, Gw, _ = act.shape
    det = act.astype(jnp.float32).reshape(batch, Gh * Gw, A, 5 + C)
    xy = det[..., 0:2]
    wh = jnp.exp(det[..., 2:4])
    conf = det[..., 4]
    probs = det[..., 5:]
    col = jax.lax.broadcasted_iota(jnp.float32, (Gh, Gw), 1) \
        .reshape(1, Gh * Gw, 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (Gh, Gw), 0) \
        .reshape(1, Gh * Gw, 1)
    stride = input_size // Gh
    anchors = jnp.asarray(anchors_px, jnp.float32) / stride
    bx = (col + xy[..., 0]) / Gw
    by = (row + xy[..., 1]) / Gh
    bw = anchors[:, 0] * wh[..., 0] / Gw
    bh = anchors[:, 1] * wh[..., 1] / Gh
    boxes = jnp.stack([bx, by, bw, bh], -1)
    scores = conf * jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    n = Gh * Gw * A
    return (boxes.reshape(batch, n, 4), scores.reshape(batch, n),
            labels.reshape(batch, n))


def decode_v3_scale(feat, anchors_px, input_size: int, num_classes: int,
                    score_dtype=jnp.float32):
    """One FPN scale (YOLOV3.py:168-238): feat (B, G, G, A*(5+C)).

    Box layout per cell is anchor-major; centers = (sigmoid + cell)/G;
    sizes = exp * anchor_in_grid_units / G; conf and classes sigmoid.
    score_dtype=bfloat16 computes conf/class sigmoids in bf16 (boxes stay
    f32) — a serving knob worth ~3% e2e on v5e at int8-416 (the (N, C)
    score tensor halves); score granularity 2^-9, well under int8
    quantization noise.
    """
    A = len(anchors_px)
    C = num_classes
    batch, Gh, Gw, _ = feat.shape
    det = feat.astype(jnp.float32).reshape(batch, Gh * Gw, A, 5 + C)

    xy = jax.nn.sigmoid(det[..., 0:2])
    wh = jnp.exp(det[..., 2:4])
    conf = jax.nn.sigmoid(det[..., 4].astype(score_dtype))
    class_probs = jax.nn.sigmoid(det[..., 5:].astype(score_dtype))

    col = jax.lax.broadcasted_iota(jnp.float32, (Gh, Gw), 1).reshape(1, Gh * Gw, 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (Gh, Gw), 0).reshape(1, Gh * Gw, 1)
    stride = input_size // Gh
    anchors = jnp.asarray(anchors_px, jnp.float32) / stride  # grid units

    bx = (col + xy[..., 0]) / Gw
    by = (row + xy[..., 1]) / Gh
    bw = anchors[:, 0] * wh[..., 0] / Gw
    bh = anchors[:, 1] * wh[..., 1] / Gh
    boxes_xywh = jnp.stack([bx, by, bw, bh], axis=-1)

    n = Gh * Gw * A
    return (boxes_xywh.reshape(batch, n, 4), conf.reshape(batch, n),
            class_probs.reshape(batch, n, C))


def decode(detections, cfg: ModelConfig, score_dtype=jnp.float32):
    """Decode the engine's list of (feature_map, Detect) into normalized
    (boxes_xywh, conf, class_probs), concatenating FPN scales in spec order
    (v3: 13² then 26² then 52², matching YOLOV3.py:344)."""
    if cfg.head == 1:
        (feat, _), = detections
        return decode_v1(feat, cfg)
    if cfg.head == 2:
        (feat, _), = detections
        return decode_v2(feat, cfg)
    parts = []
    for feat, det in detections:
        anchors = [cfg.anchors[i] for i in det.anchor_mask]
        parts.append(decode_v3_scale(feat, anchors, cfg.input_size,
                                     cfg.num_classes,
                                     score_dtype=score_dtype))
    boxes = jnp.concatenate([p[0] for p in parts], axis=1)
    conf = jnp.concatenate([p[1] for p in parts], axis=1)
    probs = jnp.concatenate([p[2] for p in parts], axis=1)
    return boxes, conf, probs


def decode_scored(detections, cfg: ModelConfig, score_dtype=jnp.float32):
    """decode + reference scoring (score = conf * best class prob, label =
    argmax) WITHOUT materializing the (N, C) class-prob tensor — the
    serving fast path.

    Monotonicity makes it exact, not approximate: for v3's independent
    sigmoids, max_c sigmoid(l_c) == sigmoid(max_c l_c) and
    argmax_c sigmoid(l_c) == argmax_c l_c, so one (N, C) -> N max/argmax
    reduction over the RAW logits replaces the N*C sigmoid evaluations
    (at yolov3-416 that is 10647*80 transcendentals per image the VPU
    never runs — measured ~5% e2e on v5e at int8 batch 256). v2's
    softmax-class equivalent: best prob = 1/sum_c exp(l_c - max_c l_c);
    v1's class outputs are raw, so max/argmax apply directly. Scoring is
    bit-identical to decode()+batched_nms at f32 (same ops on the same
    elements, minus the discarded non-max lanes). Under
    score_dtype=bfloat16, label ties that exist only because two bf16
    SIGMOIDS round equal resolve by the (more precise) bf16 logits here —
    strictly better, but not bit-equal to argmaxing the rounded sigmoids.

    Returns (boxes_xywh (B,N,4), scores (B,N), labels (B,N) int32).
    """
    if cfg.head == 1:
        (feat, _), = detections
        boxes, conf, raw = decode_v1(feat, cfg)     # raw class outputs
        labels = jnp.argmax(raw, axis=-1).astype(jnp.int32)
        scores = (conf * jnp.max(raw, axis=-1)).astype(jnp.float32)
        return boxes, scores, labels
    if cfg.head == 2:
        (feat, _), = detections
        A, C = cfg.num_anchors, cfg.num_classes
        batch, H, W, _ = feat.shape
        det = feat.astype(jnp.float32).reshape(batch, H * W, A, 5 + C)
        logits = det[..., 5:]
        m = jnp.max(logits, axis=-1)
        labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # softmax's best prob without the (N, C) normalize:
        best_prob = 1.0 / jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)
        conf = jax.nn.sigmoid(det[..., 4])
        scores = (conf * best_prob).reshape(batch, H * W * A)
        boxes = _decode_v2_boxes(det, cfg, H, W) \
            .reshape(batch, H * W * A, 4)
        return boxes, scores.astype(jnp.float32), \
            labels.reshape(batch, H * W * A)
    boxes_p, scores_p, labels_p = [], [], []
    for feat, det in detections:
        anchors = [cfg.anchors[i] for i in det.anchor_mask]
        A, C = len(anchors), cfg.num_classes
        batch, Gh, Gw, _ = feat.shape
        d = feat.astype(jnp.float32).reshape(batch, Gh * Gw, A, 5 + C)
        logits = d[..., 5:].astype(score_dtype)
        m = jnp.max(logits, axis=-1)
        labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        conf = jax.nn.sigmoid(d[..., 4].astype(score_dtype))
        scores = conf * jax.nn.sigmoid(m)
        n = Gh * Gw * A
        boxes_p.append(_decode_v3_boxes(d, anchors, Gh, Gw,
                                        cfg.input_size).reshape(batch, n, 4))
        scores_p.append(scores.reshape(batch, n).astype(jnp.float32))
        labels_p.append(labels.reshape(batch, n))
    return (jnp.concatenate(boxes_p, axis=1),
            jnp.concatenate(scores_p, axis=1),
            jnp.concatenate(labels_p, axis=1))


def _decode_v2_boxes(det, cfg, H, W):
    """Box-only slice of decode_v2's math (det (B,H*W,A,5+C) f32) —
    identical ops, no conf/class work materialized."""
    xy = jax.nn.sigmoid(det[..., 0:2])
    wh = jnp.exp(det[..., 2:4])
    col = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) \
        .reshape(1, H * W, 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) \
        .reshape(1, H * W, 1)
    anchors = jnp.asarray(cfg.anchors, jnp.float32)
    bx = (col + xy[..., 0]) / W
    by = (row + xy[..., 1]) / H
    bw = anchors[:, 0] * wh[..., 0] / W
    bh = anchors[:, 1] * wh[..., 1] / H
    return jnp.stack([bx, by, bw, bh], axis=-1)


def _decode_v3_boxes(det, anchors_px, Gh, Gw, input_size):
    """Box-only slice of decode_v3_scale's math (det (B,G*G,A,5+C) f32) —
    identical ops, no conf/class work."""
    xy = jax.nn.sigmoid(det[..., 0:2])
    wh = jnp.exp(det[..., 2:4])
    col = jax.lax.broadcasted_iota(jnp.float32, (Gh, Gw), 1) \
        .reshape(1, Gh * Gw, 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (Gh, Gw), 0) \
        .reshape(1, Gh * Gw, 1)
    stride = input_size // Gh
    anchors = jnp.asarray(anchors_px, jnp.float32) / stride  # grid units
    bx = (col + xy[..., 0]) / Gw
    by = (row + xy[..., 1]) / Gh
    bw = anchors[:, 0] * wh[..., 0] / Gw
    bh = anchors[:, 1] * wh[..., 1] / Gh
    return jnp.stack([bx, by, bw, bh], axis=-1)


def xywh_to_xyxy(boxes_xywh):
    xy, wh = boxes_xywh[..., :2], boxes_xywh[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)
