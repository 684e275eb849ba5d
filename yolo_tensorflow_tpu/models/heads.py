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


def decode_v3_scale(feat, anchors_px, input_size: int, num_classes: int):
    """One FPN scale (YOLOV3.py:168-238): feat (B, G, G, A*(5+C)).

    Box layout per cell is anchor-major; centers = (sigmoid + cell)/G;
    sizes = exp * anchor_in_grid_units / G; conf and classes sigmoid.
    """
    A = len(anchors_px)
    C = num_classes
    batch, Gh, Gw, _ = feat.shape
    det = feat.astype(jnp.float32).reshape(batch, Gh * Gw, A, 5 + C)

    xy = jax.nn.sigmoid(det[..., 0:2])
    wh = jnp.exp(det[..., 2:4])
    conf = jax.nn.sigmoid(det[..., 4])
    class_probs = jax.nn.sigmoid(det[..., 5:])

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


def decode(detections, cfg: ModelConfig):
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
                                     cfg.num_classes))
    boxes = jnp.concatenate([p[0] for p in parts], axis=1)
    conf = jnp.concatenate([p[1] for p in parts], axis=1)
    probs = jnp.concatenate([p[2] for p in parts], axis=1)
    return boxes, conf, probs


def xywh_to_xyxy(boxes_xywh):
    xy, wh = boxes_xywh[..., :2], boxes_xywh[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)
