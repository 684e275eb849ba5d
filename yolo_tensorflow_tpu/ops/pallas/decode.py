"""Pallas TPU kernel: fused anchor decode + class scoring for YOLO heads.

The XLA path (models/heads.py + post/nms.py scoring) materializes three
HBM-sized intermediates per image: the sigmoid/exp-decoded attribute tensor,
the (N, C) class-probability tensor and the (N, C) class-specific score
tensor (~11 MB/image f32 for yolov3-416) before reducing to per-box
(score, label). At serving batch sizes that's GBs of HBM round trips for
what is a single VMEM-resident pass of VPU work.

This kernel reads one scale's raw head tensor tile-by-tile into VMEM and
emits only the reduced form the NMS stage consumes:
    boxes_xyxy (N, 4) normalized, score (N, 1) = sigmoid(obj) * max class
    prob, label (N, 1) = argmax class
computing sigmoid/exp, the cell-offset meshgrid, anchor scaling, corner
transform, max and argmax in-register. Grid = (batch,); each program
processes a full scale (padded to sublane multiples; 52x52x3 boxes x 128
lanes of attributes = 4 MB VMEM, well under the 16 MB budget).

Math is identical to models/heads.decode_v3_scale / decode_v2
(YOLOV3.py:168-238, decode.py:13-48); parity-gated against them in
tests/test_pallas_decode.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(raw_ref, boxes_ref, score_ref, label_ref, *,
                   grid_hw: int, num_anchors: int, num_classes: int,
                   anchors_grid: tuple, class_softmax: bool, valid_n: int,
                   tile: int):
    x = raw_ref[0].astype(jnp.float32)            # (tile, 5 + C)
    n_pad = x.shape[0]
    A, G, C = num_anchors, grid_hw, num_classes

    t = pl.program_id(1)
    cell_idx = t * tile + jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    anchor = cell_idx % A
    cell = cell_idx // A
    col = (cell % G).astype(jnp.float32)
    row = (cell // G).astype(jnp.float32)

    sx = jax.nn.sigmoid(x[:, 0:1])
    sy = jax.nn.sigmoid(x[:, 1:2])
    bx = (col + sx) / G
    by = (row + sy) / G

    aw = jnp.zeros((n_pad, 1), jnp.float32)
    ah = jnp.zeros((n_pad, 1), jnp.float32)
    for a, (w_a, h_a) in enumerate(anchors_grid):
        sel = anchor == a
        aw = jnp.where(sel, w_a, aw)
        ah = jnp.where(sel, h_a, ah)
    bw = jnp.exp(x[:, 2:3]) * aw / G
    bh = jnp.exp(x[:, 3:4]) * ah / G

    conf = jax.nn.sigmoid(x[:, 4:5])
    cls = x[:, 5:5 + C]
    if class_softmax:
        probs = jax.nn.softmax(cls, axis=-1)
    else:
        probs = jax.nn.sigmoid(cls)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    label = jnp.argmax(probs, axis=-1)[:, None].astype(jnp.int32)
    score = conf * pmax

    half_w, half_h = bw * 0.5, bh * 0.5
    boxes_ref[0] = jnp.concatenate(
        [bx - half_w, by - half_h, bx + half_w, by + half_h], axis=1)
    # sink padded rows so they can never win top-k
    valid = cell_idx < valid_n
    score_ref[0] = jnp.where(valid, score, -1.0)
    label_ref[0] = jnp.where(valid, label, 0)


def decode_scale_fused(feat, anchors_px, input_size: int, num_classes: int,
                       *, class_softmax: bool = False,
                       interpret: bool = False):
    """One head scale, fused: feat (B, G, G, A*(5+C)) ->
    (boxes_xyxy (B, N, 4), score (B, N), label (B, N)) with N = G*G*A."""
    B, Gh, Gw, ch = feat.shape
    assert Gh == Gw, "square grids only"
    C = num_classes
    A = ch // (5 + C)
    stride = input_size // Gh
    anchors_grid = tuple((float(w) / stride, float(h) / stride)
                         for (w, h) in anchors_px)
    n = Gh * Gw * A
    tile = min(-(-n // 8) * 8, 1024)        # VMEM-friendly cell tile
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile

    raw = feat.reshape(B, n, 5 + C)
    if n_pad != n:
        raw = jnp.pad(raw, ((0, 0), (0, n_pad - n), (0, 0)))

    kernel = functools.partial(
        _decode_kernel, grid_hw=Gh, num_anchors=A, num_classes=C,
        anchors_grid=anchors_grid, class_softmax=class_softmax, valid_n=n,
        tile=tile)
    boxes, score, label = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, tile, 5 + C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, tile, 4), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((B, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, n_pad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(raw)
    return boxes[:, :n], score[:, :n, 0], label[:, :n, 0]


def decode_fused(detections, cfg, *, interpret: bool = False):
    """All scales of a model, fused; concatenated in spec order like
    models/heads.decode. Returns (boxes_xyxy, scores, labels)."""
    parts = []
    for feat, det in detections:
        if cfg.head == 3:
            anchors = [cfg.anchors[i] for i in det.anchor_mask]
            softmax = False
        elif cfg.head == 2:
            # v2 anchors are already in grid units; convert to px so the
            # shared kernel's /stride lands back on grid units
            stride = cfg.input_size // feat.shape[1]
            anchors = [(w * stride, h * stride) for w, h in cfg.anchors]
            softmax = cfg.class_softmax
        else:
            raise NotImplementedError("fused decode covers v2/v3 heads")
        parts.append(decode_scale_fused(
            feat, anchors, cfg.input_size, cfg.num_classes,
            class_softmax=softmax, interpret=interpret))
    boxes = jnp.concatenate([p[0] for p in parts], axis=1)
    scores = jnp.concatenate([p[1] for p in parts], axis=1)
    labels = jnp.concatenate([p[2] for p in parts], axis=1)
    return boxes, scores, labels
