"""Int8 (w8a8) quantized serving path.

The v5e MXU runs int8 x int8 -> int32 convolutions faster than bf16 — by
a shape-dependent 1.1-1.6x through XLA (3x3 convs gain the most, 1x1
squeeze convs barely move), a measured ~1.55x over the whole Darknet-53
mix and ~1.38x end-to-end with decode+NMS. The full profile, HLO fusion
evidence, and the ceiling analysis live in PERF_INT8.md. This module adds
post-training quantization:

  * per-output-channel symmetric weight scales  s_w[o] = max|w[...,o]|/127
  * per-layer static activation scales          s_x = calibrated max|x|/127
  * conv: q(x) (VPU) -> int8 conv (MXU, int32 accum) -> dequant + bias +
    leaky (VPU, fused by XLA into the conv epilogue) -> bf16 out

Everything between convs (pools, residual adds, concats, upsample, decode,
NMS) stays bf16/f32; only the MXU operands are int8, which is where the
speedup lives. Head convs (the 1x1 detect layers) are kept full precision
by default — standard practice, box regression is scale-sensitive.

Calibration records per-conv-input absolute-max over representative batches
(ops.quant.calibrate_activations), the moral equivalent of darknet's own
"quantize by observed range" folklore — the reference has no quantization
story at all.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tensorflow_tpu.models import engine, specs as S


def head_conv_layers(specs) -> set:
    """Indices of convs feeding a Detect marker (kept unquantized)."""
    out = set()
    for i, spec in enumerate(specs):
        if isinstance(spec, S.Detect) and i > 0:
            out.add(i - 1)
    return out


def calibrate_activations(specs, params, batches, *, cfg,
                          percentile: float = 99.9) -> Dict[str, float]:
    """Run f32 inference over calibration batches, recording the
    per-conv-input activation range. batches: iterable of uint8 (B,H,W,3).
    Returns {layer_key: scale} with scale = range/127."""
    from yolo_tensorflow_tpu.pipeline import normalize_images

    maxes: Dict[str, float] = {}

    def record(key, arr):
        v = float(np.percentile(np.abs(np.asarray(arr, np.float32)),
                                percentile))
        maxes[key] = max(maxes.get(key, 0.0), v)

    for images in batches:
        x = normalize_images(jnp.asarray(images), cfg)
        outputs = []
        cur = x
        for i, spec in enumerate(specs):
            if isinstance(spec, S.Conv):
                record(engine.layer_key(i), cur)
            cur = _apply_one(specs, spec, i, params, cur, outputs, cfg)
            outputs.append(cur)
    return {k: max(v, 1e-6) / 127.0 for k, v in maxes.items()}


def _apply_one(specs, spec, i, params, cur, outputs, cfg):
    """Single-layer step reusing the engine's op set (f32 path)."""
    from yolo_tensorflow_tpu.ops import layers as L

    def fetch(ref):
        return outputs[S.resolve_ref(ref, i)]

    if isinstance(spec, S.Conv):
        pad = None if spec.pad < 0 else spec.pad
        p = params[engine.layer_key(i)]
        cur = L.conv2d(cur, p["w"], p["b"], stride=spec.stride, pad=pad)
        return engine._activate(cur, spec.act)
    if isinstance(spec, S.MaxPool):
        return L.max_pool(cur, spec.size, spec.stride)
    if isinstance(spec, S.Route):
        ts = [fetch(r) for r in spec.refs]
        return ts[0] if len(ts) == 1 else jnp.concatenate(ts, axis=-1)
    if isinstance(spec, S.Shortcut):
        return cur + fetch(spec.ref)
    if isinstance(spec, S.Reorg):
        fn = L.darknet_reorg if spec.mode == "darknet" else L.space_to_depth
        return fn(cur, spec.stride)
    if isinstance(spec, S.Upsample):
        fn = (L.upsample_nearest if spec.mode == "nearest"
              else L.upsample_bilinear_sym)
        return fn(cur, spec.factor)
    if isinstance(spec, S.TransposeFlatten):
        return L.transpose_flatten(cur)
    if isinstance(spec, S.Dense):
        p = params[engine.layer_key(i)]
        return engine._activate(L.dense(cur, p["w"], p["b"], None),
                                spec.act)
    if isinstance(spec, S.GlobalAvgPool):
        return jnp.mean(cur, axis=(1, 2))
    if isinstance(spec, S.Softmax):
        return jax.nn.softmax(cur, axis=-1)
    if isinstance(spec, (S.Dropout, S.Detect)):
        return cur  # inference no-ops
    # silently skipping a layer (e.g. recurrent or the exotic classifier
    # family) would corrupt downstream scales with no signal
    raise TypeError(
        f"layer {i}: {type(spec).__name__} is not supported by the int8 "
        "calibration path (quantization targets the conv detection nets); "
        "serve this model through engine.apply instead")


def quantize_params(specs, folded_params, act_scales: Dict[str, float], *,
                    skip: Optional[set] = None):
    """Folded f32 params -> mixed pytree: quantized convs carry
    {"w_q" int8 HWIO, "s_w" (Co,) f32, "s_x" () f32, "b" f32}; skipped
    convs and dense layers pass through unchanged."""
    skip = head_conv_layers(specs) if skip is None else skip
    out = {}
    for i, spec in enumerate(specs):
        key = engine.layer_key(i)
        if key not in folded_params:
            continue
        p = folded_params[key]
        if (isinstance(spec, S.Conv) and i not in skip
                and key in act_scales):
            w = np.asarray(p["w"], np.float32)
            s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8) / 127.0
            w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
            out[key] = {"w_q": w_q, "s_w": s_w.astype(np.float32),
                        "s_x": np.float32(act_scales[key]),
                        "b": np.asarray(p["b"], np.float32)}
        else:
            out[key] = {k: np.asarray(v) for k, v in p.items()}
    return out


def conv2d_int8(x, w_q, s_x, s_w, b, *, stride=1, pad=None,
                epilogue_dtype=jnp.bfloat16):
    """Quantize input, int8 MXU conv with int32 accumulation, dequantize +
    bias. x: float (any precision).

    The dequant epilogue runs in bfloat16 by default: measured on v5e
    (tools/int8_ablate.py, yolov3-416 backbone, batch 256) the f32
    epilogue gives 3240 img/s, bf16 3288, and stripping the epilogue
    entirely only 3612 — i.e. the whole dequant+bias+leaky+requant chain
    costs ~10% and XLA output-fuses it into the conv either way (verified
    in the optimized HLO: the s32 accumulator never round-trips HBM; the
    fusion emits s8 directly when the consumer is the next quantized
    conv). The precision cost of bf16 dequant is below the int8
    quantization noise floor. Returns ``epilogue_dtype``."""
    from jax import lax
    k = w_q.shape[0]
    if pad is None:
        pad = k // 2
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127) \
        .astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq, w_q, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    sc = (s_x * s_w).astype(epilogue_dtype)
    return acc.astype(epilogue_dtype) * sc + b.astype(epilogue_dtype)


# ---------------------------------------------------------------------------
# Full int8-activation inference: int8 tensors BETWEEN layers
#
# Measured on v5e at yolov3-416: SLOWER than the mixed path above
# (batch 256: 2825 vs 2916 img/s; batch 128: 2645 vs 2850). int8 tensors
# carry (32, 128) tile constraints that force relayouts around
# pools/concats, and the round+clip requant chains cost more VPU time than
# the bf16 casts they replace — the mixed path's input-quantize is already
# fused into the conv prologue. Kept as a parity-tested alternative
# (tests/test_quant.py) and a baseline for future work; the mixed path is
# the production default.
# ---------------------------------------------------------------------------

def calibrate_outputs(specs, params, batches, *, cfg,
                      percentile: float = 99.9) -> Dict[int, float]:
    """Record per-LAYER-OUTPUT activation scales (plus the network input as
    index -1) for the int8-activation pipeline."""
    from yolo_tensorflow_tpu.pipeline import normalize_images

    maxes: Dict[int, float] = {}

    def record(i, arr):
        v = float(np.percentile(np.abs(np.asarray(arr, np.float32)),
                                percentile))
        maxes[i] = max(maxes.get(i, 0.0), v)

    for images in batches:
        x = normalize_images(jnp.asarray(images), cfg)
        record(-1, x)
        outputs = []
        cur = x
        for i, spec in enumerate(specs):
            cur = _apply_one(specs, spec, i, params, cur, outputs, cfg)
            if isinstance(spec, (S.Conv, S.Route, S.Shortcut)):
                record(i, cur)
            outputs.append(cur)
    return {k: max(v, 1e-6) / 127.0 for k, v in maxes.items()}


def _requant(x_f32, s_out):
    return jnp.clip(jnp.round(x_f32 / s_out), -127, 127).astype(jnp.int8)


def apply_int8(specs, qparams, out_scales: Dict[int, float], x_norm, *,
               skip: Optional[set] = None):
    """Fully int8-activation forward pass: activations stay int8 between
    layers (halving inter-layer HBM traffic vs bf16 and eliminating the
    per-conv re-quantize of the mixed path). Pools/upsample/reorg operate
    on int8 directly (scale-invariant); adds/concats and activations happen
    in f32 fused into the adjacent conv epilogues.

    x_norm: normalized float input (B,H,W,3). Returns the engine-style
    [(feature_map_f32, Detect)] list. Head convs (``skip``) run in f32.
    """
    from jax import lax
    from yolo_tensorflow_tpu.ops import layers as L

    skip = head_conv_layers(specs) if skip is None else skip
    outputs = []   # (tensor, scale) — scale None => float tensor
    detections = []

    def fetch(ref, i):
        r = S.resolve_ref(ref, i)
        return (_requant(x_norm.astype(jnp.float32), out_scales[-1]),
                out_scales[-1]) if r == S.INPUT else outputs[r]

    def to_float(t, s):
        return t if s is None else t.astype(jnp.float32) * s

    cur = _requant(x_norm.astype(jnp.float32), out_scales[-1])
    cur_s = out_scales[-1]
    for i, spec in enumerate(specs):
        if isinstance(spec, S.Conv):
            key = engine.layer_key(i)
            p = qparams[key]
            pad = spec.pad if spec.pad >= 0 else spec.size // 2
            if "w_q" in p and cur_s is not None and i not in skip:
                xq = cur  # already int8
                acc = lax.conv_general_dilated(
                    xq, p["w_q"], (spec.stride, spec.stride),
                    ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * (cur_s * p["s_w"]) + p["b"]
            else:
                xf = to_float(cur, cur_s)
                w = p["w_q"].astype(jnp.float32) * p["s_w"] \
                    if "w_q" in p else p["w"]
                y = L.conv2d(xf, w, p["b"], stride=spec.stride,
                             pad=spec.pad if spec.pad >= 0 else None)
            if spec.act == "leaky":
                y = L.leaky_relu(y)
            elif spec.act == "logistic":
                y = jax.nn.sigmoid(y)
            if i in out_scales and i not in skip:
                cur, cur_s = _requant(y, out_scales[i]), out_scales[i]
            else:
                cur, cur_s = y, None
        elif isinstance(spec, S.MaxPool):
            cur = L.max_pool(cur, spec.size, spec.stride)  # int8-safe (max)
        elif isinstance(spec, S.Route):
            parts = [fetch(r, i) for r in spec.refs]
            if len(parts) == 1:
                cur, cur_s = parts[0]
            else:
                s_out = out_scales[i]
                qs = [p[0] if (p[1] is not None and
                               abs(p[1] - s_out) < 1e-12)
                      else _requant(to_float(*p), s_out) for p in parts]
                cur, cur_s = jnp.concatenate(qs, axis=-1), s_out
        elif isinstance(spec, S.Shortcut):
            other = fetch(spec.ref, i)
            y = to_float(cur, cur_s) + to_float(*other)
            s_out = out_scales[i]
            cur, cur_s = _requant(y, s_out), s_out
        elif isinstance(spec, S.Reorg):
            fn = (L.darknet_reorg if spec.mode == "darknet"
                  else L.space_to_depth)
            cur = fn(cur, spec.stride)  # permutation: int8-safe
        elif isinstance(spec, S.Upsample):
            if spec.mode == "nearest":
                cur = L.upsample_nearest(cur, spec.factor)  # int8-safe
            else:
                cur = L.upsample_bilinear_sym(
                    to_float(cur, cur_s), spec.factor)
                cur_s = None
        elif isinstance(spec, S.Detect):
            detections.append((to_float(cur, cur_s), spec))
        else:
            # flatten/dense/dropout/avgpool/softmax: float domain
            cur = to_float(cur, cur_s)
            cur_s = None
            cur = _apply_one(specs, spec, i, qparams, cur,
                             [to_float(*o) for o in outputs], None)
        outputs.append((cur, cur_s))
    return detections


def make_int8_forward(cfg, specs, out_scales, **nms_kwargs):
    """Full int8-activation detection forward:
    (qparams, uint8 images) -> Detections. Same contract as
    pipeline.make_forward; decode + NMS stay float."""
    from yolo_tensorflow_tpu.models import heads
    from yolo_tensorflow_tpu.pipeline import normalize_images
    from yolo_tensorflow_tpu.post import nms as NMS

    max_det = nms_kwargs.pop("max_detections", cfg.max_detections)
    conf_t = nms_kwargs.pop("conf_threshold", cfg.conf_threshold)
    iou_t = nms_kwargs.pop("iou_threshold", cfg.iou_threshold)
    num_candidates = nms_kwargs.pop("num_candidates", 256)
    class_aware = nms_kwargs.pop("class_aware_nms", cfg.class_aware_nms)

    def forward(qparams, images_uint8):
        x = normalize_images(images_uint8, cfg)
        dets = apply_int8(specs, qparams, out_scales, x)
        boxes_xywh, conf, probs = heads.decode(dets, cfg)
        boxes = heads.xywh_to_xyxy(boxes_xywh)
        return NMS.batched_nms(
            boxes, conf, probs, conf_threshold=conf_t, iou_threshold=iou_t,
            max_detections=max_det, num_candidates=num_candidates,
            class_aware=class_aware)

    return forward
