"""Functional interpreter for layer specs: params pytree + pure apply fn.

Replaces the reference's graph builders and darknet's ``forward_network``
(src/network.c:188): one engine executes every model variant. Under ``jax.jit``
the whole spec unrolls into a single XLA computation, so there is no
per-layer dispatch at run time — the "network executor" IS the compiled
program.

Parameter pytree layout (dict keyed by zero-padded layer index):
  folded conv     {"w": HWIO, "b": (Cout,)}                (inference)
  unfolded conv   {"w": HWIO, "gamma", "beta"}             (training)
  bias-only conv  {"w": HWIO, "b"}                         (head convs, no BN)
  dense           {"w": (In, Out), "b": (Out,)}
Training-mode batch statistics live in a separate ``batch_stats`` pytree
{"Lxxx": {"mean", "var"}} (flax-style split of params vs. state).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from yolo_tensorflow_tpu.models import specs as S
from yolo_tensorflow_tpu.ops import layers as L


def layer_key(i: int) -> str:
    return f"L{i:03d}"


def _bn_stats(batch_stats, key):
    """Running stats for an unfolded-BN layer, with a descriptive error when
    the caller forgot to pass them (instead of 'NoneType is not
    subscriptable')."""
    if batch_stats is None or key not in batch_stats:
        raise ValueError(
            f"layer {key} carries unfolded batch-norm params (gamma/beta) "
            "but no batch_stats were supplied; pass the running mean/var "
            "pytree to engine.apply(..., batch_stats=...) or fold the "
            "params first (io.weights.fold_params)")
    return batch_stats[key]


def apply(specs, params, x, *, train: bool = False, batch_stats=None,
          bn_eps: float = 1e-5, compute_dtype=None, dropout_rng=None,
          bn_formula: str = "darknet", time_steps: int = 1,
          rec_state=None, bn_stats: str = "twopass", qat_scales=None):
    """Run the network.

    Args:
      specs: tuple of layer specs (models/specs.py).
      params: parameter pytree (see module docstring).
      x: (B, H, W, C) float input, already normalized.
      train: training mode — BN uses batch statistics (returned), dropout on.
      batch_stats: running BN stats pytree; required if params are unfolded
        and ``train=False``.
      bn_eps: batch-norm epsilon (per-model, from ModelConfig).
      compute_dtype: conv compute dtype (e.g. jnp.bfloat16); None = input dtype.
      dropout_rng: PRNG key, required when train=True and the spec has Dropout.
      bn_formula: unfolded inference-BN normalization — 'darknet'
        (gamma/(sqrt(var)+1e-6), what .weights-era stats expect) or 'tf'
        (gamma*rsqrt(var+eps), matching batch_norm_train — use for
        natively-trained params evaluated unfolded so train/deploy agree).
      time_steps: recurrent step count (darknet's net-level ``time_steps``,
        src/parser.c:650). Rows are step-major: x's leading dim is B*T.
      bn_stats: train-mode BN batch-stat form for the feedforward BN
        sites (conv, deconv, connected) — 'twopass' (darknet-exact
        E[(x-mean)^2]) or 'onepass' (E[x^2]-E[x]^2, one fused activation
        read; see ops/layers.batch_norm_train and PERF_TRAIN.md).
        Recurrent sublayers always keep the two-pass form: their BN stats
        go through the law-of-total-variance step fold (ops/recurrent.py)
        and carry a negligible FLOP share of any net that has them.
      rec_state: {layer_key: state} initial recurrent state; None = zeros
        everywhere (a freshly loaded darknet net). The final state of every
        recurrent layer is returned in aux["rec_state"] so stateful
        generation threads it functionally (darknet mutates l.state
        in place instead).
      qat_scales: {layer_key: activation scale} enables fake-quantized
        convs on the int8 serving grid (ops/qat.py) for the listed layers:
        the conv input and weight are round/clip/rescaled with
        straight-through gradients, and the observed input abs-max is
        returned in aux["act_ranges"] for the EMA scale update. A zero
        scale self-calibrates from the current batch. The lattice snap
        runs in f32; the conv itself honors compute_dtype — the operands
        are already 8-bit-narrow, so bf16 adds only sub-grid rounding
        (<= scale/4 at the range edge vs the scale-wide bins QAT trains
        against) while keeping MXU bf16 throughput.

    Returns:
      (detections, aux): ``detections`` is a list of (feature_map, Detect spec)
      for every Detect marker, in spec order; ``aux`` is a dict with
      "batch_stats" updates when train=True, "rec_state" when the spec
      has recurrent layers, and "act_ranges" when qat_scales is given.
    """
    outputs = []
    detections = []
    new_stats: Dict[str, Any] = {}
    rec_out: Dict[str, Any] = {}
    act_ranges: Dict[str, Any] = {}

    def fetch(ref, i):
        r = S.resolve_ref(ref, i)
        return x if r == S.INPUT else outputs[r]

    cur = x
    for i, spec in enumerate(specs):
        if isinstance(spec, S.Conv):
            p = params[layer_key(i)]
            pad = None if spec.pad < 0 else spec.pad
            qsc = (None if qat_scales is None
                   else qat_scales.get(layer_key(i)))
            w_in, cd, odt = p.get("w"), compute_dtype, compute_dtype
            if qsc is not None and "w_q" not in p:
                # QAT (ops/qat.py): input+weight snapped to the int8
                # serving lattice with STE gradients; observed input range
                # feeds the EMA scale update. The snap is f32-exact; the
                # conv below keeps the caller's compute_dtype (--qat --bf16
                # trains quantized layers at MXU bf16 speed).
                from yolo_tensorflow_tpu.ops import qat as Q
                xin = cur.astype(jnp.float32)
                r = jnp.max(jnp.abs(xin))
                act_ranges[layer_key(i)] = r
                s_eff = jnp.where(
                    qsc > 0, qsc,
                    jnp.maximum(jax.lax.stop_gradient(r), 1e-6) / 127.0)
                cur = Q.fake_quant(xin, s_eff)
                w_in = Q.fake_quant_weights(p["w"].astype(jnp.float32))
            if "w_q" in p:
                # int8 serving path (ops/quant.py): ~1.4x bf16 e2e on v5e
                # (shape-dependent; see PERF_INT8.md).
                # Epilogue in compute_dtype (bf16 serving) — measured ~1.5%
                # over f32 — but f32 when mixing with full-precision layers
                # so downstream unquantized convs see matching dtypes.
                from yolo_tensorflow_tpu.ops.quant import conv2d_int8
                cur = conv2d_int8(cur, p["w_q"], p["s_x"], p["s_w"], p["b"],
                                  stride=spec.stride, pad=pad,
                                  epilogue_dtype=compute_dtype
                                  or jnp.float32)
            elif spec.bn and "gamma" in p:
                # mp train: BN-conv activations stay narrow end-to-end
                # (stats are still f32 inside batch_norm_train); only the
                # bias/head convs below upcast, keeping the loss's raw
                # logits f32
                cur = L.conv2d(cur, w_in, None, stride=spec.stride,
                               pad=pad, compute_dtype=cd,
                               train=train, out_dtype=odt)
                if train:
                    cur, m, v = L.batch_norm_train(cur, p["gamma"], p["beta"],
                                                   bn_eps, stats=bn_stats)
                    new_stats[layer_key(i)] = {"mean": m, "var": v}
                else:
                    st = _bn_stats(batch_stats, layer_key(i))
                    cur = L.batch_norm_inference(
                        cur, p["gamma"], p["beta"], st["mean"], st["var"],
                        bn_eps, formula=bn_formula)
            else:
                # folded or bias-only conv
                cur = L.conv2d(cur, w_in, p["b"], stride=spec.stride,
                               pad=pad, compute_dtype=cd,
                               train=train)
            cur = _activate(cur, spec.act)
            if compute_dtype is not None and not train:
                # keep activations narrow between layers: XLA fuses the cast
                # into the conv epilogue, halving HBM traffic
                cur = cur.astype(compute_dtype)
        elif isinstance(spec, S.MaxPool):
            cur = L.max_pool(cur, spec.size, spec.stride)
        elif isinstance(spec, S.Route):
            tensors = [fetch(r, i) for r in spec.refs]
            cur = tensors[0] if len(tensors) == 1 else jnp.concatenate(tensors, axis=-1)
        elif isinstance(spec, S.Shortcut):
            cur = cur + fetch(spec.ref, i)
        elif isinstance(spec, S.Reorg):
            fn = L.darknet_reorg if spec.mode == "darknet" else L.space_to_depth
            cur = fn(cur, spec.stride)
        elif isinstance(spec, S.Upsample):
            fn = L.upsample_nearest if spec.mode == "nearest" else L.upsample_bilinear_sym
            cur = fn(cur, spec.factor)
        elif isinstance(spec, S.TransposeFlatten):
            cur = L.transpose_flatten(cur)
        elif isinstance(spec, S.Dense):
            p = params[layer_key(i)]
            if train and cur.dtype != jnp.float32:
                # FC layers train in f32 (their f32-accumulating dot's VJP
                # rejects mixed dtypes; v1-era heads, precision over speed)
                cur = cur.astype(jnp.float32)
            if "gamma" in p:
                # unfolded connected+BN (forward_connected_layer: matmul,
                # BN w/ biases-as-beta, activation)
                st = None if train else _bn_stats(batch_stats, layer_key(i))
                cur, upd = L.connected_forward(cur, p, st, spec.act,
                                               train=train, bn_eps=bn_eps,
                                               bn_formula=bn_formula,
                                               bn_stats=bn_stats)
                if upd is not None:
                    new_stats[layer_key(i)] = upd
            else:
                cur = _activate(L.dense(cur, p["w"], p["b"], None),
                                spec.act)
        elif isinstance(spec, S.Dropout):
            if train:
                dropout_rng, sub = jax.random.split(dropout_rng)
                cur = L.dropout(cur, spec.rate, sub)
            # inference: identity
        elif isinstance(spec, S.GlobalAvgPool):
            cur = jnp.mean(cur, axis=(1, 2))
        elif isinstance(spec, S.Softmax):
            x32 = cur.astype(jnp.float32)
            if spec.temperature != 1.0:
                x32 = x32 / spec.temperature
            if spec.groups > 1:
                shp = x32.shape
                x32 = x32.reshape(shp[:-1] + (spec.groups,
                                              shp[-1] // spec.groups))
                cur = jax.nn.softmax(x32, axis=-1).reshape(shp)
            else:
                cur = jax.nn.softmax(x32, axis=-1)
        elif isinstance(spec, S.Detect):
            detections.append((cur, spec))
        elif isinstance(spec, S.Local):
            p = params[layer_key(i)]
            if train and cur.dtype != jnp.float32:
                cur = cur.astype(jnp.float32)
            # exotic layers train in f32: their f32-accumulating einsum/conv
            # VJPs reject mixed (f32 cotangent, bf16 operand) dtypes, and
            # they carry a negligible share of any trained net's FLOPs
            cd = None if train else compute_dtype
            cur = L.local_conv(cur, p["w"], p["b"], size=spec.size,
                               stride=spec.stride, pad=spec.pad,
                               compute_dtype=cd)
            cur = _activate(cur, spec.act)
        elif isinstance(spec, S.Deconv):
            p = params[layer_key(i)]
            if train and cur.dtype != jnp.float32:
                cur = cur.astype(jnp.float32)
            cd = None if train else compute_dtype  # see S.Local note
            if spec.bn and "gamma" in p:
                cur = L.deconv2d(cur, p["w"], None, stride=spec.stride,
                                 pad=spec.pad, compute_dtype=cd)
                if train:
                    cur, m, v = L.batch_norm_train(cur, p["gamma"],
                                                   p["beta"], bn_eps,
                                                   stats=bn_stats)
                    new_stats[layer_key(i)] = {"mean": m, "var": v}
                else:
                    st = _bn_stats(batch_stats, layer_key(i))
                    cur = L.batch_norm_inference(
                        cur, p["gamma"], p["beta"], st["mean"], st["var"],
                        bn_eps, formula=bn_formula)
            else:
                cur = L.deconv2d(cur, p["w"], p["b"], stride=spec.stride,
                                 pad=spec.pad, compute_dtype=cd)
            cur = _activate(cur, spec.act)
        elif isinstance(spec, S.Crop):
            if train:
                raise NotImplementedError(
                    "Crop layers run their random crop in the host data "
                    "pipeline at train time (data/augment.py); the in-graph "
                    "layer implements the deterministic inference branch")
            cur = L.crop_inference(cur, spec.crop_height, spec.crop_width,
                                   noadjust=spec.noadjust)
        elif isinstance(spec, S.LRN):
            cur = L.lrn_darknet(cur, size=spec.size, alpha=spec.alpha,
                                beta=spec.beta, kappa=spec.kappa)
        elif isinstance(spec, S.L2Norm):
            cur = L.l2norm_channels(cur)
        elif isinstance(spec, S.Logistic):
            cur = jax.nn.sigmoid(cur.astype(jnp.float32)).astype(cur.dtype)
        elif isinstance(spec, S.RECURRENT):
            from yolo_tensorflow_tpu.ops import recurrent as R
            if train and cur.dtype != jnp.float32:
                cur = cur.astype(jnp.float32)  # see S.Dense note
            key = layer_key(i)
            p = params[key]
            st = (batch_stats or {}).get(key)
            init = None if rec_state is None else rec_state.get(key)
            kw = dict(steps=time_steps, train=train, stats=st,
                      bn_eps=bn_eps, bn_formula=bn_formula)
            if isinstance(spec, S.Rnn):
                cur, h_T, upd = R.rnn_forward(
                    cur, p, init, act=spec.act, shortcut=spec.shortcut, **kw)
            elif isinstance(spec, S.Gru):
                cur, h_T, upd = R.gru_forward(cur, p, init,
                                              tanh=spec.tanh, **kw)
            elif isinstance(spec, S.Lstm):
                cur, h_T, upd = R.lstm_forward(cur, p, init, **kw)
            else:
                cur, h_T, upd = R.crnn_forward(
                    cur, p, init, act=spec.act, shortcut=spec.shortcut, **kw)
            rec_out[key] = h_T
            if upd is not None:
                new_stats[key] = upd
        else:  # pragma: no cover
            raise TypeError(f"unknown spec {spec!r}")
        if train:
            # tag layer outputs for selective rematerialization: under
            # jax.checkpoint(policy=save_only_these_names(...)) the named
            # activations become the only saved residuals and everything
            # between them is recomputed in the backward pass
            # (train/loop.make_train_step remat_every) — jax.checkpoint /
            # remat trading FLOPs for HBM. No-op outside a remat context.
            cur = _checkpoint_name(cur, layer_key(i))
        outputs.append(cur)

    aux = {"batch_stats": new_stats} if train else {}
    if rec_out:
        aux["rec_state"] = rec_out
    if act_ranges:
        aux["act_ranges"] = act_ranges
    return detections, aux


# darknet activation-by-name (raises on unknown names) — ops/layers.py
_activate = L.activate


def infer_shapes(specs, input_shape) -> list:
    """Static shape inference (B treated symbolically as input_shape[0]).
    Mirrors what the reference prints per layer (print_activations,
    model_darknet19_slim.py:109) and what darknet prints at cfg parse."""
    shapes = []

    def get(ref, i):
        r = S.resolve_ref(ref, i)
        return input_shape if r == S.INPUT else shapes[r]

    cur = tuple(input_shape)
    for i, spec in enumerate(specs):
        if isinstance(spec, S.Conv):
            b, h, w, c = cur
            k, s = spec.size, spec.stride
            p = k // 2 if spec.pad < 0 else spec.pad
            oh = (h + 2 * p - k) // s + 1
            ow = (w + 2 * p - k) // s + 1
            cur = (b, oh, ow, spec.filters)
        elif isinstance(spec, S.MaxPool):
            b, h, w, c = cur
            if spec.stride == spec.size:
                cur = (b, h // spec.stride, w // spec.stride, c)
            else:  # SAME
                cur = (b, -(-h // spec.stride), -(-w // spec.stride), c)
        elif isinstance(spec, S.Route):
            ts = [get(r, i) for r in spec.refs]
            cur = (*ts[0][:3], sum(t[3] for t in ts))
        elif isinstance(spec, S.Shortcut):
            pass
        elif isinstance(spec, S.Reorg):
            b, h, w, c = cur
            st = spec.stride
            cur = (b, h // st, w // st, c * st * st)
        elif isinstance(spec, S.Upsample):
            b, h, w, c = cur
            cur = (b, h * spec.factor, w * spec.factor, c)
        elif isinstance(spec, S.TransposeFlatten):
            b, h, w, c = cur
            cur = (b, c * h * w)
        elif isinstance(spec, S.Dense):
            cur = (cur[0], spec.units)
        elif isinstance(spec, S.GlobalAvgPool):
            cur = (cur[0], cur[3])
        elif isinstance(spec, S.Local):
            b, h, w, c = cur
            if spec.pad:
                oh = (h - 1) // spec.stride + 1
                ow = (w - 1) // spec.stride + 1
            else:
                oh = (h - spec.size) // spec.stride + 1
                ow = (w - spec.size) // spec.stride + 1
            cur = (b, oh, ow, spec.filters)
        elif isinstance(spec, S.Deconv):
            b, h, w, c = cur
            oh = (h - 1) * spec.stride + spec.size - 2 * spec.pad
            ow = (w - 1) * spec.stride + spec.size - 2 * spec.pad
            cur = (b, oh, ow, spec.filters)
        elif isinstance(spec, S.Crop):
            cur = (cur[0], spec.crop_height, spec.crop_width, cur[3])
        elif isinstance(spec, (S.Rnn, S.Gru, S.Lstm)):
            cur = (cur[0], spec.output)
        elif isinstance(spec, S.Crnn):
            cur = (cur[0], cur[1], cur[2], spec.output_filters)
        elif isinstance(spec, (S.Dropout, S.Detect, S.Softmax, S.LRN,
                               S.L2Norm, S.Logistic)):
            pass
        shapes.append(cur)
    return shapes


def layer_flops(spec, shape, prev) -> float:
    """Forward FLOPs (multiply+add = 2) of one layer given its output
    ``shape`` and input ``prev`` shape — the ONE statement of each
    layer's arithmetic, shared by count_flops and the darknet `ops`
    command's numops subset (utils/netviz.py)."""
    if isinstance(spec, S.Conv):
        _, oh, ow, co = shape
        return 2.0 * oh * ow * co * prev[3] * spec.size * spec.size
    if isinstance(spec, S.Dense):
        return 2.0 * prev[1] * spec.units
    if isinstance(spec, S.Local):
        _, oh, ow, co = shape
        return 2.0 * oh * ow * co * prev[3] * spec.size * spec.size
    if isinstance(spec, S.Deconv):
        _, oh, ow, co = shape
        return 2.0 * prev[1] * prev[2] * co * prev[3] \
            * spec.size * spec.size
    if isinstance(spec, S.Rnn):
        o = spec.output
        return 2.0 * (prev[1] * o + 2 * o * o)
    if isinstance(spec, S.Gru):
        o = spec.output
        return 2.0 * (3 * prev[1] * o + 3 * o * o)
    if isinstance(spec, S.Lstm):
        o = spec.output
        return 2.0 * (4 * prev[1] * o + 4 * o * o)
    if isinstance(spec, S.Crnn):
        _, oh, ow, _ = shape
        hf, of = spec.hidden_filters, spec.output_filters
        return 2.0 * oh * ow * 9 * (prev[3] * hf + hf * hf + hf * of)
    return 0.0


def count_flops(specs, input_shape) -> float:
    """Total forward FLOPs (multiply+add = 2), comparable to the BFLOP
    column darknet prints (e.g. YOLO_V2/.../yolov2.txt)."""
    shapes = infer_shapes(specs, input_shape)
    total = 0.0
    prev = tuple(input_shape)
    for i, spec in enumerate(specs):
        total += layer_flops(spec, shapes[i], prev)
        prev = shapes[i]
    return total


def init_params(specs, input_shape, rng, *, folded: bool = False,
                dtype=jnp.float32):
    """Random init for training from scratch (darknet-style scaled uniform,
    src/convolutional_layer.c make_convolutional_layer rand_normal*sqrt(2/n)).

    Returns (params, batch_stats); batch_stats is empty when folded=True.
    """
    shapes = infer_shapes(specs, input_shape)
    params, stats = {}, {}
    prev_c = input_shape[3] if len(input_shape) == 4 else input_shape[1]
    prev = tuple(input_shape)

    def _connected_init(rng, fan_in, units):
        """make_connected_layer: scale*rand_uniform(-1,1), scale=sqrt(2/in);
        returns (sub_params, sub_stats_or_None)."""
        w = jax.random.uniform(rng, (fan_in, units), dtype, -1.0, 1.0) \
            * np.sqrt(2.0 / fan_in)
        return w

    def _rec_sub(rng, kind, fan_in, units, bn):
        if kind == "conv":
            n = 9 * fan_in
            w = jax.random.normal(rng, (3, 3, fan_in, units), dtype) \
                * np.sqrt(2.0 / n)
        else:
            w = _connected_init(rng, fan_in, units)
        if bn and not folded:
            p = {"w": w, "gamma": jnp.ones((units,), dtype),
                 "beta": jnp.zeros((units,), dtype)}
            st = {"mean": jnp.zeros((units,), dtype),
                  "var": jnp.ones((units,), dtype)}
            return p, st
        return {"w": w, "b": jnp.zeros((units,), dtype)}, None

    def _rec_init(rng, spec, in_dim, in_c):
        """Walk specs.recurrent_plan (the shared file-order source)."""
        ps, sts = {}, {}
        for name, kind, fan_in, units in S.recurrent_plan(spec, in_dim,
                                                          in_c):
            rng, sub = jax.random.split(rng)
            p, st = _rec_sub(sub, kind, fan_in, units, spec.bn)
            ps[name] = p
            if st is not None:
                sts[name] = st
        return ps, sts

    for i, spec in enumerate(specs):
        if isinstance(spec, S.Conv):
            rng, sub = jax.random.split(rng)
            cin = prev[3]
            n = spec.size * spec.size * cin
            w = jax.random.normal(sub, (spec.size, spec.size, cin, spec.filters),
                                  dtype) * np.sqrt(2.0 / n)
            p = {"w": w}
            if spec.bn and not folded:
                p["gamma"] = jnp.ones((spec.filters,), dtype)
                p["beta"] = jnp.zeros((spec.filters,), dtype)
                stats[layer_key(i)] = {
                    "mean": jnp.zeros((spec.filters,), dtype),
                    "var": jnp.ones((spec.filters,), dtype),
                }
            else:
                p["b"] = jnp.zeros((spec.filters,), dtype)
            params[layer_key(i)] = p
        elif isinstance(spec, S.Dense):
            rng, sub = jax.random.split(rng)
            fan_in = prev[1]
            w = jax.random.normal(sub, (fan_in, spec.units), dtype) * np.sqrt(2.0 / fan_in)
            if spec.bn and not folded:
                params[layer_key(i)] = {
                    "w": w, "gamma": jnp.ones((spec.units,), dtype),
                    "beta": jnp.zeros((spec.units,), dtype)}
                stats[layer_key(i)] = {
                    "mean": jnp.zeros((spec.units,), dtype),
                    "var": jnp.ones((spec.units,), dtype)}
            else:
                params[layer_key(i)] = {
                    "w": w, "b": jnp.zeros((spec.units,), dtype)}
        elif isinstance(spec, S.Local):
            rng, sub = jax.random.split(rng)
            _, oh, ow, _ = shapes[i]
            k = spec.size * spec.size * prev[3]
            # make_local_layer: scale*rand_uniform(-1,1), scale=sqrt(2/k)
            w = jax.random.uniform(sub, (oh * ow, spec.filters, k), dtype,
                                   -1.0, 1.0) * np.sqrt(2.0 / k)
            params[layer_key(i)] = {
                "w": w, "b": jnp.zeros((oh * ow, spec.filters), dtype)}
        elif isinstance(spec, S.Deconv):
            rng, sub = jax.random.split(rng)
            _, oh, ow, _ = shapes[i]
            # make_deconvolutional_layer: .02*randn scaled by out/in area
            w = jax.random.normal(
                sub, (spec.size, spec.size, prev[3], spec.filters),
                dtype) * (0.02 * oh * ow / (prev[1] * prev[2]))
            p = {"w": w}
            if spec.bn and not folded:
                p["gamma"] = jnp.ones((spec.filters,), dtype)
                p["beta"] = jnp.zeros((spec.filters,), dtype)
                stats[layer_key(i)] = {
                    "mean": jnp.zeros((spec.filters,), dtype),
                    "var": jnp.ones((spec.filters,), dtype),
                }
            else:
                p["b"] = jnp.zeros((spec.filters,), dtype)
            params[layer_key(i)] = p
        elif isinstance(spec, S.RECURRENT):
            rng, sub = jax.random.split(rng)
            in_dim = prev[1] if len(prev) == 2 else 0
            in_c = prev[3] if len(prev) == 4 else 0
            p, st = _rec_init(sub, spec, in_dim, in_c)
            params[layer_key(i)] = p
            if st:
                stats[layer_key(i)] = st
        prev = shapes[i]
    return params, stats
