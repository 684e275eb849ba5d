"""Darknet recurrent layer family as TPU-native scans.

Implements the four recurrent layer types of the reference's C runtime —
[rnn] (src/rnn_layer.c:89-128), [gru] (src/gru_layer.c forward_gru_layer),
[lstm] (src/lstm_layer.c forward_lstm_layer) and [crnn]
(src/crnn_layer.c forward_crnn_layer) — as ``lax.scan`` over the time axis.

Darknet folds time into the batch: a layer sees ``(batch*steps, inputs)``
rows, step-major (the input pointer advances by ``inputs*batch`` per step,
rnn_layer.c:123), and each step runs each fully-connected sublayer on one
``(batch, inputs)`` slab. Here the same layout reshapes to ``(T, B, F)`` and
scans — XLA unrolls nothing, state stays in registers/VMEM between steps,
and each step's matmuls hit the MXU at batch granularity. Recurrent state is
explicit (a carry pytree in, final state out) instead of the C side's
mutable ``l.state`` buffers, which is what makes generation jittable
end-to-end (a scan of scans) and the layer trivially shardable over a batch
mesh axis.

Sublayer semantics follow forward_connected_layer /
forward_convolutional_layer exactly: matmul/conv, then batch-norm (the
layer's ``biases`` act as BN beta) or bias add, then activation.

Parameter pytree per layer (nested one level, mirroring the .weights file
order — see io/weights.py):
  Rnn/Crnn:  {"input": sub, "self": sub, "output": sub}
  Gru:       {"wz","wr","wh","uz","ur","uh": sub}
  Lstm:      {"wi","wf","wo","wg","ui","uf","uo","ug": sub}
where ``sub`` is {"w","b"} (folded / no BN) or {"w","gamma","beta"} with
running stats in the enclosing batch_stats pytree under the same sub-key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from yolo_tensorflow_tpu.ops import layers as L


# the shared connected-sublayer primitive and by-name activation live in
# ops/layers.py (the engine's [connected] layers use the same functions)
_act = L.activate
_connected = L.connected_forward


def _conv_sub(x, p, st, act, *, train, bn_eps, bn_formula):
    """CRNN sublayer: 3x3 stride-1 pad-1 conv (make_crnn_layer), same
    matmul/BN/bias/activation pipeline as _connected but spatial."""
    if "gamma" not in p:
        return _act(L.conv2d(x, p["w"], p["b"], stride=1, pad=1), act), None
    y = L.conv2d(x, p["w"], None, stride=1, pad=1)
    if train:
        y, m, v = L.batch_norm_train(y, p["gamma"], p["beta"], bn_eps)
        return _act(y, act), {"mean": m, "var": v}
    y = L.batch_norm_inference(y, p["gamma"], p["beta"], st["mean"],
                               st["var"], bn_eps, formula=bn_formula)
    return _act(y, act), None


def _to_time_major(x, steps: int):
    """(B*T, ...) step-major rows -> (T, B, ...)."""
    if x.shape[0] % steps:
        raise ValueError(
            f"rows {x.shape[0]} not divisible by time_steps {steps}")
    return x.reshape((steps, x.shape[0] // steps) + x.shape[1:])


def _from_time_major(y):
    return y.reshape((y.shape[0] * y.shape[1],) + y.shape[2:])


def _mean_stats(stats_seq):
    """Per-step batch stats (leading axis T) -> one update per train step.
    Darknet folds each step into the rolling averages sequentially
    (momentum per step); the order-free equivalent combines the T per-step
    (mean, var) pairs by the law of total variance —
        var = E_t[var_t] + Var_t[mean_t]
    — so the across-step spread of the per-step means is kept (a plain
    mean of the vars would underestimate the variance the sequential
    rolling update accumulates)."""
    def combine(sub):
        m, v = sub["mean"], sub["var"]
        mbar = jnp.mean(m, axis=0)
        return {"mean": mbar,
                "var": (jnp.mean(v, axis=0)
                        + jnp.mean(jnp.square(m - mbar), axis=0))}
    return {k: combine(v) for k, v in stats_seq.items()}


def rnn_forward(x, p, state0, *, steps, act="logistic", shortcut=False,
                train=False, stats=None, bn_eps=1e-5, bn_formula="darknet"):
    """[rnn] forward (src/rnn_layer.c:89-128).

    Per step: state = (shortcut ? state : 0) + act(in_fc(x_t))
                                             + act(self_fc(state));
              y_t = act(out_fc(state)).
    x: (B*T, In) step-major. state0: (B, Out) or None (zeros — what a
    freshly loaded darknet net holds, and what train mode forces,
    rnn_layer.c:101). Returns (y (B*T, Out), state_T, new_stats|None).
    """
    xt = _to_time_major(x, steps)
    B = xt.shape[1]
    out = p["output"]["w"].shape[-1]
    h0 = jnp.zeros((B, out), xt.dtype) if state0 is None else state0
    st = stats or {}

    def step(h, x_t):
        i_t, s_i = _connected(x_t, p["input"], st.get("input"), act,
                              train=train, bn_eps=bn_eps,
                              bn_formula=bn_formula)
        s_t, s_s = _connected(h, p["self"], st.get("self"), act,
                              train=train, bn_eps=bn_eps,
                              bn_formula=bn_formula)
        h_new = (h if shortcut else 0.0) + i_t + s_t
        y_t, s_o = _connected(h_new, p["output"], st.get("output"), act,
                              train=train, bn_eps=bn_eps,
                              bn_formula=bn_formula)
        upd = {"input": s_i, "self": s_s, "output": s_o} if train and s_i \
            else None
        return h_new, (y_t, upd)

    h_T, (ys, upds) = lax.scan(step, h0, xt)
    new_stats = _mean_stats(upds) if train and upds is not None else None
    return _from_time_major(ys), h_T, new_stats


def gru_forward(x, p, state0, *, steps, tanh=False, train=False, stats=None,
                bn_eps=1e-5, bn_formula="darknet"):
    """[gru] forward (src/gru_layer.c forward_gru_layer). Darknet's gate
    convention: z multiplies the OLD state (weighted_sum_cpu(state, h~, z)),
    i.e. out = z*h + (1-z)*h~. All six sublayers are LINEAR-activation
    connected layers; the candidate uses tanh only if the cfg sets tanh=1,
    else logistic."""
    xt = _to_time_major(x, steps)
    B = xt.shape[1]
    out = p["uh"]["w"].shape[-1]
    h0 = jnp.zeros((B, out), xt.dtype) if state0 is None else state0
    st = stats or {}
    names = ("wz", "wr", "wh", "uz", "ur", "uh")

    def fc(name, v):
        return _connected(v, p[name], st.get(name), "linear", train=train,
                          bn_eps=bn_eps, bn_formula=bn_formula)

    def step(h, x_t):
        uz, s1 = fc("uz", x_t)
        ur, s2 = fc("ur", x_t)
        uh_x, s3 = fc("uh", x_t)
        wz, s4 = fc("wz", h)
        wr, s5 = fc("wr", h)
        z = jax.nn.sigmoid(uz + wz)
        r = jax.nn.sigmoid(ur + wr)
        wh, s6 = fc("wh", r * h)
        cand = uh_x + wh
        cand = jnp.tanh(cand) if tanh else jax.nn.sigmoid(cand)
        y = z * h + (1.0 - z) * cand
        upd = dict(zip(names, (s4, s5, s6, s1, s2, s3))) \
            if train and s1 else None
        return y, (y, upd)

    h_T, (ys, upds) = lax.scan(step, h0, xt)
    new_stats = _mean_stats(upds) if train and upds is not None else None
    return _from_time_major(ys), h_T, new_stats


def lstm_forward(x, p, state0, *, steps, train=False, stats=None,
                 bn_eps=1e-5, bn_formula="darknet"):
    """[lstm] forward (src/lstm_layer.c forward_lstm_layer): standard LSTM
    with separate input (u*) and recurrent (w*) LINEAR connected sublayers.
    state0: (c, h) tuple or None."""
    xt = _to_time_major(x, steps)
    B = xt.shape[1]
    out = p["uo"]["w"].shape[-1]
    if state0 is None:
        c0 = jnp.zeros((B, out), xt.dtype)
        h0 = jnp.zeros((B, out), xt.dtype)
    else:
        c0, h0 = state0
    st = stats or {}
    names = ("wi", "wf", "wo", "wg", "ui", "uf", "uo", "ug")

    def fc(name, v):
        return _connected(v, p[name], st.get(name), "linear", train=train,
                          bn_eps=bn_eps, bn_formula=bn_formula)

    def step(carry, x_t):
        c, h = carry
        outs = {}
        upd = {}
        for n in names:
            outs[n], s = fc(n, h if n.startswith("w") else x_t)
            upd[n] = s
        f = jax.nn.sigmoid(outs["wf"] + outs["uf"])
        i = jax.nn.sigmoid(outs["wi"] + outs["ui"])
        g = jnp.tanh(outs["wg"] + outs["ug"])
        o = jax.nn.sigmoid(outs["wo"] + outs["uo"])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        upd = upd if train and upd["wi"] else None
        return (c_new, h_new), (h_new, upd)

    (c_T, h_T), (ys, upds) = lax.scan(step, (c0, h0), xt)
    new_stats = _mean_stats(upds) if train and upds is not None else None
    return _from_time_major(ys), (c_T, h_T), new_stats


def crnn_forward(x, p, state0, *, steps, act="logistic", shortcut=False,
                 train=False, stats=None, bn_eps=1e-5,
                 bn_formula="darknet"):
    """[crnn] forward (src/crnn_layer.c): the RNN recurrence with 3x3
    stride-1 pad-1 convolutional sublayers; hidden state is a feature map
    (B, H, W, hidden_filters)."""
    xt = _to_time_major(x, steps)
    _, B, H, Wd, _ = xt.shape
    hidden = p["self"]["w"].shape[-1]
    h0 = jnp.zeros((B, H, Wd, hidden), xt.dtype) if state0 is None else state0
    st = stats or {}

    def step(h, x_t):
        i_t, s_i = _conv_sub(x_t, p["input"], st.get("input"), act,
                             train=train, bn_eps=bn_eps,
                             bn_formula=bn_formula)
        s_t, s_s = _conv_sub(h, p["self"], st.get("self"), act,
                             train=train, bn_eps=bn_eps,
                             bn_formula=bn_formula)
        h_new = (h if shortcut else 0.0) + i_t + s_t
        y_t, s_o = _conv_sub(h_new, p["output"], st.get("output"), act,
                             train=train, bn_eps=bn_eps,
                             bn_formula=bn_formula)
        upd = {"input": s_i, "self": s_s, "output": s_o} if train and s_i \
            else None
        return h_new, (y_t, upd)

    h_T, (ys, upds) = lax.scan(step, h0, xt)
    new_stats = _mean_stats(upds) if train and upds is not None else None
    return _from_time_major(ys), h_T, new_stats
