"""Darknet ``.weights`` byte-stream <-> JAX pytree.

Replaces src/parser.c:1241 (load_weights_upto), :992 (save_weights_upto) and
the five per-model Python ``_load_weights`` twins (e.g. YOLOV3.py:385-441).
Unlike the reference — which discovers layer types by sniffing the *names* of
the next TF variable (YOLOV3.py:404-429) — the loader here walks the model's
explicit layer specs, so the file-order contract is stated once, in
models/zoo.py.

File format (src/parser.c:1241-1290):
  header: int32 major, minor, revision, then ``seen`` — int32 for pre-v3-era
          files, int64 for v3-era (major*10+minor >= 2) — then raw float32s.
  per conv+BN layer:   biases(beta)[n] scales(gamma)[n] mean[n] var[n]
                       weights[(out,in,kh,kw) row-major]
  per conv(no BN):     biases[n] weights[...]
  per connected layer: biases[out] weights[(out,in) row-major]

Conv kernels transpose (out,in,kh,kw) -> HWIO (kh,kw,in,out)
(YOLOV3.py:434-436). By default batch norm is folded into the conv at load:
    w' = w * gamma / sqrt(var + eps);  b' = beta - gamma * mean / sqrt(var+eps)
which is the TPU-idiomatic equivalent of darknet's separate inference-mode
BN op — one fused conv epilogue instead of an extra HBM round trip.
"""

from __future__ import annotations

import io as _io
import struct
from typing import Dict, Optional, Tuple

import numpy as np

from yolo_tensorflow_tpu.models import specs as S
from yolo_tensorflow_tpu.models.engine import infer_shapes, layer_key


class WeightsFormatError(ValueError):
    pass


def read_header(fp, header_ints: Optional[int] = None):
    """Read the darknet header. If header_ints is None, use the darknet
    version rule (seen is int64 iff major*10+minor >= 2); otherwise force
    4 (-> seen int32) or 5 (-> seen int64) int32 slots like the reference
    converters do (count=4: YOLO_V2_Tiny_Voc...py:316; count=5:
    YOLO_V3_convert...py:121)."""
    raw = fp.read(12)
    if len(raw) != 12:
        raise WeightsFormatError("truncated header")
    major, minor, revision = struct.unpack("<3i", raw)
    if header_ints is None:
        wide_seen = major * 10 + minor >= 2
    else:
        wide_seen = header_ints == 5
    seen = struct.unpack("<q" if wide_seen else "<i", fp.read(8 if wide_seen else 4))[0]
    return {"major": major, "minor": minor, "revision": revision, "seen": seen}


def write_header(fp, *, major=0, minor=2, revision=0, seen=0):
    fp.write(struct.pack("<3i", major, minor, revision))
    wide_seen = major * 10 + minor >= 2
    fp.write(struct.pack("<q" if wide_seen else "<i", seen))


def _take(buf: np.ndarray, ptr: int, n: int) -> Tuple[np.ndarray, int]:
    if ptr + n > buf.size:
        raise WeightsFormatError(
            f"weights file exhausted: need {ptr + n} floats, have {buf.size}")
    return buf[ptr:ptr + n], ptr + n


def fold_bn(w_hwio, gamma, beta, mean, var, eps, formula: str = "darknet"):
    """Fold inference-mode BN into conv weight + bias.

    formula="darknet": gamma/(sqrt(var)+1e-6) — darknet's normalize_cpu
    (src/blas.c), the ground truth for .weights files. formula="tf":
    gamma/sqrt(var+eps) — what the reference TF graphs compute."""
    if formula == "darknet":
        inv = gamma / (np.sqrt(var) + 1e-6)
    else:
        inv = gamma / np.sqrt(var + eps)
    w = w_hwio * inv.reshape(1, 1, 1, -1)
    b = beta - mean * inv
    return w.astype(np.float32), b.astype(np.float32)


# sublayer structure/file order lives in ONE place: specs.recurrent_plan
_recurrent_plan = S.recurrent_plan


def fold_bn_fc(w, gamma, beta, mean, var, eps, formula: str = "darknet"):
    """Fold inference BN into a connected layer's (In, Out) weight + bias —
    the fold_bn twin for the last-axis layout (connected biases are BN
    beta, load_connected_weights)."""
    if formula == "darknet":
        inv = gamma / (np.sqrt(var) + 1e-6)
    else:
        inv = gamma / np.sqrt(var + eps)
    return ((w * inv[None, :]).astype(np.float32),
            (beta - mean * inv).astype(np.float32))


def _read_fc(buf, ptr, fan_in, units, bn, fold, bn_formula, bn_eps=1e-5):
    """One connected sublayer from the stream (load_connected_weights,
    src/parser.c: biases, weights (out,in) row-major, then BN
    scales/mean/var). Returns (sub_params, sub_stats|None, ptr)."""
    bias, ptr = _take(buf, ptr, units)
    flat, ptr = _take(buf, ptr, units * fan_in)
    w = np.ascontiguousarray(flat.reshape(units, fan_in).T, np.float32)
    if not bn:
        return {"w": w, "b": bias.copy()}, None, ptr
    gamma, ptr = _take(buf, ptr, units)
    mean, ptr = _take(buf, ptr, units)
    var, ptr = _take(buf, ptr, units)
    if fold:
        wf, bf = fold_bn_fc(w, gamma, bias, mean, var, bn_eps, bn_formula)
        return {"w": wf, "b": bf}, None, ptr
    return ({"w": w, "gamma": gamma.copy(), "beta": bias.copy()},
            {"mean": mean.copy(), "var": var.copy()}, ptr)


def _read_conv_sub(buf, ptr, cin, cout, k, bn, fold, bn_eps, bn_formula):
    """One conv sublayer (load_convolutional_weights order)."""
    if bn:
        beta, ptr = _take(buf, ptr, cout)
        gamma, ptr = _take(buf, ptr, cout)
        mean, ptr = _take(buf, ptr, cout)
        var, ptr = _take(buf, ptr, cout)
    else:
        bias, ptr = _take(buf, ptr, cout)
    flat, ptr = _take(buf, ptr, cout * cin * k * k)
    w = flat.reshape(cout, cin, k, k).transpose(2, 3, 1, 0)
    if bn:
        if fold:
            wf, bf = fold_bn(w, gamma, beta, mean, var, bn_eps, bn_formula)
            return {"w": wf, "b": bf}, None, ptr
        return ({"w": np.ascontiguousarray(w, np.float32),
                 "gamma": gamma.copy(), "beta": beta.copy()},
                {"mean": mean.copy(), "var": var.copy()}, ptr)
    return ({"w": np.ascontiguousarray(w, np.float32), "b": bias.copy()},
            None, ptr)


def darknet_layer_indices(specs, head: Optional[int] = None):
    """Spec index -> darknet layer index (or None for specs that emit no
    darknet section: TransposeFlatten, and the classifier-head Detect
    marker). The same mapping io/cfg.specs_to_cfg uses when emitting, so
    ``upto`` cutoffs here count layers exactly as save_weights_upto /
    load_weights_upto do (src/parser.c:992,1241)."""
    idx, n = [], 0
    for sp in specs:
        if isinstance(sp, S.TransposeFlatten) or \
                (isinstance(sp, S.Detect) and head == 0):
            idx.append(None)
        else:
            idx.append(n)
            n += 1
    return idx


def _spec_cutoff(specs, upto: Optional[int], head: Optional[int] = None):
    """First spec index at/after darknet layer ``upto`` (None = no cut)."""
    if upto is None:
        return len(specs)
    dk = darknet_layer_indices(specs, head)
    for i, d in enumerate(dk):
        if d is not None and d >= upto:
            return i
    return len(specs)


def load_darknet_weights(specs, input_size: int, path_or_bytes, *,
                         header_ints: Optional[int] = None,
                         bn_eps: float = 1e-5, fold: bool = True,
                         bn_formula: str = "darknet",
                         in_channels: int = 3,
                         upto: Optional[int] = None,
                         allow_partial: bool = False,
                         head: Optional[int] = None):
    """Parse a .weights stream against ``specs``.

    Returns (params, batch_stats, header). When fold=True batch_stats is {}
    and every conv carries {"w","b"}; otherwise BN convs carry
    {"w","gamma","beta"} and their running stats land in batch_stats.

    ``upto``: stop consuming at darknet layer index ``upto`` and ignore any
    remaining floats — load_weights_upto's cutoff (src/parser.c:1241),
    mapping a full file's prefix onto this model's matching backbone.
    ``allow_partial``: accept a file that ENDS at a layer boundary before
    the spec list does (a ``partial``-truncated backbone like
    darknet19_448.conv.23, examples/darknet.c:491) — layers past the end
    of the file are simply absent from the returned pytrees; a file that
    ends MID-layer still raises WeightsFormatError.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        fp = _io.BytesIO(path_or_bytes)
    else:
        fp = open(path_or_bytes, "rb")
    with fp:
        header = read_header(fp, header_ints)
        buf = np.frombuffer(fp.read(), dtype="<f4")

    shapes = infer_shapes(specs, (1, input_size, input_size, in_channels))
    params: Dict[str, Dict[str, np.ndarray]] = {}
    batch_stats: Dict[str, Dict[str, np.ndarray]] = {}
    ptr = 0
    prev = (1, input_size, input_size, in_channels)
    cutoff = _spec_cutoff(specs, upto, head)
    stopped_early = cutoff < len(specs)
    for i, spec in enumerate(specs):
        if i >= cutoff:
            break
        if allow_partial and ptr == buf.size and _has_weights(spec):
            stopped_early = True
            break
        if isinstance(spec, S.Conv):
            sub, st, ptr = _read_conv_sub(buf, ptr, prev[3], spec.filters,
                                          spec.size, spec.bn, fold, bn_eps,
                                          bn_formula)
            params[layer_key(i)] = sub
            if st is not None:
                batch_stats[layer_key(i)] = st
        elif isinstance(spec, S.Dense):
            sub, st, ptr = _read_fc(buf, ptr, prev[1], spec.units,
                                    spec.bn, fold, bn_formula, bn_eps)
            params[layer_key(i)] = sub
            if st is not None:
                batch_stats[layer_key(i)] = st
        elif isinstance(spec, S.Local):
            # parser.c:1315: biases[outputs] then weights[ssc*n*locations];
            # biases in (n, L) planar output order, weights (L, n, ssc)
            _, oh, ow, _ = shapes[i]
            Lx, n, ssc = oh * ow, spec.filters, \
                spec.size * spec.size * prev[3]
            bias, ptr = _take(buf, ptr, n * Lx)
            flat, ptr = _take(buf, ptr, Lx * n * ssc)
            params[layer_key(i)] = {
                "w": np.ascontiguousarray(flat.reshape(Lx, n, ssc),
                                          np.float32),
                "b": np.ascontiguousarray(bias.reshape(n, Lx).T,
                                          np.float32)}
        elif isinstance(spec, S.Deconv):
            # load_convolutional_weights order, weights (in_c,out_c,kh,kw)
            cin, cout, k = prev[3], spec.filters, spec.size
            if spec.bn:
                beta, ptr = _take(buf, ptr, cout)
                gamma, ptr = _take(buf, ptr, cout)
                mean, ptr = _take(buf, ptr, cout)
                var, ptr = _take(buf, ptr, cout)
            else:
                bias, ptr = _take(buf, ptr, cout)
            flat, ptr = _take(buf, ptr, cin * cout * k * k)
            w = flat.reshape(cin, cout, k, k).transpose(2, 3, 0, 1)  # HWIO
            if spec.bn:
                if fold:
                    wf, bf = fold_bn(w, gamma, beta, mean, var, bn_eps,
                                     bn_formula)
                    params[layer_key(i)] = {"w": wf, "b": bf}
                else:
                    params[layer_key(i)] = {
                        "w": np.ascontiguousarray(w, np.float32),
                        "gamma": gamma.copy(), "beta": beta.copy()}
                    batch_stats[layer_key(i)] = {
                        "mean": mean.copy(), "var": var.copy()}
            else:
                params[layer_key(i)] = {
                    "w": np.ascontiguousarray(w, np.float32),
                    "b": bias.copy()}
        elif isinstance(spec, S.RECURRENT):
            in_dim = prev[1] if len(prev) == 2 else 0
            in_c = prev[3] if len(prev) == 4 else 0
            ps, sts = {}, {}
            for name, kind, fan_in, units in _recurrent_plan(
                    spec, in_dim, in_c):
                if kind == "fc":
                    sub, st, ptr = _read_fc(buf, ptr, fan_in, units,
                                            spec.bn, fold, bn_formula,
                                            bn_eps)
                else:
                    sub, st, ptr = _read_conv_sub(buf, ptr, fan_in, units, 3,
                                                  spec.bn, fold, bn_eps,
                                                  bn_formula)
                ps[name] = sub
                if st is not None:
                    sts[name] = st
            params[layer_key(i)] = ps
            if sts:
                batch_stats[layer_key(i)] = sts
        prev = shapes[i]

    if ptr != buf.size and not stopped_early:
        raise WeightsFormatError(
            f"weights file has {buf.size - ptr} unconsumed floats "
            f"(consumed {ptr}); spec/weights mismatch")
    return params, batch_stats, header


def _has_weights(spec) -> bool:
    return isinstance(spec, (S.Conv, S.Dense, S.Local, S.Deconv,
                             S.RECURRENT))


def save_darknet_weights(specs, input_size: int, params, batch_stats, path, *,
                         seen: int = 0, in_channels: int = 3,
                         upto: Optional[int] = None,
                         head: Optional[int] = None):
    """Write params back to darknet .weights (the save_weights_upto
    equivalent, src/parser.c:992). Requires unfolded BN params for BN convs.

    ``upto``: emit only the first ``upto`` darknet layers' weights — the
    ``partial`` command's backbone truncation (examples/darknet.c:491:
    save_weights_upto(net, outfile, max)), producing pretrain files like
    darknet19_448.conv.23. ``head``: the model's head id, so a classifier's
    (head==0) Detect marker is not counted as a darknet layer by the
    cutoff — matching specs_to_cfg's emission (io/cfg.py)."""
    shapes = infer_shapes(specs, (1, input_size, input_size, in_channels))
    cutoff = _spec_cutoff(specs, upto, head)
    with open(path, "wb") as fp:
        write_header(fp, seen=seen)
        prev = (1, input_size, input_size, in_channels)
        for i, spec in enumerate(specs):
            if i >= cutoff:
                break
            key = layer_key(i)
            if isinstance(spec, S.Conv):
                p = {k: np.asarray(v, np.float32) for k, v in params[key].items()}
                if spec.bn:
                    if "gamma" not in p:
                        raise ValueError(
                            f"{key}: cannot serialize folded BN back to .weights")
                    st = {k: np.asarray(v, np.float32)
                          for k, v in batch_stats[key].items()}
                    for arr in (p["beta"], p["gamma"], st["mean"], st["var"]):
                        fp.write(arr.tobytes())
                else:
                    fp.write(p["b"].tobytes())
                fp.write(p["w"].transpose(3, 2, 0, 1).tobytes())  # HWIO -> OIHW
            elif isinstance(spec, S.Dense):
                p = {k: np.asarray(v, np.float32) for k, v in params[key].items()}
                if spec.bn:
                    if "gamma" not in p:
                        raise ValueError(
                            f"{key}: cannot serialize folded BN back to "
                            ".weights")
                    st = {k: np.asarray(v, np.float32)
                          for k, v in batch_stats[key].items()}
                    fp.write(p["beta"].tobytes())
                    fp.write(p["w"].T.tobytes())  # (In,Out) -> (Out,In)
                    for arr in (p["gamma"], st["mean"], st["var"]):
                        fp.write(arr.tobytes())
                else:
                    fp.write(p["b"].tobytes())
                    fp.write(p["w"].T.tobytes())  # (In,Out) -> (Out,In)
            elif isinstance(spec, S.Local):
                p = {k: np.asarray(v, np.float32)
                     for k, v in params[key].items()}
                fp.write(p["b"].T.tobytes())   # (L,n) -> (n,L) planar
                fp.write(p["w"].tobytes())     # (L,n,ssc) flat
            elif isinstance(spec, S.Deconv):
                p = {k: np.asarray(v, np.float32)
                     for k, v in params[key].items()}
                if spec.bn:
                    if "gamma" not in p:
                        raise ValueError(
                            f"{key}: cannot serialize folded BN back to "
                            ".weights")
                    st = {k: np.asarray(v, np.float32)
                          for k, v in batch_stats[key].items()}
                    for arr in (p["beta"], p["gamma"], st["mean"],
                                st["var"]):
                        fp.write(arr.tobytes())
                else:
                    fp.write(p["b"].tobytes())
                fp.write(p["w"].transpose(2, 3, 0, 1).tobytes())  # ->IOHW
            elif isinstance(spec, S.RECURRENT):
                in_dim = prev[1] if len(prev) == 2 else 0
                in_c = prev[3] if len(prev) == 4 else 0
                subs = params[key]
                substs = batch_stats.get(key, {}) if batch_stats else {}
                for name, kind, fan_in, units in _recurrent_plan(
                        spec, in_dim, in_c):
                    p = {k: np.asarray(v, np.float32)
                         for k, v in subs[name].items()}
                    if spec.bn and "gamma" not in p:
                        raise ValueError(
                            f"{key}/{name}: cannot serialize folded BN "
                            "back to .weights")
                    st = {k: np.asarray(v, np.float32)
                          for k, v in substs.get(name, {}).items()}
                    if kind == "fc":
                        # connected order: bias, weights, then BN
                        fp.write((p["beta"] if spec.bn else p["b"]).tobytes())
                        fp.write(p["w"].T.tobytes())  # (In,Out)->(Out,In)
                        if spec.bn:
                            for arr in (p["gamma"], st["mean"], st["var"]):
                                fp.write(arr.tobytes())
                    else:
                        # conv order: bias/beta, BN, then weights
                        if spec.bn:
                            for arr in (p["beta"], p["gamma"],
                                        st["mean"], st["var"]):
                                fp.write(arr.tobytes())
                        else:
                            fp.write(p["b"].tobytes())
                        fp.write(p["w"].transpose(3, 2, 0, 1).tobytes())
            prev = shapes[i]


def fold_params(params, batch_stats, bn_eps: float,
                bn_formula: str = "tf"):
    """Fold a trained (unfolded-BN) parameter pytree into inference form
    ({"w","b"} per conv) — the train->deploy hand-off.

    Default formula is "tf" (gamma*rsqrt(var+eps)) because training-mode BN
    (ops/layers.batch_norm_train) normalizes that way — folding natively
    trained params with the darknet formula would skew deployment vs
    training for small-variance channels. Pass "darknet" only when the
    params came from a darknet .weights file (load_darknet_weights already
    folds those itself with the right formula)."""
    def fold_one(p, st):
        if "gamma" not in p:
            return {k: np.asarray(v) for k, v in p.items()}
        w = np.asarray(p["w"])
        gamma, beta = np.asarray(p["gamma"]), np.asarray(p["beta"])
        mean, var = np.asarray(st["mean"]), np.asarray(st["var"])
        fold = fold_bn_fc if w.ndim == 2 else fold_bn
        w2, b2 = fold(w, gamma, beta, mean, var, bn_eps, bn_formula)
        return {"w": w2, "b": b2}

    out = {}
    for key, p in params.items():
        if "w" in p:
            out[key] = fold_one(p, batch_stats.get(key, {}))
        else:  # recurrent layer: one nested level of sublayers
            st = batch_stats.get(key, {})
            out[key] = {name: fold_one(sub, st.get(name, {}))
                        for name, sub in p.items()}
    return out


def param_count(specs, input_size: int, *, in_channels: int = 3,
                with_bn: bool = True) -> int:
    """Number of float32s a .weights payload must contain for ``specs`` —
    the offset/total-count gate the reference only checked by eye via
    printed byte offsets (YOLO_V3_convert...py:143-168)."""
    shapes = infer_shapes(specs, (1, input_size, input_size, in_channels))
    prev = (1, input_size, input_size, in_channels)
    total = 0
    for i, spec in enumerate(specs):
        if isinstance(spec, S.Conv):
            cin = prev[3]
            total += spec.filters * (4 if (spec.bn and with_bn) else 1)
            total += spec.filters * cin * spec.size * spec.size
        elif isinstance(spec, S.Dense):
            total += spec.units * (4 if (spec.bn and with_bn) else 1)
            total += prev[1] * spec.units
        elif isinstance(spec, S.Local):
            _, oh, ow, _ = shapes[i]
            k = spec.size * spec.size * prev[3]
            total += oh * ow * spec.filters * (1 + k)
        elif isinstance(spec, S.Deconv):
            total += spec.filters * (4 if (spec.bn and with_bn) else 1)
            total += spec.filters * prev[3] * spec.size * spec.size
        elif isinstance(spec, S.RECURRENT):
            in_dim = prev[1] if len(prev) == 2 else 0
            in_c = prev[3] if len(prev) == 4 else 0
            for name, kind, fan_in, units in _recurrent_plan(
                    spec, in_dim, in_c):
                per = 4 if (spec.bn and with_bn) else 1
                if kind == "fc":
                    total += units * per + fan_in * units
                else:
                    total += units * per + fan_in * units * 9
        prev = shapes[i]
    return total
