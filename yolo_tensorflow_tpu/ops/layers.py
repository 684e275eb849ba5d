"""Primitive compute ops, TPU-first.

These replace the darknet layer kernels (src/convolutional_layer.c,
src/maxpool_layer.c, src/reorg_layer.c, src/upsample_layer.c,
src/shortcut_layer.c, src/connected_layer.c and their .cu twins) with XLA
ops that tile onto the MXU/VPU. Layout is NHWC throughout — channels on the
TPU lane dimension. Convolutions run in a configurable compute dtype
(bfloat16 by default on TPU) with float32 accumulation via
``preferred_element_type``; XLA fuses the bias add and leaky ReLU into the
convolution epilogue, which is the TPU-idiomatic equivalent of darknet's
hand-fused ``forward_convolutional_layer`` (im2col+gemm+bias+activation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def leaky_relu(x, alpha=0.1):
    """LEAKY activation, alpha=0.1 everywhere in the reference
    (src/activations.h leaky_activate; YOLOV3.py:10 _LEAKY_RELU)."""
    return jnp.maximum(x * alpha, x)


def activate(x, name: str):
    """Darknet activation by name (src/activations.c): leaky alpha=.1,
    logistic, relu, tanh, linear. Unknown names raise — silently running
    linear would break C parity without any signal."""
    if name == "leaky":
        return leaky_relu(x)
    if name == "logistic":
        return jax.nn.sigmoid(x)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "linear":
        return x
    raise ValueError(f"unsupported activation {name!r} "
                     "(supported: leaky, logistic, relu, tanh, linear)")


def connected_forward(x, p, st, act, *, train, bn_eps,
                      bn_formula="darknet", bn_stats: str = "twopass"):
    """forward_connected_layer (src/connected_layer.c): matmul, then batch
    norm (the layer's biases act as BN beta) or bias add, then activation.
    x (B, In) -> (B, Out). ``p`` is {"w","b"} (folded / no BN) or
    {"w","gamma","beta"}; ``st`` the running {"mean","var"} for unfolded
    inference. ``bn_stats`` mirrors batch_norm_train's twopass/onepass
    variance forms. Returns (y, batch_stats_or_None) — used by both the
    engine's [connected] layers and every recurrent sublayer
    (ops/recurrent.py)."""
    if "gamma" not in p:
        return activate(dense(x, p["w"], p["b"]), act), None
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = jnp.dot(x, p["w"].astype(x.dtype),
                preferred_element_type=jnp.float32, precision=precision)
    if train:
        if (bn_stats not in ("twopass", "onepass", "onepass_bf16")
                and not bn_stats.startswith("ghost")):
            raise ValueError(f"unknown bn_stats {bn_stats!r} (supported: "
                             "twopass, onepass, onepass_bf16, ghost<N>)")
        src = (y[:_ghost_rows(bn_stats, y.shape[0])]
               if bn_stats.startswith("ghost") else y)
        mean = jnp.mean(src, axis=0)
        if bn_stats == "twopass":
            var = jnp.var(src, axis=0)
        else:
            # onepass family; the FC stat pass is tiny, bf16 accumulation
            # buys nothing here — onepass_bf16 just takes the onepass form
            var = jnp.maximum(jnp.mean(jnp.square(src), axis=0)
                              - jnp.square(mean), 0.0)
        inv = p["gamma"] * lax.rsqrt(var + bn_eps)
        y = y * inv + (p["beta"] - mean * inv)
        return activate(y, act), {"mean": mean, "var": var}
    y = batch_norm_inference(y, p["gamma"], p["beta"], st["mean"],
                             st["var"], bn_eps, formula=bn_formula)
    return activate(y, act), None


def conv2d(x, w, b=None, *, stride=1, pad=None, compute_dtype=None,
           train=False, out_dtype=None):
    """Conv with darknet explicit padding (size//2 per side).

    x: (B, H, W, Cin); w: (kh, kw, Cin, Cout) HWIO; b: (Cout,) or None.
    Accumulates in float32 regardless of compute dtype. When compute_dtype
    is None (parity mode) we force exact f32 multiplies (Precision.HIGHEST);
    with an explicit low-precision compute_dtype (bf16 serving) the operands
    are already narrow, so the MXU-native default precision applies.

    ``train=True`` with a narrow compute_dtype selects the mixed-precision
    training form: the conv output is materialized in compute_dtype (MXU
    still accumulates f32 internally, one rounding on output). This keeps
    the VJP dtype-consistent — the transpose convs see (bf16 cotangent,
    bf16 operand) instead of the unsupported (f32, bf16) mix
    ``preferred_element_type`` would produce — so backward matmuls run at
    MXU bf16 speed while BN statistics, loss, and optimizer state stay
    float32 (master weights). ``out_dtype`` picks what the output upcasts
    to afterwards: None = f32 (precise head logits, f32 bias add);
    the compute dtype itself keeps the activation narrow between layers,
    halving the train-time HBM traffic of both the forward and the
    backward-sweep recompute reads.
    """
    k = w.shape[0]
    if pad is None:
        pad = k // 2
    precision = lax.Precision.HIGHEST if compute_dtype is None else None
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    mp_train = (train and compute_dtype is not None
                and jnp.dtype(compute_dtype) != jnp.float32)
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_CONV_DIMS,
        preferred_element_type=None if mp_train else jnp.float32,
        precision=precision,
    )
    if mp_train:
        out = out.astype(out_dtype or jnp.float32)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def batch_norm_inference(x, gamma, beta, mean, var, eps,
                         formula: str = "darknet"):
    """Inference-mode BN (rolling statistics). Only used when parameters are
    kept unfolded (training graphs); detection inference folds BN into the
    conv at load time instead (io/weights.py). formula: see
    io/weights.fold_bn."""
    if formula == "darknet":
        inv = gamma / (jnp.sqrt(var) + 1e-6)
    else:
        inv = gamma * lax.rsqrt(var + eps)
    return x * inv.astype(x.dtype) + (beta - mean * inv).astype(x.dtype)


def _ghost_rows(stats: str, batch: int) -> int:
    """Parse 'ghost<N>' -> rows to keep (clamped to the batch)."""
    n = int(stats[5:] or 32)
    if n <= 0:
        raise ValueError(f"ghost BN sample size must be positive: {stats!r}")
    return min(n, batch)


def batch_norm_train(x, gamma, beta, eps, *, stats: str = "twopass"):
    """Training-mode BN over (B, H, W). Returns (y, batch_mean, batch_var);
    the train loop folds the batch stats into the running averages with the
    model's momentum (reference: model_darknet19.py:31 momentum=0.9,
    YOLOV3.py:8 decay=0.9).

    stats='twopass' (default) is darknet's exact form — mean reduction,
    then E[(x-mean)^2] (src/blas.c variance_cpu), two full reads of the
    activation. The opt-in variants (not bit-identical to the C) trade
    exactness for stat-pass HBM traffic, the cost that makes the
    train-mode forward ~1.9x the folded serving forward (PERF_TRAIN.md):

    - 'onepass': var = E[x^2] - E[x]^2 — the two reductions are
      independent siblings over the same input, so XLA fuses them into
      ONE activation read. f32 accumulation bounds the cancellation error
      at ~eps*mean^2/var relative (clamped at 0).
    - 'onepass_bf16': the onepass form with bfloat16 reduction
      accumulators (jnp.mean(dtype=bfloat16)) — probes whether narrowing
      the reduction itself buys anything beyond onepass. 8-bit-mantissa
      accumulation over B*H*W elements is a real accuracy risk on 416^2
      spatial reductions; gate convergence before trusting it
      (tests/test_train_bf16.py).
    - 'ghost<N>' (e.g. 'ghost32'): onepass stats computed from only the
      first N images of the batch, applied to the whole batch — the
      ghost-batch-norm subsampling lever: the stat pass reads N/B of the
      activation. Statistically sound for i.i.d. shuffled batches (the
      estimator is unbiased, just noisier — like training at batch N for
      the stats while the gradient keeps batch B); the rolling averages
      blend the same way.
    """
    if stats == "onepass_bf16":
        mean = jnp.mean(x, axis=(0, 1, 2),
                        dtype=jnp.bfloat16).astype(jnp.float32)
        m2 = jnp.mean(jnp.square(x.astype(jnp.bfloat16)), axis=(0, 1, 2),
                      dtype=jnp.bfloat16).astype(jnp.float32)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    elif stats.startswith("ghost"):
        src = x[:_ghost_rows(stats, x.shape[0])].astype(jnp.float32)
        mean = jnp.mean(src, axis=(0, 1, 2))
        m2 = jnp.mean(jnp.square(src), axis=(0, 1, 2))
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    else:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        if stats == "onepass":
            m2 = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
            var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        elif stats == "twopass":
            var = jnp.var(x32, axis=(0, 1, 2))
        else:
            raise ValueError(f"unknown bn_stats {stats!r} (supported: "
                             "twopass, onepass, onepass_bf16, ghost<N>)")
    inv = gamma * lax.rsqrt(var + eps)
    y = x * inv.astype(x.dtype) + (beta - mean * inv).astype(x.dtype)
    return y, mean, var


def max_pool(x, size=2, stride=2):
    """Max pool. stride==size uses VALID; stride<size (the tiny models'
    stride-1 size-2 pool6) uses SAME end-padding, matching
    slim.max_pool2d(..., stride=1, padding='SAME')."""
    padding = "VALID" if stride == size else "SAME"
    # init must be a CONCRETE scalar (numpy, not jnp): a traced init breaks
    # reduce_window's reverse-mode autodiff
    import numpy as np
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = np.asarray(-np.inf, x.dtype)[()]
    else:
        init = np.asarray(np.iinfo(np.dtype(x.dtype)).min, x.dtype)[()]
    return lax.reduce_window(
        x, init,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )


def space_to_depth(x, block=2):
    """Reorg/passthrough with tf.space_to_depth channel order:
    out[b,i,j,(di*block+dj)*C + c] = in[b, block*i+di, block*j+dj, c]
    (what the reference's TF graphs compute, model_darknet19.py:41-44)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def darknet_reorg(x, stride=2):
    """Darknet's actual reorg (src/blas.c:9 reorg_cpu, forward=0 path) —
    NOT tf.space_to_depth. The C code reinterprets the input CHW buffer
    (C,H,W) as (C/s^2, H*s, W*s), gathers with the quirky offset pattern,
    and reinterprets the result as (C*s^2, H/s, W/s):

      mid[k, j, i] = view[k % (C/s^2), j*s + (k//(C/s^2))//s,
                                       i*s + (k//(C/s^2)) % s]
      out = mid buffer reshaped (C*s^2, H/s, W/s)

    Darknet-trained weights for the conv after the passthrough expect THIS
    channel order — the reference's space_to_depth substitution is a real
    numerics divergence from darknet (verified against the compiled C
    oracle in tests/test_oracle_parity.py). Default for .weights models.
    """
    b, h, w, c = x.shape
    s = stride
    oc = c // (s * s)
    x_chw = x.transpose(0, 3, 1, 2)                  # (B, C, H, W)
    view = x_chw.reshape(b, oc, h * s, w * s)        # buffer reinterpret
    rows = []
    for k in range(c):
        c2, off = k % oc, k // oc
        rows.append(view[:, c2, off // s::s, off % s::s])  # (B, H, W)
    mid = jnp.stack(rows, axis=1)                    # (B, C, H, W)
    out_chw = mid.reshape(b, c * s * s, h // s, w // s)
    return out_chw.transpose(0, 2, 3, 1)


def upsample_nearest(x, factor=2):
    """Nearest-neighbour 2x upsample — darknet semantics
    (src/upsample_layer.c). Broadcast+reshape keeps it a pure layout op that
    XLA fuses with the following concat/conv."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def upsample_bilinear_sym(x, factor=2):
    """The reference TF approximation of darknet upsample: SYMMETRIC pad by
    1 px, bilinear resize to 2*(H+2) - effectively +4, crop 2 px each side
    (YOLOV3.py:241-271 _upsample). Provided for graph-parity experiments;
    the default everywhere is ``upsample_nearest``."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="symmetric")
    out = jax.image.resize(
        xp, (b, (h + 2) * factor, (w + 2) * factor, c), method="bilinear")
    crop = factor
    return out[:, crop:-crop, crop:-crop, :]


def dense(x, w, b, act=None):
    """Fully connected: x (B, In) @ w (In, Out) + b."""
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32,
                  precision=precision)
    out = out + b.astype(out.dtype)
    if act is not None:
        out = act(out)
    return out


def transpose_flatten(x):
    """NHWC -> NCHW -> (B, C*H*W): YOLOv1's FC input layout
    (YOLO_V1_Inference.py:196-198)."""
    b = x.shape[0]
    return x.transpose(0, 3, 1, 2).reshape(b, -1)


def dropout(x, rate, rng):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def local_conv(x, w, b, *, size, stride=1, pad=0, compute_dtype=None):
    """Locally-connected (untied) conv — forward_local_layer
    (src/local_layer.c:92): per-location weight blocks, per-output-element
    biases.

    x: (B, H, W, C); w: (L, filters, size*size*C) with L = out_h*out_w and
    the k axis ordered (channel, ky, kx) like darknet's im2col columns;
    b: (L, filters). Returns (B, out_h, out_w, filters).

    Maps to the MXU as one batched matmul over locations
    (einsum 'blk,lnk->bln') — the TPU-native equivalent of darknet's
    per-location gemm loop.
    """
    B, H, W, C = x.shape
    if pad:
        out_h = (H - 1) // stride + 1
        out_w = (W - 1) // stride + 1
    else:
        out_h = (H - size) // stride + 1
        out_w = (W - size) // stride + 1
    patches = lax.conv_general_dilated_patches(
        x.astype(compute_dtype or x.dtype),
        filter_shape=(size, size), window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # feature axis of patches is (C, ky, kx)-major — darknet's im2col order
    L = out_h * out_w
    patches = patches.reshape(B, L, size * size * C)
    out = jnp.einsum("blk,lnk->bln", patches, w.astype(patches.dtype),
                     preferred_element_type=jnp.float32)
    out = out + b.astype(out.dtype)
    return out.reshape(B, out_h, out_w, w.shape[1])


def deconv2d(x, w, b=None, *, stride=1, pad=0, compute_dtype=None):
    """Transposed convolution — forward_deconvolutional_layer
    (src/deconvolutional_layer.c:222): out = (h-1)*stride + size - 2*pad.
    w: HWIO (size, size, in_c, out_c). The col2im scatter is an UNFLIPPED
    kernel scatter, so the equivalent gather correlation uses the
    spatially-reversed kernel with lhs dilation."""
    size = w.shape[0]
    p = size - 1 - pad
    dtype = compute_dtype or x.dtype
    out = lax.conv_general_dilated(
        x.astype(dtype), w[::-1, ::-1].astype(dtype),
        window_strides=(1, 1), padding=[(p, p), (p, p)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def crop_inference(x, crop_h, crop_w, *, noadjust=False):
    """Crop layer, inference branch (forward_crop_layer's !net.train path,
    src/crop_layer.c:81-101): center crop + x*2-1 (identity scaling with
    noadjust). Training-time random crop/flip is host augmentation."""
    B, H, W, C = x.shape
    dh = (H - crop_h) // 2
    dw = (W - crop_w) // 2
    out = lax.dynamic_slice(x, (0, dh, dw, 0), (B, crop_h, crop_w, C))
    if noadjust:
        return out
    return out * 2.0 - 1.0


def lrn_darknet(x, *, size=5, alpha=1e-4, beta=0.75, kappa=1.0):
    """Cross-channel LRN — forward_normalization_layer
    (src/normalization_layer.c:66): norms_k = kappa + alpha * sum of
    squares over channels [k-(size-1)//2, k+size//2], reproducing the C
    init quirk where EVERY channel's sum is missing the x[size//2]^2 term
    (the init loop covers [0, size//2) but the rolling update assumes
    [0, size//2]). Output = x * norms^-beta."""
    x32 = x.astype(jnp.float32)
    sq = jnp.square(x32)
    C = x.shape[-1]
    lo, hi = (size - 1) // 2, size // 2
    # windowed channel sum with clipped edges
    pad = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(lo, hi)])
    csum = jnp.cumsum(pad, axis=-1)
    zeros = jnp.zeros_like(csum[..., :1])
    csum = jnp.concatenate([zeros, csum], axis=-1)
    win = csum[..., size:size + C] - csum[..., 0:C]
    deficit = sq[..., hi:hi + 1] if hi < C else 0.0
    norms = kappa + alpha * (win - deficit)
    return (x32 * norms ** (-beta)).astype(x.dtype)


def l2norm_channels(x):
    """Per-position channel L2 normalization (blas.c:126
    l2normalize_cpu): x / sqrt(sum_c x^2), no epsilon — matching C."""
    x32 = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True))
    return (x32 / n).astype(x.dtype)
