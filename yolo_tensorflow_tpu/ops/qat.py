"""Quantization-aware training (QAT) for the int8 serving path.

Post-training quantization (ops/quant.py) costs a measured -0.021 mAP@0.5
on the 12-class hard synthetic task (tools/synthetic_train_demo.py). QAT
removes that price by simulating the exact serving-time quantization grid
inside the training forward pass — round/clip to the int8 lattice with a
straight-through estimator (STE) so gradients flow as if the rounding were
identity — letting the weights settle where the quantized network, not the
float network, is optimal. The reference has no quantization story at all
(darknet trains and serves f32); this is a TPU-native capability on top of
SURVEY.md §2's inventory.

Design (mirrors the PTQ conventions in ops/quant.py so export is drop-in):

  * weights: per-output-channel symmetric, s_w[o] = max|w[..., o]|/127,
    recomputed from the live weights every step (scale follows the weight
    as it trains; stop-gradient on the scale).
  * activations: per-conv-input scalar scale, tracked as an EMA of the
    observed batch abs-max/127 in the train step (the moral twin of PTQ's
    calibrate_activations, but tracked during training instead of a
    separate calibration pass). Until the first update the scale
    self-calibrates from the current batch inside the step.
  * head convs (the 1x1 detect layers) stay float, same as serving
    (quant.head_conv_layers).

Export: after folding BN with the trained rolling stats, the folded
weight's quantization grid is IDENTICAL to the trained fake-quant grid —
folding multiplies w[..., o] by c_o = gamma_o/sqrt(var_o+eps), the
per-channel scale absorbs |c_o| exactly, and round(-x) == -round(x) under
round-half-to-even covers negative gamma (pinned by
tests/test_qat.py::test_fold_commutes_with_weight_fake_quant). So
``export_int8`` is just fold + ops/quant.quantize_params with the tracked
activation scales, and the exported model runs the existing int8 serving
path (engine's "w_q" branch) unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu.models import engine, specs as S


def fake_quant(x, scale):
    """Symmetric int8 fake-quantization with a clip-aware STE.

    Forward: round(x/scale) clipped to [-127, 127], times scale — the same
    lattice the serving path's quantize produces (quant.conv2d_int8).
    Backward: identity inside the representable range, zero where the clip
    saturated (the standard clip-aware straight-through estimator).
    ``scale`` broadcasts (scalar for activations, per-channel for weights)
    and is treated as a constant (stop-gradient).
    """
    s = jax.lax.stop_gradient(scale)
    q = jnp.round(x / s)
    y = jnp.clip(q, -127.0, 127.0) * s
    passthrough = jnp.abs(q) <= 127.0
    xg = jnp.where(passthrough, x, jax.lax.stop_gradient(x))
    return xg + jax.lax.stop_gradient(y - xg)


def weight_scale(w):
    """Per-output-channel symmetric scale, the PTQ formula
    (quant.quantize_params): max|w[..., o]|/127 over all non-output axes."""
    red = tuple(range(w.ndim - 1))
    return jnp.maximum(jnp.max(jnp.abs(w), axis=red), 1e-8) / 127.0


def fake_quant_weights(w):
    """Fake-quantize a conv weight (HWIO) on the serving grid."""
    return fake_quant(w, weight_scale(w))


def quantizable_layers(specs) -> list:
    """Conv layer indices the int8 serving path quantizes: every Conv
    except the head convs feeding a Detect marker (quant.head_conv_layers'
    complement over convs)."""
    from yolo_tensorflow_tpu.ops.quant import head_conv_layers
    skip = head_conv_layers(specs)
    return [i for i, sp in enumerate(specs)
            if isinstance(sp, S.Conv) and i not in skip]


def init_scales(specs) -> Dict[str, jax.Array]:
    """Initial activation-scale pytree: 0.0 = uninitialized — the engine
    self-calibrates from the first batch's abs-max and the EMA takes over
    from there (update_scales)."""
    return {engine.layer_key(i): jnp.float32(0.0)
            for i in quantizable_layers(specs)}


def update_scales(scales: Dict[str, jax.Array],
                  ranges: Dict[str, jax.Array],
                  momentum: float = 0.99) -> Dict[str, jax.Array]:
    """EMA the observed per-conv-input abs-max into the activation scales.

    ranges: {layer_key: max|conv input|} from engine.apply's aux
    (global across the mesh — the max reduction runs under GSPMD, so data-
    parallel shards agree). A zero (uninitialized) scale jumps straight to
    the batch value; afterwards s <- m*s + (1-m)*batch_max/127.
    """
    def one(s, r):
        batch_s = jnp.maximum(r, 1e-6) / 127.0
        return jnp.where(s > 0, momentum * s + (1.0 - momentum) * batch_s,
                         batch_s).astype(jnp.float32)
    return {k: one(scales[k], ranges[k]) for k in scales}


def export_int8(specs, params, batch_stats, scales, *, bn_eps: float,
                bn_formula: str = "tf",
                skip: Optional[set] = None) -> Dict[str, Any]:
    """QAT train state -> int8 serving params (the engine's "w_q" pytree).

    Folds BN with the trained rolling stats (io.weights.fold_params,
    'tf' formula — what batch_norm_train computed during training), then
    quantizes on the PTQ path with the TRACKED activation scales standing
    in for a calibration pass. The per-channel weight grid after folding
    equals the grid trained against (module docstring); activations use
    the exact EMA scales the fake-quant saw.
    """
    from yolo_tensorflow_tpu.io.weights import fold_params
    from yolo_tensorflow_tpu.ops.quant import quantize_params
    folded = fold_params(params, batch_stats, bn_eps, bn_formula=bn_formula)
    act_scales = {k: float(v) for k, v in scales.items() if float(v) > 0}
    return quantize_params(specs, folded, act_scales, skip=skip)


def qat_eval_scales(scales) -> Dict[str, jax.Array]:
    """Scales pytree for fake-quant EVALUATION (engine.apply(qat_scales=...)
    with train=False): drop never-updated zeros so an un-warmed layer runs
    float instead of self-calibrating per batch."""
    return {k: v for k, v in scales.items() if float(v) > 0}


__all__ = ["fake_quant", "fake_quant_weights", "weight_scale",
           "quantizable_layers", "init_scales", "update_scales",
           "export_int8", "qat_eval_scales"]
