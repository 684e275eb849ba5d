"""Weight-file utilities from the darknet CLI dispatcher.

The `darknet` binary ships a family of small commands that transform a
weights file in place (examples/darknet.c:425-499): `average` (checkpoint
averaging), `denormalize` (fold batch norm into the conv weights),
`rgbgr` (swap the first conv's channel order), `rescale` (re-range the
first conv for a different input scaling). Each operates on the UNFOLDED
parameter pytrees (io/weights.py fold=False) so the result round-trips
through save_darknet_weights.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from yolo_tensorflow_tpu.models import specs as S
from yolo_tensorflow_tpu.models.engine import layer_key


def _avg(arrs):
    out = np.asarray(arrs[0], np.float32).copy()
    for a in arrs[1:]:
        out += np.asarray(a, np.float32)
    return out / len(arrs)


def average_params(specs, runs: Sequence[Tuple[dict, dict]]):
    """`darknet average` (examples/darknet.c:425): elementwise mean over
    N checkpoints — with the C's exact type rules. CONVOLUTIONAL layers
    average weights, biases/beta and (when BN) scales + rolling
    mean/variance; CONNECTED layers average ONLY weights and
    biases/beta — a BN'd connected layer's scales and rolling stats keep
    the FIRST file's values (the C loop never touches them). Every other
    layer type (local/deconv/recurrent/...) passes the first file's
    tensors through untouched, exactly like the C's sum network that
    never accumulates them.

    runs: [(params, batch_stats), ...] unfolded. Returns (params, stats).
    """
    if not runs:
        raise ValueError("average needs at least one checkpoint")
    p0, s0 = runs[0]
    out_p = {k: dict(v) for k, v in p0.items()}
    out_s = {k: dict(v) for k, v in s0.items()}
    for i, spec in enumerate(specs):
        key = layer_key(i)
        if key not in p0:
            continue
        if isinstance(spec, S.Conv):
            keys = ["w"] + (["gamma", "beta"] if spec.bn else ["b"])
            for name in keys:
                out_p[key][name] = _avg([p[key][name] for p, _ in runs])
            if spec.bn:
                for name in ("mean", "var"):
                    out_s[key][name] = _avg([s[key][name]
                                             for _, s in runs])
        elif isinstance(spec, S.Dense):
            # the C averages l.weights and l.biases only — for a BN'd
            # connected layer biases ARE beta, but scales/rolling stats
            # stay file-1 (quirk kept)
            for name in ("w", "beta" if spec.bn else "b"):
                out_p[key][name] = _avg([p[key][name] for p, _ in runs])
    return out_p, out_s


def denormalize(specs, params, batch_stats):
    """`darknet denormalize` (examples/darknet.c:473 denormalize_net):
    fold BN into the preceding conv/connected weights and drop the BN
    slots, with the C's own eps constants — sqrt(var + 1e-5) for
    convolutional (denormalize_convolutional_layer), sqrt(var + 1e-6)
    for connected (denormalize_connected_layer). These differ from the
    runtime's normalize_cpu (1/(sqrt(var)+1e-6)), so the C's
    denormalized net is NOT bit-equal to its BN form — the same tiny
    drift applies here by design.

    Deconvolutional BN folds on the output-filter axis; note the C's
    denormalize_convolutional_layer indexes deconv weights with the conv
    (n,c,k,k) stride pattern even though deconv stores (c,n,k,k) — a
    reference bug we do not reproduce.

    Returns (new_specs, new_params): specs with bn=False and {w, b}
    params, ready for save_darknet_weights / specs_to_cfg (the C leaves
    the .cfg stale after denormalize; emit the matching cfg instead).
    """
    new_specs = list(specs)
    out = {}
    for i, spec in enumerate(specs):
        key = layer_key(i)
        if key not in params:
            continue
        p = params[key]
        if isinstance(spec, (S.Conv, S.Deconv, S.Dense)) and \
                getattr(spec, "bn", False):
            eps = 1e-6 if isinstance(spec, S.Dense) else 1e-5
            st = batch_stats[key]
            scale = (np.asarray(p["gamma"], np.float32)
                     / np.sqrt(np.asarray(st["var"], np.float32) + eps))
            w = np.asarray(p["w"], np.float32) * scale   # O on last axis
            b = (np.asarray(p["beta"], np.float32)
                 - np.asarray(st["mean"], np.float32) * scale)
            out[key] = {"w": w, "b": b}
            new_specs[i] = dataclasses.replace(spec, bn=False)
        elif isinstance(spec, S.RECURRENT) and getattr(spec, "bn", False):
            # the C denormalizes GRU sublayers too (darknet.c:478-483);
            # folding nested sublayer BN is not implemented here — fail
            # clearly instead of a KeyError at save time
            raise NotImplementedError(
                f"denormalize: layer {i} ({type(spec).__name__}) has "
                "batch_normalize sublayers, which this operation does not "
                "fold — retrain/convert the recurrent layers without "
                "batch_normalize first")
        else:
            out[key] = dict(p)
    return tuple(new_specs), out


def reset_normalize(specs, params, batch_stats):
    """`darknet reset` (reset_normalize_net, examples/darknet.c:471):
    denormalize_*_layer math — weights absorb gamma/sqrt(var+eps), beta
    absorbs the mean — but the layers KEEP their BN slots, reset to the
    identity (gamma 1, mean 0, var 1). The result is not bit-identical
    to plain denormalize at inference: darknet's normalize_cpu divides
    by sqrt(1)+1e-6, a one-ppm shrink per layer — the C has the same
    drift. specs are unchanged. GRU sub-layers (which the C also
    resets) are not handled; recurrent BN raises immediately."""
    out_p = {}
    out_s = {}
    for i, spec in enumerate(specs):
        key = layer_key(i)
        if key not in params:
            continue
        p = params[key]
        if isinstance(spec, (S.Conv, S.Deconv, S.Dense)) and \
                getattr(spec, "bn", False):
            eps = 1e-6 if isinstance(spec, S.Dense) else 1e-5
            st = batch_stats[key]
            scale = (np.asarray(p["gamma"], np.float32)
                     / np.sqrt(np.asarray(st["var"], np.float32) + eps))
            n = scale.shape[0]
            out_p[key] = {
                "w": np.asarray(p["w"], np.float32) * scale,
                "gamma": np.ones(n, np.float32),
                "beta": (np.asarray(p["beta"], np.float32)
                         - np.asarray(st["mean"], np.float32) * scale),
            }
            out_s[key] = {"mean": np.zeros(n, np.float32),
                          "var": np.ones(n, np.float32)}
        elif isinstance(spec, S.RECURRENT) and getattr(spec, "bn", False):
            raise NotImplementedError(
                f"reset: layer {i} ({type(spec).__name__}) has "
                "batch_normalize sublayers, which this operation does not "
                "reset — retrain/convert the recurrent layers without "
                "batch_normalize first")
        else:
            out_p[key] = dict(p)
            if key in batch_stats:
                out_s[key] = dict(batch_stats[key])
    return out_p, out_s


def normalize(specs, params, batch_stats=None):
    """`darknet normalize` (normalize_net -> normalize_layer,
    examples/darknet.c): give every bias-only conv/connected layer BN
    slots — gamma 1, biases becoming beta, rolling mean 0 and rolling
    variance **0** (the C callocs it; at inference normalize_cpu then
    divides by sqrt(0)+1e-6, a ~1e6 amplification — the command exists
    to re-estimate stats by further training, and the quirk is kept).
    Returns (new_specs with bn=True, params, batch_stats); layers that
    already had BN pass through with their existing stats."""
    batch_stats = batch_stats or {}
    new_specs = list(specs)
    out_p = {}
    out_s = {k: dict(v) for k, v in batch_stats.items()}
    for i, spec in enumerate(specs):
        key = layer_key(i)
        if key not in params:
            continue
        p = params[key]
        if isinstance(spec, (S.Conv, S.Dense)) and \
                not getattr(spec, "bn", True):
            n = np.asarray(p["b"]).shape[0]
            out_p[key] = {"w": np.asarray(p["w"], np.float32),
                          "gamma": np.ones(n, np.float32),
                          "beta": np.asarray(p["b"], np.float32)}
            out_s[key] = {"mean": np.zeros(n, np.float32),
                          "var": np.zeros(n, np.float32)}
            new_specs[i] = dataclasses.replace(spec, bn=True)
        else:
            out_p[key] = dict(p)
    return tuple(new_specs), out_p, out_s


def _first_conv_key(specs):
    for i, spec in enumerate(specs):
        if isinstance(spec, S.Conv):
            return layer_key(i), spec
    raise ValueError("model has no convolutional layer")


def rgbgr(specs, params):
    """`darknet rgbgr` (rgbgr_weights, src/convolutional_layer.c): swap
    the FIRST conv's input-channel order (RGB <-> BGR) when it has 3
    input channels — for serving weights trained with the opposite
    channel convention. HWIO: reverse axis 2."""
    key, _ = _first_conv_key(specs)
    out = {k: dict(v) for k, v in params.items()}
    w = np.asarray(out[key]["w"])
    if w.shape[2] == 3:
        out[key]["w"] = np.ascontiguousarray(w[:, :, ::-1, :])
    return out


def rescale(specs, params, scale: float = 2.0, trans: float = -0.5):
    """`darknet rescale` (rescale_net -> rescale_weights): re-range the
    FIRST 3-channel conv for an affine input change x -> scale*x + trans
    (the shipped values 2,-0.5 convert a [0,1]-input net to [-.5, 1.5]
    style ranges): w *= scale, then bias += trans * sum(scaled filter),
    per output filter — the sum taken AFTER scaling, like the C."""
    key, spec = _first_conv_key(specs)
    out = {k: dict(v) for k, v in params.items()}
    w = np.asarray(out[key]["w"], np.float32)
    if w.shape[2] != 3:
        return out
    w2 = w * scale
    out[key]["w"] = w2
    bkey = "beta" if spec.bn else "b"
    out[key][bkey] = (np.asarray(out[key][bkey], np.float32)
                      + trans * w2.sum(axis=(0, 1, 2)))
    return out
