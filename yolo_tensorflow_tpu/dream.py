"""Feature visualization ("deep dream") and feature inversion — the
reference's `darknet nightmare` demo (examples/nightmare.c), TPU-native.

Two modes, same as the C driver (`run_nightmare`, nightmare.c:288):

* **Dream** (`optimize_picture`, nightmare.c:28-113): gradient ASCENT on
  the image, amplifying a chosen layer's already-strong activations. Per
  iteration the C jitter-crops (+-8 px), picks a random octave scale
  (1/1.333^k), random-flips, runs forward to the layer, masks the output
  to entries above mean + thresh*sigma (`calculate_loss`, :17-26), and
  backprops that masked output as the delta — i.e. the gradient of
  0.5*sum(masked out^2). Here the forward+backward is one jitted
  `jax.grad` per (layer, octave shape) — XLA compiles each shape once and
  caches — while the cheap per-iteration image shuffle (clamped-shift
  crop :38 == crop_image's edge clamp, flip, octave resize, the
  0.1*(0.5-x) mid-gray pull :88-91, normalize_array :93, rate update and
  [0,1] clip :104) stays on host, mirroring the C's structure. cv2's
  bilinear stands in for darknet's resize_image (a visualization demo —
  no parity gate).

* **Reconstruct** (`reconstruct_picture`, nightmare.c:135-179): feature
  inversion — record the target layer's feature map for an input, then
  iterate image <- image + rate*update with update accumulating the
  L2-matching gradient under momentum. Here the ENTIRE iteration loop is
  one on-device `lax.scan` (one dispatch per round), vs the C's per-iter
  full network walk. The optional window-smoothness regularizer
  (`smooth`, :115-133 — present but commented out of the C's loop at
  :166) is implemented with `lax.reduce_window` and off by default like
  the vendored C. `zero_objectness` (region_layer.c:497) is reproduced
  for detection-head targets by zeroing the per-anchor objectness
  channel in the recorded features (on the RAW map — this framework
  truncates at the conv feeding the head, so the zero lands pre-logistic
  where the C zeroes post-activation; documented divergence, demo-only).

Layer indexing: `layer` is the spec index as printed by the `summary`
CLI, and the layer's output is INCLUDED (the C's dream mode,
nightmare.c:31 `net->n = max_layer + 1`; its reconstruct mode truncates
BEFORE the layer, :338 — we keep one consistent rule instead).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu.models import engine, specs as S


def _prefix_specs(specs, layer: int):
    """Truncate the spec list at ``layer`` (inclusive) and mark the final
    tensor with a Detect so engine.apply returns it."""
    if not 0 <= layer < len(specs):
        raise ValueError(f"layer {layer} out of range (0..{len(specs)-1})")
    sub = tuple(specs[:layer + 1])
    if not isinstance(sub[-1], S.Detect):
        sub = sub + (S.Detect(()),)
    return sub


def _input_fold(cfg):
    """(rescale, offset): darknet-image [0,1] -> this model's network
    input (normalization_fold's contract with u == px/255)."""
    from yolo_tensorflow_tpu.pipeline import normalization_fold
    return normalization_fold(cfg)


def _shift_crop(img: np.ndarray, dx: int, dy: int,
                out_w: Optional[int] = None,
                out_h: Optional[int] = None) -> np.ndarray:
    """darknet crop_image (src/image.c:857): out[y,x] = im[clamp(y+dy),
    clamp(x+dx)] over an (out_w, out_h) window — edge-clamped, so borders
    replicate instead of wrapping or zero-filling."""
    h, w = img.shape[:2]
    rows = np.clip(np.arange(out_h if out_h is not None else h) + dy,
                   0, h - 1)
    cols = np.clip(np.arange(out_w if out_w is not None else w) + dx,
                   0, w - 1)
    return img[rows][:, cols]


def make_dream_step(cfg, specs, layer: int, *, thresh: float = 1.0):
    """Jitted (params, u[1,H,W,3] in [0,1]) -> (objective, du): the value
    and input-gradient of 0.5*sum(out^2 over out > mean + thresh*sigma)
    at the layer — `calculate_loss`'s masked delta (nightmare.c:17-26) is
    exactly this objective's gradient w.r.t. the layer output. One
    factory per layer; jax.jit re-specializes per octave shape."""
    sub = _prefix_specs(specs, layer)
    rescale, offset = _input_fold(cfg)

    @jax.jit
    def step(params, u):
        def objective(uu):
            x = uu * rescale + offset
            dets, _ = engine.apply(sub, params, x, bn_eps=cfg.bn_eps)
            out = dets[-1][0].astype(jnp.float32)
            mu = jnp.mean(out)
            sd = jnp.sqrt(jnp.var(out))
            mask = jax.lax.stop_gradient(out > mu + thresh * sd)
            return 0.5 * jnp.sum(jnp.where(mask, out * out, 0.0))
        return jax.value_and_grad(objective)(u)

    return step


def dream(cfg, specs, params, image_u8: np.ndarray, layer: int, *,
          rounds: int = 1, iters: int = 10, octaves: int = 4,
          layer_range: int = 1, rate: float = 0.04, thresh: float = 1.0,
          norm: bool = True, zoom: float = 1.0, rotate: float = 0.0,
          seed: int = 0, on_round=None, verbose: bool = False):
    """The `darknet nightmare` dream loop (run_nightmare + optimize_picture).

    Defaults match the C flags (nightmare.c:300-314): -range 1 -norm 1
    -rounds 1 -iters 10 -octaves 4 -zoom 1 -rate .04 -thresh 1 -rotate 0.
    ``on_round(e, image_u8)`` is the per-round save hook (the C saves
    ``<im>_<cfg>_<layer>_%06d`` each round, :396-402, then applies
    rotate/zoom :406-415). Returns (final image uint8, objective history).
    """
    import cv2

    u = image_u8.astype(np.float32) / 255.0  # darknet [0,1] HWC RGB image
    h, w = u.shape[:2]
    # fixed-input-size layers break octave rescaling; check the whole
    # prefix the per-iteration layer jitter can reach (li can exceed
    # `layer` by layer_range - 1 - layer_range//2)
    hi = layer + (layer_range - 1 - layer_range // 2
                  if layer_range > 1 else 0)
    hi = min(max(hi, layer), len(specs) - 1)
    FIXED_SIZE = (S.Dense, S.TransposeFlatten, S.Local, S.Crop)
    if octaves > 1 and any(isinstance(sp, FIXED_SIZE)
                           for sp in specs[:hi + 1]):
        raise ValueError(
            "octave rescaling needs a fully-convolutional prefix; a Dense/"
            "flatten/local/crop layer fixes the input size — pass "
            "octaves=1 or a shallower --layer (the C's resize_network has "
            "the same limit)")
    if any(isinstance(sp, FIXED_SIZE) for sp in specs[:hi + 1]) \
            and (h, w) != (cfg.input_size, cfg.input_size):
        raise ValueError(
            f"the target prefix contains a fixed-input-size layer, so the "
            f"image must be exactly {cfg.input_size}x{cfg.input_size} "
            f"(got {w}x{h}) — resize it first")
    rng = np.random.default_rng(seed)
    steps: Dict[int, object] = {}
    history = []
    for e in range(rounds):
        for _ in range(iters):
            # nightmare.c:392-394: layer jitter, octave, then :33-40
            li = layer + (int(rng.integers(layer_range)) - layer_range // 2
                          if layer_range > 1 else 0)
            li = min(max(li, 0), len(specs) - 1)
            octave = int(rng.integers(octaves)) if octaves > 1 else 0
            sc = 1.0 / (1.3333333 ** octave)
            dx = int(rng.integers(16)) - 8
            dy = int(rng.integers(16)) - 8
            flip = bool(rng.integers(2))

            crop = _shift_crop(u, dx, dy)
            sw, sh = max(int(w * sc), 8), max(int(h * sc), 8)
            im = cv2.resize(crop, (sw, sh), interpolation=cv2.INTER_LINEAR)
            if flip:
                im = im[:, ::-1]
            fn = steps.get(li)
            if fn is None:
                fn = steps[li] = make_dream_step(cfg, specs, li,
                                                 thresh=thresh)
            val, g = fn(params, jnp.asarray(im[None]))
            history.append(float(val))
            g = np.asarray(g[0], np.float32)
            if flip:
                g = g[:, ::-1]
            g = cv2.resize(g, (w, h), interpolation=cv2.INTER_LINEAR)
            out = _shift_crop(g, -dx, -dy)
            # mid-gray pull + normalize + ascent step (nightmare.c:88-104)
            out = out + 0.1 * (0.5 - u)
            if norm:
                out = (out - out.mean()) / max(float(out.std()), 1e-12)
            u = np.clip(u + rate * out, 0.0, 1.0)
        if verbose and history:
            print(f"round {e}: objective {history[-1]:.4g}", flush=True)
        if on_round is not None:
            on_round(e, (u * 255.0 + 0.5).astype(np.uint8))
        if rotate:
            m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), rotate, 1.0)
            u = cv2.warpAffine(u, m, (w, h))
        if zoom != 1.0:
            cw, ch = max(int(w * zoom), 2), max(int(h * zoom), 2)
            x0, y0 = int(w * (1.0 - zoom) / 2.0), int(h * (1.0 - zoom) / 2.0)
            u = cv2.resize(_shift_crop(u, x0, y0, cw, ch), (w, h),
                           interpolation=cv2.INTER_LINEAR)
    return (u * 255.0 + 0.5).astype(np.uint8), history


def _smooth_term(u, num: int):
    """darknet's `smooth` regularizer (nightmare.c:115-133): for every
    pixel, lambda * sum over the edge-CLIPPED (2num+1)^2 window of
    (neighbor - center) == window_sum - window_count*center."""
    win = (1, 2 * num + 1, 2 * num + 1, 1)
    pad = ((0, 0), (num, num), (num, num), (0, 0))
    s = jax.lax.reduce_window(u, 0.0, jax.lax.add, win, (1, 1, 1, 1), pad)
    cnt = jax.lax.reduce_window(jnp.ones_like(u), 0.0, jax.lax.add, win,
                                (1, 1, 1, 1), pad)
    return s - cnt * u


def make_reconstruct(cfg, specs, layer: int, *, rate: float = 0.04,
                     momentum: float = 0.9, lam: float = 0.0,
                     smooth_size: int = 1, iters: int = 10):
    """(features_of, run) for feature inversion (reconstruct_picture,
    nightmare.c:135-179). ``features_of(params, u)`` records the target
    map; ``run(params, u0, update0, features)`` executes ``iters``
    update steps as ONE lax.scan on device and returns (u, update, mags)
    — mags is the C's per-iteration printed gradient magnitude (:172).
    ``lam`` > 0 enables the window-smoothness term the vendored C ships
    commented out (:166)."""
    sub = _prefix_specs(specs, layer)
    rescale, offset = _input_fold(cfg)

    def forward(params, u):
        x = u * rescale + offset
        dets, _ = engine.apply(sub, params, x, bn_eps=cfg.bn_eps)
        return dets[-1][0].astype(jnp.float32)

    @jax.jit
    def features_of(params, u):
        return forward(params, u)

    @jax.jit
    def run(params, u0, upd0, features):
        def body(carry, _):
            u, upd = carry
            # delta = backward(features - out) = -grad 0.5||out - feat||^2
            g = jax.grad(
                lambda uu: 0.5 * jnp.sum(
                    (forward(params, uu) - features) ** 2))(u)
            delta = -g
            mag = jnp.sqrt(jnp.sum(delta * delta))
            upd = upd + delta                       # axpy :165
            if lam:
                upd = upd + lam * _smooth_term(u, smooth_size)
            u = jnp.clip(u + rate * upd, 0.0, 1.0)  # axpy :168 + constrain
            upd = momentum * upd                    # scal :169
            return (u, upd), mag
        (u, upd), mags = jax.lax.scan(body, (u0, upd0), None, length=iters)
        return u, upd, mags

    return features_of, run


def reconstruct(cfg, specs, params, image_u8: np.ndarray, layer: int, *,
                rounds: int = 1, iters: int = 10, rate: float = 0.04,
                momentum: float = 0.9, lam: float = 0.0,
                smooth_size: int = 1, random_start: bool = False,
                seed: int = 0, on_round=None, verbose: bool = False):
    """Full reconstruct driver: letterbox to the net size, record the
    layer's features (zeroing per-anchor objectness channels when the
    target is a detection head, region_layer.c:497), then invert. The
    vendored C starts from the original image (its random start is
    commented out, nightmare.c:363-368); ``random_start=True`` restores
    that intent. Returns (final image uint8, mags history)."""
    from yolo_tensorflow_tpu.data.augment import letterbox

    boxed, _, _, _ = letterbox(image_u8, cfg.input_size)
    u_target = jnp.asarray(boxed[None].astype(np.float32) / 255.0)
    features_of, run = make_reconstruct(
        cfg, specs, layer, rate=rate, momentum=momentum, lam=lam,
        smooth_size=smooth_size, iters=iters)
    feats = np.array(features_of(params, u_target))
    sp = specs[layer]
    if isinstance(sp, S.Detect) and cfg.head in (2, 3):
        nA = len(sp.anchor_mask) or cfg.num_anchors
        block = 4 + 1 + cfg.num_classes
        feats[..., [a * block + 4 for a in range(nA)]] = 0.0
    feats = jnp.asarray(feats)

    if random_start:
        rng = np.random.default_rng(seed)
        u = jnp.asarray(rng.random(u_target.shape, np.float32))
    else:
        u = u_target
    upd = jnp.zeros_like(u)
    mags_all = []
    for e in range(rounds):
        u, upd, mags = run(params, u, upd, feats)
        mags_all.extend(float(m) for m in np.asarray(mags))
        if verbose and mags_all:
            print(f"round {e}: mag {mags_all[-1]:.4g}", flush=True)
        if on_round is not None:
            img = (np.asarray(u[0]) * 255.0 + 0.5).astype(np.uint8)
            on_round(e, img)
    return (np.asarray(u[0]) * 255.0 + 0.5).astype(np.uint8), mags_all
