"""Network inspection and image-utility commands — the small darknet CLI
tools that round out `examples/darknet.c`'s dispatch table:

* ``ops`` / ``speed``   — `numops` FLOP accounting (darknet.c:80-134)
* ``print``             — per-filter conv weight dump (print_weights, :190)
* ``statistics``        — weight statistics for BN'd connected/GRU layers
                          (statistics_net, :305)
* ``visualize``         — first-layer/all-conv filter grids
                          (visualize_network, src/network.c:477 +
                          collapse_images_vert, src/image.c:1513)
* ``mkimg``             — collage images ghost-pasted from first-conv
                          filters (mkimg, darknet.c:375)
* ``imtest``            — the image-op self test (test_resize,
                          src/image.c:1392)
* ``3d``                — stereo composite (composite_3d, src/image.c:909)

All of these are host-side utilities operating on float [0,1] images in
HWC layout (darknet stores CHW; every op here is layout-independent
except the strided ``dist_array`` sampling and the connected-weights
statistics slice, which are explicitly converted to darknet's flat
order). They are transcriptions, not ports: each function cites the C it
reproduces and the tests diff them against literal loop transcriptions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from yolo_tensorflow_tpu.models import engine, specs as S


# ---------------------------------------------------------------------------
# FLOP accounting (numops, examples/darknet.c:80-113)

def numops(specs, input_size: int, in_channels: int = 3) -> int:
    """The C's ``numops``: the shared engine.layer_flops arithmetic summed
    over ONLY the types the C counts (conv, connected, rnn/gru/lstm).
    Deliberately matches the C's omissions — local, deconvolutional and
    crnn layers are NOT counted (they are absent from numops' type
    switch), so `ops` on such a cfg undercounts exactly like darknet.
    The `summary` command's BFLOPs column is the fuller accounting."""
    shapes = engine.infer_shapes(specs, (1, input_size, input_size,
                                         in_channels))
    prev = (1, input_size, input_size, in_channels)
    total = 0.0
    for i, sp in enumerate(specs):
        if isinstance(sp, (S.Conv, S.Dense, S.Rnn, S.Gru, S.Lstm)):
            total += engine.layer_flops(sp, shapes[i], prev)
        prev = shapes[i]
    return int(total)


# ---------------------------------------------------------------------------
# Weight statistics (print_statistics, src/utils.c:507; statistics_net,
# examples/darknet.c:305)

def print_statistics(a: np.ndarray) -> str:
    """One stat line: the C's 'MSE' is actually the RMS sqrt(mean(a^2))
    (mse_array, src/utils.c:546); variance is the biased 1/n form."""
    a = np.asarray(a, np.float64).ravel()
    n = max(a.size, 1)
    rms = float(np.sqrt(np.sum(a * a) / n))
    m = float(np.mean(a)) if a.size else 0.0
    v = float(np.sum((a - m) ** 2) / n)
    return f"MSE: {rms:.6f}, Mean: {m:.6f}, Variance: {v:.6f}"


def _connected_stat_lines(p: Dict[str, np.ndarray], units: int,
                          bn: bool) -> List[str]:
    """statistics_connected_layer (src/connected_layer.c:215). The C
    passes l.outputs as the COUNT for the weights line, so only the
    first `outputs` floats of the (outputs x inputs) row-major weight
    array are summarized — a C quirk kept on purpose. Our dense weights
    are (in, out); darknet flat order is w.T.ravel()."""
    lines = []
    if bn:
        lines.append("Scales " + print_statistics(p["gamma"]))
        bias = p["beta"]
    else:
        bias = p["b"]
    lines.append("Biases " + print_statistics(bias))
    w_darknet = np.asarray(p["w"]).T.ravel()
    lines.append("Weights " + print_statistics(w_darknet[:units]))
    return lines


def statistics_lines(specs, params) -> List[str]:
    """statistics_net (examples/darknet.c:305): BN'd connected layers and
    BN'd GRU sublayers, in the C's print order (Input Z/R/H then
    State Z/R/H — darknet's input_* are our u*, state_* our w*). The C
    prints a blank line for EVERY layer, matching or not; kept."""
    lines: List[str] = []
    for i, sp in enumerate(specs):
        p = params.get(engine.layer_key(i), {})
        if isinstance(sp, S.Dense) and sp.bn:
            lines.append(f"Connected Layer {i}")
            lines += _connected_stat_lines(p, sp.units, True)
        elif isinstance(sp, S.Gru) and sp.bn:
            lines.append(f"GRU Layer {i}")
            for label, sub in (("Input Z", "uz"), ("Input R", "ur"),
                               ("Input H", "uh"), ("State Z", "wz"),
                               ("State R", "wr"), ("State H", "wh")):
                lines.append(label)
                lines += _connected_stat_lines(p[sub], sp.output, True)
        lines.append("")
    return lines


def conv_weight_rows(w_hwio: np.ndarray) -> np.ndarray:
    """print_weights (examples/darknet.c:190): one row per output filter
    in darknet's (c, h, w) flat order."""
    w = np.asarray(w_hwio)
    if w.ndim != 4:
        raise ValueError(f"print expects a conv layer (4-d weights), "
                         f"got shape {w.shape}")
    return w.transpose(3, 2, 0, 1).reshape(w.shape[3], -1)


# ---------------------------------------------------------------------------
# Image primitives (float [0,1] HWC, transcribed from src/image.c)

def normalize_image(im: np.ndarray) -> np.ndarray:
    """normalize_image (src/image.c:465): min/max rescale with the
    degenerate-range guard (span < 1e-9 -> treat as [0, 1])."""
    mn, mx = float(im.min()), float(im.max())
    if mx - mn < 1e-9:
        mn, mx = 0.0, 1.0
    return (im - mn) / (mx - mn)


def constrain_image(im: np.ndarray) -> np.ndarray:
    """constrain_image (src/image.c:456): clip to [0,1]."""
    return np.clip(im, 0.0, 1.0)


def crop_image(im: np.ndarray, dx: int, dy: int, w: int,
               h: int) -> np.ndarray:
    """crop_image (src/image.c:857): out[y,x] = im[clamp(y+dy),
    clamp(x+dx)] — edge-clamped (borders replicate)."""
    rows = np.clip(np.arange(h) + dy, 0, im.shape[0] - 1)
    cols = np.clip(np.arange(w) + dx, 0, im.shape[1] - 1)
    return im[rows][:, cols]


def rotate_cw(im: np.ndarray, times: int) -> np.ndarray:
    """rotate_image_cw (src/image.c:328): square images only; each step
    applies new[r, c] = old[c, n-1-r] (== np.rot90 k=1 per step)."""
    if im.shape[0] != im.shape[1]:
        raise ValueError("rotate_cw needs a square image")
    return np.rot90(im, k=times % 4, axes=(0, 1)).copy()


def grayscale_image(im: np.ndarray) -> np.ndarray:
    """grayscale_image (src/image.c:1208): ITU-R 601 luma, 1 channel."""
    scale = np.array([0.299, 0.587, 0.114], im.dtype)
    return (im * scale).sum(axis=-1, keepdims=True)


def _rgb_to_hsv(im: np.ndarray) -> np.ndarray:
    """rgb_to_hsv (src/image.c:1112), vectorized; h in [0,1)."""
    r, g, b = im[..., 0], im[..., 1], im[..., 2]
    mx = np.maximum(np.maximum(r, g), b)
    mn = np.minimum(np.minimum(r, g), b)
    delta = mx - mn
    v = mx
    s = np.where(mx == 0, 0.0, delta / np.where(mx == 0, 1.0, mx))
    with np.errstate(divide="ignore", invalid="ignore"):
        hr = (g - b) / delta
        hg = 2.0 + (b - r) / delta
        hb = 4.0 + (r - g) / delta
    h = np.where(r == mx, hr, np.where(g == mx, hg, hb))
    # gray pixels (delta==0, max>0) hit 0/0 in the C too; s==0 makes the
    # value irrelevant on the way back — pin it to 0 to avoid NaN churn
    h = np.where(delta == 0, 0.0, h)
    h = np.where(h < 0, h + 6.0, h) / 6.0
    h = np.where(mx == 0, 0.0, h)
    return np.stack([h, s, v], axis=-1)


def _hsv_to_rgb(im: np.ndarray) -> np.ndarray:
    """hsv_to_rgb (src/image.c:1149), vectorized; index>=5 and the exact
    branch order follow the C (the trailing else is the index==5 arm)."""
    h = 6.0 * im[..., 0]
    s, v = im[..., 1], im[..., 2]
    idx = np.floor(h)
    f = h - idx
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    conds = [idx == 0, idx == 1, idx == 2, idx == 3, idx == 4]
    r = np.select(conds, [v, q, p, p, t], default=v)
    g = np.select(conds, [t, v, v, q, p], default=p)
    b = np.select(conds, [p, p, t, v, v], default=q)
    out = np.stack([r, g, b], axis=-1)
    return np.where(s[..., None] == 0, v[..., None], out)


def distort_image(im: np.ndarray, dhue: float, dsat: float,
                  dexp: float) -> np.ndarray:
    """distort_image (src/image.c:1315): HSV scale sat/val, shift hue
    with single wraparound, back to RGB, clip. Float [0,1] RGB."""
    hsv = _rgb_to_hsv(im.astype(np.float32))
    hsv[..., 1] *= dsat
    hsv[..., 2] *= dexp
    h = hsv[..., 0] + dhue
    h = np.where(h > 1, h - 1, h)
    hsv[..., 0] = np.where(h < 0, h + 1, h)
    return constrain_image(_hsv_to_rgb(hsv))


def ghost_image(source: np.ndarray, dest: np.ndarray, dx: int,
                dy: int) -> None:
    """ghost_image (src/image.c:380): paste with a radial alpha falloff
    centered on the source; writes into ``dest`` in place."""
    sh, sw = source.shape[:2]
    max_dist = np.sqrt((-sw / 2.0 + 0.5) ** 2)
    ys = np.arange(sh)[:, None] - sh / 2.0 + 0.5
    xs = np.arange(sw)[None, :] - sw / 2.0 + 0.5
    alpha = np.maximum(1.0 - np.sqrt(xs * xs + ys * ys) / max_dist,
                       0.0)[..., None]
    region = dest[dy:dy + sh, dx:dx + sw]
    region[...] = alpha * source + (1 - alpha) * region


# ---------------------------------------------------------------------------
# Filter visualization (get_weights, src/convolutional_layer.c:591;
# collapse_images_vert, src/image.c:1513; show_images :1592)

def filter_images(w_hwio: np.ndarray) -> List[np.ndarray]:
    """Per-output-filter images, each min/max normalized
    (get_weights + normalize_image). Returns (size, size, in_c) floats."""
    w = np.asarray(w_hwio, np.float32)
    return [normalize_image(w[..., i]) for i in range(w.shape[-1])]


def collapse_images_vert(ims: List[np.ndarray]) -> np.ndarray:
    """collapse_images_vert (src/image.c:1513): 3-channel filters stack
    vertically (1px border); other channel counts tile each channel
    horizontally as grayscale, one filter per row. Background 0."""
    border = 1
    h0, w0, c0 = ims[0].shape
    n = len(ims)
    if c0 == 3:
        grid = np.zeros(((h0 + border) * n - border, w0, 3), np.float32)
        for i, im in enumerate(ims):
            grid[i * (h0 + border):i * (h0 + border) + h0, :w0] = im
    else:
        grid = np.zeros(((h0 + border) * n - border,
                         (w0 + border) * c0 - border, 1), np.float32)
        for i, im in enumerate(ims):
            hoff = i * (h0 + border)
            for j in range(c0):
                woff = j * (w0 + border)
                grid[hoff:hoff + h0, woff:woff + w0, 0] = im[..., j]
    return grid


def visualize_network(specs, params) -> Dict[int, np.ndarray]:
    """visualize_network (src/network.c:477): one normalized filter grid
    per conv layer (show_images saves the collapsed, re-normalized
    mosaic). Works on folded or unfolded params — only 'w' is read."""
    grids = {}
    for i, sp in enumerate(specs):
        if isinstance(sp, S.Conv):
            w = params[engine.layer_key(i)]["w"]
            grids[i] = normalize_image(
                collapse_images_vert(filter_images(w)))
    return grids


def mkimg(specs, params, h: int, w: int, num: int,
          seed: int = 0) -> List[np.ndarray]:
    """mkimg (examples/darknet.c:375): ``num`` collages, each 100
    first-conv filters rotated (rand cw quarter-turns), HSV-distorted
    (hue 1, sat 1.5, exp 1.5 — random_distort_image's ranges) and
    ghost-pasted onto a mid-gray canvas. RNG is numpy (the C uses libc
    rand(); the construction, not the stream, is the contract)."""
    first = next(i for i, sp in enumerate(specs) if isinstance(sp, S.Conv))
    ims = filter_images(params[engine.layer_key(first)]["w"])
    if ims[0].shape[-1] != 3:
        raise ValueError("mkimg needs a 3-channel first conv")
    fs = max(ims[0].shape[:2])
    if h <= fs or w <= fs:
        raise ValueError(f"canvas {w}x{h} must exceed the {fs}x{fs} "
                         f"first-conv filters (the C's rand%(w-r.w) "
                         f"needs room to place them)")
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        canvas = np.full((h, w, 3), 0.5, np.float32)
        for _ in range(100):
            r = ims[int(rng.integers(len(ims)))].copy()
            r = rotate_cw(r, int(rng.integers(4)))
            dhue = float(rng.uniform(-1.0, 1.0))
            dsat = _rand_scale(rng, 1.5)
            dexp = _rand_scale(rng, 1.5)
            r = distort_image(r, dhue, dsat, dexp)
            dx = int(rng.integers(w - r.shape[1]))
            dy = int(rng.integers(h - r.shape[0]))
            ghost_image(r, canvas, dx, dy)
        out.append(canvas)
    return out


def _rand_scale(rng, s: float) -> float:
    """rand_scale (src/utils.c): shared with the training augmenter."""
    from yolo_tensorflow_tpu.data.augment import _rand_scale as rs
    return float(rs(rng, s))


# ---------------------------------------------------------------------------
# imtest (test_resize, src/image.c:1392) and 3d (composite_3d, :909)

def imtest_images(im: np.ndarray) -> Tuple[float, Dict[str, np.ndarray]]:
    """The deterministic part of test_resize: L2 norm plus the gray and
    four fixed HSV-distorted variants (the interactive random-augment
    loop needs a display and is omitted)."""
    mag = float(np.sqrt(np.sum(im.astype(np.float64) ** 2)))
    return mag, {
        "Original": im,
        "Gray": grayscale_image(im),
        "C1": distort_image(im, 0.1, 1.5, 1.5),
        "C2": distort_image(im, -0.1, 0.66666, 0.66666),
        "C3": distort_image(im, 0.1, 1.5, 0.66666),
        "C4": distort_image(im, 0.1, 0.66666, 1.5),
    }


def _dist_array(a: np.ndarray, b: np.ndarray, sub: int) -> float:
    """dist_array (src/utils.c:538): strided L2 over darknet's flat CHW
    order (the stride pattern is part of the semantics)."""
    af = a.transpose(2, 0, 1).ravel()[::sub].astype(np.float64)
    bf = b.transpose(2, 0, 1).ravel()[::sub].astype(np.float64)
    return float(np.sqrt(np.sum((af - bf) ** 2)))


def best_3d_shift_r(a: np.ndarray, b: np.ndarray, lo: int,
                    hi: int) -> int:
    """best_3d_shift_r (src/image.c:877): binary search the vertical
    shift minimizing the strided distance."""
    while lo != hi:
        mid = int(np.floor((lo + hi) / 2.0))
        c1 = crop_image(b, 0, mid, b.shape[1], b.shape[0])
        c2 = crop_image(b, 0, mid + 1, b.shape[1], b.shape[0])
        if _dist_array(c1, a, 10) < _dist_array(c2, a, 10):
            hi = mid
        else:
            lo = mid + 1
    return lo


def composite_3d(a: np.ndarray, b: np.ndarray,
                 delta: int = 0) -> Tuple[int, np.ndarray]:
    """composite_3d (src/image.c:909): align b to a by vertical shift,
    then overlay a's RED channel onto the shifted b (the first CHW plane
    — an anaglyph). The C's d2<d1 swap branch is dead code (`&& 0`) and
    is not reproduced. Returns (shift, composite)."""
    if a.shape != b.shape:
        raise ValueError("composite_3d needs same-size images")
    # C's -a.h/100 truncates toward zero; Python's -h//100 would floor
    # one wider for heights not divisible by 100
    h100 = a.shape[0] // 100
    shift = best_3d_shift_r(a, b, -h100, h100)
    c = crop_image(b, delta, shift, a.shape[1], a.shape[0]).copy()
    c[..., 0] = a[..., 0]
    return shift, c
