"""On-device preprocessing: darknet-exact letterbox fused into the jit.

The reference letterboxes on host (src/image.c:960 letterbox_image calling
resize_image:1347, an align-corners separable bilinear, embedded into a
0.5-grey canvas) and the TF graphs stretch-resize in-graph
(_input_process). Here the aspect-preserving resize+pad runs INSIDE the
compiled program: the host only memcpy's the raw uint8 image into a fixed
canvas (no cv2 work on the hot path), and scale/pad are traced scalars so
one compilation serves every input size. Box un-mapping
(correct_yolo_boxes, src/yolo_layer.c:247) happens in the same jit.

Semantics matched exactly (gated by tests/test_preprocess.py):
  - new_w/new_h via integer division ((im.h * w)/im.w etc.)
  - resize_image's align-corners bilinear incl. its two edge rules
    (last column copies the source edge; the last row skips the dy term)
  - pad value 0.5 (darknet fills the normalized canvas with .5 — NOT
    128/255)
  - embed offset (w-new_w)/2 with integer division. darknet's own
    correct_yolo_boxes un-maps with the FLOAT half offset, a 0.5-pixel
    self-inconsistency when the pad is odd; we invert our true embed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def letterbox_geometry(img_w, img_h, out_size: int):
    """(new_w, new_h, px, py) per letterbox_image (src/image.c:960-978);
    img_w/img_h may be traced int32 scalars."""
    img_w = jnp.asarray(img_w, jnp.int32)
    img_h = jnp.asarray(img_h, jnp.int32)
    s = jnp.int32(out_size)
    wide = img_w > img_h           # (float)S/w < (float)S/h  <=>  w > h
    new_w = jnp.where(wide, s, (img_w * s) // img_h)
    new_h = jnp.where(wide, (img_h * s) // img_w, s)
    return new_w, new_h, (s - new_w) // 2, (s - new_h) // 2


def letterbox_device(canvas_u8, img_h, img_w, out_size: int,
                     compute_dtype=None, rescale: float = 1.0,
                     offset: float = 0.0):
    """One image: (Hc, Wc, 3) uint8 canvas whose top-left [0:h, 0:w] holds
    the real pixels + traced (h, w) -> (S, S, 3) float32, bit-matching
    rescale * letterbox_image(resize_image(im)) + offset up to float
    association. ``rescale``/``offset`` fold the per-model normalization
    (255/input_scale for 'unit', (2, -1) for v1's symmetric) into the
    letterbox so the fused serving path does zero extra passes; the pad
    region becomes 0.5*rescale + offset (darknet fills with .5 normalized).

    TPU formulation: the separable bilinear is TWO MATMULS against one-hot
    interpolation matrices (each output row/column has at most two source
    weights), column pass first then row pass — the same order as
    resize_image's horizontal-then-vertical loops, so the float products
    round identically to the direct two-term form. The original
    gather-grid formulation ran at ~66 img/s on v5e (4 full (S,S,3)
    gathers hit the scalar path); the matmul form rides the MXU. Only the
    interpolation-matrix CONTENTS are data-dependent — shapes stay
    static, one compilation serves every input size.
    """
    S = out_size
    Hc, Wc = canvas_u8.shape[0], canvas_u8.shape[1]
    h = jnp.asarray(img_h, jnp.int32)
    w = jnp.asarray(img_w, jnp.int32)
    new_w, new_h, px, py = letterbox_geometry(w, h, S)

    # resize_image scales; guard the ==1 denominators (C indexes the edge)
    w_scale = (w - 1).astype(jnp.float32) / jnp.maximum(new_w - 1, 1)
    h_scale = (h - 1).astype(jnp.float32) / jnp.maximum(new_h - 1, 1)

    rr = jnp.arange(S, dtype=jnp.int32) - py   # output row in resized image
    cc = jnp.arange(S, dtype=jnp.int32) - px   # output col in resized image
    in_r = (rr >= 0) & (rr < new_h)
    in_c = (cc >= 0) & (cc < new_w)

    sx = cc.astype(jnp.float32) * w_scale
    sy = rr.astype(jnp.float32) * h_scale
    ix = jnp.floor(sx).astype(jnp.int32)
    iy = jnp.floor(sy).astype(jnp.int32)
    dx = sx - ix.astype(jnp.float32)
    dy = sy - iy.astype(jnp.float32)

    # edge rules of resize_image: the last output column copies the source's
    # last column outright (val = get_pixel(im, im.w-1, ...)); the last
    # output row keeps its (1-dy) weight but SKIPS the +dy*part[iy+1] term
    # (image.c:1380 'if(r == h-1 ...) continue') — with float32 rounding of
    # r*h_scale deciding whether that row lands on iy=h-1 (dy~0, full
    # value) or iy=h-2 (dy~1, near-zero).
    last_col = (cc == new_w - 1) | (w == 1)
    last_row = (rr == new_h - 1) | (h == 1)
    ix = jnp.where(last_col, w - 1, ix)
    dx = jnp.where(last_col, 0.0, dx)
    wbot = jnp.where(last_row, 0.0, dy)

    ix = jnp.clip(ix, 0, Wc - 1)
    iy = jnp.clip(iy, 0, Hc - 1)
    ix1 = jnp.clip(ix + 1, 0, Wc - 1)
    iy1 = jnp.clip(iy + 1, 0, Hc - 1)

    # one-hot interp matrices; zero out rows/cols outside the resized area
    # (ix1 can equal ix at the clip edge, but its weight is 0 there)
    col_ids = jnp.arange(Wc, dtype=jnp.int32)
    row_ids = jnp.arange(Hc, dtype=jnp.int32)
    Cm = ((col_ids[None, :] == ix[:, None]) * (1 - dx)[:, None]
          + (col_ids[None, :] == ix1[:, None]) * dx[:, None])    # (S, Wc)
    Cm = jnp.where(in_c[:, None], Cm, 0.0)
    Rm = ((row_ids[None, :] == iy[:, None]) * (1 - dy)[:, None]
          + (row_ids[None, :] == iy1[:, None]) * wbot[:, None])  # (S, Hc)
    Rm = jnp.where(in_r[:, None], Rm, 0.0)

    # horizontal pass then vertical pass (resize_image's loop order).
    # compute_dtype=bfloat16 is a serving knob (+~10% on the fused
    # pipeline): the RAW uint8 canvas is the bf16 operand (integers up to
    # 256 are bf16-exact — no pixel rounding), the /255 normalization and
    # ``rescale`` fold into the column interpolation matrix, and both
    # accumulations stay f32 — so only the interpolation WEIGHTS and the
    # inter-pass intermediate round (<=2^-8 relative, under a quantum of
    # the uint8 input and far under int8 quantization noise). Default f32
    # HIGHEST bit-matches the C.
    if compute_dtype is not None and compute_dtype != jnp.float32:
        # downcast the inter-pass intermediate at the producer (fuses into
        # the first matmul's epilogue -> half the HBM round trip)
        part = jnp.einsum("hwc,sw->hsc", canvas_u8.astype(compute_dtype),
                          (Cm * (rescale / 255.0)).astype(compute_dtype),
                          preferred_element_type=jnp.float32) \
            .astype(compute_dtype)
        val = jnp.einsum("rh,hsc->rsc", Rm.astype(compute_dtype), part,
                         preferred_element_type=jnp.float32)
    else:
        x = canvas_u8.astype(jnp.float32) / 255.0
        part = jnp.einsum("hwc,sw->hsc", x, Cm,
                          precision=jax.lax.Precision.HIGHEST)  # (Hc,S,3)
        val = jnp.einsum("rh,hsc->rsc", Rm, part,
                         precision=jax.lax.Precision.HIGHEST)   # (S,S,3)
        if rescale != 1.0:
            # post-multiply (not matrix-folded) so rescale=1 stays the
            # bit-exact C parity path and rescale!=1 rounds exactly like
            # the former separate normalization pass did
            val = val * rescale
    inside = in_r[:, None] & in_c[None, :]
    out = jnp.where(inside[..., None], val, 0.5 * rescale)
    return out + offset if offset != 0.0 else out


def resize_device(canvas_u8, img_h, img_w, out_h: int, out_w: int,
                  compute_dtype=None, rescale: float = 1.0,
                  offset: float = 0.0):
    """darknet's stretch resize_image (src/image.c:1347) on device: (Hc,
    Wc, 3) uint8 canvas whose top-left [0:h, 0:w] holds the real pixels +
    traced (h, w) -> (out_h, out_w, 3) float32 = rescale *
    resize_image(im, out_w, out_h)/255 + offset. The classifier eval
    modes build on this: validate_classifier_crop's load_image_color(w,h)
    stretch, the 10-crop mode's (S+32)x(S+32) base, and the full/multi
    modes' resize_min/resize_max targets (examples/classifier.c).

    Same TPU formulation as letterbox_device — the separable bilinear as
    two one-hot-matrix matmuls, horizontal pass first, both edge rules
    (last column copies the source edge; the last row keeps (1-dy) but
    skips the +dy term) — minus the pad bookkeeping: the output is all
    image. Only matrix CONTENTS depend on (h, w); shapes are static."""
    Hc, Wc = canvas_u8.shape[0], canvas_u8.shape[1]
    h = jnp.asarray(img_h, jnp.int32)
    w = jnp.asarray(img_w, jnp.int32)
    w_scale = (w - 1).astype(jnp.float32) / max(out_w - 1, 1)
    h_scale = (h - 1).astype(jnp.float32) / max(out_h - 1, 1)

    cc = jnp.arange(out_w, dtype=jnp.int32)
    rr = jnp.arange(out_h, dtype=jnp.int32)
    sx = cc.astype(jnp.float32) * w_scale
    sy = rr.astype(jnp.float32) * h_scale
    ix = jnp.floor(sx).astype(jnp.int32)
    iy = jnp.floor(sy).astype(jnp.int32)
    dx = sx - ix.astype(jnp.float32)
    dy = sy - iy.astype(jnp.float32)

    last_col = (cc == out_w - 1) | (w == 1)
    last_row = (rr == out_h - 1) | (h == 1)
    ix = jnp.where(last_col, w - 1, ix)
    dx = jnp.where(last_col, 0.0, dx)
    wbot = jnp.where(last_row, 0.0, dy)

    ix = jnp.clip(ix, 0, Wc - 1)
    iy = jnp.clip(iy, 0, Hc - 1)
    ix1 = jnp.clip(ix + 1, 0, Wc - 1)
    iy1 = jnp.clip(iy + 1, 0, Hc - 1)

    col_ids = jnp.arange(Wc, dtype=jnp.int32)
    row_ids = jnp.arange(Hc, dtype=jnp.int32)
    Cm = ((col_ids[None, :] == ix[:, None]) * (1 - dx)[:, None]
          + (col_ids[None, :] == ix1[:, None]) * dx[:, None])  # (out_w, Wc)
    Rm = ((row_ids[None, :] == iy[:, None]) * (1 - dy)[:, None]
          + (row_ids[None, :] == iy1[:, None]) * wbot[:, None])  # (out_h, Hc)

    if compute_dtype is not None and compute_dtype != jnp.float32:
        part = jnp.einsum("hwc,sw->hsc", canvas_u8.astype(compute_dtype),
                          (Cm * (rescale / 255.0)).astype(compute_dtype),
                          preferred_element_type=jnp.float32) \
            .astype(compute_dtype)
        val = jnp.einsum("rh,hsc->rsc", Rm.astype(compute_dtype), part,
                         preferred_element_type=jnp.float32)
    else:
        x = canvas_u8.astype(jnp.float32) / 255.0
        part = jnp.einsum("hwc,sw->hsc", x, Cm,
                          precision=jax.lax.Precision.HIGHEST)
        val = jnp.einsum("rh,hsc->rsc", Rm, part,
                         precision=jax.lax.Precision.HIGHEST)
        if rescale != 1.0:
            val = val * rescale
    return val + offset if offset != 0.0 else val


def letterbox_device_batch(canvas_u8, sizes, out_size: int,
                           compute_dtype=None, rescale: float = 1.0,
                           offset: float = 0.0):
    """(B, Hc, Wc, 3) uint8 + (B, 2) int32 [h, w] -> (B, S, S, 3) f32."""
    return jax.vmap(lambda c, s: letterbox_device(
        c, s[0], s[1], out_size, compute_dtype=compute_dtype,
        rescale=rescale, offset=offset))(canvas_u8, sizes)


def unmap_boxes_device(boxes_xyxy_norm, img_h, img_w, out_size: int):
    """Normalized network-space xyxy boxes -> original-image pixels, the
    correct_yolo_boxes inverse (using our integral embed offsets), clipped
    to the image like the host unletterbox_boxes."""
    h = jnp.asarray(img_h, jnp.int32)
    w = jnp.asarray(img_w, jnp.int32)
    new_w, new_h, px, py = letterbox_geometry(w, h, out_size)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    bx = boxes_xyxy_norm * out_size
    x0 = (bx[..., 0] - px) * wf / new_w.astype(jnp.float32)
    y0 = (bx[..., 1] - py) * hf / new_h.astype(jnp.float32)
    x1 = (bx[..., 2] - px) * wf / new_w.astype(jnp.float32)
    y1 = (bx[..., 3] - py) * hf / new_h.astype(jnp.float32)
    return jnp.stack([jnp.clip(x0, 0, wf), jnp.clip(y0, 0, hf),
                      jnp.clip(x1, 0, wf), jnp.clip(y1, 0, hf)], -1)
