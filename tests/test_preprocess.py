"""Fused on-device letterbox gates: the device kernel vs a direct numpy
transcription of letterbox_image/resize_image (src/image.c:960,1347), and
the fused Detector path end to end against the deterministic model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine
from yolo_tensorflow_tpu.ops import preprocess as P
from yolo_tensorflow_tpu.pipeline import Detector


def _resize_image_np(im, w, h):
    """Transcription of resize_image (src/image.c:1347), HWC float. The
    scale products are float32 like the C code's — the int truncation of
    r*h_scale at the edges depends on that precision."""
    ih, iw = im.shape[:2]
    part = np.zeros((ih, w, 3), np.float32)
    w_scale = np.float32(iw - 1) / np.float32(w - 1) if w > 1 else np.float32(0)
    h_scale = np.float32(ih - 1) / np.float32(h - 1) if h > 1 else np.float32(0)
    for c in range(w):
        if c == w - 1 or iw == 1:
            part[:, c] = im[:, iw - 1]
        else:
            sx = np.float32(c) * w_scale
            ix = int(sx)
            dx = sx - np.float32(ix)
            part[:, c] = (1 - dx) * im[:, ix] + dx * im[:, ix + 1]
    out = np.zeros((h, w, 3), np.float32)
    for r in range(h):
        sy = np.float32(r) * h_scale
        iy = int(sy)
        dy = sy - np.float32(iy)
        out[r] = (1 - dy) * part[iy]
        if r == h - 1 or ih == 1:
            continue
        out[r] += dy * part[iy + 1]
    return out


def _letterbox_image_np(im, size):
    """Transcription of letterbox_image (src/image.c:960)."""
    ih, iw = im.shape[:2]
    if size / iw < size / ih:
        new_w = size
        new_h = (ih * size) // iw
    else:
        new_h = size
        new_w = (iw * size) // ih
    resized = _resize_image_np(im, new_w, new_h)
    boxed = np.full((size, size, 3), 0.5, np.float32)
    px, py = (size - new_w) // 2, (size - new_h) // 2
    boxed[py:py + new_h, px:px + new_w] = resized
    return boxed


@pytest.mark.parametrize("h,w", [(100, 300), (300, 100), (64, 64),
                                 (97, 211), (500, 333)])
def test_device_letterbox_matches_c_transcription(h, w, rng):
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    size = 96
    canvas_side = 512
    canvas = np.zeros((canvas_side, canvas_side, 3), np.uint8)
    canvas[:h, :w] = img

    got = np.asarray(jax.jit(
        lambda c, hh, ww: P.letterbox_device(c, hh, ww, size))(
            jnp.asarray(canvas), jnp.int32(h), jnp.int32(w)))
    want = _letterbox_image_np(img.astype(np.float32) / 255.0, size)
    # fused single-pass bilerp vs darknet's two-pass: same math, float
    # association differs at ~1e-5
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_letterbox_geometry_matches_c_int_division():
    for h, w, size in [(200, 300, 416), (300, 200, 416), (417, 416, 416),
                       (416, 416, 416), (1, 5, 32)]:
        nw, nh, px, py = jax.tree.map(
            int, P.letterbox_geometry(jnp.int32(w), jnp.int32(h), size))
        if size / w < size / h:
            assert (nw, nh) == (size, (h * size) // w)
        else:
            assert (nw, nh) == ((w * size) // h, size)
        assert (px, py) == ((size - nw) // 2, (size - nh) // 2)


def _deterministic_detector(**kw):
    cfg = C.get_config("yolov2-tiny-voc", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = jax.tree.map(lambda a: np.zeros_like(a), params)
    head = sorted(params)[-1]
    bias = np.zeros_like(params[head]["b"])
    bias[4] = 4.0
    bias[5 + 7] = 6.0
    params[head]["b"] = bias
    return Detector(cfg, params=params, specs=specs, num_candidates=32,
                    max_detections=5, **kw)


def test_fused_letterbox_detect_end_to_end():
    """Full fused path on the deterministic model: boxes arrive in
    original-image pixels with anchor-0 geometry un-mapped through the
    letterbox (w = anchor_w/G * S / new_w * orig_w)."""
    det = _deterministic_detector(letterbox=True, fused=True)
    h, w = 100, 200
    img = np.full((h, w, 3), 128, np.uint8)
    res = det.detect(img)
    assert res and all(r["class"] == "cat" for r in res)
    assert all(abs(r["score"] - 0.93784) < 1e-3 for r in res)
    # geometry: new_w=64, new_h=(100*64)//32=32 -> anchor-0 box w un-maps to
    # 1.08/2*64 * 200/64 = 108 px, centered on a cell 50 px from an edge,
    # so the image clip trims exactly 4 px off every detection
    exp_w = 1.08 / 2 * 64 * 200 / 64 - 4.0    # 104 px after clipping
    r0 = res[0]
    got_w = r0["box"][2] - r0["box"][0]
    assert abs(got_w - exp_w) < 1.0, (got_w, exp_w)
    for r in res:  # boxes clipped to the original image
        assert -1e-3 <= r["box"][0] and r["box"][2] <= w + 1e-3
        assert -1e-3 <= r["box"][1] and r["box"][3] <= h + 1e-3


def test_fused_matches_host_letterbox_path(rng):
    """Fused and host letterbox paths agree on scores/classes and agree on
    boxes to sub-pixel (resize kernels differ: darknet-exact align-corners
    on device vs cv2 INTER_LINEAR on host; on a flat image they coincide)."""
    det_host = _deterministic_detector(letterbox=True)
    det_fused = _deterministic_detector(letterbox=True, fused=True)
    img = np.full((96, 160, 3), 77, np.uint8)
    a = det_host.detect(img)
    b = det_fused.detect(img)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["class_id"] == rb["class_id"]
        assert abs(ra["score"] - rb["score"]) < 1e-4
        np.testing.assert_allclose(ra["box"], rb["box"], atol=1.0)


def test_letterbox_bf16_serving_knob(rng):
    """compute_dtype=bfloat16 on the device letterbox (a +~10% serving
    knob for the fused pipeline) must stay within an interpolation-weight
    quantum of the exact f32 output: pixel values are bf16-exact, only
    the <=2^-9-relative weight rounding differs."""
    import jax.numpy as jnp
    from yolo_tensorflow_tpu.ops.preprocess import letterbox_device
    canvas = np.zeros((64, 64, 3), np.uint8)
    canvas[:48, :40] = rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)
    exact = np.asarray(letterbox_device(jnp.asarray(canvas), 48, 40, 64))
    fast = np.asarray(letterbox_device(jnp.asarray(canvas), 48, 40, 64,
                                       compute_dtype=jnp.bfloat16))
    assert np.abs(exact - fast).max() < 2.0 / 255.0


@pytest.mark.parametrize("rescale,offset", [(255.0 / 225.0, 0.0),
                                            (2.0, -1.0)])
def test_letterbox_normalization_folding(rng, rescale, offset):
    """rescale/offset folded into the letterbox must equal the former
    two-pass form (letterbox then x*r+c) — exactly in f32 (same op order),
    within a weight quantum in bf16 (where r folds into the interpolation
    matrix)."""
    import jax.numpy as jnp
    from yolo_tensorflow_tpu.ops.preprocess import letterbox_device
    canvas = np.zeros((64, 64, 3), np.uint8)
    canvas[:48, :40] = rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)
    base = np.asarray(letterbox_device(jnp.asarray(canvas), 48, 40, 64))
    want = base * np.float32(rescale) + np.float32(offset)
    got = np.asarray(letterbox_device(jnp.asarray(canvas), 48, 40, 64,
                                      rescale=rescale, offset=offset))
    np.testing.assert_array_equal(got, want)
    got_bf = np.asarray(letterbox_device(jnp.asarray(canvas), 48, 40, 64,
                                         compute_dtype=jnp.bfloat16,
                                         rescale=rescale, offset=offset))
    assert np.abs(got_bf - want).max() < 2.0 * rescale / 255.0


def test_fused_tta_matches_unfused_tta_v2():
    """VERDICT r3 order 4: flip-TTA composed with the fused letterbox must
    equal the unfused (host-letterbox) TTA path — the C's valid2 pipeline
    (examples/detector.c:234: letterbox THEN flip the letterboxed image)
    with zero host resize. Flat image so the host-cv2 vs device resize
    kernels coincide; w=98 exercises the asymmetric pad column (px=12,
    right pad 13), which must mirror with the canvas. corrected mode: in
    darknet mode the C's negation quirk hits exactly anchor 0's obj plane
    (p<A under the true layout), zeroing the helper model's anchor-0-only
    detections — the darknet-mode gate below biases anchor 1 instead."""
    det_host = _deterministic_detector(letterbox=True, tta=True,
                                       tta_mode="corrected")
    det_fused = _deterministic_detector(letterbox=True, fused=True,
                                        tta=True, tta_mode="corrected")
    for h, w in [(96, 160), (160, 98)]:
        img = np.full((h, w, 3), 77, np.uint8)
        a = det_host.detect(img)
        b = det_fused.detect(img)
        assert len(a) == len(b) > 0, (h, w)
        for ra, rb in zip(a, b):
            assert ra["class_id"] == rb["class_id"]
            assert abs(ra["score"] - rb["score"]) < 1e-4
            np.testing.assert_allclose(ra["box"], rb["box"], atol=1.0)


def test_fused_tta_matches_unfused_tta_v2_darknet_mode():
    """darknet-quirk mode on the fused path: anchor-1-biased model (the
    negation only touches anchor 0's planes) — fused == unfused."""
    cfg = C.get_config("yolov2-tiny-voc", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = jax.tree.map(lambda a: np.zeros_like(a), params)
    head = sorted(params)[-1]
    bias = np.zeros_like(params[head]["b"])
    E = 5 + cfg.num_classes
    bias[E + 4] = 4.0          # anchor 1 obj
    bias[E + 5 + 7] = 6.0      # anchor 1 class 7
    params[head]["b"] = bias
    kw = dict(num_candidates=32, max_detections=5, tta=True,
              tta_mode="darknet")
    det_host = Detector(cfg, params=params, specs=specs, letterbox=True,
                        **kw)
    det_fused = Detector(cfg, params=params, specs=specs, letterbox=True,
                         fused=True, **kw)
    img = np.full((96, 160, 3), 77, np.uint8)
    a = det_host.detect(img)
    b = det_fused.detect(img)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["class_id"] == rb["class_id"] == 7
        assert abs(ra["score"] - rb["score"]) < 1e-4
        np.testing.assert_allclose(ra["box"], rb["box"], atol=1.0)


def test_fused_tta_matches_unfused_tta_v3():
    """Same gate for the yolo-head family (avg_flipped_yolo averaging,
    yolo_layer.c:290): fused-letterbox TTA == host-letterbox TTA."""
    from yolo_tensorflow_tpu.models import specs as S
    cfg = C.get_config("yolov3-tiny", input_size=64)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 64, 64, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = jax.tree.map(lambda a: np.zeros_like(a), params)
    for i, sp in enumerate(specs):
        if isinstance(sp, S.Detect):
            head = engine.layer_key(i - 1)
            b = np.zeros_like(params[head]["b"])
            b[4] = 3.0
            b[5 + 5] = 5.0
            params[head]["b"] = b
    kw = dict(num_candidates=32, max_detections=5, tta=True,
              tta_mode="darknet")
    det_host = Detector(cfg, params=params, specs=specs, letterbox=True,
                        **kw)
    det_fused = Detector(cfg, params=params, specs=specs, letterbox=True,
                         fused=True, **kw)
    img = np.full((96, 160, 3), 100, np.uint8)
    a = det_host.detect(img)
    b = det_fused.detect(img)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["class_id"] == rb["class_id"] == 5
        assert abs(ra["score"] - rb["score"]) < 1e-4
        np.testing.assert_allclose(ra["box"], rb["box"], atol=1.0)


def test_bf16_letterbox_default_for_narrow_serving():
    """Detector(fused, bf16) defaults the letterbox to bf16; explicit
    letterbox_dtype=float32 restores the bit-exact path. Both must agree
    on the deterministic model's detections."""
    import jax.numpy as jnp
    det_bf = _deterministic_detector(letterbox=True, fused=True,
                                     compute_dtype=jnp.bfloat16)
    det_f32 = _deterministic_detector(letterbox=True, fused=True,
                                      compute_dtype=jnp.bfloat16,
                                      letterbox_dtype=jnp.float32)
    img = np.full((96, 160, 3), 77, np.uint8)
    a = det_bf.detect(img)
    b = det_f32.detect(img)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["class_id"] == rb["class_id"]
        assert abs(ra["score"] - rb["score"]) < 2e-3
        np.testing.assert_allclose(ra["box"], rb["box"], atol=1.0)
