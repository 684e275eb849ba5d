"""End-to-end detection pipeline: one jit from uint8 pixels to boxes.

The reference's constructor-does-everything classes (``Yolo``/``YOLOV2``/
``YOLOV3``, e.g. YOLO_V3_convert...py:53) become a single ``Detector`` over
any model config. The whole hot path — normalize, backbone, decode,
threshold, NMS — is one compiled XLA program with static shapes; the only
host work is image decode + resize (and that can batch through the native
prefetcher in data/loader.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.io import weights as W
from yolo_tensorflow_tpu.models import engine, heads
from yolo_tensorflow_tpu.post import nms as NMS


def normalize_images(images_uint8, cfg: C.ModelConfig, dtype=jnp.float32):
    """uint8 (B,H,W,3) -> float. 'unit': x/scale (v2/v3; scale=225 quirk
    reproducible via cfg.input_scale); 'symmetric': (x/255)*2-1 (v1,
    YOLO_V1_Inference.py:69)."""
    x = images_uint8.astype(dtype)
    if cfg.normalization == "symmetric":
        return (x / 255.0) * 2.0 - 1.0
    return x / cfg.input_scale


def normalization_fold(cfg: C.ModelConfig):
    """(rescale, offset) such that ``px_over_255 * rescale + offset`` equals
    ``normalize_images(uint8_px)`` — the per-model normalization folded into
    on-device interpolation matrices (letterbox/center-crop) so the fused
    paths add zero extra passes. Single source for the detector's fused
    letterbox and the classifier's center-crop jit; any new
    cfg.normalization mode must extend THIS, not the call sites."""
    if cfg.normalization == "symmetric":
        return 2.0, -1.0
    return 255.0 / cfg.input_scale, 0.0


def _nms_opts(cfg, max_detections, conf_threshold, iou_threshold,
              class_aware_nms, num_candidates):
    """Resolve the per-call NMS overrides against the model config ONCE —
    every forward factory shares this, so a threshold-defaulting fix cannot
    diverge between the plain/TTA/letterbox/smoothed paths."""
    return dict(
        max_detections=(cfg.max_detections if max_detections is None
                        else max_detections),
        conf_threshold=(cfg.conf_threshold if conf_threshold is None
                        else conf_threshold),
        iou_threshold=(cfg.iou_threshold if iou_threshold is None
                       else iou_threshold),
        class_aware=(cfg.class_aware_nms if class_aware_nms is None
                     else class_aware_nms),
        num_candidates=num_candidates,
    )


def _decode_v3_activated_scales(acts, det_specs, cfg):
    """Activated per-scale v3 outputs -> concatenated
    (boxes_xyxy, scores, labels) — the shared tail of the flip-TTA and
    rolling-average paths (both average activations before decode)."""
    bp, sp, lp = [], [], []
    for avg, det in zip(acts, det_specs):
        anchors = [cfg.anchors[i] for i in det.anchor_mask]
        b, s, l = heads.decode_v3_scale_activated(
            avg, anchors, cfg.input_size, cfg.num_classes)
        bp.append(b)
        sp.append(s)
        lp.append(l)
    return (heads.xywh_to_xyxy(jnp.concatenate(bp, axis=1)),
            jnp.concatenate(sp, axis=1), jnp.concatenate(lp, axis=1))


def make_forward(cfg: C.ModelConfig, specs, *, compute_dtype=None,
                 num_candidates: int = 256,
                 max_detections: Optional[int] = None,
                 conf_threshold: Optional[float] = None,
                 iou_threshold: Optional[float] = None,
                 class_aware_nms: Optional[bool] = None,
                 fused_decode: Optional[bool] = None,
                 tta: bool = False, tta_mode: str = "darknet",
                 score_dtype=None):
    """Build the pure forward fn: (params, uint8 images) -> Detections.

    fused_decode: use the Pallas decode+score kernel
    (ops/pallas/decode.py) instead of the XLA decode. Off by default:
    measured on v5e at yolov3-416 batch 128, XLA's automatic fusion of the
    decode math beats the hand kernel (61.0 vs 70.3 ms/batch) — the
    (N, C) score intermediate I expected to round-trip HBM is already
    fusion-eliminated by XLA. Kept as a parity-tested option and a
    baseline for future kernel work (see tests/test_pallas_decode.py)."""
    nms_kw = _nms_opts(cfg, max_detections, conf_threshold, iou_threshold,
                       class_aware_nms, num_candidates)
    if fused_decode is None:
        fused_decode = False

    if tta and cfg.head not in (2, 3):
        raise ValueError("flip-TTA is a region/yolo-layer capability "
                         "(get_region_detections region_layer.c:368; "
                         "avg_flipped_yolo yolo_layer.c:290)")

    def forward(params, images_uint8):
        x = normalize_images(images_uint8, cfg,
                             compute_dtype or jnp.float32)
        if tta and cfg.head == 3:
            # v3 flip-TTA (validate_detector_flip, examples/detector.c:234:
            # batch-2 image+mirror, per-scale avg_flipped_yolo averaging of
            # the activated outputs before decode)
            B = x.shape[0]
            x2 = jnp.concatenate([x, x[:, :, ::-1]], axis=0)
            dets2, _ = engine.apply(specs, params, x2, bn_eps=cfg.bn_eps,
                                    compute_dtype=compute_dtype)
            avgs, det_specs = [], []
            for feat2, det in dets2:
                act = heads.activate_v3(feat2, len(det.anchor_mask),
                                        cfg.num_classes)
                avgs.append(heads.yolo_flip_tta(
                    act[:B], act[B:], len(det.anchor_mask),
                    cfg.num_classes, mode=tta_mode))
                det_specs.append(det)
            boxes, scores, labels = _decode_v3_activated_scales(
                avgs, det_specs, cfg)
            return NMS.batched_nms_scored(boxes, scores, labels, **nms_kw)
        if tta:
            # flip-TTA (get_region_detections batch==2 averaging): run the
            # image and its mirror through one doubled batch, average the
            # activated region outputs, decode once
            B = x.shape[0]
            x2 = jnp.concatenate([x, x[:, :, ::-1]], axis=0)
            dets2, _ = engine.apply(specs, params, x2, bn_eps=cfg.bn_eps,
                                    compute_dtype=compute_dtype)
            (feat2, _), = dets2
            act = heads.activate_v2(feat2, cfg)
            avg = heads.region_flip_tta(act[:B], act[B:], cfg,
                                        mode=tta_mode)
            boxes_xywh, conf, probs = heads.decode_v2_activated(avg, cfg)
            return NMS.batched_nms(heads.xywh_to_xyxy(boxes_xywh), conf,
                                   probs, **nms_kw)
        dets, _ = engine.apply(specs, params, x, bn_eps=cfg.bn_eps,
                               compute_dtype=compute_dtype)
        if fused_decode:
            from yolo_tensorflow_tpu.ops.pallas.decode import decode_fused
            boxes, scores, labels = decode_fused(dets, cfg)
            return NMS.batched_nms_scored(boxes, scores, labels, **nms_kw)
        # decode_scored: same scoring as decode()+batched_nms but the
        # (N, C) class activation is reduced (max/argmax on raw logits)
        # instead of materialized — exactness argument in its docstring
        boxes_xywh, scores, labels = heads.decode_scored(
            dets, cfg, score_dtype=score_dtype or jnp.float32)
        boxes = heads.xywh_to_xyxy(boxes_xywh)
        return NMS.batched_nms_scored(boxes, scores, labels, **nms_kw)

    return forward


def make_forward_letterbox(cfg: C.ModelConfig, specs, *,
                           compute_dtype=None, num_candidates: int = 256,
                           max_detections: Optional[int] = None,
                           conf_threshold: Optional[float] = None,
                           iou_threshold: Optional[float] = None,
                           class_aware_nms: Optional[bool] = None,
                           score_dtype=None, letterbox_dtype=None,
                           tta: bool = False, tta_mode: str = "darknet"):
    """Forward with the letterbox FUSED into the jit (BASELINE.md north
    star): (params, canvas (B,Hc,Hc,3) uint8, sizes (B,2) int32 [h,w]) ->
    Detections whose boxes are in ORIGINAL-image pixels. The host does no
    resize at all — only a memcpy of raw pixels into the canvas; the
    darknet-exact letterbox (ops/preprocess.py) and the box un-mapping
    (correct_yolo_boxes equivalent) run on device with traced scalars, so
    one compilation serves every input size up to the canvas.

    ``tta=True`` composes flip-TTA with the fused letterbox — exactly
    validate_detector_flip's pipeline (examples/detector.c:234: the C
    letterboxes first, then flip_image's the whole letterboxed canvas for
    the batch-2 input): the mirror is taken of the LETTERBOXED tensor
    inside the jit (one width reversal, the pad columns mirror with it),
    the activated head outputs average per the existing flip kernels
    (avg_flipped_yolo / get_region_detections batch==2), and the boxes
    un-map once. No host resize, no second letterbox."""
    from yolo_tensorflow_tpu.ops import preprocess as P
    nms_kw = _nms_opts(cfg, max_detections, conf_threshold, iou_threshold,
                       class_aware_nms, num_candidates)
    S = cfg.input_size
    if tta and cfg.head not in (2, 3):
        raise ValueError("flip-TTA is a region/yolo-layer capability "
                         "(get_region_detections region_layer.c:368; "
                         "avg_flipped_yolo yolo_layer.c:290)")

    # fold the per-model normalization (normalize_images' contract) into
    # the letterbox interpolation itself — zero extra passes
    rescale, offset = normalization_fold(cfg)

    def forward(params, canvas_uint8, sizes):
        x = P.letterbox_device_batch(canvas_uint8, sizes, S,
                                     compute_dtype=letterbox_dtype,
                                     rescale=rescale, offset=offset)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        if tta:
            B = x.shape[0]
            x2 = jnp.concatenate([x, x[:, :, ::-1]], axis=0)
            dets2, _ = engine.apply(specs, params, x2, bn_eps=cfg.bn_eps,
                                    compute_dtype=compute_dtype)
            if cfg.head == 3:
                avgs, det_specs = [], []
                for feat2, det in dets2:
                    act = heads.activate_v3(feat2, len(det.anchor_mask),
                                            cfg.num_classes)
                    avgs.append(heads.yolo_flip_tta(
                        act[:B], act[B:], len(det.anchor_mask),
                        cfg.num_classes, mode=tta_mode))
                    det_specs.append(det)
                boxes, scores, labels = _decode_v3_activated_scales(
                    avgs, det_specs, cfg)
                out = NMS.batched_nms_scored(boxes, scores, labels,
                                             **nms_kw)
            else:
                (feat2, _), = dets2
                act = heads.activate_v2(feat2, cfg)
                avg = heads.region_flip_tta(act[:B], act[B:], cfg,
                                            mode=tta_mode)
                boxes_xywh, conf, probs = heads.decode_v2_activated(avg,
                                                                    cfg)
                out = NMS.batched_nms(heads.xywh_to_xyxy(boxes_xywh),
                                      conf, probs, **nms_kw)
        else:
            dets, _ = engine.apply(specs, params, x, bn_eps=cfg.bn_eps,
                                   compute_dtype=compute_dtype)
            boxes_xywh, scores, labels = heads.decode_scored(
                dets, cfg, score_dtype=score_dtype or jnp.float32)
            boxes = heads.xywh_to_xyxy(boxes_xywh)
            out = NMS.batched_nms_scored(boxes, scores, labels, **nms_kw)
        boxes_px = jax.vmap(
            lambda b, s: P.unmap_boxes_device(b, s[0], s[1], S))(
                out.boxes, sizes)
        return out._replace(boxes=boxes_px)

    return forward


def make_forward_smoothed(cfg: C.ModelConfig, specs, avg_frames: int, *,
                          compute_dtype=None, num_candidates: int = 256,
                          max_detections: Optional[int] = None,
                          conf_threshold: Optional[float] = None,
                          iou_threshold: Optional[float] = None,
                          class_aware_nms: Optional[bool] = None):
    """Temporal-smoothing forward for streaming — demo.c's rolling
    prediction average (src/demo.c:31,67-78: remember_network keeps the
    last demo_frame=3 activated head outputs, avg_predictions means them
    before get_network_boxes).

    (params, images (B,S,S,3) u8, tails) -> (Detections, new_tails) where
    ``tails`` holds the previous (avg_frames-1) frames' activated head
    outputs per scale, so the average slides across batch boundaries.
    Frame j is decoded from mean(act[j-N+1 .. j]); startup tails are zeros
    (darknet calloc's the prediction buffers, so its first frames average
    with zeros too). Everything — activation, sliding mean, decode, NMS —
    is one compiled program.
    """
    nms_kw = _nms_opts(cfg, max_detections, conf_threshold, iou_threshold,
                       class_aware_nms, num_candidates)
    N = int(avg_frames)
    if N < 2:
        raise ValueError("avg_frames must be >= 2 (darknet demo_frame=3)")
    if cfg.head not in (1, 2, 3):
        raise ValueError("rolling prediction average applies to detection "
                         "heads (demo.c averages YOLO/REGION/DETECTION "
                         "layer outputs only)")

    def forward(params, images_uint8, tails):
        x = normalize_images(images_uint8, cfg,
                             compute_dtype or jnp.float32)
        dets, _ = engine.apply(specs, params, x, bn_eps=cfg.bn_eps,
                               compute_dtype=compute_dtype)
        B = images_uint8.shape[0]
        acts, det_specs = [], []
        for feat, det in dets:
            if cfg.head == 3:
                acts.append(heads.activate_v3(feat, len(det.anchor_mask),
                                              cfg.num_classes))
            elif cfg.head == 2:
                acts.append(heads.activate_v2(feat, cfg))
            else:  # v1 detection layer output is linear — buffer as-is
                acts.append(feat.astype(jnp.float32))
            det_specs.append(det)
        full = [jnp.concatenate([t, a], axis=0)
                for t, a in zip(tails, acts)]          # (N-1+B, ...)
        smoothed = [sum(f[k:k + B] for k in range(N)) / N for f in full]
        new_tails = tuple(f[B:] for f in full)         # last N-1 frames
        if cfg.head == 3:
            boxes, scores, labels = _decode_v3_activated_scales(
                smoothed, det_specs, cfg)
            out = NMS.batched_nms_scored(boxes, scores, labels, **nms_kw)
        else:
            (avg,) = smoothed
            decode = (heads.decode_v2_activated if cfg.head == 2
                      else heads.decode_v1)
            boxes_xywh, conf, probs = decode(avg, cfg)
            out = NMS.batched_nms(heads.xywh_to_xyxy(boxes_xywh), conf,
                                  probs, **nms_kw)
        return out, new_tails

    return forward


def smooth_state_shapes(cfg: C.ModelConfig, specs, batch_size: int,
                        avg_frames: int):
    """Zero initial tails for make_forward_smoothed: one (N-1, ...) array
    per detection head output."""
    from yolo_tensorflow_tpu.models import specs as S
    shapes = engine.infer_shapes(
        specs, (batch_size, cfg.input_size, cfg.input_size, 3))
    tails = []
    for i, sp in enumerate(specs):
        if isinstance(sp, S.Detect):
            shp = shapes[i]
            tails.append(np.zeros((avg_frames - 1,) + tuple(shp[1:]),
                                  np.float32))
    return tuple(tails)


class _LRUCache:
    """Tiny LRU for compiled-executable caches (dict-like: in / [] / =).

    Keeps the most recently used ``cap`` entries; evicted jax.jit wrappers
    release their compiled executables with them."""

    def __init__(self, cap: int):
        from collections import OrderedDict
        self.cap = cap
        self._d = OrderedDict()

    def __contains__(self, key):
        return key in self._d

    def __getitem__(self, key):
        self._d.move_to_end(key)
        return self._d[key]

    def __setitem__(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.cap:
            self._d.popitem(last=False)

    def __len__(self):
        return len(self._d)


def canvas_side(*extents: int) -> int:
    """On-device-resize canvas bucket covering the given extents: canvases
    quantize to 256-px buckets so arbitrary input sizes share a handful of
    compiled executables. Detector._detect_fused / eval/batched.py pass
    (h, w, input_size); Classifier.classify_batch_center_crop passes just
    the crop side (its device letterbox upscales, so the canvas need not
    cover the net input). This is the single definition — the bucket
    granularity must agree everywhere or compile caches split."""
    return max(((max(extents) + 255) // 256) * 256, 256)


class Detector:
    """Load a model + weights once, detect many times.

    API mirrors the reference driver classes: ``detect(image)`` on a raw
    HWC uint8 array (any size; host-resized like the in-graph
    ``_input_process`` resize), ``detect_batch`` on a pre-sized uint8 batch
    for throughput serving.
    """

    def __init__(self, model: str, weights_path: Optional[str] = None, *,
                 params=None, compute_dtype=None, donate: bool = False,
                 letterbox: bool = False, fused: bool = False, mesh=None,
                 **overrides):
        # letterbox=True: aspect-preserving pad-resize + box un-mapping,
        # darknet's test path (src/image.c:960 letterbox_image +
        # correct_yolo_boxes); False: stretch resize like the reference TF
        # graphs' _input_process. fused=True (with letterbox): the resize/
        # pad/un-map run inside the jit (make_forward_letterbox) — the host
        # only memcpy's pixels into a canvas, compiled once per canvas
        # bucket (256-px granularity).
        self.letterbox = letterbox
        self.fused = fused and letterbox
        nms_keys = {"num_candidates", "max_detections", "conf_threshold",
                    "iou_threshold", "class_aware_nms", "fused_decode",
                    "tta", "tta_mode", "score_dtype", "letterbox_dtype"}
        nms_kwargs = {k: overrides.pop(k) for k in list(overrides)
                      if k in nms_keys}
        letterbox_dtype = nms_kwargs.pop("letterbox_dtype", None)
        specs = overrides.pop("specs", None)
        if isinstance(model, C.ModelConfig):
            # arbitrary-cfg models (config_from_cfg) — not in the registry
            self.cfg = model
            self.specs = specs if specs is not None else C.build_specs(model)
        else:
            self.cfg = C.get_config(model, **overrides)
            self.specs = specs if specs is not None else C.build_specs(self.cfg)
        if params is None:
            if weights_path is None:
                raise ValueError("need weights_path or params")
            # header_ints=None: the darknet version rule (seen is int64 iff
            # major*10+minor >= 2) parses every era correctly — more robust
            # than the reference's hard-coded count=4/count=5 per model.
            params, _, self.header = W.load_darknet_weights(
                self.specs, self.cfg.input_size, weights_path,
                header_ints=None, bn_eps=self.cfg.bn_eps, fold=True)
        self.params = jax.device_put(
            jax.tree.map(jnp.asarray, params))
        self._compute_dtype = compute_dtype
        self._smooth_kwargs = {k: v for k, v in nms_kwargs.items()
                               if k in ("num_candidates", "max_detections",
                                        "conf_threshold", "iou_threshold",
                                        "class_aware_nms")}
        self._smooth_jits = {}
        fwd = make_forward(self.cfg, self.specs,
                           compute_dtype=compute_dtype, **nms_kwargs)
        if self.fused:
            nms_kwargs.pop("fused_decode", None)
            if letterbox_dtype is None and self._narrow_serving(
                    compute_dtype):
                # bf16 letterbox is the default whenever the model itself
                # computes narrow (bf16/int8 serving): pixels are bf16-
                # exact, only interpolation weights round — argued and
                # test-pinned within 2/255 of the C (test_preprocess);
                # pass letterbox_dtype=jnp.float32 for the bit-exact path
                letterbox_dtype = jnp.bfloat16
            # jit caches one executable per canvas shape; detect() rounds
            # canvases up to 256-px buckets to bound recompiles
            fwd_lb = make_forward_letterbox(
                self.cfg, self.specs, compute_dtype=compute_dtype,
                letterbox_dtype=letterbox_dtype, **nms_kwargs)
        self.mesh = mesh
        if mesh is not None:
            # scale-out batched serving: params replicated, images sharded
            # batch-over-data / height-over-spatial; GSPMD does the rest
            from yolo_tensorflow_tpu.parallel import mesh as M
            self.params = jax.device_put(self.params, M.replicated(mesh))
            self._image_sharding = M.image_sharding(mesh)
            self._jit_forward = jax.jit(
                fwd, in_shardings=(M.replicated(mesh), self._image_sharding),
                donate_argnums=(1,) if donate else ())
            if self.fused:
                # the fused path must shard its canvases too, or GSPMD
                # replicates the batch and mesh scale-out is silently lost
                self._jit_fused = jax.jit(
                    fwd_lb, in_shardings=(M.replicated(mesh),
                                          self._image_sharding,
                                          M.batch_sharding(mesh)))
        else:
            self._jit_forward = jax.jit(
                fwd, donate_argnums=(1,) if donate else ())
            if self.fused:
                self._jit_fused = jax.jit(fwd_lb)

    def _narrow_serving(self, compute_dtype) -> bool:
        """True when the model computes in a narrow dtype (bf16 compute or
        int8-quantized params) — the serving modes where the bf16 letterbox
        default applies."""
        if compute_dtype is not None and compute_dtype != jnp.float32:
            return True
        return any(isinstance(v, dict) and "w_q" in v
                   for v in self.params.values())

    # -- single image ------------------------------------------------------
    def detect(self, image: np.ndarray):
        """image: HWC uint8 (RGB). Returns a list of dicts with pixel-space
        boxes scaled back to the original image (like the reference's
        host-side ratio->pixel conversion, YOLO_V1_Inference.py:386-391)."""
        h, w = image.shape[:2]
        s = self.cfg.input_size
        if self.fused:
            return self._detect_fused(image)
        if self.letterbox:
            from yolo_tensorflow_tpu.data.augment import (letterbox,
                                                          unletterbox_boxes)
            resized, scale, px, py = letterbox(image, s)
        else:
            import cv2
            resized = cv2.resize(image, (s, s),
                                 interpolation=cv2.INTER_LINEAR)
        # single-transfer readback (post/nms.fetch_detections): bit-equal
        # to fetching each field, one round trip instead of five on
        # remote links
        dets = NMS.fetch_detections(
            self._jit_forward(self.params, resized[None]))
        n = int(dets.num[0])
        if self.letterbox and n:
            boxes_px = unletterbox_boxes(dets.boxes[0, :n], w, h, s,
                                         scale, px, py)
        else:
            boxes_px = dets.boxes[0, :n] * np.asarray([w, h, w, h],
                                                      np.float32)
        out = []
        for i in range(n):
            x0, y0, x1, y1 = boxes_px[i]
            out.append({
                "class_id": int(dets.classes[0, i]),
                "class": self.cfg.classes[int(dets.classes[0, i])],
                "score": float(dets.scores[0, i]),
                "box": (float(x0), float(y0), float(x1), float(y1)),
            })
        return out

    def _detect_fused(self, image: np.ndarray):
        """Fused letterbox path: memcpy into a bucketed canvas, everything
        else (resize, pad, normalize, backbone, decode, NMS, box un-map)
        inside one compiled program. Boxes come back in original pixels."""
        h, w = image.shape[:2]
        side = canvas_side(h, w, self.cfg.input_size)
        canvas = np.zeros((1, side, side, 3), np.uint8)
        canvas[0, :h, :w] = image
        sizes = np.asarray([[h, w]], np.int32)
        dets = NMS.fetch_detections(
            self._jit_fused(self.params, canvas, sizes))
        n = int(dets.num[0])
        return [{
            "class_id": int(dets.classes[0, i]),
            "class": self.cfg.classes[int(dets.classes[0, i])],
            "score": float(dets.scores[0, i]),
            "box": tuple(float(v) for v in dets.boxes[0, i]),
        } for i in range(n)]

    def detect_batch_fused(self, canvas_uint8, sizes) -> NMS.Detections:
        """Batched fused letterbox serving: (B, Hc, Hc, 3) uint8 canvases +
        (B, 2) int32 [h, w]. Boxes in each image's original pixels.

        ``sizes`` already on device (eval/batched.py pre-puts it to overlap
        the transfer) passes through untouched — np.asarray here would be a
        blocking device->host fetch per batch, serializing the prefetch
        pipeline through high-latency links."""
        if isinstance(sizes, jax.Array):
            if sizes.dtype != jnp.int32:
                sizes = sizes.astype(jnp.int32)   # device-side cast
            return self._jit_fused(self.params, canvas_uint8, sizes)
        return self._jit_fused(self.params, canvas_uint8,
                               np.asarray(sizes, np.int32))

    def detect_batch_smoothed(self, images_uint8, state=None, *,
                              avg_frames: int = 3):
        """Rolling-average streaming detection (demo.c:67-78
        avg_predictions): decode each frame from the mean of the last
        ``avg_frames`` activated head outputs. ``state`` carries the tail
        frames across calls (None = zeros, darknet's calloc'd buffers);
        returns (Detections, new_state). Frames must be consecutive in
        batch order."""
        import jax as _jax
        key = (avg_frames, images_uint8.shape[0])
        if key not in self._smooth_jits:
            self._smooth_jits[key] = _jax.jit(make_forward_smoothed(
                self.cfg, self.specs, avg_frames,
                compute_dtype=self._compute_dtype, **self._smooth_kwargs))
        if state is None:
            state = smooth_state_shapes(self.cfg, self.specs,
                                        images_uint8.shape[0], avg_frames)
        return self._smooth_jits[key](self.params, images_uint8, state)

    # -- batched ------------------------------------------------------------
    def detect_batch(self, images_uint8) -> NMS.Detections:
        """images_uint8: (B, S, S, 3) uint8 already sized to the model input.
        Returns device-resident fixed-shape Detections."""
        if self.mesh is not None:
            images_uint8 = jax.device_put(images_uint8, self._image_sharding)
        return self._jit_forward(self.params, images_uint8)

    def detect_from_file(self, path: str):
        from yolo_tensorflow_tpu.eval.batched import read_rgb
        return self.detect(read_rgb(path))


class Classifier:
    """Image classification pipeline (head=0 models) — the
    examples/classifier.c predict path: uint8 image -> softmax probs."""

    def __init__(self, model, weights_path: Optional[str] = None, *,
                 params=None, compute_dtype=None, specs=None, **overrides):
        self.cfg = (model if isinstance(model, C.ModelConfig)
                    else C.get_config(model, **overrides))
        if self.cfg.head != 0:
            raise ValueError(f"{model} is not a classifier config")
        self.specs = C.build_specs(self.cfg) if specs is None else specs
        if params is None:
            if weights_path is None:
                raise ValueError("need weights_path or params")
            params, _, _ = W.load_darknet_weights(
                self.specs, self.cfg.input_size, weights_path,
                bn_eps=self.cfg.bn_eps, fold=True)
        self.params = jax.device_put(jax.tree.map(jnp.asarray, params))
        cfg = self.cfg
        specs = self.specs

        def forward(p, images_uint8):
            x = normalize_images(images_uint8, cfg,
                                 compute_dtype or jnp.float32)
            dets, _ = engine.apply(specs, p, x, bn_eps=cfg.bn_eps,
                                   compute_dtype=compute_dtype)
            (probs, _), = dets
            return probs

        self._jit_forward = jax.jit(forward)
        self._compute_dtype = compute_dtype
        # LRU-capped: the fully-conv eval paths compile per (canvas,
        # out-shape, views) key; exact-geometry eval over a heterogeneous
        # set would otherwise grow this without bound (the bucketing
        # policy in eval/classify.snap_shape_32 bounds the KEYS; the cap
        # bounds live executables either way). Dropping a jax.jit wrapper
        # releases its compiled executables.
        self._crop_jits = _LRUCache(cap=16)
        self._mode_jits = _LRUCache(cap=64)

    def _crop_jit(self, canvas_side: int):
        """jit for the center-crop eval path, cached per canvas bucket."""
        if canvas_side not in self._crop_jits:
            from yolo_tensorflow_tpu.ops import preprocess as P
            cfg, specs, cd = self.cfg, self.specs, self._compute_dtype
            # fold the model normalization into the resize matrices, same
            # contract as the fused detector path
            rescale, offset = normalization_fold(cfg)

            def fwd(p, canvas_u8, sizes):
                x = P.letterbox_device_batch(canvas_u8, sizes,
                                             cfg.input_size,
                                             rescale=rescale, offset=offset)
                if cd is not None:
                    x = x.astype(cd)
                dets, _ = engine.apply(specs, p, x, bn_eps=cfg.bn_eps,
                                       compute_dtype=cd)
                (probs, _), = dets
                return probs

            self._crop_jits[canvas_side] = jax.jit(fwd)
        return self._crop_jits[canvas_side]

    def classify_batch_center_crop(self, images):
        """validate_classifier_single's preprocessing
        (examples/classifier.c:303-360 -> center_crop_image,
        src/image.c): square min-side center crop, then darknet's
        bilinear resize to the net size. The crop is a host numpy slice
        (exact); the resize runs ON DEVICE through the letterbox matmul
        machinery — a square image letterboxed to S x S degenerates to
        exactly resize_image(c, S, S), no padding — so the bilinear is
        bit-gated against the C transcription and rides the MXU. Canvas
        sides bucket at 256 px: one compilation serves every image whose
        crop fits the bucket. Returns (B, classes) probs on device."""
        ms = [min(im.shape[0], im.shape[1]) for im in images]
        side = canvas_side(max(ms))
        canvas = np.zeros((len(images), side, side, 3), np.uint8)
        sizes = np.zeros((len(images), 2), np.int32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            m = ms[i]
            # crop_image offsets (im.w - m)/2, (im.h - m)/2 — C int
            # division, non-negative here so // matches
            y0, x0 = (h - m) // 2, (w - m) // 2
            canvas[i, :m, :m] = im[y0:y0 + m, x0:x0 + m]
            sizes[i] = (m, m)
        return self._crop_jit(side)(self.params, jnp.asarray(canvas),
                                    jnp.asarray(sizes))

    def _resize_fwd_jit(self, canvas_hw, out_hw, views: str = "plain"):
        """jit cache for the eval-mode paths: device darknet resize from a
        (canvas_h, canvas_w) uint8 canvas (traced true sizes) to the STATIC
        (out_h, out_w), then forward. views='plain' -> (B, classes);
        'flip' -> image + mirror through one 2B batch, probs SUMMED
        (validate_classifier_multi's axpy, examples/classifier.c:462-466);
        '10crop' -> out is the (S+32) base, 10 clamped S-crops through one
        10B batch, probs summed (validate_classifier_10:252-272)."""
        key = (canvas_hw, out_hw, views)
        if key not in self._mode_jits:
            from yolo_tensorflow_tpu.ops import preprocess as P
            cfg, specs, cd = self.cfg, self.specs, self._compute_dtype
            rescale, offset = normalization_fold(cfg)
            S = cfg.input_size
            oh, ow = out_hw

            def fwd(p, canvas_u8, sizes):
                x = jax.vmap(lambda c, s: P.resize_device(
                    c, s[0], s[1], oh, ow, rescale=rescale,
                    offset=offset))(canvas_u8, sizes)
                if views == "flip":
                    x = jnp.concatenate([x, x[:, :, ::-1]], axis=0)
                elif views == "10crop":
                    # crop_image's constrain_int clamps out-of-range reads
                    # to the edge (src/image.c:857-875); offsets are only
                    # ever NEGATIVE 32 out of range here, so one
                    # replicate-pad on top/left makes all ten crops static
                    # slices. Same five offsets on the mirrored base.
                    offs = [(-32, -32), (32, -32), (0, 0), (-32, 32),
                            (32, 32)]
                    xs = []
                    for base in (x, x[:, :, ::-1]):
                        padded = jnp.pad(base, ((0, 0), (32, 0), (32, 0),
                                                (0, 0)), mode="edge")
                        xs += [padded[:, 32 + dy:32 + dy + S,
                                      32 + dx:32 + dx + S]
                               for dx, dy in offs]
                    x = jnp.concatenate(xs, axis=0)
                if cd is not None:
                    x = x.astype(cd)
                dets, _ = engine.apply(specs, p, x, bn_eps=cfg.bn_eps,
                                       compute_dtype=cd)
                (probs, _), = dets
                if views == "plain":
                    return probs
                n = 2 if views == "flip" else 10
                B = probs.shape[0] // n
                return probs.reshape(n, B, -1).sum(0)

            self._mode_jits[key] = jax.jit(fwd)
        return self._mode_jits[key]

    def _pack_canvases(self, images):
        """(B, Hc, Wc, 3) uint8 canvas + (B, 2) [h, w] sizes, bucketed."""
        side = canvas_side(*[max(im.shape[0], im.shape[1])
                             for im in images])
        canvas = np.zeros((len(images), side, side, 3), np.uint8)
        sizes = np.zeros((len(images), 2), np.int32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            canvas[i, :h, :w] = im
            sizes[i] = (h, w)
        return jnp.asarray(canvas), jnp.asarray(sizes)

    def classify_batch_resize(self, images):
        """validate_classifier_crop's preprocessing: plain stretch resize
        to the net size (load_data_old -> load_image_color(path, w, h),
        src/data.c:1122 — despite the mode's name there is no crop).
        Returns (B, classes) probs on device."""
        canvas, sizes = self._pack_canvases(images)
        S = self.cfg.input_size
        return self._resize_fwd_jit(canvas.shape[1:3], (S, S))(
            self.params, canvas, sizes)

    def classify_batch_10crop(self, images):
        """validate_classifier_10 (examples/classifier.c:234-305): stretch
        to (S+32, S+32), ten S-crops — four corners + center, then the
        same five on the mirror — predictions SUMMED. All ten views run
        as one 10B device batch. Returns (B, classes) summed probs."""
        canvas, sizes = self._pack_canvases(images)
        S = self.cfg.input_size
        return self._resize_fwd_jit(canvas.shape[1:3], (S + 32, S + 32),
                                    views="10crop")(
            self.params, canvas, sizes)

    @staticmethod
    def _resize_min_shape(h: int, w: int, size: int):
        """resize_min's integer geometry (src/image.c:997): shorter side
        -> size."""
        if w < h:
            return (h * size) // w, size
        return size, (w * size) // h

    @staticmethod
    def _resize_max_shape(h: int, w: int, size: int):
        """resize_max's integer geometry (src/image.c:981): longer side
        -> size."""
        if w > h:
            return (h * size) // w, size
        return size, (w * size) // h

    def classify_group_fullconv(self, images, out_hw, flip: bool = False):
        """One fully-convolutional forward at the static shape ``out_hw``
        — the resize_network(net, r.w, r.h) step of
        validate_classifier_full/_multi (examples/classifier.c:340,460):
        the global avgpool head makes the net shape-polymorphic, each
        distinct resized shape is one compiled executable (the C pays a
        workspace realloc per image instead). images must share no
        particular shape — the device resize takes traced true sizes."""
        canvas, sizes = self._pack_canvases(images)
        return self._resize_fwd_jit(canvas.shape[1:3], tuple(out_hw),
                                    views="flip" if flip else "plain")(
            self.params, canvas, sizes)

    def classify(self, image: np.ndarray, top_k: int = 5):
        import cv2
        s = self.cfg.input_size
        resized = cv2.resize(image, (s, s), interpolation=cv2.INTER_LINEAR)
        probs = np.asarray(self._jit_forward(self.params, resized[None])[0])
        idx = np.argsort(-probs)[:top_k]
        return [{"class_id": int(i), "class": self.cfg.classes[int(i)],
                 "prob": float(probs[i])} for i in idx]

    def classify_batch(self, images_uint8):
        return self._jit_forward(self.params, images_uint8)
