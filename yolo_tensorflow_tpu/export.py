"""Serialized inference artifacts — the frozen-pb equivalent.

The reference freezes graphs with convert_variables_to_constants and ships
.pb files consumed by a separate app that only knows 4 tensor names
(yOLO_v2_export_graph.py:22-27, object_detect.py:61-90). Here the artifact
is a ``jax.export`` StableHLO bundle with the weights baked in, plus a JSON
manifest (model name, class names, thresholds, input spec).

Consumer side: ``LoadedArtifact`` (raw named-output call) and
``ArtifactDetector`` (the object_detect.py ObjectDetectModel analogue:
resize, run, pixel-space boxes, class names — zero model knowledge), driven
by ``cli.py detect --artifact model.ytt img...`` and ``serve``.
"""

from __future__ import annotations

import json
import zipfile

import numpy as np

MANIFEST = "manifest.json"
MLIR = "model.stablehlo"

_OUTPUT_NAMES = ("detected_boxes", "detected_scores", "detected_classes",
                 "detected_valid", "detected_num")


def export_detector(detector, path: str, *, batch_size: int = 1,
                    canvas_size: int = 0) -> None:
    """Serialize a pipeline.Detector to a self-contained artifact.

    A Detector built with ``letterbox=True, fused=True`` exports the
    letterbox-fused program instead: inputs are a (B, C, C, 3) uint8
    canvas (raw pixels memcpy'd top-left) plus (B, 2) int32 true [h, w],
    and detected_boxes come back in each image's ORIGINAL pixels — an
    arbitrary-input-size serving artifact the reference's fixed-placeholder
    .pb files never had. ``canvas_size`` bounds the largest feedable image
    (default 2x the model input)."""
    import jax
    from jax import export as jexport

    cfg = detector.cfg
    params = detector.params

    manifest = {
        "framework": "yolo_tensorflow_tpu",
        "model": cfg.name,
        "outputs": list(_OUTPUT_NAMES),
        "classes": list(cfg.classes),
        "conf_threshold": cfg.conf_threshold,
        "iou_threshold": cfg.iou_threshold,
        "max_detections": cfg.max_detections,
    }

    if getattr(detector, "fused", False):
        side = canvas_size or 2 * cfg.input_size
        fwd = detector._jit_fused

        def model(canvas_uint8, sizes):
            return tuple(fwd(params, canvas_uint8, sizes))

        in_specs = (jax.ShapeDtypeStruct((batch_size, side, side, 3),
                                         np.uint8),
                    jax.ShapeDtypeStruct((batch_size, 2), np.int32))
        exported = jexport.export(jax.jit(model))(*in_specs)
        manifest["input"] = {
            "kind": "letterbox_canvas",
            "shape": [batch_size, side, side, 3],
            "sizes_shape": [batch_size, 2],
            "dtype": "uint8", "layout": "NHWC", "colorspace": "RGB",
            "boxes_space": "original_pixels"}
    else:
        # close over the weights so the artifact is standalone (pb analogue)
        fwd = detector._jit_forward

        def model(images_uint8):
            return tuple(fwd(params, images_uint8))

        spec = jax.ShapeDtypeStruct(
            (batch_size, cfg.input_size, cfg.input_size, 3), np.uint8)
        exported = jexport.export(jax.jit(model))(spec)
        manifest["input"] = {
            "shape": [batch_size, cfg.input_size, cfg.input_size, 3],
            "dtype": "uint8", "layout": "NHWC", "colorspace": "RGB"}

    blob = exported.serialize()
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(MANIFEST, json.dumps(manifest, indent=2))
        z.writestr(MLIR, blob)


class LoadedArtifact:
    """Consumer side (the object_detect.py analogue): no model knowledge,
    just the artifact."""

    def __init__(self, path: str):
        from jax import export as jexport
        with zipfile.ZipFile(path) as z:
            self.manifest = json.loads(z.read(MANIFEST))
            blob = z.read(MLIR)
        self._exported = jexport.deserialize(blob)
        self.classes = self.manifest["classes"]
        self.input_shape = tuple(self.manifest["input"]["shape"])

    @property
    def is_letterbox(self) -> bool:
        return self.manifest["input"].get("kind") == "letterbox_canvas"

    def __call__(self, images_uint8: np.ndarray, sizes=None):
        """images: uint8 matching the manifest input shape (a raw-pixel
        canvas for letterbox artifacts, with ``sizes`` (B, 2) int32 [h, w]).
        Returns dict of the named outputs."""
        if self.is_letterbox:
            if sizes is None:
                raise ValueError("letterbox artifact needs sizes (B,2) "
                                 "[h, w]")
            outs = self._exported.call(images_uint8,
                                       np.asarray(sizes, np.int32))
        else:
            outs = self._exported.call(images_uint8)
        return dict(zip(self.manifest["outputs"], outs))


class ArtifactDetector:
    """Standalone artifact consumer app — the ObjectDetectModel analogue
    (YOLO_V1/.../object_detect.py:34-90,161: load frozen graph by output
    names, feed uint8, visualize). Knows nothing about the model beyond the
    manifest: input shape, output names, class names."""

    def __init__(self, path: str):
        self.artifact = LoadedArtifact(path)
        self.classes = self.artifact.classes
        _, self.size, _, _ = self.artifact.input_shape

    def detect(self, image: np.ndarray):
        """image: HWC uint8 (RGB), any size. Returns the same list-of-dicts
        contract as pipeline.Detector.detect (pixel-space boxes on the
        original image)."""
        import cv2
        h, w = image.shape[:2]
        if self.artifact.is_letterbox:
            # raw pixels into the canvas; resize/pad/un-map are inside the
            # frozen program. Downscale only if the image exceeds the
            # canvas, and map boxes back with the TRUE per-axis ratios
            # (int() flooring of the resize target makes them differ from
            # the nominal scale by up to ~1px on the non-dominant axis).
            # Note the host pre-shrink uses cv2 INTER_AREA — a deliberate
            # deviation from the darknet bilinear inside the frozen program
            # (area averaging is the correct anti-aliasing minifier for an
            # oversize fallback; the in-program letterbox stays bit-exact).
            side = self.size
            scale = min(1.0, side / max(h, w))
            if scale < 1.0:
                image = cv2.resize(image, (int(w * scale), int(h * scale)),
                                   interpolation=cv2.INTER_AREA)
            ih, iw = image.shape[:2]
            canvas = np.zeros(self.artifact.input_shape, np.uint8)
            canvas[:, :ih, :iw] = image
            sizes = np.tile(np.asarray([[ih, iw]], np.int32),
                            (self.artifact.input_shape[0], 1))
            outs = {k: np.asarray(v)
                    for k, v in self.artifact(canvas, sizes).items()}
            n = int(outs["detected_num"][0])
            boxes_px = outs["detected_boxes"][0, :n] * np.asarray(
                [w / iw, h / ih, w / iw, h / ih], np.float32)
        else:
            resized = cv2.resize(image, (self.size, self.size),
                                 interpolation=cv2.INTER_LINEAR)
            batch = np.broadcast_to(
                resized[None], self.artifact.input_shape).copy()
            outs = {k: np.asarray(v)
                    for k, v in self.artifact(batch).items()}
            n = int(outs["detected_num"][0])
            boxes_px = outs["detected_boxes"][0, :n] * np.asarray(
                [w, h, w, h], np.float32)
        return [{
            "class_id": int(outs["detected_classes"][0, i]),
            "class": self.classes[int(outs["detected_classes"][0, i])],
            "score": float(outs["detected_scores"][0, i]),
            "box": tuple(float(v) for v in boxes_px[i]),
        } for i in range(n)]

    def detect_from_file(self, path: str):
        import cv2
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return self.detect(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
