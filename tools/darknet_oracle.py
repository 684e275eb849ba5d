"""Minimal ctypes harness around the *reference's own* darknet build, used
exclusively as a numerical ground-truth oracle for parity tests.

The reference repo vendors the full darknet C framework
(/root/reference/Darknet2Tensorflow/darknet-master). We compile it CPU-only
into a scratch directory (never into this repo) and drive it through its
public C API (include/darknet.h:586,739,745) to produce reference
activations/detections for (cfg, weights) pairs that THIS framework emits
via io/cfg.py + io/weights.py. Nothing from the C side ships here — it is a
test oracle, exactly the role the reference's own README gives the binary.
"""

from __future__ import annotations

import ctypes as ct
import os
import shutil
import subprocess

import numpy as np

DARKNET_SRC = "/root/reference/Darknet2Tensorflow/darknet-master"
BUILD_DIR = os.environ.get("DARKNET_ORACLE_BUILD", "/tmp/dnbuild")


class BOX(ct.Structure):
    _fields_ = [("x", ct.c_float), ("y", ct.c_float),
                ("w", ct.c_float), ("h", ct.c_float)]


class DETECTION(ct.Structure):
    _fields_ = [("bbox", BOX), ("classes", ct.c_int),
                ("prob", ct.POINTER(ct.c_float)),
                ("mask", ct.POINTER(ct.c_float)),
                ("objectness", ct.c_float), ("sort_class", ct.c_int)]


class IMAGE(ct.Structure):
    _fields_ = [("w", ct.c_int), ("h", ct.c_int), ("c", ct.c_int),
                ("data", ct.POINTER(ct.c_float))]


def build_oracle() -> str:
    """Compile the reference darknet (CPU-only) into BUILD_DIR; reuse an
    existing build. Returns the path to libdarknet.so or raises."""
    lib = os.path.join(BUILD_DIR, "libdarknet.so")
    if os.path.exists(lib):
        return lib
    if not os.path.isdir(DARKNET_SRC):
        raise FileNotFoundError(DARKNET_SRC)
    os.makedirs(BUILD_DIR, exist_ok=True)
    for d in ("src", "include", "examples"):
        shutil.copytree(os.path.join(DARKNET_SRC, d),
                        os.path.join(BUILD_DIR, d), dirs_exist_ok=True)
    shutil.copy(os.path.join(DARKNET_SRC, "Makefile"), BUILD_DIR)
    mk = os.path.join(BUILD_DIR, "Makefile")
    text = open(mk).read().replace("GPU=1", "GPU=0").replace("CUDNN=1",
                                                             "CUDNN=0")
    open(mk, "w").write(text)
    for d in ("obj", "backup", "results"):  # Makefile assumes these exist
        os.makedirs(os.path.join(BUILD_DIR, d), exist_ok=True)
    subprocess.run(["make", "-j8", "libdarknet.so"], cwd=BUILD_DIR,
                   check=True, capture_output=True)
    return lib


class Oracle:
    def __init__(self, lib_path: str | None = None):
        self.lib = ct.CDLL(lib_path or build_oracle(), ct.RTLD_GLOBAL)
        self.lib.load_network.restype = ct.c_void_p
        self.lib.load_network.argtypes = [ct.c_char_p, ct.c_char_p, ct.c_int]
        self.lib.network_predict.restype = ct.POINTER(ct.c_float)
        self.lib.network_predict.argtypes = [ct.c_void_p,
                                             ct.POINTER(ct.c_float)]
        self.lib.get_network_boxes.restype = ct.POINTER(DETECTION)
        self.lib.get_network_boxes.argtypes = [
            ct.c_void_p, ct.c_int, ct.c_int, ct.c_float, ct.c_float,
            ct.POINTER(ct.c_int), ct.c_int, ct.POINTER(ct.c_int)]
        self.lib.free_detections.argtypes = [ct.POINTER(DETECTION), ct.c_int]
        self.lib.make_image.restype = IMAGE
        self.lib.make_image.argtypes = [ct.c_int, ct.c_int, ct.c_int]
        self.lib.letterbox_image.restype = IMAGE
        self.lib.letterbox_image.argtypes = [IMAGE, ct.c_int, ct.c_int]
        self.lib.free_image.argtypes = [IMAGE]

    def load(self, cfg_path: str, weights_path: str):
        net = self.lib.load_network(cfg_path.encode(), weights_path.encode(), 0)
        assert net, "load_network failed"
        return net

    @staticmethod
    def to_darknet_input(image_u8: np.ndarray) -> np.ndarray:
        """uint8 HWC RGB -> darknet float CHW in [0,1] (image.c layout)."""
        x = image_u8.astype(np.float32) / 255.0
        return np.ascontiguousarray(x.transpose(2, 0, 1)).ravel()

    def predict_raw(self, net, image_u8: np.ndarray, out_size: int) -> np.ndarray:
        """network_predict: returns the final layer's output (CHW order)."""
        data = self.to_darknet_input(image_u8)
        ptr = self.lib.network_predict(
            net, data.ctypes.data_as(ct.POINTER(ct.c_float)))
        return np.ctypeslib.as_array(ptr, shape=(out_size,)).copy()

    def predict_flat(self, net, data: np.ndarray, out_size: int) -> np.ndarray:
        """network_predict on a raw float vector — recurrent / flat-input
        nets ([net] inputs=K time_steps=T feed T*K floats, step-major,
        src/network.c:497)."""
        data = np.ascontiguousarray(data, dtype=np.float32).ravel()
        ptr = self.lib.network_predict(
            net, data.ctypes.data_as(ct.POINTER(ct.c_float)))
        return np.ctypeslib.as_array(ptr, shape=(out_size,)).copy()

    def letterbox(self, image_u8: np.ndarray, out_size: int) -> np.ndarray:
        """letterbox_image (src/image.c:960) through the C library itself:
        uint8 HWC RGB -> (S, S, 3) float32 in [0,1] incl. the .5 pad."""
        h, w = image_u8.shape[:2]
        im = self.lib.make_image(w, h, 3)
        chw = self.to_darknet_input(image_u8)
        ct.memmove(im.data, chw.ctypes.data, chw.nbytes)
        boxed = self.lib.letterbox_image(im, out_size, out_size)
        out = np.ctypeslib.as_array(
            boxed.data, shape=(3, out_size, out_size)).copy()
        self.lib.free_image(im)
        self.lib.free_image(boxed)
        return out.transpose(1, 2, 0)

    def boxes_flip(self, net, image_u8: np.ndarray, num_classes: int,
                   thresh: float = 0.5):
        """The validate_detector_flip path (examples/detector.c:234):
        set_batch_network(net, 2), feed [image, mirrored image],
        get_network_boxes — the C runs avg_flipped_yolo /
        get_region_detections' batch==2 averaging internally."""
        self.lib.set_batch_network.argtypes = [ct.c_void_p, ct.c_int]
        self.lib.set_batch_network(net, 2)
        data = np.concatenate([self.to_darknet_input(image_u8),
                               self.to_darknet_input(image_u8[:, ::-1])])
        self.lib.network_predict(
            net, data.ctypes.data_as(ct.POINTER(ct.c_float)))
        n = ct.c_int(0)
        h, w = image_u8.shape[:2]
        dets = self.lib.get_network_boxes(net, w, h, thresh, 0.5, None, 1,
                                          ct.byref(n))
        out = []
        for i in range(n.value):
            d = dets[i]
            probs = [d.prob[c] for c in range(num_classes)]
            out.append({"box": (d.bbox.x, d.bbox.y, d.bbox.w, d.bbox.h),
                        "objectness": d.objectness, "prob": probs})
        self.lib.free_detections(dets, n)
        self.lib.set_batch_network(net, 1)
        return out

    def boxes(self, net, image_u8: np.ndarray, num_classes: int,
              thresh: float = 0.5, orig_wh=None):
        """network_predict + get_network_boxes (relative coords, no NMS).
        orig_wh: (w, h) of the pre-letterbox image — passed through to
        correct_yolo_boxes/correct_region_boxes exactly like the darknet
        detect path (examples/detector.c test_detector); defaults to the
        fed image's own size (identity correction)."""
        data = self.to_darknet_input(image_u8)
        self.lib.network_predict(
            net, data.ctypes.data_as(ct.POINTER(ct.c_float)))
        n = ct.c_int(0)
        if orig_wh is None:
            h, w = image_u8.shape[:2]
        else:
            w, h = orig_wh
        dets = self.lib.get_network_boxes(net, w, h, thresh, 0.5, None, 1,
                                          ct.byref(n))
        out = []
        for i in range(n.value):
            d = dets[i]
            probs = [d.prob[c] for c in range(num_classes)]
            out.append({"box": (d.bbox.x, d.bbox.y, d.bbox.w, d.bbox.h),
                        "objectness": d.objectness, "prob": probs})
        self.lib.free_detections(dets, n)
        return out
