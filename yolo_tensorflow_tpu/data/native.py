"""ctypes binding to the native batch-preprocessing kernel
(native/yolodata.cpp) — the framework-side counterpart of the reference's
darknet.py ctypes binding, but binding OUR native runtime instead of
libdarknet. Falls back cleanly when the library isn't built."""

from __future__ import annotations

import ctypes as ct
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libyolodata.so"),
    "libyolodata.so",
)


class Aug(ct.Structure):
    _fields_ = [("crop_x0", ct.c_int32), ("crop_y0", ct.c_int32),
                ("crop_w", ct.c_int32), ("crop_h", ct.c_int32),
                ("dhue", ct.c_float), ("dsat", ct.c_float),
                ("dexp", ct.c_float), ("flip", ct.c_int32)]


_lib = None
_tried = False


def load_library() -> Optional[ct.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    for p in _LIB_PATHS:
        try:
            lib = ct.CDLL(os.path.abspath(p) if os.sep in p else p)
        except OSError:
            continue
        lib.yd_process_batch.argtypes = [
            ct.POINTER(ct.c_void_p), ct.POINTER(ct.c_int32),
            ct.POINTER(ct.c_int32), ct.c_int32, ct.POINTER(Aug),
            ct.c_void_p, ct.c_int32, ct.c_uint8, ct.c_int32]
        lib.yd_version.restype = ct.c_int32
        _lib = lib
        break
    return _lib


def available() -> bool:
    return load_library() is not None


def process_batch(images: Sequence[np.ndarray], augs: Sequence[dict],
                  out_size: int, *, pad: int = 128,
                  nthreads: int = 0) -> np.ndarray:
    """images: list of HWC RGB uint8 arrays; augs: per-image dicts with
    crop_x0/crop_y0/crop_w/crop_h/dhue/dsat/dexp/flip. Returns
    (N, out_size, out_size, 3) uint8."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("libyolodata.so not built (make -C native)")
    n = len(images)
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    srcs = (ct.c_void_p * n)(*[im.ctypes.data_as(ct.c_void_p).value
                               for im in images])
    hs = (ct.c_int32 * n)(*[im.shape[0] for im in images])
    ws = (ct.c_int32 * n)(*[im.shape[1] for im in images])
    ca = (Aug * n)()
    for i, a in enumerate(augs):
        ca[i] = Aug(int(a["crop_x0"]), int(a["crop_y0"]), int(a["crop_w"]),
                    int(a["crop_h"]), float(a.get("dhue", 0.0)),
                    float(a.get("dsat", 1.0)), float(a.get("dexp", 1.0)),
                    int(a.get("flip", 0)))
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    lib.yd_process_batch(
        ct.cast(srcs, ct.POINTER(ct.c_void_p)), hs, ws, n, ca,
        out.ctypes.data_as(ct.c_void_p), out_size, pad, nthreads)
    return out
