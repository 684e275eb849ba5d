"""Streaming/batched serving driver — the src/demo.c:185 equivalent.

Darknet's demo runs a 2-thread fetch/detect pipeline (pthread_create at
demo.c:252-253) with a rolling FPS print. Here: a host prefetch thread
decodes+resizes frames into fixed batches while the device runs the
previous batch — the same overlap, plus batching (darknet is batch-1).
Sources: a video file / camera index (cv2.VideoCapture) or a directory of
images looped ``loops`` times.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
import time
from typing import Iterator

import numpy as np

def _fetch_packed(dets):
    """Device Detections -> numpy-backed Detections in ONE host transfer
    (post/nms.fetch_detections)."""
    from yolo_tensorflow_tpu.post import nms as NMS
    return NMS.fetch_detections(dets)


def frame_source(source, size: int, loops: int = 1) -> Iterator[np.ndarray]:
    """Yield (size, size, 3) uint8 RGB frames from a video path, camera
    index, or image directory."""
    import cv2
    if isinstance(source, int) or (isinstance(source, str)
                                   and source.isdigit()):
        cap = cv2.VideoCapture(int(source))
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    return
                yield cv2.cvtColor(cv2.resize(frame, (size, size)),
                                   cv2.COLOR_BGR2RGB)
        finally:
            cap.release()  # free the camera even on generator close
    elif os.path.isdir(source):
        paths = sorted(glob.glob(os.path.join(source, "*")))
        paths = [p for p in paths
                 if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))]
        for _ in range(loops):
            for p in paths:
                img = cv2.imread(p)
                if img is None:
                    continue
                yield cv2.cvtColor(cv2.resize(img, (size, size)),
                                   cv2.COLOR_BGR2RGB)
    else:
        cap = cv2.VideoCapture(source)
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    return
                yield cv2.cvtColor(cv2.resize(frame, (size, size)),
                                   cv2.COLOR_BGR2RGB)
        finally:
            cap.release()


def stream_detect(detector, source, *, batch_size: int = 8, loops: int = 1,
                  prefetch: int = 3, on_batch=None, max_batches: int = 0,
                  avg_frames: int = 0):
    """Run the fetch/detect pipeline. ``on_batch(dets, images)`` is called
    per batch (e.g. to draw); returns (frames, wall_seconds, fps).

    ``avg_frames`` >= 2 enables demo.c's rolling prediction average
    (src/demo.c:31,67-78, demo_frame=3): each frame is decoded from the
    mean of the last N activated head outputs, smoothing detections over
    time; the tail state slides across batch boundaries."""
    size = detector.cfg.input_size
    # Queue(maxsize<=0) would be UNBOUNDED — a fetcher outrunning the
    # detector would buffer the whole video; prefetch floors at 1
    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    SENTINEL = None
    stop = threading.Event()

    def put(item) -> bool:
        """Bounded put that aborts when the consumer stopped early, so the
        fetcher (and its video capture) never blocks forever."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def fetcher():
        try:
            batch = []
            for frame in frame_source(source, size, loops):
                if stop.is_set():
                    return
                batch.append(frame)
                if len(batch) == batch_size:
                    if not put(np.stack(batch)):
                        return
                    batch = []
            if batch:  # pad the tail to the compiled batch size
                pad = np.zeros((batch_size - len(batch), size, size, 3),
                               np.uint8)
                put((np.concatenate([np.stack(batch), pad]), len(batch)))
        finally:
            # always unblock the consumer, even if the source raised
            stop.is_set() or put(SENTINEL)

    t = threading.Thread(target=fetcher, daemon=True)
    t.start()

    frames = 0
    batches = 0
    smooth_state = None
    t0 = time.perf_counter()
    try:
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            if isinstance(item, tuple):
                images, valid = item
            else:
                images, valid = item, item.shape[0]
            if avg_frames and avg_frames > 1:
                dets, smooth_state = detector.detect_batch_smoothed(
                    images, smooth_state, avg_frames=avg_frames)
            else:
                dets = detector.detect_batch(images)
            if on_batch is not None:
                # single-transfer readback (post/nms.pack_detections):
                # remote links charge a round trip per fetched array — hand
                # the callback a host-materialized Detections in one
                # transfer
                on_batch(_fetch_packed(dets), images[:valid])
            else:
                # force completion so FPS is honest (demo.c per-frame print)
                np.asarray(dets.num)
            frames += valid
            batches += 1
            if max_batches and batches >= max_batches:
                break
    finally:
        # release the fetcher (and its capture source) on ANY exit —
        # early stop, source end, or a detect/on_batch exception; without
        # this a raising consumer leaks the thread and holds the camera
        # open for the life of the process
        stop.set()
    dt = time.perf_counter() - t0
    t.join(timeout=2.0)
    fps = frames / dt if dt > 0 else 0.0
    return frames, dt, fps
