"""Profiling/observability hooks.

The reference's tracing story is wall-clock prints around sess.run
(YOLO_V1_Inference.py:379-383) and darknet's per-batch second counts
(examples/detector.c:110). Here: a stage timer with the same printed
flavor, plus jax.profiler trace capture and an --xla_dump hook."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict


class StageTimer:
    """Accumulating wall-clock stage timer; ``report()`` prints
    darknet-style 'stage: seconds' lines."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {total/n*1e3:.2f}ms "
                         f"avg over {n}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/yolo_trace"):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_xla_dump(dump_dir: str = "/tmp/yolo_xla_dump") -> None:
    """Must run before the first compilation; dumps HLO for offline
    inspection (the TensorBoard-graph-dump analogue of FileWriter('logs/'))."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_dump_to" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_dump_to={dump_dir}").strip()


def block_and_time(fn, *args, label: str = "run", **kw):
    """Reference-style timed run print ('duration = %.3f',
    YOLO_V1_Inference.py:383)."""
    import jax
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"{label}: duration = {time.perf_counter() - t0:.3f}s")
    return out
