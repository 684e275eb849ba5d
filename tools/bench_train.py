"""Training-step throughput on one chip: YOLOv3-416, full darknet loss.

The reference trains in C (examples/detector.c train_detector); it prints
per-batch seconds but records no numbers (BASELINE.md). This measures our
equivalent hot loop — normalize -> Darknet-53 FPN forward (train-mode BN)
-> yolo_layer.c-exact loss -> backward -> SGD/momentum update — as
images/sec on the attached device, using the same multi-step scan the
runner uses to amortize dispatch (train/loop.make_multi_step).

Prints one JSON line. Env knobs: BENCH_TRAIN_BATCH (32), BENCH_TRAIN_STEPS
(4, scanned inside one jit), BENCH_TRAIN_SIZE (416), BENCH_TRAIN_MODEL
(yolov3).
"""

import json
import os
import time

import numpy as np


def measure_train(model="yolov3", size=416, batch=32, steps=4,
                  compute_dtype="bfloat16", remat_every=None,
                  bn_stats="twopass", truth_assign="vectorized",
                  repeats=3):
    import jax
    import jax.numpy as jnp
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.train import loop as L

    cfg = C.get_config(model, input_size=size)
    sched = L.darknet_lr_schedule(1e-3, burn_in=1000)
    tx = L.make_optimizer(sched)
    state = L.create_train_state(cfg, tx, jax.random.PRNGKey(0))
    # compute_dtype None = the exact-f32 parity mode (Precision.HIGHEST);
    # "float32" = f32 operands at MXU default precision; "bfloat16" = the
    # mixed-precision training mode (tests/test_train_bf16.py)
    cd = None if compute_dtype is None else getattr(jnp, compute_dtype)
    multi = L.make_multi_step(cfg, tx, steps, compute_dtype=cd,
                              remat_every=remat_every, bn_stats=bn_stats,
                              truth_assign=truth_assign)
    step_fn = jax.jit(multi, donate_argnums=(0,))

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (steps, batch, size, size, 3),
                          dtype=np.uint8)
    # 8 boxes/image, normalized cxcywh+class, w==0 padding beyond
    truths = np.zeros((steps, batch, 30, 5), np.float32)
    truths[..., :8, 0:2] = rng.uniform(0.2, 0.8, (steps, batch, 8, 2))
    truths[..., :8, 2:4] = rng.uniform(0.05, 0.4, (steps, batch, 8, 2))
    truths[..., :8, 4] = rng.integers(0, cfg.num_classes, (steps, batch, 8))
    images, truths = jax.device_put(images), jax.device_put(truths)

    # time with a host VALUE readback, not block_until_ready: through the
    # remote-TPU tunnel block_until_ready can resolve before the donated
    # executable finishes (measured 1 ms/step vs the real 135), while
    # np.asarray must wait for the actual bytes
    t0 = time.perf_counter()
    state, metrics = step_fn(state, images, truths)
    cost = np.asarray(metrics["cost"])
    compile_s = time.perf_counter() - t0

    # median-of-`repeats` timed dispatches: one stalled tunnel window must
    # not become the number of record (see bench.py docstring)
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, images, truths)
        cost = np.asarray(metrics["cost"])
        samples.append(time.perf_counter() - t0)
    dt = float(np.median(samples))
    return {
        "train_images_per_sec": round(steps * batch / dt, 1),
        "step_ms": round(dt / steps * 1e3, 2),
        "spread_img_per_sec": [round(steps * batch / s, 1) for s in samples],
        "loss_finite": bool(np.isfinite(cost.sum())),
        "compile_s": round(compile_s, 1),
        "batch": batch, "steps_per_dispatch": steps,
        "model": model, "size": size,
        "compute_dtype": compute_dtype or "float32-exact",
        "remat_every": remat_every,
        "bn_stats": bn_stats,
        "truth_assign": truth_assign,
    }


def main():
    import jax
    res = measure_train(
        model=os.environ.get("BENCH_TRAIN_MODEL", "yolov3"),
        size=int(os.environ.get("BENCH_TRAIN_SIZE", "416")),
        batch=int(os.environ.get("BENCH_TRAIN_BATCH", "32")),
        steps=int(os.environ.get("BENCH_TRAIN_STEPS", "4")),
        remat_every=(int(os.environ["BENCH_TRAIN_REMAT"])
                     if os.environ.get("BENCH_TRAIN_REMAT") else None),
        bn_stats=os.environ.get("BENCH_TRAIN_BN_STATS", "twopass"),
        truth_assign=os.environ.get("BENCH_TRAIN_TRUTH_ASSIGN", "vectorized"))
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
