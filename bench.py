"""Benchmark: YOLOv3-416 batched end-to-end throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
Baseline target (BASELINE.md): >= 1500 images/sec/chip at 416x416 batched
on TPU v5e, full pipeline (uint8 normalize -> Darknet-53 FPN -> decode ->
NMS) on device. Timing forces a host read of the detection counts each
round, so async dispatch can't hide device time.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.models import engine
    from yolo_tensorflow_tpu.pipeline import make_forward

    batch = int(__import__("os").environ.get("BENCH_BATCH", "64"))
    iters = int(__import__("os").environ.get("BENCH_ITERS", "20"))

    cfg = C.get_config("yolov3")
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(
        specs, (1, cfg.input_size, cfg.input_size, 3),
        jax.random.PRNGKey(0), folded=True)
    # serving layout: weights bf16 (biases stay f32 for the f32 accumulate)
    params = {k: {"w": jnp.asarray(v["w"], jnp.bfloat16),
                  "b": jnp.asarray(v["b"], jnp.float32)}
              for k, v in params.items()}
    params = jax.device_put(params)
    fwd = jax.jit(make_forward(cfg, specs, compute_dtype=jnp.bfloat16))

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(
        0, 255, (batch, cfg.input_size, cfg.input_size, 3), dtype=np.uint8))

    # warmup (compile)
    out = fwd(params, images)
    _ = np.asarray(out.num)

    t0 = time.perf_counter()
    total = 0
    for _ in range(iters):
        out = fwd(params, images)
        total += int(np.asarray(out.num).sum())  # forces device completion
    dt = time.perf_counter() - t0
    ips = batch * iters / dt

    # p50 end-to-end latency (single batch incl. NMS + host readback)
    lats = []
    for _ in range(30):
        t = time.perf_counter()
        out = fwd(params, images)
        _ = np.asarray(out.num)
        lats.append(time.perf_counter() - t)
    p50_ms = float(np.median(lats) * 1e3)

    print(json.dumps({
        "metric": "yolov3-416 batched e2e images/sec/chip (incl. on-device NMS)",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / 1500.0, 3),
        "extra": {"batch": batch, "p50_batch_latency_ms": round(p50_ms, 2),
                  "platform": jax.devices()[0].platform,
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
