"""Perf ablation on the real chip: stage-by-stage timing of the yolov3
pipeline to locate the bottleneck (backbone vs decode vs NMS), across batch
sizes. Not part of the test suite."""

import time

import numpy as np


def timeit(fn, args, iters=10):
    out = fn(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.models import engine, heads
    from yolo_tensorflow_tpu.pipeline import make_forward, normalize_images

    cfg = C.get_config("yolov3")
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 416, 416, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = {k: {"w": jnp.asarray(v["w"], jnp.bfloat16),
                  "b": jnp.asarray(v["b"], jnp.float32)}
              for k, v in params.items()}
    params = jax.device_put(params)

    for batch in (32, 64, 128):
        rng = np.random.default_rng(0)
        imgs = jax.device_put(rng.integers(
            0, 255, (batch, 416, 416, 3), dtype=np.uint8))

        @jax.jit
        def backbone_only(p, im):
            x = normalize_images(im, cfg, jnp.float32)
            dets, _ = engine.apply(specs, p, x, compute_dtype=jnp.bfloat16)
            return [f for f, _ in dets]

        @jax.jit
        def through_decode(p, im):
            x = normalize_images(im, cfg, jnp.float32)
            dets, _ = engine.apply(specs, p, x, compute_dtype=jnp.bfloat16)
            return heads.decode(dets, cfg)

        full = jax.jit(make_forward(cfg, specs, compute_dtype=jnp.bfloat16))

        tb = timeit(backbone_only, (params, imgs))
        td = timeit(through_decode, (params, imgs))
        tf = timeit(full, (params, imgs))
        gflop = engine.count_flops(specs, (batch, 416, 416, 3)) / 1e9
        print(f"batch {batch:4d}: backbone {tb*1e3:7.2f}ms  +decode "
              f"{td*1e3:7.2f}ms  full {tf*1e3:7.2f}ms  "
              f"-> {batch/tf:7.1f} img/s  "
              f"({gflop/tb/1e3:5.1f} TF/s backbone)", flush=True)


if __name__ == "__main__":
    main()
