"""Throughput matrix over BASELINE.json's five benchmark configs.

Same chained-on-device methodology as bench.py (each iteration's input
depends on the previous detection counts so XLA can't elide passes; one
readback), run for every config the driver's baseline names:
YOLOv1-448, Tiny-YOLOv2-416, YOLOv2-416, YOLOv3-416, YOLOv3-608.

Prints one JSON line per config and a markdown table at the end.
Usage: python tools/bench_matrix.py  (env BENCH_ITERS to override)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [
    # (model, size, batch) — batches sized to fill the chip at each res
    ("yolov1", 448, 64),
    ("yolov2-tiny-voc", 416, 512),
    ("yolov2", 416, 256),
    ("yolov3", 416, 256),
    ("yolov3", 608, 96),
]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.models import engine
    from yolo_tensorflow_tpu.ops import quant as Q
    from yolo_tensorflow_tpu.pipeline import make_forward

    iters = int(os.environ.get("BENCH_ITERS", "15"))
    rows = []
    for name, size, batch in CONFIGS:
        cfg = C.get_config(name) if name == "yolov1" \
            else C.get_config(name, input_size=size)
        size = cfg.input_size
        specs = C.build_specs(cfg)
        params, _ = engine.init_params(
            specs, (1, size, size, 3), jax.random.PRNGKey(0), folded=True)
        params = jax.tree.map(np.asarray, params)
        fwd = make_forward(cfg, specs, compute_dtype=jnp.bfloat16,
                           score_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        images = jax.device_put(rng.integers(
            0, 255, (batch, size, size, 3), dtype=np.uint8))

        def measure(p):
            @jax.jit
            def chained(p, imgs):
                def body(_, carry):
                    im, acc = carry
                    out = fwd(p, im)
                    im = im + (out.num.sum() % 2).astype(jnp.uint8)
                    return im, acc + out.num.sum()
                _, acc = lax.fori_loop(0, iters, body,
                                       (imgs, jnp.int32(0)))
                return acc
            _ = int(chained(p, images))
            t0 = time.perf_counter()
            _ = int(chained(p, images))
            return batch * iters / (time.perf_counter() - t0)

        bf16 = {k: {"w": jnp.asarray(v["w"], jnp.bfloat16),
                    "b": jnp.asarray(v["b"], jnp.float32)}
                for k, v in params.items()}
        ips_bf16 = measure(jax.device_put(bf16))

        scales = {engine.layer_key(i): 0.05 for i, sp in enumerate(specs)
                  if hasattr(sp, "filters")}
        qp = jax.device_put(Q.quantize_params(specs, params, scales))
        ips_int8 = measure(qp)

        row = {"config": f"{name}-{size}", "batch": batch,
               "bf16_ips": round(ips_bf16, 1),
               "int8_ips": round(ips_int8, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| config | batch | bf16 img/s | int8 img/s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['batch']} | {r['bf16_ips']} "
              f"| {r['int8_ips']} |")


if __name__ == "__main__":
    main()
