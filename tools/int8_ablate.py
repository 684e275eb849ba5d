"""Int8 epilogue ablation on the real chip (VERDICT r1 item 3).

Backbone-only yolov3-416 throughput under different quantized-conv epilogue
formulations, to locate where the int8 path loses its 2x MXU advantage.
Chained-jit methodology (bench.py). Not part of the test suite.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.models import engine, specs as S
    from yolo_tensorflow_tpu.ops import layers as L
    from yolo_tensorflow_tpu.ops import quant as Q
    from yolo_tensorflow_tpu.pipeline import normalize_images

    batch = 256
    iters = 8
    cfg = C.get_config("yolov3")
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 416, 416, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = jax.tree.map(np.asarray, params)
    scales = {engine.layer_key(i): 0.05 for i, sp in enumerate(specs)
              if isinstance(sp, S.Conv)}
    qparams = Q.quantize_params(specs, params, scales)
    skip = Q.head_conv_layers(specs)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 255, (batch, 416, 416, 3),
                                       dtype=np.uint8))

    def apply_with(conv_fn, p):
        """Engine walk with a custom quantized-conv implementation."""
        def fwd(pp, images):
            x = normalize_images(images, cfg, jnp.bfloat16)
            outputs = []
            cur = x
            for i, spec in enumerate(specs):
                if isinstance(spec, S.Conv):
                    key = engine.layer_key(i)
                    pi = pp[key]
                    pad = spec.size // 2 if spec.pad < 0 else spec.pad
                    if "w_q" in pi:
                        cur = conv_fn(cur, pi, spec, pad)
                    else:
                        cur = L.conv2d(cur, pi["w"], pi["b"],
                                       stride=spec.stride, pad=pad,
                                       compute_dtype=jnp.bfloat16)
                        if spec.act == "leaky":
                            cur = L.leaky_relu(cur)
                        cur = cur.astype(jnp.bfloat16)
                elif isinstance(spec, S.MaxPool):
                    cur = L.max_pool(cur, spec.size, spec.stride)
                elif isinstance(spec, S.Route):
                    ts = [outputs[S.resolve_ref(r, i)] for r in spec.refs]
                    cur = ts[0] if len(ts) == 1 else jnp.concatenate(ts, -1)
                elif isinstance(spec, S.Shortcut):
                    cur = cur + outputs[S.resolve_ref(spec.ref, i)]
                elif isinstance(spec, S.Upsample):
                    cur = L.upsample_nearest(cur, spec.factor)
                elif isinstance(spec, S.Detect):
                    pass
                outputs.append(cur)
            return [outputs[i - 1] for i, s in enumerate(specs)
                    if isinstance(s, S.Detect)]
        return fwd

    def measure(fwd, p):
        p = jax.device_put(p)

        @jax.jit
        def chained(pp, im):
            def body(_, carry):
                im, acc = carry
                outs = fwd(pp, im)
                s = sum(o.astype(jnp.float32).sum() for o in outs)
                im = im + (s.astype(jnp.int32) % 2).astype(jnp.uint8)
                return im, acc + s
            _, acc = lax.fori_loop(0, iters, body, (im, jnp.float32(0)))
            return acc
        _ = float(chained(p, imgs))
        t0 = time.perf_counter()
        _ = float(chained(p, imgs))
        dt = time.perf_counter() - t0
        return batch * iters / dt

    # -- epilogue variants ---------------------------------------------------
    def conv_v0(x, p, spec, pad):
        """current production path: f32 epilogue"""
        y = Q.conv2d_int8(x, p["w_q"], p["s_x"], p["s_w"], p["b"],
                          stride=spec.stride, pad=pad)
        if spec.act == "leaky":
            y = L.leaky_relu(y)
        return y.astype(jnp.bfloat16)

    def conv_v1(x, p, spec, pad):
        """bf16 epilogue arithmetic"""
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / p["s_x"]),
                      -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            xq, p["w_q"], (spec.stride, spec.stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        sc = (p["s_x"] * p["s_w"]).astype(jnp.bfloat16)
        y = acc.astype(jnp.bfloat16) * sc + p["b"].astype(jnp.bfloat16)
        if spec.act == "leaky":
            y = jnp.maximum(y, jnp.bfloat16(0.1) * y)
        return y

    def conv_v2(x, p, spec, pad):
        """folded epilogue: acc + b/s then leaky then single scale"""
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / p["s_x"]),
                      -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            xq, p["w_q"], (spec.stride, spec.stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        s = p["s_x"] * p["s_w"]
        b_over_s = (p["b"] / s).astype(jnp.float32)
        y = acc.astype(jnp.float32) + b_over_s
        if spec.act == "leaky":
            y = jnp.maximum(y, 0.1 * y)      # leaky commutes with s>0
        return (y * s).astype(jnp.bfloat16)

    def conv_sol(x, p, spec, pad):
        """speed-of-light: conv + direct s8 re-cast, no scales/bias/act"""
        xq = x.astype(jnp.int8) if x.dtype != jnp.int8 else x
        acc = lax.conv_general_dilated(
            xq, p["w_q"], (spec.stride, spec.stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.clip(acc, -127, 127).astype(jnp.int8)

    def conv_sol_bf16(x, p, spec, pad):
        """bf16 conv reference with identical walk"""
        w = p["w_q"].astype(jnp.bfloat16)
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w, (spec.stride, spec.stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y + p["b"]
        if spec.act == "leaky":
            y = jnp.maximum(y, 0.1 * y)
        return y.astype(jnp.bfloat16)

    for name, fn in [("bf16-ref", conv_sol_bf16),
                     ("int8-v0-f32-epilogue", conv_v0),
                     ("int8-v1-bf16-epilogue", conv_v1),
                     ("int8-v2-folded", conv_v2),
                     ("int8-SOL-no-epilogue", conv_sol)]:
        ips = measure(apply_with(fn, qparams), qparams)
        print(f"{name:28s} {ips:8.1f} img/s")


if __name__ == "__main__":
    main()
