"""Training-step perf anatomy on the real chip: where do the cycles go?

Times the yolov3-416 mixed-precision training step stage by stage —
train-mode forward+loss (unfolded BN + batch-stat reductions), forward +
backward (jax.grad), and the full step (grad + SGD update + rolling BN
stats) — and contrasts with the folded serving forward at the same batch.
Deltas between stages attribute wall-clock to the backward sweep, to the
optimizer/stats epilogue, and to the train-mode BN overhead. MXU
utilization is derived from the darknet FLOPs accounting (utils/summary.py,
same formula the C prints at cfg parse) with the standard fwd:bwd = 1:2
convolution cost model.

Methodology matches bench.py: each stage runs ITERS iterations chained by a
data dependency inside ONE jit (XLA cannot overlap or elide them) with a
single scalar readback — plain block_until_ready does NOT block through the
axon remote tunnel, and per-call readbacks would charge the ~0.3-2 s tunnel
RTT to every iteration.

Run on the real chip:  python tools/ablate_train.py [batch] [size] [model]
(ABLATE_ITERS env overrides the chain length — lower it for CPU smokes).
Findings are recorded in PERF_TRAIN.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_BF16_PEAK_TFLOPS = 197.0
ITERS = int(os.environ.get("ABLATE_ITERS", "12"))


def main(batch=128, size=416, model="yolov3"):
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the session sitecustomize re-pins JAX_PLATFORMS=axon; only the
        # config override reaches the backend selector (tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.models import engine
    from yolo_tensorflow_tpu.pipeline import make_forward, normalize_images
    from yolo_tensorflow_tpu.train import loop as L
    from yolo_tensorflow_tpu.train.loop import loss_for_config
    from yolo_tensorflow_tpu.utils.summary import summarize

    cfg = C.get_config(model, input_size=size)
    specs = C.build_specs(cfg)
    fwd_gflops = float(summarize(cfg).rsplit("total", 1)[1].split()[0])

    tx = L.make_optimizer(L.darknet_lr_schedule(1e-3, burn_in=100),
                          weight_decay=5e-4)
    state = L.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                 input_size=size)
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(
        0, 255, (batch, size, size, 3), dtype=np.uint8))
    truths = jax.device_put(
        rng.uniform(0.2, 0.8, (batch, 8, 5)).astype(np.float32))
    cd = jnp.bfloat16
    drng = jax.random.PRNGKey(1)

    def loss_fn(params, batch_stats, imgs, tr, truth_assign="scan"):
        x = normalize_images(imgs, cfg)
        dets, aux = engine.apply(specs, params, x, train=True,
                                 bn_eps=cfg.bn_eps, compute_dtype=cd,
                                 dropout_rng=drng)
        raw = [f.astype(jnp.float32) for f, _ in dets]
        loss, _ = loss_for_config(cfg, specs, raw, tr,
                                  ignore_thresh=0.5, input_size=size,
                                  seen=100000, truth_assign=truth_assign)
        return loss

    def dep(scalar):  # fold any scalar into the next input, breaks overlap
        return (scalar.astype(jnp.int32) % 2).astype(jnp.uint8)

    def chained(inner):
        @jax.jit
        def run(imgs):
            def body(_, carry):
                im, acc = carry
                s = inner(im)
                return im + dep(s), acc + s.astype(jnp.float32)
            _, acc = lax.fori_loop(0, ITERS, body,
                                   (imgs, jnp.float32(0)))
            return acc
        return run

    def timeit(fn, *args):
        _ = float(fn(*args))                     # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(fn(*args))                 # ONE readback per run
            best = min(best, time.perf_counter() - t0)
        return best / ITERS

    # folded serving forward (incl. decode+NMS) at the same batch
    sparams, _ = engine.init_params(specs, (1, size, size, 3),
                                    jax.random.PRNGKey(0), folded=True)
    sparams = jax.device_put(
        {k: {"w": jnp.asarray(v["w"], jnp.bfloat16),
             "b": jnp.asarray(v["b"], jnp.float32)}
         for k, v in sparams.items()})
    serve_fwd = make_forward(cfg, specs, compute_dtype=jnp.bfloat16,
                             score_dtype=jnp.bfloat16)

    def fwd_only(params, batch_stats, imgs, bn_stats="twopass"):
        x = normalize_images(imgs, cfg)
        dets, _ = engine.apply(specs, params, x, train=True,
                               bn_eps=cfg.bn_eps, compute_dtype=cd,
                               dropout_rng=drng, bn_stats=bn_stats)
        return sum(f.astype(jnp.float32).sum() for f, _ in dets)

    rows = []
    t = timeit(chained(lambda im: serve_fwd(sparams, im).num.sum()), images)
    rows.append(("serving fwd (folded BN, incl. decode+NMS)", t, 1.0))

    t = timeit(chained(
        lambda im: fwd_only(state.params, state.batch_stats, im)), images)
    rows.append(("train fwd only (unfolded BN, batch stats)", t, 1.0))

    t = timeit(chained(
        lambda im: fwd_only(state.params, state.batch_stats, im,
                            bn_stats="onepass")), images)
    rows.append(("train fwd only, onepass BN stats (--bn-onepass)", t, 1.0))

    t = timeit(chained(
        lambda im: fwd_only(state.params, state.batch_stats, im,
                            bn_stats="onepass_bf16")), images)
    rows.append(("train fwd only, onepass_bf16 BN stats", t, 1.0))

    ghost = f"ghost{max(batch // 4, 1)}"
    t = timeit(chained(
        lambda im: fwd_only(state.params, state.batch_stats, im,
                            bn_stats=ghost)), images)
    rows.append((f"train fwd only, {ghost} BN stats (B/4 subsample)",
                 t, 1.0))

    t = timeit(chained(
        lambda im: loss_fn(state.params, state.batch_stats, im, truths)),
        images)
    rows.append(("train fwd + loss (unfolded BN, batch stats)", t, 1.0))

    if cfg.head == 3:
        t = timeit(chained(
            lambda im: loss_fn(state.params, state.batch_stats, im, truths,
                               truth_assign="vectorized")), images)
        rows.append(("train fwd + loss, vectorized truth assign", t, 1.0))

    # sum EVERY gradient leaf: summing just one leaf lets XLA dead-code
    # the other layers' weight-gradient convs and under-reports the
    # backward sweep by the whole wgrad cost (measured: tens of ms)
    def grad_scalar(im):
        g = jax.grad(loss_fn)(state.params, state.batch_stats, im, truths)
        return sum(l.sum() for l in jax.tree_util.tree_leaves(g))
    t = timeit(chained(grad_scalar), images)
    rows.append(("fwd + backward (jax.grad, all grads live)", t, 3.0))

    # full step: lax.scan threads the state — the dependency is structural
    multi = jax.jit(L.make_multi_step(cfg, tx, ITERS, compute_dtype=cd))
    st_imgs = jax.device_put(np.broadcast_to(
        np.asarray(images), (ITERS,) + images.shape).copy())
    st_tr = jax.device_put(np.broadcast_to(
        np.asarray(truths), (ITERS,) + truths.shape).copy())

    def full_run(s):
        _, m = multi(s, st_imgs, st_tr)
        return float(np.asarray(m["cost"])[-1])
    _ = full_run(state)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _ = full_run(state)
        best = min(best, time.perf_counter() - t0)
    rows.append(("full step (+SGD update, BN rolling stats)",
                 best / ITERS, 3.0))

    print(f"\n{model}-{size} batch {batch}, bf16 compute, "
          f"{fwd_gflops:.1f} BFLOPs/img fwd, {ITERS} chained iters, "
          f"device {jax.devices()[0]}")
    print(f"{'stage':<46} {'ms':>8} {'img/s':>7} {'MXU%':>6}")
    for name, sec, fmul in rows:
        ips = batch / sec
        tflops = ips * fwd_gflops * fmul / 1e3
        print(f"{name:<46} {sec*1e3:8.1f} {ips:7.0f} "
              f"{100*tflops/V5E_BF16_PEAK_TFLOPS:6.1f}")
    by = {name: sec for name, sec, _ in rows}
    fo_t = by["train fwd only (unfolded BN, batch stats)"]
    one_t = by["train fwd only, onepass BN stats (--bn-onepass)"]
    fwd_t = by["train fwd + loss (unfolded BN, batch stats)"]
    grad_t = by["fwd + backward (jax.grad, all grads live)"]
    full_t = by["full step (+SGD update, BN rolling stats)"]
    print(f"onepass BN stats save {(fo_t-one_t)*1e3:.1f} ms on the "
          f"train forward")
    va = by.get("train fwd + loss, vectorized truth assign")
    if va is not None:
        print(f"vectorized truth assign saves {(fwd_t-va)*1e3:.1f} ms "
              f"on fwd+loss vs the sequential scan")
    print(f"\nloss adds {(fwd_t-fo_t)*1e3:.1f} ms on the train forward; "
          f"backward adds {(grad_t-fwd_t)/fwd_t:.2f}x the train forward "
          f"(cost model predicts 2x); optimizer+stats epilogue adds "
          f"{(full_t-grad_t)*1e3:.1f} ms/step "
          f"({100*(full_t-grad_t)/full_t:.1f}% of the step)")
    print(f"train-mode fwd is {fwd_t/rows[0][1]:.2f}x the folded serving "
          f"fwd (unfolded BN + stat reductions + f32 head cast + loss)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         int(sys.argv[2]) if len(sys.argv) > 2 else 416,
         sys.argv[3] if len(sys.argv) > 3 else "yolov3")
