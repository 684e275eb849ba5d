"""The labeled training-throughput sweep of record (PERF_TRAIN.md §3).

One process, one chip, one methodology — every cell is
tools/bench_train.measure_train (full darknet-exact step: train-mode
forward, loss, backward, SGD/momentum+decay update, rolling BN stats,
multi-step scan, donated state, host VALUE readback). Three axes:

  1. batch sweep at the default config (twopass BN, scan truth assign,
     steps-per-dispatch = 4 — exactly what bench.py records), to pin the
     knee with ONE consistent number per batch;
  2. steps-per-dispatch at the knee (4 vs 12): through the remote-TPU
     tunnel each dispatch pays a fixed RTT + host round-trip that is
     amortized over steps*batch images — the round-3 docs' 443 vs 357
     img/s "contradiction" at batch 128 was exactly this (12 chained
     fori-loop iters in the ablation vs 4 scanned steps in the bench),
     plus run-to-run tunnel variance. The sweep records both so the
     dispatch-overhead share is a measured number, not an anecdote.
  3. the BN-stat and truth-assign levers at the knee, full-step
     (twopass / onepass / onepass_bf16 / ghost32 x scan / vectorized).

Run on the real chip:  python tools/sweep_train.py
Env: SWEEP_BATCHES="32,64,96,128,160,192", SWEEP_STEPS=4.
Prints one table + one JSON line; findings go to PERF_TRAIN.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_train import measure_train  # noqa: E402


def main():
    batches = [int(b) for b in os.environ.get(
        "SWEEP_BATCHES", "32,64,96,128,160,192").split(",")]
    steps = int(os.environ.get("SWEEP_STEPS", "4"))
    rows = []

    def run(tag, **kw):
        r = measure_train(model="yolov3", size=416, compute_dtype="bfloat16",
                          **kw)
        rows.append((tag, r))
        print(f"{tag:<46} {r['step_ms']:>9.2f} ms/step "
              f"{r['train_images_per_sec']:>7.1f} img/s "
              f"(compile {r['compile_s']}s)", flush=True)
        return r

    print("== 1. batch sweep (twopass, scan, steps/dispatch = "
          f"{steps}) ==", flush=True)
    best = None
    for b in batches:
        r = run(f"batch {b}", batch=b, steps=steps)
        if best is None or r["train_images_per_sec"] > best[1]:
            best = (b, r["train_images_per_sec"])
    knee = best[0]

    print(f"\n== 2. dispatch amortization at batch {knee} ==", flush=True)
    run(f"batch {knee}, steps/dispatch 4", batch=knee, steps=4)
    run(f"batch {knee}, steps/dispatch 12", batch=knee, steps=12)

    print(f"\n== 3. levers at batch {knee} (steps/dispatch {steps}) ==",
          flush=True)
    for bs in ("twopass", "onepass", "onepass_bf16", "ghost32"):
        run(f"bn_stats={bs}", batch=knee, steps=steps, bn_stats=bs)
    for ta in ("scan", "vectorized"):
        run(f"truth_assign={ta}", batch=knee, steps=steps, truth_assign=ta)
    run("best levers combined (onepass + vectorized)", batch=knee,
        steps=steps, bn_stats="onepass", truth_assign="vectorized")

    import jax
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "knee_batch": knee,
        "results": {tag: r for tag, r in rows}}))


if __name__ == "__main__":
    main()
