"""Training driver — the examples/detector.c:6 (train_detector) equivalent:
threaded data loading overlapped with device steps, multi-scale resizes
every 10 batches, periodic checkpoints, per-step Region-style stat lines.
"""

from __future__ import annotations

import time
import numpy as np

MULTISCALE_SIZES = tuple(range(320, 640, 32))  # 320..608 (detector.c:63-71)


def run_training(args):
    import jax
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.data.datasets import load_darknet_list
    from yolo_tensorflow_tpu.data.loader import DetectionLoader
    from yolo_tensorflow_tpu.io import checkpoint as ckpt
    from yolo_tensorflow_tpu.io import weights as W
    from yolo_tensorflow_tpu.parallel import mesh as M
    from yolo_tensorflow_tpu.train import loop as T

    overrides = {}
    if getattr(args, "input_size", None):
        overrides["input_size"] = args.input_size
    cfg = C.get_config(args.model, **overrides)
    samples = load_darknet_list(args.list)
    print(f"{len(samples)} training samples")

    n_dev = len(jax.devices())
    num_data = args.num_data or (n_dev // args.num_spatial)
    mesh = M.make_mesh(num_data, args.num_spatial)
    print(f"mesh: data={num_data} spatial={args.num_spatial}")

    schedule = T.darknet_lr_schedule(args.lr, burn_in=args.burn_in)
    tx = T.make_optimizer(schedule)
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(0))

    if args.weights:
        specs = C.build_specs(cfg)
        params, stats, _ = W.load_darknet_weights(
            specs, cfg.input_size, args.weights, fold=False,
            bn_eps=cfg.bn_eps)
        if not stats:
            raise ValueError("training needs unfolded BN weights")
        state = state._replace(params=jax.tree.map(np.asarray, params),
                               batch_stats=jax.tree.map(np.asarray, stats))

    restored, start_step = ckpt.restore_train_state(state, args.ckpt_dir)
    if restored is not None:
        state = restored
        print(f"resumed from step {start_step}")

    loader = DetectionLoader(samples, args.batch_size, cfg.input_size,
                             train=True)
    # one compiled step per input size (multi-scale), darknet resizes the
    # net every 10 batches; XLA compile cache plays that role here
    steps = {}

    def step_for(size):
        if size not in steps:
            steps[size] = T.make_sharded_train_step(cfg, tx, mesh,
                                                    input_size=size)
        return steps[size]

    rng = np.random.default_rng(1)
    size = cfg.input_size
    step_i = start_step
    t_last = time.time()
    with mesh:
        while step_i < args.steps:
            for images, truths in loader.epoch():
                if args.multiscale and step_i % 10 == 0:
                    size = int(rng.choice(MULTISCALE_SIZES))
                    loader.set_size(size)
                im, tr = M.shard_batch(mesh, images, truths)
                state, metrics = step_for(images.shape[1])(state, im, tr)
                step_i += 1
                if step_i % args.log_every == 0:
                    dt = (time.time() - t_last) / args.log_every
                    t_last = time.time()
                    print(f"step {step_i}: cost {float(metrics['cost']):.3f} "
                          f"avg_iou {float(metrics.get('avg_iou', 0)):.3f} "
                          f"obj {float(metrics.get('avg_obj', 0)):.3f} "
                          f"{args.batch_size/dt:.1f} img/s size {images.shape[1]}",
                          flush=True)
                if step_i % args.save_every == 0:
                    path = ckpt.save_train_state(state, args.ckpt_dir, step_i)
                    print(f"saved {path}")
                if step_i >= args.steps:
                    break
    ckpt.save_train_state(state, args.ckpt_dir, step_i)
    print("done")
