"""Training driver — the examples/detector.c:6 (train_detector) equivalent:
threaded data loading overlapped with device steps, multi-scale resizes
every 10 batches, periodic checkpoints, per-step Region-style stat lines.
"""

from __future__ import annotations

import time
import numpy as np

MULTISCALE_SIZES = tuple(range(320, 640, 32))  # 320..608 (detector.c:63-71)


def evaluate_model(cfg, specs, state, samples, *, limit=0, conf=0.25,
                   detector_cache=None):
    """In-training mAP eval — validate_detector (examples/detector.c:364)
    folded into the loop instead of writing files for external scorers.
    Pass a one-element list as ``detector_cache`` to reuse the compiled
    Detector across eval rounds (params are a jit argument, so swapping
    them does NOT recompile)."""
    import jax
    import cv2
    import numpy as np
    import jax.numpy as jnp
    from yolo_tensorflow_tpu.eval.map import evaluate_detections
    from yolo_tensorflow_tpu.io.weights import fold_params
    from yolo_tensorflow_tpu.pipeline import Detector

    folded = fold_params(jax.tree.map(np.asarray, state.params),
                         jax.tree.map(np.asarray, state.batch_stats),
                         cfg.bn_eps)
    if detector_cache is not None and detector_cache:
        det = detector_cache[0]
        det.params = jax.device_put(jax.tree.map(jnp.asarray, folded))
    else:
        det = Detector(cfg.name, params=folded, input_size=cfg.input_size,
                       conf_threshold=conf, max_detections=50)
        if detector_cache is not None:
            detector_cache.append(det)
    if limit:
        samples = samples[:limit]
    dets, gts = [], []
    for s in samples:
        img = cv2.cvtColor(cv2.imread(s.image_path), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        res = det.detect(img)
        dets.append({
            "boxes": np.asarray([r["box"] for r in res],
                                np.float32).reshape(-1, 4),
            "scores": np.asarray([r["score"] for r in res], np.float32),
            "classes": np.asarray([r["class_id"] for r in res], np.int32)})
        gb = s.boxes
        gts.append({
            "boxes": np.stack([(gb[:, 0] - gb[:, 2] / 2) * w,
                               (gb[:, 1] - gb[:, 3] / 2) * h,
                               (gb[:, 0] + gb[:, 2] / 2) * w,
                               (gb[:, 1] + gb[:, 3] / 2) * h], 1)
            if len(gb) else np.zeros((0, 4), np.float32),
            "classes": gb[:, 4].astype(np.int32) if len(gb)
            else np.zeros((0,), np.int32)})
    return evaluate_detections(dets, gts, cfg.num_classes)


def evaluate_classifier(cfg, state, samples, *, limit=0):
    """Top-1 accuracy of the in-training classifier on (path, label)
    samples — the classifier analogue of evaluate_model (the reference's
    validate_classifier_single, examples/classifier.c)."""
    import cv2
    import jax
    import jax.numpy as jnp
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.io.weights import fold_params
    from yolo_tensorflow_tpu.models import engine
    from yolo_tensorflow_tpu.pipeline import normalize_images

    specs = C.build_specs(cfg)
    folded = fold_params(jax.tree.map(np.asarray, state.params),
                         jax.tree.map(np.asarray, state.batch_stats),
                         cfg.bn_eps)

    @jax.jit
    def probs_fn(p, images):
        x = normalize_images(images, cfg, jnp.float32)
        dets, _ = engine.apply(specs, p, x, bn_eps=cfg.bn_eps)
        (probs, _), = dets
        return probs

    if limit:
        samples = samples[:limit]
    correct = 0
    s = cfg.input_size
    for smp in samples:
        img = cv2.cvtColor(cv2.imread(smp.image_path), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
        probs = np.asarray(probs_fn(folded, img[None]))[0]
        correct += int(np.argmax(probs)) == int(smp.boxes[0, 4])
    return correct / max(len(samples), 1)


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
    if getattr(args, "names", None):
        with open(args.names) as f:
            overrides["custom_classes"] = tuple(
                l.strip() for l in f if l.strip())
    cfg = C.get_config(args.model, **overrides)
    if cfg.head == 0:
        # classifier training (examples/classifier.c train_classifier):
        # labels from class-name substring match on the path (fill_truth)
        from yolo_tensorflow_tpu.data.datasets import load_classifier_list
        samples = load_classifier_list(args.list, cfg.classes)
        val_samples = (load_classifier_list(args.val_list, cfg.classes)
                       if getattr(args, "val_list", None) else None)
    else:
        samples = load_darknet_list(args.list)
        val_samples = (load_darknet_list(args.val_list)
                       if getattr(args, "val_list", None) else None)
    print(f"{len(samples)} training samples")
    eval_every = getattr(args, "eval_every", 0) or 0
    det_cache = []

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

    if args.multiscale and cfg.head == 1:
        raise SystemExit("--multiscale is incompatible with v1 (FC-head) "
                         "models: the dense layer fixes the input size "
                         "(darknet's v1-era trainer, examples/yolo.c, has "
                         "no multi-scale either)")
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
                if cfg.head == 0:
                    truths = truths[:, 0, 4].astype(np.int32)
                im, tr = M.shard_batch(mesh, images, truths)
                state, metrics = step_for(images.shape[1])(state, im, tr)
                step_i += 1
                if step_i % args.log_every == 0:
                    dt = (time.time() - t_last) / args.log_every
                    t_last = time.time()
                    if cfg.head == 0:
                        extra = f"acc {float(metrics.get('accuracy', 0)):.3f}"
                    else:
                        extra = (f"avg_iou {float(metrics.get('avg_iou', 0)):.3f} "
                                 f"obj {float(metrics.get('avg_obj', 0)):.3f}")
                    print(f"step {step_i}: cost {float(metrics['cost']):.3f} "
                          f"{extra} "
                          f"{args.batch_size/dt:.1f} img/s size {images.shape[1]}",
                          flush=True)
                if step_i % args.save_every == 0:
                    path = ckpt.save_train_state(state, args.ckpt_dir, step_i)
                    print(f"saved {path}")
                if val_samples and eval_every and step_i % eval_every == 0:
                    if cfg.head == 0:
                        acc = evaluate_classifier(cfg, state, val_samples,
                                                  limit=200)
                        print(f"step {step_i}: val top-1 = {acc:.4f}",
                              flush=True)
                    else:
                        m = evaluate_model(cfg, C.build_specs(cfg), state,
                                           val_samples, limit=200,
                                           detector_cache=det_cache)
                        print(f"step {step_i}: val mAP@0.5 = {m['map']:.4f} "
                              f"({m['num_classes_evaluated']} classes)",
                              flush=True)
                if step_i >= args.steps:
                    break
    ckpt.save_train_state(state, args.ckpt_dir, step_i)
    print("done")
