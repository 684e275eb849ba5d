"""Training driver — the examples/detector.c:6 (train_detector) equivalent:
threaded data loading overlapped with device steps, multi-scale resizes
every 10 batches, periodic checkpoints, per-step Region-style stat lines.
"""

from __future__ import annotations

import time
import numpy as np

MULTISCALE_SIZES = tuple(range(320, 640, 32))  # 320..608 (detector.c:63-71)


def qat_export_params(cfg, specs, state):
    """Fold + quantize a QAT train state onto the int8 serving grid — the
    ONE recipe shared by the in-loop eval and the final int8-qat.npz
    export, so the scored network and the shipped artifact cannot
    diverge."""
    import jax
    from yolo_tensorflow_tpu.ops import qat as Q
    return Q.export_int8(
        specs, jax.tree.map(np.asarray, state.params),
        jax.tree.map(np.asarray, state.batch_stats),
        jax.tree.map(np.asarray, state.qat_scales), bn_eps=cfg.bn_eps)


def evaluate_model(cfg, specs, state, samples, *, limit=0, conf=0.25,
                   detector_cache=None, batch_size=16):
    """In-training mAP eval — validate_detector (examples/detector.c:364)
    folded into the loop instead of writing files for external scorers,
    driven through the batched prefetching pipeline (eval/batched.py)
    rather than one detect() dispatch per image.
    Pass a one-element list as ``detector_cache`` to reuse the compiled
    Detector across eval rounds (params are a jit argument, so swapping
    them does NOT recompile)."""
    import jax
    import jax.numpy as jnp
    from yolo_tensorflow_tpu.eval.batched import evaluate_samples
    from yolo_tensorflow_tpu.eval.map import evaluate_detections
    from yolo_tensorflow_tpu.io.weights import fold_params
    from yolo_tensorflow_tpu.pipeline import Detector

    if getattr(state, "qat_scales", None):
        # QAT run: score what will actually ship — the int8 export on the
        # serving path (the fake-quant lattice it trained against)
        folded = qat_export_params(cfg, specs, state)
    else:
        folded = fold_params(jax.tree.map(np.asarray, state.params),
                             jax.tree.map(np.asarray, state.batch_stats),
                             cfg.bn_eps)
    if detector_cache is not None and detector_cache:
        det = detector_cache[0]
        det.params = jax.device_put(jax.tree.map(jnp.asarray, folded))
    else:
        # pass the ModelConfig + specs directly so arbitrary-cfg (non-
        # registry) models evaluate through the same path
        det = Detector(cfg, params=folded, specs=specs,
                       conf_threshold=conf, max_detections=50)
        if detector_cache is not None:
            detector_cache.append(det)
    dets, gts, _, _ = evaluate_samples(det, samples, limit=limit,
                                       batch_size=batch_size)
    return evaluate_detections(dets, gts, cfg.num_classes)


def evaluate_classifier(cfg, state, samples, *, limit=0, specs=None,
                        classifier_cache=None, batch_size=32):
    """Top-1 accuracy of the in-training classifier on (path, label)
    samples — the classifier analogue of evaluate_model (the reference's
    validate_classifier_crop stretch-resize flow, examples/classifier.c:
    170), driven through the batched worker-pooled eval (eval/classify.
    validate_classifier mode='crop') instead of one dispatch per image.
    Pass ``specs`` for arbitrary-cfg (non-registry) classifiers and a
    one-element list as ``classifier_cache`` to reuse the compiled
    Classifier across eval rounds (params swap without recompiling); QAT
    runs score the int8 export, the artifact the run ships."""
    import jax
    import jax.numpy as jnp
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.eval.classify import validate_classifier
    from yolo_tensorflow_tpu.io.weights import fold_params
    from yolo_tensorflow_tpu.pipeline import Classifier

    if specs is None:
        specs = C.build_specs(cfg)
    if getattr(state, "qat_scales", None):
        folded = qat_export_params(cfg, specs, state)
    else:
        folded = fold_params(jax.tree.map(np.asarray, state.params),
                             jax.tree.map(np.asarray, state.batch_stats),
                             cfg.bn_eps)
    if classifier_cache is not None and classifier_cache:
        clf = classifier_cache[0]
        clf.params = jax.device_put(jax.tree.map(jnp.asarray, folded))
    else:
        clf = Classifier(cfg, params=folded, specs=specs)
        if classifier_cache is not None:
            classifier_cache.append(clf)

    if limit:
        samples = samples[:limit]
    pairs = [(smp.image_path, int(smp.boxes[0, 4])) for smp in samples]
    res = validate_classifier(clf, pairs, top_k=1, mode="crop",
                              batch_size=batch_size)
    return res["top1"]


def aug_from_cfg(net: dict, h0: dict, head: int) -> dict:
    """DetectionLoader kwargs from a parsed cfg — the load_args plumbing
    (get_base_args src/network.c:45-58 reads [net] saturation/exposure/
    hue; train_detector reads jitter and max boxes from the head layer,
    examples/detector.c:45-52). Defaults mirror the C's
    (parse_net_options:675-679; [yolo]/[detection] max=90, [region]
    max=30, jitter .2). The classifier-only knobs (angle/aspect/
    min_crop/max_crop/center — load_data_augment) have no detection
    equivalent and are not consumed here."""
    return dict(
        jitter=float(h0.get("jitter", 0.2)),
        hue=float(net.get("hue", 0.0)),
        sat=float(net.get("saturation", 1.0)),
        exposure=float(net.get("exposure", 1.0)),
        max_boxes=int(h0.get("max", 30 if head == 2 else 90)),
    )


def run_training(args):
    import dataclasses
    import os
    import jax
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.data.datasets import load_darknet_list
    from yolo_tensorflow_tpu.data.loader import DetectionLoader
    from yolo_tensorflow_tpu.io import checkpoint as ckpt
    from yolo_tensorflow_tpu.io import weights as W
    from yolo_tensorflow_tpu.parallel import mesh as M
    from yolo_tensorflow_tpu.train import loop as T
    from yolo_tensorflow_tpu.train import losses

    # multi-host: initialize the distributed runtime FIRST (before any
    # device use) so jax.devices() below is the global set and the mesh
    # spans hosts (DP psum over ICI within a slice, DCN across hosts)
    if getattr(args, "coordinator", None) or \
            os.environ.get("JAX_COORDINATOR_ADDRESS"):
        M.init_distributed(getattr(args, "coordinator", None),
                           getattr(args, "num_processes", None),
                           getattr(args, "process_id", None))
        print(f"distributed: process {jax.process_index()} of "
              f"{jax.process_count()}, {len(jax.devices())} global devices")

    specs = None          # None -> registry builder
    net_opts = None       # NetTrainOptions from the cfg's [net] section
    loss_kw = {}
    aug_kw = {}           # loader aug hypers from the cfg (aug_from_cfg)
    cfg_multiscale = False
    if getattr(args, "cfg", None):
        # arbitrary-cfg training: the C trains ANY .cfg with every
        # hyperparameter read from [net]/the head section
        # (parse_net_options src/parser.c:643, train_detector
        # examples/detector.c:6) — same here
        from yolo_tensorflow_tpu.io.cfg import parse_cfg_file
        cfg, specs = C.config_from_cfg(
            args.cfg, class_names_file=getattr(args, "names", None),
            name=os.path.splitext(os.path.basename(args.cfg))[0])
        _, net, head_opt_list = parse_cfg_file(args.cfg)
        net_opts = T.NetTrainOptions.from_net(net)
        h0 = head_opt_list[0] if head_opt_list else {}
        if cfg.head != 0:
            aug_kw = aug_from_cfg(net, h0, cfg.head)
        if cfg.head == 3:
            loss_kw["ignore_thresh"] = float(h0.get("ignore_thresh", 0.5))
            loss_kw["truth_thresh"] = float(h0.get("truth_thresh", 1.0))
        elif cfg.head == 2:
            loss_kw["region_hyper"] = losses.RegionHyper.from_options(h0)
        elif cfg.head == 1:
            loss_kw["detection_hyper"] = \
                losses.DetectionHyper.from_options(h0)
        # darknet multi-scale comes from the head section's random=1
        # (detector.c:63 'if(l.random && count++%10 == 0)') — but ONLY for
        # region/yolo heads: a [detection] section's `random` is the v1
        # random-responsibility override (detection_layer.c:143, consumed
        # above via DetectionHyper.from_options), not a resize flag
        if cfg.head in (2, 3):
            cfg_multiscale = bool(int(h0.get("random",
                                             net.get("random", 0))))
        if getattr(args, "input_size", None):
            if cfg.head == 1:
                raise SystemExit("--input-size cannot override a v1 "
                                 "(FC-head) cfg")
            cfg = dataclasses.replace(cfg, input_size=args.input_size)
    else:
        if not getattr(args, "model", None):
            raise SystemExit("train needs --model or --cfg")
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

    # schedule/optimizer: CLI flags override the cfg's [net] options, which
    # override the registry defaults (get_current_rate, src/network.c:90)
    if net_opts is not None:
        import dataclasses as _dc
        eff = _dc.replace(
            net_opts,
            learning_rate=(args.lr if getattr(args, "lr", None) is not None
                           else net_opts.learning_rate),
            burn_in=(args.burn_in
                     if getattr(args, "burn_in", None) is not None
                     else net_opts.burn_in))
        schedule = T.darknet_schedule(eff)
        total_steps = (args.steps if getattr(args, "steps", None) is not None
                       else (eff.max_batches or 500200))
        batch_size = (args.batch_size
                      if getattr(args, "batch_size", None) is not None
                      else max(eff.batch, 1))
        # adam=1 selects darknet's Adam (src/parser.c:657, the GPU update
        # branch); otherwise SGD+momentum+decay
        tx = T.optimizer_from_net(eff, batch=batch_size, schedule=schedule)
        print(f"[net] lr {eff.learning_rate} policy {eff.policy} "
              f"burn_in {eff.burn_in} momentum {eff.momentum} "
              f"decay {eff.decay} max_batches {eff.max_batches} "
              f"batch {batch_size}"
              + (f" adam B1={eff.B1} B2={eff.B2} eps={eff.eps}"
                 if eff.adam else ""))
    else:
        lr = args.lr if getattr(args, "lr", None) is not None else 1e-3
        burn_in = (args.burn_in
                   if getattr(args, "burn_in", None) is not None else 1000)
        schedule = T.darknet_lr_schedule(lr, burn_in=burn_in)
        tx = T.make_optimizer(schedule)
        total_steps = (args.steps
                       if getattr(args, "steps", None) is not None
                       else 500200)
        batch_size = (args.batch_size
                      if getattr(args, "batch_size", None) is not None
                      else 64)
    qat = bool(getattr(args, "qat", False))
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                 specs=specs, qat=qat)

    if args.weights:
        load_specs = specs if specs is not None else C.build_specs(cfg)
        params, stats, _ = W.load_darknet_weights(
            load_specs, cfg.input_size, args.weights, fold=False,
            bn_eps=cfg.bn_eps,
            allow_partial=bool(getattr(args, "partial_weights", False)))
        if not stats and any(
                getattr(sp, "bn", False) for sp in load_specs):
            raise ValueError("training needs unfolded BN weights")
        if getattr(args, "partial_weights", False):
            # backbone fine-tuning (darknet19_448.conv.23 workflow): keep
            # the random init for layers the truncated file doesn't cover
            merged_p = dict(state.params)
            merged_s = dict(state.batch_stats)
            merged_p.update(jax.tree.map(np.asarray, params))
            merged_s.update(jax.tree.map(np.asarray, stats))
            print(f"loaded {len(params)} weighted layers from "
                  f"{args.weights} (partial); "
                  f"{len(merged_p) - len(params)} layers keep init")
            state = state._replace(params=merged_p, batch_stats=merged_s)
        else:
            state = state._replace(
                params=jax.tree.map(np.asarray, params),
                batch_stats=jax.tree.map(np.asarray, stats))

    try:
        restored, start_step = ckpt.restore_train_state(state, args.ckpt_dir)
    except KeyError:
        if state.qat_scales is None:
            raise
        # the float -> QAT fine-tune workflow: the checkpoint predates
        # --qat, so it has no scales — restore everything else and start
        # the scales fresh (they re-warm from the first batch)
        base, start_step = ckpt.restore_train_state(
            state._replace(qat_scales=None), args.ckpt_dir)
        restored = None if base is None else \
            base._replace(qat_scales=state.qat_scales)
        if restored is not None:
            print("float checkpoint -> QAT fine-tune (fresh scales)")
    if restored is not None:
        state = restored
        print(f"resumed from step {start_step}")
        if not qat and ckpt.checkpoint_has_field(args.ckpt_dir,
                                                 "qat_scales"):
            # the inverse of the float->QAT path above would be silent:
            # restoring into a qat_scales=None template just drops the
            # trained scales and the run downgrades to float training
            # with no int8-qat.npz at the end — say so loudly
            print("WARNING: checkpoint has QAT scales but --qat is off — "
                  "continuing as FLOAT training (trained scales dropped, "
                  "no int8-qat.npz export); pass --qat to keep the "
                  "quantization-aware fine-tune", flush=True)

    n_proc = jax.process_count()
    if n_proc > 1:
        # only process 0 saves checkpoints; without a shared filesystem the
        # others would restore nothing and resume at step 0 — every train
        # step is a cross-host collective, so the first mismatched dispatch
        # deadlocks. Broadcast process 0's view so all hosts agree.
        from jax.experimental import multihost_utils
        state, step_arr = multihost_utils.broadcast_one_to_all(
            (state, np.int64(start_step)))
        start_step = int(step_arr)

    # multi-host input: each process loads a disjoint sample shard and
    # feeds its local rows of the global batch (shard_batch assembles the
    # global array with zero cross-host pixel traffic)
    if n_proc > 1:
        if batch_size % n_proc:
            raise SystemExit(f"batch size {batch_size} must divide across "
                             f"{n_proc} processes")
        # truncate every shard to the same length: unequal shards (or the
        # loader's drop-last on top of them) would give processes different
        # per-epoch step counts, and a step one host skips is a collective
        # the others block in forever
        per = len(samples) // n_proc
        if per == 0:
            raise SystemExit(f"{len(samples)} samples cannot feed "
                             f"{n_proc} processes")
        samples = samples[jax.process_index()::n_proc][:per]
        local_batch = batch_size // n_proc
    else:
        local_batch = batch_size

    multiscale = bool(getattr(args, "multiscale", False)) or cfg_multiscale
    if multiscale and cfg.head == 1:
        raise SystemExit("--multiscale is incompatible with v1 (FC-head) "
                         "models: the dense layer fixes the input size "
                         "(darknet's v1-era trainer, examples/yolo.c, has "
                         "no multi-scale either)")
    loader = DetectionLoader(samples, local_batch, cfg.input_size,
                             train=True,
                             cache_images=bool(getattr(args, "cache_images",
                                                       False)),
                             **aug_kw)
    # one compiled step per input size (multi-scale), darknet resizes the
    # net every 10 batches; XLA compile cache plays that role here
    steps = {}

    def step_for(size):
        if size not in steps:
            import jax.numpy as jnp
            cd = jnp.bfloat16 if getattr(args, "bf16", False) else None
            steps[size] = T.make_sharded_train_step(
                cfg, tx, mesh, input_size=size, specs=specs,
                compute_dtype=cd,
                remat_every=getattr(args, "remat_every", None),
                bn_stats=getattr(args, "bn_stats", None)
                or ("onepass" if getattr(args, "bn_onepass", False)
                    else "twopass"),
                **loss_kw)
        return steps[size]

    rng = np.random.default_rng(1)
    size = cfg.input_size
    step_i = start_step
    t_last = time.time()
    with mesh:
        while step_i < total_steps:
            for images, truths in loader.epoch():
                if multiscale and step_i % 10 == 0:
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
                          f"{batch_size/dt:.1f} img/s size {images.shape[1]}",
                          flush=True)
                if step_i % args.save_every == 0 and \
                        jax.process_index() == 0:
                    path = ckpt.save_train_state(state, args.ckpt_dir, step_i)
                    print(f"saved {path}")
                # in-training eval runs on process 0 only: it dispatches no
                # cross-host collectives (the Detector it builds is local),
                # so N-fold duplicate evals would only waste host+device
                # time and print N identical lines
                if val_samples and eval_every and step_i % eval_every == 0 \
                        and jax.process_index() == 0:
                    if cfg.head == 0:
                        acc = evaluate_classifier(
                            cfg, state, val_samples, limit=200,
                            specs=specs, classifier_cache=det_cache)
                        print(f"step {step_i}: val top-1 = {acc:.4f}",
                              flush=True)
                    else:
                        m = evaluate_model(
                            cfg,
                            specs if specs is not None
                            else C.build_specs(cfg),
                            state, val_samples, limit=200,
                            detector_cache=det_cache)
                        print(f"step {step_i}: val mAP@0.5 = {m['map']:.4f} "
                              f"({m['num_classes_evaluated']} classes)",
                              flush=True)
                if step_i >= total_steps:
                    break
    if jax.process_index() == 0:
        ckpt.save_train_state(state, args.ckpt_dir, step_i)
        if qat and state.qat_scales:
            # ship the thing that was trained: fold + quantize on the
            # tracked scales; detect/eval/stream load this npz like any
            # `quantize` output
            qparams = qat_export_params(
                cfg, specs if specs is not None else C.build_specs(cfg),
                state)
            out = os.path.join(args.ckpt_dir, "int8-qat.npz")
            ckpt.save_params_npz(qparams, out)
            n_q = sum(1 for v in qparams.values() if "w_q" in v)
            print(f"QAT export: {out} ({n_q} int8 convs)")
    print("done")
