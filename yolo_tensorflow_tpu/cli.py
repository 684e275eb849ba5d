"""Unified CLI — replaces the reference's per-model driver scripts and the
darknet binary's strcmp dispatch (examples/darknet.c:23-75):

  python -m yolo_tensorflow_tpu detect  --model yolov3 --weights w.weights img...
  python -m yolo_tensorflow_tpu convert --model yolov3 --weights w.weights --out ckpt.npz
  python -m yolo_tensorflow_tpu export  --model yolov3 --weights w.weights --out model.ytt
  python -m yolo_tensorflow_tpu train   --model yolov3-tiny --list train.txt ...
  python -m yolo_tensorflow_tpu eval    --model yolov3 --weights w.weights --voc-root ...
  python -m yolo_tensorflow_tpu bench   [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from yolo_tensorflow_tpu.config import MODEL_NAMES


def _add_model_args(p, weights_required=True):
    p.add_argument("--model", choices=MODEL_NAMES,
                   help="registry model (or use --cfg for any darknet cfg)")
    p.add_argument("--cfg", help="arbitrary darknet .cfg file")
    p.add_argument("--names", help="class-names file (one per line, for --cfg)")
    p.add_argument("--data",
                   help="darknet .data key-value file (read_data_cfg, "
                        "src/option_list.c:7): names/labels, train/valid "
                        "lists, backup dir, classifier top, eval= writer "
                        "type — explicit flags override its keys")
    p.add_argument("--weights", required=weights_required,
                   help="darknet .weights file (or .npz checkpoint)")
    p.add_argument("--conf-threshold", type=float, default=None)
    p.add_argument("--iou-threshold", type=float, default=None)
    p.add_argument("--max-detections", type=int, default=None)
    p.add_argument("--input-size", type=int, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (serving mode)")
    p.add_argument("--letterbox", action="store_true",
                   help="aspect-preserving letterbox preprocessing "
                        "(darknet's test path) instead of stretch resize")
    p.add_argument("--fused-letterbox", action="store_true",
                   help="with --letterbox: run the resize/pad/box-unmap "
                        "inside the jit (ops/preprocess.py)")


def _build_detector(args):
    import jax.numpy as jnp
    from yolo_tensorflow_tpu.pipeline import Detector
    over = {}
    nms = {k: getattr(args, k) for k in
           ("conf_threshold", "iou_threshold", "max_detections")
           if getattr(args, k) is not None}
    if getattr(args, "flip", False):
        # flip-TTA: v2 decode-level (region_layer.c:368) or v3 eval-level
        # (validate_detector_flip, examples/detector.c:234)
        nms["tta"] = True
        nms["tta_mode"] = getattr(args, "tta_mode", None) or "darknet"
    params = None
    weights = args.weights
    if weights and weights.endswith(".npz"):
        params = _load_npz_params(weights)
        weights = None
    if getattr(args, "cfg", None):
        import dataclasses
        from yolo_tensorflow_tpu.config import config_from_cfg
        cfg, specs = config_from_cfg(args.cfg,
                                     class_names_file=getattr(args, "names", None))
        if args.input_size:
            if cfg.head == 1:
                raise SystemExit("--input-size cannot override a v1 (FC-head)"
                                 " cfg: the dense layer fixes the input size")
            cfg = dataclasses.replace(cfg, input_size=args.input_size)
        return Detector(cfg, weights, params=params, specs=specs,
                        compute_dtype=jnp.bfloat16 if args.bf16 else None,
                        letterbox=getattr(args, "letterbox", False),
                        fused=getattr(args, "fused_letterbox", False),
                        **nms)
    if not args.model:
        raise SystemExit("need --model or --cfg")
    if args.input_size:
        over["input_size"] = args.input_size
    if getattr(args, "names", None):
        # a names/labels file (flag or .data key) renames the registry
        # model's classes, like the C's per-command name_list reads
        # (examples/detector.c:565 option_find_str "names")
        with open(args.names) as f:
            over["custom_classes"] = tuple(
                line.strip() for line in f if line.strip())
    return Detector(args.model, weights, params=params,
                    compute_dtype=jnp.bfloat16 if args.bf16 else None,
                    letterbox=getattr(args, "letterbox", False),
                    fused=getattr(args, "fused_letterbox", False),
                    **over, **nms)


def _load_npz_params(path):
    with np.load(path) as z:
        params = {}
        for k in z.files:
            layer, field = k.rsplit("/", 1)
            params.setdefault(layer, {})[field] = z[k]
    return params


def _save_npz_params(params, path):
    from yolo_tensorflow_tpu.io.checkpoint import save_params_npz
    save_params_npz(params, path)


def cmd_detect(args):
    import cv2
    if args.artifact:
        # model-knowledge-free path (the object_detect.py consumer app,
        # YOLO_V1/.../object_detect.py:256)
        from yolo_tensorflow_tpu.export import ArtifactDetector
        det = ArtifactDetector(args.artifact)
    elif args.weights or args.cfg or args.model:
        det = _build_detector(args)
    else:
        raise SystemExit("need --artifact, or --model/--cfg with --weights")
    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.images:
        t0 = time.time()
        results = det.detect_from_file(path)
        dt = time.time() - t0
        print(f"{path}: {len(results)} objects in {dt*1e3:.1f} ms")
        img = cv2.imread(path)
        for r in results:
            x0, y0, x1, y1 = (int(v) for v in r["box"])
            print(f"  {r['class']:<14s} {r['score']:.3f} "
                  f"[{x0}, {y0}, {x1}, {y1}]")
            cv2.rectangle(img, (x0, y0), (x1, y1), (0, 255, 0), 2)
            cv2.putText(img, f"{r['class']} {r['score']:.2f}",
                        (x0, max(y0 - 6, 12)), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, (0, 255, 0), 1)
        out = os.path.join(args.out_dir,
                           "detected_" + os.path.basename(path))
        cv2.imwrite(out, img)
        if args.boxes_txt:
            from yolo_tensorflow_tpu.utils.drawing import write_boxes_txt
            write_boxes_txt(args.boxes_txt, results)


def cmd_convert(args):
    det = _build_detector(args)
    import jax
    _save_npz_params(jax.tree.map(np.asarray, det.params), args.out)
    print(f"wrote {args.out} "
          f"({sum(np.asarray(v).size for d in det.params.values() for v in d.values())} params)")


def cmd_export(args):
    from yolo_tensorflow_tpu.export import export_detector
    det = _build_detector(args)
    export_detector(det, args.out, batch_size=args.batch,
                    canvas_size=getattr(args, "canvas_size", 0))
    print(f"wrote {args.out}")


def _eval_classifier(args):
    """Classifier valid: top-1/top-k accuracy over a path list
    (validate_classifier_single, examples/classifier.c:303)."""
    import sys
    import jax.numpy as jnp
    from yolo_tensorflow_tpu.pipeline import Classifier
    from yolo_tensorflow_tpu.eval.classify import (read_validation_list,
                                                   validate_classifier)
    cd = jnp.bfloat16 if args.bf16 else None
    params, weights = None, args.weights
    if weights and weights.endswith(".npz"):
        params = _load_npz_params(weights)
        weights = None
    if getattr(args, "cfg", None):
        from yolo_tensorflow_tpu.config import config_from_cfg
        cfg, specs = config_from_cfg(
            args.cfg, class_names_file=getattr(args, "names", None))
        clf = Classifier(cfg, weights, params=params, specs=specs,
                         compute_dtype=cd)
    else:
        over = {}
        if getattr(args, "names", None):
            with open(args.names) as f:
                over["custom_classes"] = tuple(
                    l.strip() for l in f if l.strip())
        clf = Classifier(args.model, weights, params=params,
                         compute_dtype=cd, **over)
    if not args.list:
        raise SystemExit("classifier eval needs --list (image paths "
                         "containing their class name)")
    samples = read_validation_list(args.list, clf.cfg.classes)
    if args.limit:
        samples = samples[:args.limit]
    t0 = time.time()
    res = validate_classifier(
        clf, samples, top_k=args.top, batch_size=args.batch_size,
        num_workers=args.num_workers,
        mode=getattr(args, "classifier_mode", "single"),
        shape_buckets=(None if getattr(args, "shape_buckets",
                                       "snap32") == "exact" else "snap32"),
        progress=lambda d, n: print(f"\r{d}/{n}", end="", flush=True,
                                    file=sys.stderr))
    dt = time.time() - t0
    print(f"\r{res['images']} images in {dt:.1f}s", file=sys.stderr)
    # the C's running line, final form (classifier.c:358)
    print(f"top 1: {res['top1']:f}, top {args.top}: "
          f"{res['top%d' % args.top]:f}")
    print(json.dumps(res, default=float))


def _is_classifier_target(args):
    if getattr(args, "cfg", None):
        from yolo_tensorflow_tpu.io.cfg import parse_cfg_file
        _, _, head_opts = parse_cfg_file(args.cfg)
        # no [yolo]/[region]/[detection] section -> headless/classifier
        return not head_opts
    if getattr(args, "model", None):
        from yolo_tensorflow_tpu.config import get_config
        try:
            return get_config(args.model).head == 0
        except KeyError:
            return False
    return False


def cmd_eval(args):
    from yolo_tensorflow_tpu.data.datasets import load_voc, load_coco, load_darknet_list
    from yolo_tensorflow_tpu.eval.batched import evaluate_samples
    from yolo_tensorflow_tpu.eval.map import evaluate_detections, coco_map
    if _is_classifier_target(args):
        return _eval_classifier(args)
    det = _build_detector(args)
    if args.voc_root:
        samples = load_voc(args.voc_root, args.image_set, args.voc_year)
    elif args.coco_json:
        samples = load_coco(args.coco_json, args.image_root)
    else:
        samples = load_darknet_list(args.list)
    if args.limit:
        samples = samples[:args.limit]
    import sys
    t0 = time.time()
    dets, gts, results, sizes = evaluate_samples(
        det, samples, batch_size=args.batch_size,
        num_workers=args.num_workers,
        progress=lambda d, n: print(f"\r{d}/{n}", end="", flush=True,
                                    file=sys.stderr))
    dt = time.time() - t0
    print(f"\r{len(samples)} images in {dt:.1f}s "
          f"({len(samples)/max(dt, 1e-9):.1f} img/s, "
          f"batch {args.batch_size})", file=sys.stderr)
    per_image = []
    if args.write_results:
        from yolo_tensorflow_tpu.eval.map import coco_image_id
        for k, (s, (h, w), res) in enumerate(zip(samples, sizes, results)):
            stem = os.path.splitext(os.path.basename(s.image_path))[0]
            if args.coco_results:
                image_id = coco_image_id(s.image_path)
            elif getattr(args, "imagenet_results", False):
                # print_imagenet_detections takes the 1-based running
                # list index as the id (detector.c:469)
                image_id = k + 1
            else:
                image_id = stem
            per_image.append((image_id, w, h, res))
    n_cls = det.cfg.num_classes
    if args.recall:
        from yolo_tensorflow_tpu.eval.map import recall_stats
        print(json.dumps(recall_stats(dets, gts), indent=2, default=float))
        return
    if args.write_results:
        from yolo_tensorflow_tpu.eval.map import (write_coco_results,
                                                  write_imagenet_results,
                                                  write_voc_results)
        if args.coco_results:
            path = os.path.join(args.write_results, "coco_results.json")
            os.makedirs(args.write_results, exist_ok=True)
            write_coco_results(path, per_image)
        elif getattr(args, "imagenet_results", False):
            # the C's default name in imagenet mode (detector.c:401)
            path = os.path.join(args.write_results, "imagenet-detection.txt")
            os.makedirs(args.write_results, exist_ok=True)
            write_imagenet_results(path, per_image)
        else:
            write_voc_results(args.write_results, det.cfg.classes, per_image)
    if args.coco_metric:
        out = coco_map(dets, gts, n_cls)
    else:
        out = evaluate_detections(dets, gts, n_cls,
                                  eleven_point=args.eleven_point)
    print(json.dumps(out, indent=2, default=float))


def cmd_serve(args):
    """Artifact serving loop — the standalone frozen-artifact app the
    reference ships as object_detect.py (P3/P12/P22): consume a serialized
    model by its named outputs only, no model code. Paths come from stdin
    (one per line) or a watched directory; one JSON line out per image."""
    import sys
    from yolo_tensorflow_tpu.export import ArtifactDetector
    det = ArtifactDetector(args.artifact)
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    def handle(path):
        try:
            t0 = time.time()
            results = det.detect_from_file(path)
            dt = (time.time() - t0) * 1e3
        except (FileNotFoundError, OSError) as e:
            print(json.dumps({"image": path, "error": str(e)}), flush=True)
            return
        print(json.dumps({"image": path, "ms": round(dt, 1),
                          "detections": results}), flush=True)
        if args.out_dir:
            import cv2
            from yolo_tensorflow_tpu.utils.drawing import draw_detections
            img = cv2.imread(path)
            draw_detections(img, results)
            cv2.imwrite(os.path.join(args.out_dir,
                                     "detected_" + os.path.basename(path)),
                        img)

    if args.watch:
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        # keyed on (path -> mtime): a re-written image is re-processed, and
        # entries whose files vanished are dropped each poll so the map
        # stays bounded by the directory contents (long-running server
        # semantics, unlike a grow-only seen set)
        seen = {}
        while True:
            names = sorted(os.listdir(args.watch))
            live = set()
            for name in names:
                if not name.lower().endswith(exts):
                    continue
                p = os.path.join(args.watch, name)
                try:
                    mtime = os.stat(p).st_mtime_ns
                except OSError:
                    continue   # raced with a delete
                live.add(p)
                if seen.get(p) == mtime:
                    continue
                seen[p] = mtime
                handle(p)
            for p in list(seen):
                if p not in live:
                    del seen[p]
            if args.once:
                break
            time.sleep(args.poll_interval)
    else:
        for line in sys.stdin:
            path = line.strip()
            if path:
                handle(path)


def cmd_train(args):
    from yolo_tensorflow_tpu.train.runner import run_training
    run_training(args)


def cmd_summary(args):
    from yolo_tensorflow_tpu.config import get_config
    from yolo_tensorflow_tpu.utils.summary import summarize
    if args.cfg:
        from yolo_tensorflow_tpu.io.cfg import parse_cfg_file
        specs, net, heads = parse_cfg_file(args.cfg)
        if heads:
            from yolo_tensorflow_tpu.config import config_from_cfg
            cfg, specs = config_from_cfg(args.cfg)
        else:
            # headless (classifier / char-rnn) cfg: any carrier config
            # works, summarize only reads input_size + name
            import dataclasses
            cfg = dataclasses.replace(
                get_config("darknet19-classifier"),
                name=os.path.basename(args.cfg),
                input_size=int(net.get("height", 0) or 1))
        in_ch = 3
        if "inputs" in net and "height" not in net:   # flat-input net
            in_ch = int(net["inputs"])
        print(summarize(cfg, specs, input_size=args.input_size,
                        in_channels=in_ch))
        return
    if not args.model:
        raise SystemExit("summary needs --model or --cfg")
    print(summarize(get_config(args.model), input_size=args.input_size))


def cmd_inspect(args):
    """Weights/checkpoint inspector — the print_tensor_name.py equivalent."""
    if args.file.endswith(".npz"):
        with np.load(args.file) as z:
            for k in sorted(z.files):
                a = z[k]
                print(f"{k:<40s} {str(a.shape):<20s} {a.dtype} "
                      f"|mean|={np.abs(a).mean():.4f}")
    else:
        from yolo_tensorflow_tpu.config import get_config, build_specs
        from yolo_tensorflow_tpu.io import weights as W
        cfg = get_config(args.model)
        specs = build_specs(cfg)
        params, stats, header = W.load_darknet_weights(
            specs, args.input_size or cfg.input_size, args.file, fold=False)
        print(f"header: {header}")

        def walk(prefix, d):
            for f, a in sorted(d.items()):
                if isinstance(a, dict):   # recurrent sublayer nesting
                    walk(f"{prefix}/{f}", a)
                else:
                    print(f"{prefix}/{f:<10s} {str(a.shape):<20s} "
                          f"|mean|={np.abs(a).mean():.4f}")

        import jax
        for k in sorted(params):
            walk(k, params[k])
        leaves = jax.tree_util.tree_leaves((params, stats))
        print(f"{sum(a.size for a in leaves):,} floats")


def cmd_stream(args):
    from yolo_tensorflow_tpu.serving import stream_detect
    det = _build_detector(args)
    on_batch = None
    if args.save_dir or args.display:
        # src/demo.c:185 behavior: draw detections (+FPS overlay) on each
        # frame and display/save it
        import cv2
        import numpy as _np
        import time as _time
        from yolo_tensorflow_tpu.utils.drawing import draw_detections
        if args.save_dir:
            os.makedirs(args.save_dir, exist_ok=True)
        state = {"n": 0, "t": _time.perf_counter()}

        def on_batch(dets, images):
            boxes = _np.asarray(dets.boxes)
            scores = _np.asarray(dets.scores)
            classes = _np.asarray(dets.classes)
            nums = _np.asarray(dets.num)
            now = _time.perf_counter()
            fps = images.shape[0] / max(now - state["t"], 1e-6)
            state["t"] = now
            s = images.shape[1]
            for b in range(images.shape[0]):
                frame = cv2.cvtColor(images[b], cv2.COLOR_RGB2BGR)
                results = [{
                    "class_id": int(classes[b, i]),
                    "class": det.cfg.classes[int(classes[b, i])],
                    "score": float(scores[b, i]),
                    "box": tuple(float(v) * s for v in boxes[b, i]),
                } for i in range(int(nums[b]))]
                draw_detections(frame, results,
                                num_classes=det.cfg.num_classes)
                cv2.putText(frame, f"FPS {fps:.1f}", (8, 22),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 255), 2)
                if args.save_dir:
                    cv2.imwrite(os.path.join(
                        args.save_dir, f"frame_{state['n']:06d}.jpg"), frame)
                if args.display:
                    cv2.imshow("yolo_tensorflow_tpu", frame)
                    cv2.waitKey(1)
                state["n"] += 1

    frames, dt, fps = stream_detect(det, args.source,
                                    batch_size=args.batch,
                                    loops=args.loops,
                                    max_batches=args.max_batches,
                                    on_batch=on_batch,
                                    avg_frames=args.avg_frames)
    print(f"{frames} frames in {dt:.2f}s -> {fps:.1f} FPS "
          f"(batch {args.batch})")


def cmd_quantize(args):
    """Post-training int8 quantization: calibrate activation ranges on a
    directory of images, emit a quantized .npz the detect/stream/eval
    commands load transparently."""
    import glob
    import cv2
    import jax
    from yolo_tensorflow_tpu.config import get_config, build_specs
    from yolo_tensorflow_tpu.io import weights as W
    from yolo_tensorflow_tpu.ops import quant as Q
    cfg = get_config(args.model, **({"input_size": args.input_size}
                                    if args.input_size else {}))
    specs = build_specs(cfg)
    if args.weights.endswith(".npz"):
        params = _load_npz_params(args.weights)
    else:
        params, _, _ = W.load_darknet_weights(
            specs, cfg.input_size, args.weights, bn_eps=cfg.bn_eps, fold=True)
    paths = sorted(glob.glob(os.path.join(args.calib_dir, "*")))[:args.calib_images]
    if not paths:
        raise SystemExit(f"no calibration images in {args.calib_dir}")
    batches = []
    for pth in paths:
        img = cv2.imread(pth)
        if img is None:
            continue
        img = cv2.cvtColor(cv2.resize(img, (cfg.input_size, cfg.input_size)),
                           cv2.COLOR_BGR2RGB)
        batches.append(img[None])
    scales = Q.calibrate_activations(specs, params, batches, cfg=cfg)
    qparams = Q.quantize_params(specs, params, scales)
    _save_npz_params(qparams, args.out)
    n_q = sum(1 for v in qparams.values() if "w_q" in v)
    print(f"wrote {args.out}: {n_q} int8 convs, "
          f"{len(qparams) - n_q} full-precision layers, "
          f"calibrated on {len(batches)} images")


def cmd_classify(args):
    import cv2
    from yolo_tensorflow_tpu.pipeline import Classifier
    import jax.numpy as jnp
    clf = Classifier(args.model, args.weights,
                     compute_dtype=jnp.bfloat16 if args.bf16 else None)
    names = None
    if args.names:
        with open(args.names) as f:
            names = [l.strip() for l in f if l.strip()]
    for path in args.images:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        results = clf.classify(img, top_k=args.top_k)
        print(path)
        for r in results:
            label = names[r["class_id"]] if names else r["class"]
            print(f"  {r['prob']*100:5.2f}%  {label}")


def cmd_export_darknet(args):
    """Emit a darknet-loadable (cfg, weights) pair from an unfolded model.

    Source is either raw darknet --weights or a training checkpoint
    (--ckpt: a ckpt-<step>.npz or a checkpoint dir's latest) — the latter
    closes the C's pretrain loop, where the classifier trainer's saved
    weights feed `partial` directly (examples/classifier.c save_weights ->
    examples/darknet.c:491)."""
    from yolo_tensorflow_tpu.io import weights as W
    from yolo_tensorflow_tpu.io.cfg import specs_to_cfg
    if getattr(args, "cfg", None):
        from yolo_tensorflow_tpu.config import config_from_cfg
        cfg, specs = config_from_cfg(args.cfg)
    elif args.model:
        from yolo_tensorflow_tpu.config import get_config, build_specs
        cfg = get_config(args.model)
        specs = build_specs(cfg)
    else:
        raise SystemExit("export-darknet needs --model or --cfg")
    if getattr(args, "ckpt", None):
        from yolo_tensorflow_tpu.io import checkpoint as ckpt
        params, stats, _ = ckpt.load_train_params(args.ckpt)
    elif args.weights:
        params, stats, _ = W.load_darknet_weights(
            specs, cfg.input_size, args.weights, fold=False,
            bn_eps=cfg.bn_eps)
    else:
        raise SystemExit("export-darknet needs --weights or --ckpt")
    W.save_darknet_weights(specs, cfg.input_size, params, stats,
                           args.out + ".weights")
    with open(args.out + ".cfg", "w") as f:
        f.write(specs_to_cfg(cfg, specs))
    print(f"wrote {args.out}.cfg + {args.out}.weights")


def cmd_partial(args):
    """Backbone weight truncation — the darknet ``partial`` command
    (examples/darknet.c:184,491: load_network then
    save_weights_upto(net, outfile, max)). Emits the first N darknet
    layers' weights with seen reset to 0 — the workflow that produces
    pretrain backbones like darknet19_448.conv.23 for detector
    fine-tuning (consumed via ``train --weights backbone.conv.N
    --partial-weights``)."""
    from yolo_tensorflow_tpu.io import weights as W
    head = None
    if args.cfg:
        from yolo_tensorflow_tpu.io.cfg import parse_cfg_file
        specs, net, _ = parse_cfg_file(args.cfg)
        input_size = int(net.get("height", 416) or 416)
        bn_eps = 1e-5
    elif args.model:
        from yolo_tensorflow_tpu.config import build_specs, get_config
        cfg = get_config(args.model)
        specs = build_specs(cfg)
        input_size, bn_eps, head = cfg.input_size, cfg.bn_eps, cfg.head
    else:
        raise SystemExit("partial needs --model or --cfg")
    params, stats, header = W.load_darknet_weights(
        specs, input_size, args.weights, fold=False, bn_eps=bn_eps)
    W.save_darknet_weights(specs, input_size, params, stats, args.out,
                           upto=args.upto, seen=0, head=head)
    kept = W._spec_cutoff(specs, args.upto, head)
    n_weighted = sum(1 for sp in specs[:kept] if W._has_weights(sp))
    print(f"wrote {args.out}: first {args.upto} darknet layers "
          f"({n_weighted} weighted) of {args.weights}, seen reset to 0")


def _load_unfolded(args):
    """(cfg, specs, params, stats) for the weight-file utilities —
    registry --model or arbitrary --cfg (incl. headless/classifier)."""
    from yolo_tensorflow_tpu.io import weights as W
    if getattr(args, "cfg", None):
        from yolo_tensorflow_tpu.config import config_from_cfg
        cfg, specs = config_from_cfg(
            args.cfg, class_names_file=getattr(args, "names", None))
    elif getattr(args, "model", None):
        from yolo_tensorflow_tpu.config import build_specs, get_config
        cfg = get_config(args.model)
        specs = build_specs(cfg)
    else:
        raise SystemExit("need --model or --cfg")
    params, stats, _ = W.load_darknet_weights(
        specs, cfg.input_size, args.weights, fold=False, bn_eps=cfg.bn_eps)
    return cfg, specs, params, stats


def cmd_average(args):
    """Checkpoint averaging — the darknet ``average`` command
    (examples/darknet.c:425): elementwise mean of N weight files with
    the C's type rules (io/netops.average_params)."""
    from yolo_tensorflow_tpu.io import netops, weights as W
    first = argparse.Namespace(model=args.model, cfg=args.cfg,
                               names=getattr(args, "names", None),
                               weights=args.weights_files[0])
    cfg, specs, p0, s0 = _load_unfolded(first)
    runs = [(p0, s0)]
    for path in args.weights_files[1:]:
        p, s, _ = W.load_darknet_weights(specs, cfg.input_size, path,
                                         fold=False, bn_eps=cfg.bn_eps)
        runs.append((p, s))
    params, stats = netops.average_params(specs, runs)
    W.save_darknet_weights(specs, cfg.input_size, params, stats, args.out,
                           head=cfg.head)
    print(f"wrote {args.out}: mean of {len(runs)} checkpoints")


def cmd_denormalize(args):
    """Fold BN into the weights — the darknet ``denormalize`` command
    (examples/darknet.c:473). Unlike the C (which leaves the .cfg
    stale), this also emits <out>.cfg with batch_normalize dropped so
    the pair round-trips."""
    from yolo_tensorflow_tpu.io import netops, weights as W
    from yolo_tensorflow_tpu.io.cfg import specs_to_cfg
    cfg, specs, params, stats = _load_unfolded(args)
    new_specs, new_params = netops.denormalize(specs, params, stats)
    W.save_darknet_weights(new_specs, cfg.input_size, new_params, {},
                           args.out, head=cfg.head)
    cfg_out = os.path.splitext(args.out)[0] + ".cfg"
    with open(cfg_out, "w") as f:
        f.write(specs_to_cfg(cfg, new_specs))
    print(f"wrote {args.out} + {cfg_out}: batch norm folded "
          f"(denormalize_net eps quirks preserved)")


def cmd_reset(args):
    """Fold BN into the weights but keep identity BN slots — the darknet
    ``reset`` command (reset_normalize_net, examples/darknet.c:471)."""
    from yolo_tensorflow_tpu.io import netops, weights as W
    cfg, specs, params, stats = _load_unfolded(args)
    new_p, new_s = netops.reset_normalize(specs, params, stats)
    W.save_darknet_weights(specs, cfg.input_size, new_p, new_s, args.out,
                           head=cfg.head)
    print(f"wrote {args.out}: BN folded into weights, slots reset to "
          f"identity (same cfg still loads it)")


def cmd_normalize(args):
    """Add identity-BN slots to bias-only layers — the darknet
    ``normalize`` command (normalize_net). Emits the matching
    batch_normalize=1 .cfg (the C leaves it stale); note the C inits
    rolling variance to ZERO, so the result is meant for stat
    re-estimation by training, not direct serving (quirk kept)."""
    from yolo_tensorflow_tpu.io import netops, weights as W
    from yolo_tensorflow_tpu.io.cfg import specs_to_cfg
    cfg, specs, params, stats = _load_unfolded(args)
    new_specs, new_p, new_s = netops.normalize(specs, params, stats)
    W.save_darknet_weights(new_specs, cfg.input_size, new_p, new_s,
                           args.out, head=cfg.head)
    cfg_out = os.path.splitext(args.out)[0] + ".cfg"
    with open(cfg_out, "w") as f:
        f.write(specs_to_cfg(cfg, new_specs))
    print(f"wrote {args.out} + {cfg_out}: BN slots added to bias-only "
          f"layers (rolling var ZERO, the C's init — retrain stats "
          f"before serving)")


def cmd_rgbgr(args):
    """Swap the first conv's channel order — ``rgbgr``
    (examples/darknet.c:469)."""
    from yolo_tensorflow_tpu.io import netops, weights as W
    cfg, specs, params, stats = _load_unfolded(args)
    W.save_darknet_weights(specs, cfg.input_size,
                           netops.rgbgr(specs, params), stats, args.out,
                           head=cfg.head)
    print(f"wrote {args.out}: first conv input channels reversed")


def cmd_rescale(args):
    """Re-range the first conv for an affine input change — ``rescale``
    (examples/darknet.c:479)."""
    from yolo_tensorflow_tpu.io import netops, weights as W
    cfg, specs, params, stats = _load_unfolded(args)
    out_p = netops.rescale(specs, params, scale=args.scale,
                           trans=args.trans)
    W.save_darknet_weights(specs, cfg.input_size, out_p, stats, args.out,
                           head=cfg.head)
    print(f"wrote {args.out}: first conv rescaled "
          f"(scale {args.scale}, trans {args.trans})")


def cmd_voc_label(args):
    """VOC XML -> darknet labels/*.txt + image lists (scripts/voc_label.py)."""
    from yolo_tensorflow_tpu.data.datasets import write_darknet_labels
    lists = write_darknet_labels(args.root, args.image_sets,
                                 year=args.year,
                                 out_list_dir=args.out_dir)
    for p in lists:
        print(f"wrote {p}")


def cmd_bench(args):
    os.environ["BENCH_BATCH"] = str(args.batch)
    import bench
    bench.main()


def cmd_generate(args):
    """Char-RNN text generation (examples/rnn.c test_char_rnn): the whole
    sampling loop runs as one on-device lax.scan."""
    from yolo_tensorflow_tpu import textgen
    specs, params, inputs = textgen.load_charrnn(args.cfg, args.weights)
    tokens = None
    if args.tokens:
        with open(args.tokens) as f:   # read_tokens (examples/rnn.c:47)
            tokens = [line.rstrip("\n") for line in f]
    text = textgen.generate(specs, params, inputs, seed_text=args.seed_text,
                            n=args.n, temperature=args.temperature,
                            rng_seed=args.rng_seed, tokens=tokens)
    print(text)


def cmd_rnn_train(args):
    """Char-RNN training (examples/rnn.c train_char_rnn): next-byte CE on
    random windows of a raw text file."""
    from yolo_tensorflow_tpu import textgen
    from yolo_tensorflow_tpu.io import weights as W
    from yolo_tensorflow_tpu.io.cfg import parse_cfg_file
    if args.tokenized:
        # read_tokenized_data (examples/rnn.c:24): whitespace-split ints
        with open(args.text) as f:
            text = np.asarray([int(t) for t in f.read().split()], np.int64)
    else:
        with open(args.text, "rb") as f:
            text = f.read()
    specs, params, vocab, (raw_p, raw_st) = textgen.train_char_rnn(
        text, args.cfg, steps_per_seq=args.steps, batch=args.batch,
        iters=args.iters, lr=args.lr, seed=args.rng_seed, return_raw=True,
        tokenized=args.tokenized)
    if args.out:
        # save the UNFOLDED form: darknet .weights stores raw BN stats
        raw_specs, _, _ = parse_cfg_file(args.cfg)
        W.save_darknet_weights(raw_specs, 1, raw_p, raw_st, args.out,
                               in_channels=vocab)
        print(f"wrote {args.out}")
    if args.sample:
        print(textgen.generate(specs, params, vocab, seed_text="",
                               n=args.sample,
                               temperature=args.temperature,
                               rng_seed=args.rng_seed))


def cmd_nightmare(args):
    """Feature visualization / inversion — the `darknet nightmare` demo
    (examples/nightmare.c run_nightmare). Dream mode amplifies a layer's
    strongest activations by gradient ascent on the image; --reconstruct
    inverts a recorded feature map instead."""
    import cv2
    from yolo_tensorflow_tpu import dream as D
    from yolo_tensorflow_tpu.config import (get_config, build_specs,
                                            config_from_cfg)
    from yolo_tensorflow_tpu.io import weights as W

    params = None
    weights = args.weights
    if weights and weights.endswith(".npz"):
        params = _load_npz_params(weights)
        weights = None
    if args.cfg:
        cfg, specs = config_from_cfg(args.cfg, class_names_file=args.names)
        base = os.path.splitext(os.path.basename(args.cfg))[0]
    elif args.model:
        cfg = get_config(args.model)
        specs = build_specs(cfg)
        base = args.model
    else:
        raise SystemExit("nightmare needs --model or --cfg")
    if params is None:
        params, _, _ = W.load_darknet_weights(
            specs, cfg.input_size, weights, header_ints=None,
            bn_eps=cfg.bn_eps, fold=True)
    img = cv2.imread(args.image)
    if img is None:
        raise SystemExit(f"cannot read {args.image}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    imbase = os.path.splitext(os.path.basename(args.image))[0]

    def save_round(e, out_u8):
        # the C's <im>_<cfg>_<layer>_%06d naming (nightmare.c:396-401)
        name = f"{imbase}_{base}_{args.layer}_{e:06d}.jpg"
        path = os.path.join(args.prefix, name) if args.prefix else name
        cv2.imwrite(path, cv2.cvtColor(out_u8, cv2.COLOR_RGB2BGR))
        print(f"{e} {path}", flush=True)

    if args.prefix:
        os.makedirs(args.prefix, exist_ok=True)
    if args.reconstruct:
        D.reconstruct(
            cfg, specs, params, img, args.layer, rounds=args.rounds,
            iters=args.iters, rate=args.rate, momentum=args.momentum,
            lam=args.smooth_lambda if args.smooth else 0.0,
            smooth_size=args.smooth_size, random_start=args.random_start,
            seed=args.seed, on_round=save_round, verbose=True)
    else:
        D.dream(
            cfg, specs, params, img, args.layer, rounds=args.rounds,
            iters=args.iters, octaves=args.octaves, layer_range=args.range,
            rate=args.rate, thresh=args.thresh, norm=not args.no_norm,
            zoom=args.zoom, rotate=args.rotate, seed=args.seed,
            on_round=save_round, verbose=True)


def _cfg_specs_only(args):
    """(cfg, specs) from --model or --cfg, no weights."""
    if getattr(args, "cfg", None):
        from yolo_tensorflow_tpu.config import config_from_cfg
        return config_from_cfg(args.cfg,
                               class_names_file=getattr(args, "names", None))
    if getattr(args, "model", None):
        from yolo_tensorflow_tpu.config import build_specs, get_config
        cfg = get_config(args.model)
        return cfg, build_specs(cfg)
    raise SystemExit("need --model or --cfg")


def _params_or_init(args, cfg, specs, *, folded=True):
    """Weights if given, else a random init — the C's load_network with
    an optional weightfile (parse_network_cfg leaves random weights)."""
    import jax
    import numpy as np
    from yolo_tensorflow_tpu.io import weights as W
    from yolo_tensorflow_tpu.models import engine
    if getattr(args, "weights", None):
        if args.weights.endswith(".npz"):
            if not folded:
                # every npz this repo writes stores FOLDED serving params;
                # the raw-weights commands (print/statistics/visualize/
                # mkimg) would silently show BN-folded values
                raise SystemExit(
                    "this command reads raw (unfolded) weights like the C;"
                    " npz checkpoints store BN-folded serving params —"
                    " pass the darknet .weights file instead")
            return _load_npz_params(args.weights), {}
        p, s, _ = W.load_darknet_weights(specs, cfg.input_size,
                                         args.weights, fold=folded,
                                         bn_eps=cfg.bn_eps)
        return p, s
    p, s = engine.init_params(specs, (1, cfg.input_size, cfg.input_size, 3),
                              jax.random.PRNGKey(0), folded=folded)
    return (jax.tree.map(np.asarray, p),
            jax.tree.map(np.asarray, s) if s else {})


def cmd_ops(args):
    """FLOP count — darknet `ops` (operations, examples/darknet.c:135):
    the C's numops rule (conv/connected/rnn/gru/lstm only; `summary` has
    the fuller per-layer accounting)."""
    from yolo_tensorflow_tpu.utils.netviz import numops
    cfg, specs = _cfg_specs_only(args)
    ops = numops(specs, args.input_size or cfg.input_size)
    print(f"Floating Point Operations: {ops}")
    print(f"Floating Point Operations: {ops / 1e9:.2f} Bn")


def cmd_speed(args):
    """Timed forward evals — darknet `speed` (examples/darknet.c:115):
    batch-1 network_predict on a blank image, default 1000 tics. Each
    eval here is one jit dispatch with a blocking readback (the per-call
    cost a serial client pays; `bench` measures pipelined throughput)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from yolo_tensorflow_tpu.models import engine
    from yolo_tensorflow_tpu.utils.netviz import numops
    cfg, specs = _cfg_specs_only(args)
    tics = args.tics or 1000
    params, _ = _params_or_init(args, cfg, specs, folded=True)

    @jax.jit
    def fwd(p, x):
        dets, _ = engine.apply(specs, p, x, bn_eps=cfg.bn_eps)
        return [d for d, _ in dets]

    x = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
    outs = fwd(params, x)
    jax.block_until_ready(outs)          # compile outside the clock
    t0 = time.time()
    for _ in range(tics):
        jax.block_until_ready(fwd(params, x))
    t = time.time() - t0
    ops = numops(specs, cfg.input_size)
    print(f"\n{tics} evals, {t:f} Seconds")
    print(f"Floating Point Operations: {ops / 1e9:.2f} Bn")
    print(f"FLOPS: {ops / 1e9 * tics / t:.2f} Bn")
    print(f"Speed: {t / tics:f} sec/eval")
    print(f"Speed: {tics / t:f} Hz")


def cmd_print(args):
    """Dump one conv layer's filters — darknet `print` (print_weights,
    examples/darknet.c:190): one line per output filter, darknet (c,h,w)
    order, %g formatting."""
    from yolo_tensorflow_tpu.models import engine
    from yolo_tensorflow_tpu.utils.netviz import conv_weight_rows
    cfg, specs = _cfg_specs_only(args)
    params, _ = _params_or_init(args, cfg, specs, folded=False)
    key = engine.layer_key(args.layer)
    if key not in params or "w" not in params[key]:
        raise SystemExit(f"layer {args.layer} has no weights")
    for row in conv_weight_rows(params[key]["w"]):
        print(" ".join(f"{v:g}" for v in row) + " ")


def cmd_statistics(args):
    """Weight statistics for BN'd connected/GRU layers — darknet
    `statistics` (statistics_net, examples/darknet.c:305)."""
    from yolo_tensorflow_tpu.utils.netviz import statistics_lines
    cfg, specs = _cfg_specs_only(args)
    params, _ = _params_or_init(args, cfg, specs, folded=False)
    for line in statistics_lines(specs, params):
        print(line)


def cmd_visualize(args):
    """Save per-conv filter grids — darknet `visualize`
    (visualize_network, src/network.c:477; the C opens windows, this
    writes 'Layer <i>.png' mosaics)."""
    import cv2
    import numpy as np
    from yolo_tensorflow_tpu.utils.netviz import visualize_network
    cfg, specs = _cfg_specs_only(args)
    params, _ = _params_or_init(args, cfg, specs, folded=False)
    os.makedirs(args.prefix, exist_ok=True)
    for i, grid in visualize_network(specs, params).items():
        path = os.path.join(args.prefix, f"Layer {i}.png")
        img = (np.clip(grid, 0, 1) * 255 + 0.5).astype(np.uint8)
        if img.shape[-1] == 3:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, img)
        print(path)


def cmd_mkimg(args):
    """Collages ghost-pasted from first-conv filters — darknet `mkimg`
    (examples/darknet.c:375)."""
    import cv2
    import numpy as np
    from yolo_tensorflow_tpu.utils.netviz import mkimg
    cfg, specs = _cfg_specs_only(args)
    params, _ = _params_or_init(args, cfg, specs, folded=False)
    os.makedirs(args.prefix, exist_ok=True)
    imgs = mkimg(specs, params, args.height, args.width, args.num,
                 seed=args.seed)
    for z, im in enumerate(imgs):
        path = os.path.join(args.prefix, f"gen_{z}.png")
        cv2.imwrite(path, cv2.cvtColor(
            (im * 255 + 0.5).astype(np.uint8), cv2.COLOR_RGB2BGR))
        print(path)


def cmd_imtest(args):
    """Image-op self test — darknet `imtest` (test_resize,
    src/image.c:1392): prints the L2 norm, writes the gray + four fixed
    HSV-distorted variants (the interactive loop needs a display)."""
    import cv2
    import numpy as np
    from yolo_tensorflow_tpu.utils.netviz import imtest_images
    img = cv2.imread(args.image)
    if img is None:
        raise SystemExit(f"cannot read {args.image}")
    im = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    mag, outs = imtest_images(im)
    print(f"L2 Norm: {mag:f}")
    os.makedirs(args.prefix, exist_ok=True)
    for name, out in outs.items():
        path = os.path.join(args.prefix, f"{name}.png")
        u8 = (np.clip(out, 0, 1) * 255 + 0.5).astype(np.uint8)
        if u8.shape[-1] == 1:
            u8 = u8[..., 0]
        else:
            u8 = cv2.cvtColor(u8, cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, u8)
        print(path)


def cmd_3d(args):
    """Stereo composite — darknet `3d` (composite_3d, src/image.c:909):
    align the second image by vertical shift, overlay the first's red
    channel (anaglyph)."""
    import cv2
    import numpy as np
    from yolo_tensorflow_tpu.utils.netviz import composite_3d
    a = cv2.imread(args.image_a)
    b = cv2.imread(args.image_b)
    if a is None or b is None:
        raise SystemExit("cannot read input images")
    af = cv2.cvtColor(a, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    bf = cv2.cvtColor(b, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    shift, comp = composite_3d(af, bf, delta=args.delta)
    print(shift)
    cv2.imwrite(args.out, cv2.cvtColor(
        (comp * 255 + 0.5).astype(np.uint8), cv2.COLOR_RGB2BGR))
    print(args.out)


def cmd_serve_http(args):
    """HTTP detection server with dynamic micro-batching (server.py):
    concurrent POST /detect requests coalesce into fixed-shape device
    batches on the fused-letterbox path — any input size, one compiled
    executable per canvas bucket, boxes back in original pixels."""
    from yolo_tensorflow_tpu.server import serve_http
    args.letterbox = True
    args.fused_letterbox = True
    det = _build_detector(args)
    serve_http(det, host=args.host, port=args.port,
               batch_size=args.batch, max_wait_ms=args.max_wait_ms,
               max_canvas=args.max_canvas,
               max_body_bytes=args.max_body_mb << 20,
               queue_depth=args.queue_depth,
               model_name=args.model or args.cfg or "model")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="yolo_tensorflow_tpu")
    ap.add_argument("--platform", choices=("cpu", "tpu", "axon"),
                    default=None,
                    help="force a JAX backend (e.g. cpu for offline use)")
    ap.add_argument("--trace", nargs="?", const="/tmp/yolo_trace",
                    default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the whole command "
                         "into DIR (view with xprof/tensorboard) — the "
                         "framework's answer to the reference's wall-clock "
                         "prints around sess.run "
                         "(YOLO_V1_Inference.py:379-383)")
    ap.add_argument("--xla-dump", nargs="?", const="/tmp/yolo_xla_dump",
                    default=None, metavar="DIR",
                    help="dump compiled HLO into DIR (the TensorBoard "
                         "graph-dump analogue of FileWriter('logs/', ...), "
                         "YOLO_v2.py:51); set before the first compile")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("detect", help="detect objects in images")
    _add_model_args(p, weights_required=False)
    p.add_argument("images", nargs="+")
    p.add_argument("--artifact", default=None,
                   help="exported .ytt artifact — detect with zero model "
                        "knowledge (the frozen-pb consumer path)")
    p.add_argument("--out-dir", default="out")
    p.add_argument("--boxes-txt", default=None,
                   help="append class,x0,y0,x1,y1,score lines (boxes.txt "
                        "format of YOLO_V1_Inference.py:418)")
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("serve",
                       help="serve an exported artifact: read image paths "
                            "from stdin (or --watch a directory), print one "
                            "JSON line of detections per image")
    p.add_argument("--artifact", required=True)
    p.add_argument("--watch", default=None,
                   help="poll this directory for new images instead of stdin")
    p.add_argument("--out-dir", default=None,
                   help="also write annotated copies here")
    p.add_argument("--poll-interval", type=float, default=0.5)
    p.add_argument("--once", action="store_true",
                   help="with --watch: process current contents and exit")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("convert", help=".weights -> folded .npz checkpoint")
    _add_model_args(p)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("export", help="serialize inference artifact")
    _add_model_args(p)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--canvas-size", type=int, default=0,
                   help="with --letterbox --fused-letterbox: canvas side "
                        "of the arbitrary-input-size artifact (default "
                        "2x model input)")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("eval", help="mAP evaluation")
    _add_model_args(p)
    p.add_argument("--voc-root")
    p.add_argument("--voc-year", default="2007")
    p.add_argument("--image-set", default="test")
    p.add_argument("--coco-json")
    p.add_argument("--image-root", default=".")
    p.add_argument("--list", help="darknet-format image list")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=32,
                   help="device batch for the prefetching eval pipeline "
                        "(validate_detector's buffered loader, "
                        "detector.c:388-430, batched)")
    p.add_argument("--num-workers", type=int, default=8,
                   help="host decode/preprocess threads")
    p.add_argument("--coco-metric", action="store_true")
    p.add_argument("--eleven-point", action="store_true")
    p.add_argument("--write-results", default=None, metavar="DIR",
                   help="emit interchange files for external scorers "
                        "(VOC comp4_det_test_<class>.txt per class, or "
                        "coco_results.json with --coco-results) — the "
                        "validate_detector output formats")
    p.add_argument("--coco-results", action="store_true",
                   help="with --write-results: COCO results-json instead "
                        "of VOC per-class files")
    p.add_argument("--imagenet-results", action="store_true",
                   help="with --write-results: the 'eval=imagenet' format "
                        "— one imagenet-detection.txt with 1-based running "
                        "image ids and 1-based class ids "
                        "(print_imagenet_detections, detector.c:212)")
    p.add_argument("--recall", action="store_true",
                   help="IoU/recall stats instead of mAP "
                        "(validate_detector_recall, detector.c:489)")
    p.add_argument("--flip", action="store_true",
                   help="flip-TTA eval: average each image with its "
                        "mirror before decode (validate_detector_flip "
                        "'valid2', examples/detector.c:234)")
    p.add_argument("--tta-mode", choices=("darknet", "corrected"),
                   default="darknet",
                   help="flip mirroring: 'darknet' reproduces the C's "
                        "buggy plane negation (avg_flipped_yolo; measured "
                        "-0.044 mAP on the hard synthetic task), "
                        "'corrected' mirrors properly (+0.044)")
    p.add_argument("--top", type=int, default=5,
                   help="classifier eval: report top-1 and top-N accuracy "
                        "(validate_classifier_single, "
                        "examples/classifier.c:303; 'top' in the .data "
                        "file). Detection models ignore this.")
    p.add_argument("--classifier-mode",
                   choices=("single", "crop", "10crop", "full", "multi"),
                   default="single",
                   help="classifier eval flow (the C's 'valid'/'validcrop'"
                        "/'valid10'/'validfull'/'validmulti' dispatch, "
                        "examples/classifier.c:1085): single=center-crop, "
                        "crop=stretch resize, 10crop=ten summed crops, "
                        "full=resize_min fully-conv, multi=4 scales + "
                        "mirror summed")
    p.add_argument("--shape-buckets", choices=("snap32", "exact"),
                   default="snap32",
                   help="full/multi classifier eval: 'snap32' (default) "
                        "snaps each fully-conv resize target to the "
                        "stride-32 grid so XLA compiles O(buckets) "
                        "executables over a heterogeneous validation set; "
                        "'exact' keeps the C's per-ratio resize_network "
                        "geometry (classifier.c:340,460) — one compile "
                        "per distinct aspect ratio")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("train", help="train a model (detector or classifier)")
    p.add_argument("--model", choices=MODEL_NAMES,
                   help="registry model (or --cfg for any darknet cfg)")
    p.add_argument("--cfg",
                   help="train an arbitrary darknet .cfg: every [net] "
                        "training option (learning_rate, momentum, decay, "
                        "burn_in, policy=steps/step/exp/poly/sig, "
                        "max_batches) and the head section's loss options "
                        "are honored (parse_net_options, "
                        "src/parser.c:643); CLI flags override")
    p.add_argument("--list",
                   help="image list: darknet detection format, or for "
                        "classifier models plain paths with the class name "
                        "in each path (fill_truth convention). Required "
                        "unless --data provides train=")
    p.add_argument("--names", default=None,
                   help="class-names file (one per line); overrides the "
                        "registry classes — required for classifier "
                        "training on custom classes")
    p.add_argument("--data",
                   help="darknet .data file: train=/valid= lists, names= "
                        "(or labels=), backup= checkpoint dir "
                        "(train_detector's reads, examples/detector.c:8-10)"
                        "; explicit flags override")
    p.add_argument("--val-list")
    p.add_argument("--weights", help="initial weights (.weights or .npz)")
    p.add_argument("--partial-weights", action="store_true",
                   help="accept a truncated backbone .weights file "
                        "(a 'partial' pretrain like darknet19_448.conv.23); "
                        "layers past its end keep their random init")
    p.add_argument("--ckpt-dir", default="ckpts")
    p.add_argument("--batch-size", type=int, default=None,
                   help="default: cfg [net] batch, else 64")
    p.add_argument("--steps", type=int, default=None,
                   help="default: cfg max_batches, else 500200")
    p.add_argument("--lr", type=float, default=None,
                   help="default: cfg learning_rate, else 1e-3")
    p.add_argument("--burn-in", type=int, default=None,
                   help="default: cfg burn_in, else 1000")
    p.add_argument("--multiscale", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: convs compute bf16 on "
                        "the MXU, BN stats/loss/optimizer and master "
                        "weights stay f32 (gradients gated vs f32 in "
                        "tests/test_train_bf16.py)")
    p.add_argument("--remat-every", type=int, default=None, metavar="N",
                   help="selective rematerialization: keep only every Nth "
                        "layer's activation for the backward pass and "
                        "recompute the rest (jax.checkpoint) — ~N-fold "
                        "lower activation HBM for one extra forward's "
                        "FLOPs; lets batch size grow past plain backprop")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware training: convs train against "
                        "the int8 serving lattice (fake-quant + STE, "
                        "ops/qat.py) with activation scales EMA-tracked in "
                        "the step; saves an int8-qat.npz next to the "
                        "checkpoints that detect/eval/stream load like any "
                        "quantize output. Resuming a float checkpoint "
                        "fine-tunes it quantization-aware")
    p.add_argument("--bn-onepass", action="store_true",
                   help="one-pass BN batch stats (var = E[x^2]-E[x]^2): "
                        "mean and variance become sibling reductions XLA "
                        "fuses into one activation read, cutting train-mode "
                        "BN HBM traffic ~2x; not bit-identical to darknet's "
                        "two-pass variance (PERF_TRAIN.md). Shorthand for "
                        "--bn-stats onepass")
    p.add_argument("--bn-stats", default=None,
                   metavar="{twopass,onepass,onepass_bf16,ghostN}",
                   help="BN batch-stat form (ops/layers.batch_norm_train): "
                        "twopass = darknet-exact (default); onepass = one "
                        "fused activation read; onepass_bf16 = onepass "
                        "with bfloat16 reduction accumulators (accuracy "
                        "risk on large spatial reductions — convergence-"
                        "gate before trusting); ghostN (e.g. ghost32) = "
                        "stats from the first N images only, applied to "
                        "the whole batch (the ghost-BN subsampling lever, "
                        "stat pass reads N/B of the activation)")
    p.add_argument("--cache-images", action="store_true",
                   help="cache decoded frames in host RAM (bounded, "
                        "4 GiB): darknet re-decodes every image every "
                        "epoch (load_data_detection, src/data.c:957); for "
                        "datasets that fit, this pays the codec once and "
                        "keeps the host cores for augmentation — the "
                        "loader, not the TPU step, is the throughput "
                        "ceiling on core-starved hosts")
    p.add_argument("--num-data", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--num-spatial", type=int, default=1)
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host training: jax.distributed coordinator "
                        "address (or env JAX_COORDINATOR_ADDRESS); the "
                        "mesh then spans all hosts' devices")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--save-every", type=int, default=1000)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--input-size", type=int, default=None)
    p.add_argument("--eval-every", type=int, default=0,
                   help="run val-list mAP every N steps (needs --val-list)")
    p.set_defaults(fn=cmd_train)

    def _weight_util(name, help_, **extra):
        q = sub.add_parser(name, help=help_)
        q.add_argument("--model", choices=MODEL_NAMES)
        q.add_argument("--cfg",
                       help="arbitrary darknet .cfg instead of --model")
        q.add_argument("--names", help="class-names file (with --cfg)")
        if not extra.get("multi_weights"):
            q.add_argument("--weights", required=True)
        q.add_argument("--out", required=True)
        return q

    p = _weight_util("average",
                     "elementwise mean of N checkpoints (darknet "
                     "'average', examples/darknet.c:425)",
                     multi_weights=True)
    p.add_argument("weights_files", nargs="+",
                   help=".weights files to average")
    p.set_defaults(fn=cmd_average)

    p = _weight_util("denormalize",
                     "fold batch norm into the weights; emits matching "
                     ".cfg too (darknet 'denormalize')")
    p.set_defaults(fn=cmd_denormalize)

    p = _weight_util("reset",
                     "fold BN into weights, keep identity BN slots "
                     "(darknet 'reset')")
    p.set_defaults(fn=cmd_reset)

    p = _weight_util("normalize",
                     "add identity-BN slots to bias-only layers "
                     "(darknet 'normalize'; rolling var starts 0, "
                     "retrain stats before serving)")
    p.set_defaults(fn=cmd_normalize)

    p = _weight_util("rgbgr",
                     "swap the first conv's input channel order "
                     "(darknet 'rgbgr')")
    p.set_defaults(fn=cmd_rgbgr)

    p = _weight_util("rescale",
                     "re-range the first conv for an affine input "
                     "change (darknet 'rescale')")
    p.add_argument("--scale", type=float, default=2.0)
    p.add_argument("--trans", type=float, default=-0.5)
    p.set_defaults(fn=cmd_rescale)

    p = sub.add_parser("partial",
                       help="truncate a .weights file at a layer cutoff "
                            "(darknet 'partial': backbone pretrain files "
                            "like darknet19_448.conv.23)")
    p.add_argument("--model", choices=MODEL_NAMES)
    p.add_argument("--cfg", help="arbitrary darknet .cfg instead of --model")
    p.add_argument("--weights", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--upto", type=int, required=True,
                   help="darknet layer cutoff (counts cfg sections, like "
                        "save_weights_upto)")
    p.set_defaults(fn=cmd_partial)

    p = sub.add_parser("voc-label",
                       help="VOC XML -> darknet labels + lists "
                            "(scripts/voc_label.py)")
    p.add_argument("--root", required=True, help="VOCdevkit root")
    p.add_argument("--year", default="2007")
    p.add_argument("--out-dir", default=".")
    p.add_argument("image_sets", nargs="+",
                   help="e.g. train val test")
    p.set_defaults(fn=cmd_voc_label)

    p = sub.add_parser("bench", help="throughput benchmark")
    p.add_argument("--batch", type=int, default=64)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("summary", help="layer table (shapes, params, BFLOPs)")
    p.add_argument("--model", choices=MODEL_NAMES)
    p.add_argument("--cfg", help="summarize an arbitrary darknet .cfg "
                                 "instead of a registry model")
    p.add_argument("--input-size", type=int, default=None)
    p.set_defaults(fn=cmd_summary)

    p = sub.add_parser("inspect", help="list tensors in .weights/.npz")
    p.add_argument("file")
    p.add_argument("--model", choices=MODEL_NAMES,
                   help="required for .weights files")
    p.add_argument("--input-size", type=int, default=None)
    p.set_defaults(fn=cmd_inspect)

    p = sub.add_parser("stream", help="streaming demo (video/camera/dir)")
    _add_model_args(p)
    p.add_argument("--source", required=True,
                   help="video file, camera index, or image directory")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--loops", type=int, default=1)
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--avg-frames", type=int, default=0,
                   help="rolling prediction average over N frames "
                        "(demo.c demo_frame=3 smoothing; 0 = off)")
    p.add_argument("--save-dir", default=None,
                   help="write annotated frames here (demo.c drawing)")
    p.add_argument("--display", action="store_true",
                   help="show annotated frames in a window (needs a GUI)")
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("quantize", help="post-training int8 quantization")
    p.add_argument("--model", required=True, choices=MODEL_NAMES)
    p.add_argument("--weights", required=True)
    p.add_argument("--calib-dir", required=True,
                   help="directory of calibration images")
    p.add_argument("--calib-images", type=int, default=64)
    p.add_argument("--input-size", type=int, default=None)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_quantize)

    p = sub.add_parser("classify", help="image classification (head=0 models)")
    p.add_argument("--model", required=True, choices=MODEL_NAMES)
    p.add_argument("--weights", required=True)
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--names", help="file with one class name per line")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("images", nargs="+")
    p.set_defaults(fn=cmd_classify)

    p = sub.add_parser("export-darknet",
                       help="emit darknet (cfg, weights) pair")
    p.add_argument("--model", choices=MODEL_NAMES)
    p.add_argument("--cfg", help="arbitrary darknet .cfg instead of a "
                                 "registry --model")
    p.add_argument("--weights", help="raw darknet .weights source")
    p.add_argument("--ckpt", help="training checkpoint source: a "
                                  "ckpt-<step>.npz or a checkpoint dir "
                                  "(uses its latest)")
    p.add_argument("--out", required=True, help="output path stem")
    p.set_defaults(fn=cmd_export_darknet)

    p = sub.add_parser("generate",
                       help="char-RNN text generation ([rnn]/[gru]/[lstm] "
                            "cfgs; examples/rnn.c test_char_rnn)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--weights", help="darknet .weights (random init if "
                                     "omitted)")
    p.add_argument("-n", type=int, default=200, help="bytes to sample")
    p.add_argument("--seed-text", default="", help="priming text")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--rng-seed", type=int, default=0)
    p.add_argument("--tokens", help="vocab file, one token per line "
                                    "(tokenized models)")
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("rnn-train",
                       help="char-RNN training on a raw text file "
                            "(examples/rnn.c train_char_rnn)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--text", required=True, help="raw training text file")
    p.add_argument("--tokenized", action="store_true",
                   help="treat --text as whitespace-separated token ids "
                        "(read_tokenized_data)")
    p.add_argument("--steps", type=int, default=64,
                   help="BPTT window (net time_steps)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--out", help="write trained darknet .weights here")
    p.add_argument("--sample", type=int, default=0,
                   help="sample N bytes after training")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--rng-seed", type=int, default=0)
    p.set_defaults(fn=cmd_rnn_train)

    p = sub.add_parser("nightmare",
                       help="feature visualization / inversion — deep-dream"
                            " gradient ascent (examples/nightmare.c)")
    p.add_argument("--model", choices=MODEL_NAMES,
                   help="registry model (or --cfg for any darknet cfg)")
    p.add_argument("--cfg", help="arbitrary darknet .cfg file")
    p.add_argument("--names", help="class-names file (for --cfg)")
    p.add_argument("--weights", required=True,
                   help="darknet .weights or .npz checkpoint")
    p.add_argument("--image", required=True)
    p.add_argument("--layer", type=int, required=True,
                   help="spec index to amplify (see the `summary` table)")
    p.add_argument("--rounds", type=int, default=1)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--octaves", type=int, default=4)
    p.add_argument("--range", type=int, default=1,
                   help="randomize the layer +-range/2 per iteration")
    p.add_argument("--rate", type=float, default=0.04)
    p.add_argument("--thresh", type=float, default=1.0,
                   help="amplify activations above mean + thresh*sigma")
    p.add_argument("--zoom", type=float, default=1.0)
    p.add_argument("--rotate", type=float, default=0.0,
                   help="degrees rotated between rounds")
    p.add_argument("--momentum", type=float, default=0.9,
                   help="update momentum (--reconstruct mode)")
    p.add_argument("--no-norm", action="store_true",
                   help="skip the update normalization (-norm 0)")
    p.add_argument("--reconstruct", action="store_true",
                   help="feature inversion instead of dream ascent")
    p.add_argument("--random-start", action="store_true",
                   help="reconstruct from noise instead of the image")
    p.add_argument("--smooth", action="store_true",
                   help="enable the window-smoothness regularizer "
                        "(the C ships it commented out)")
    p.add_argument("--smooth-lambda", type=float, default=0.01)
    p.add_argument("--smooth-size", type=int, default=1)
    p.add_argument("--prefix", help="output directory")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_nightmare)

    def _net_tool(name, help_, weights=True):
        q = sub.add_parser(name, help=help_)
        q.add_argument("--model", choices=MODEL_NAMES)
        q.add_argument("--cfg", help="arbitrary darknet .cfg")
        q.add_argument("--names", help="class-names file (with --cfg)")
        if weights:
            q.add_argument("--weights",
                           help=".weights/.npz (default: random init, "
                                "like the C's parse-only load)")
        return q

    p = _net_tool("ops", "FLOP count (darknet 'ops' / numops)",
                  weights=False)
    p.add_argument("--input-size", type=int, default=None)
    p.set_defaults(fn=cmd_ops)

    p = _net_tool("speed",
                  "timed batch-1 forward evals (darknet 'speed')")
    p.add_argument("--tics", type=int, default=1000)
    p.set_defaults(fn=cmd_speed)

    p = _net_tool("print",
                  "dump a conv layer's filters (darknet 'print')")
    p.add_argument("--layer", type=int, required=True,
                   help="spec index (see `summary`)")
    p.set_defaults(fn=cmd_print)

    p = _net_tool("statistics",
                  "weight statistics for BN'd connected/GRU layers "
                  "(darknet 'statistics')")
    p.set_defaults(fn=cmd_statistics)

    p = _net_tool("visualize",
                  "save per-conv filter grid mosaics "
                  "(darknet 'visualize')")
    p.add_argument("--prefix", default=".", help="output directory")
    p.set_defaults(fn=cmd_visualize)

    p = _net_tool("mkimg",
                  "collages ghost-pasted from first-conv filters "
                  "(darknet 'mkimg')")
    p.add_argument("--height", type=int, default=416)
    p.add_argument("--width", type=int, default=416)
    p.add_argument("--num", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prefix", default=".", help="output directory")
    p.set_defaults(fn=cmd_mkimg)

    p = sub.add_parser("serve-http",
                       help="HTTP detection server with dynamic "
                            "micro-batching (POST /detect, GET /healthz, "
                            "GET /stats)")
    _add_model_args(p)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch", type=int, default=8,
                   help="compiled batch size requests coalesce into")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="batching window after the first request")
    p.add_argument("--max-canvas", type=int, default=1024,
                   help="largest on-device canvas bucket; bigger images "
                        "are host-downscaled first")
    p.add_argument("--max-body-mb", type=int, default=32,
                   help="per-request POST body cap in MiB (413 beyond it) "
                        "— bounds host memory per request")
    p.add_argument("--queue-depth", type=int, default=64,
                   help="max requests waiting for a batch slot; beyond it "
                        "requests are shed immediately with 503 + "
                        "Retry-After")
    p.set_defaults(fn=cmd_serve_http)

    p = sub.add_parser("imtest",
                       help="image-op self test (darknet 'imtest')")
    p.add_argument("--image", required=True)
    p.add_argument("--prefix", default=".", help="output directory")
    p.set_defaults(fn=cmd_imtest)

    p = sub.add_parser("3d",
                       help="stereo anaglyph composite (darknet '3d')")
    p.add_argument("image_a")
    p.add_argument("image_b")
    p.add_argument("--delta", type=int, default=0)
    p.add_argument("--out", default="out.png")
    p.set_defaults(fn=cmd_3d)

    args = ap.parse_args(argv)
    if getattr(args, "data", None):
        from .io.datacfg import apply_data_cfg
        apply_data_cfg(args, args.fn.__name__.replace("cmd_", ""))
    if args.fn is cmd_train and not args.list:
        ap.error("train needs --list (or a --data file with train=)")
    if args.xla_dump:
        from .utils.profiling import enable_xla_dump
        enable_xla_dump(args.xla_dump)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.trace:
        from .utils.profiling import device_trace
        with device_trace(args.trace):
            rc = args.fn(args)
        print(f"profiler trace written to {args.trace}", file=sys.stderr)
        return rc
    return args.fn(args)


if __name__ == "__main__":
    main()
