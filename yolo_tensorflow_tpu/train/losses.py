"""Training losses with darknet-exact gradients.

v3: the semantics of src/yolo_layer.c:132-240 (forward_yolo_layer /
delta_yolo_box / delta_yolo_class). Darknet builds a ``delta`` tensor
(target - output, on the *activated* outputs for xy/obj/class and on the
raw logits for tw/th) and backpropagates it directly — skipping the logistic
derivative — which makes its effective gradient w.r.t. the raw feature map
exactly ``-delta``. We reproduce that bit-for-bit with a linear surrogate:

    loss_grad_surrogate = -sum(stop_gradient(delta) * raw)

whose gradient w.r.t. ``raw`` is ``-delta``; the *reported* cost is
``sum(delta^2)`` like darknet's ``*(l.cost) = pow(mag_array(l.delta),2)``.

v2 (darknet, default): src/region_layer.c:158 forward_region_layer —
noobject deltas with ignore threshold, the seen<12800 bias-matching warmup,
per-truth best-anchor assignment with bias_match, rescore objectness, and
softmax-class deltas. Same -delta gradient contract as v3.

v2 (tf variant): the TF reference's training contract,
YOLO_V2/.../Loss.py:10-79 — weighted MSE in (sigmoid-xy, sqrt-wh) space with
best-IoU anchor masking. This one is an ordinary differentiable loss.

v1: src/detection_layer.c:50 forward_detection_layer — MSE deltas on the raw
FC outputs with per-cell best-box responsibility (IoU, rmse fallback),
rescore, and sqrt-wh encoding. Gradient is -delta (backward_detection_layer
axpy's delta straight into net.delta).

Everything is batched, static-shape (truths padded to ``max_boxes`` with
w==0 sentinels, matching darknet's ``if(!truth.x) break`` convention), and
jit/pjit friendly (fori_loop scatters, no dynamic shapes).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax


def _box_iou_xywh(a, b):
    """IoU of boxes in (cx, cy, w, h); broadcasts."""
    ax0, ay0 = a[..., 0] - a[..., 2] / 2, a[..., 1] - a[..., 3] / 2
    ax1, ay1 = a[..., 0] + a[..., 2] / 2, a[..., 1] + a[..., 3] / 2
    bx0, by0 = b[..., 0] - b[..., 2] / 2, b[..., 1] - b[..., 3] / 2
    bx1, by1 = b[..., 0] + b[..., 2] / 2, b[..., 1] + b[..., 3] / 2
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = iw * ih
    union = a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter
    return inter / jnp.maximum(union, 1e-9)


# --------------------------------------------------------------------------
# YOLOv3 loss (yolo_layer.c semantics)
# --------------------------------------------------------------------------

def _v3_scale_delta(raw, truths, anchors_all, mask, input_size,
                    ignore_thresh, truth_thresh, num_classes,
                    truth_assign: str = "vectorized"):
    """Per-scale delta for one image.

    raw: (G, G, A*(5+C)) raw conv output (NHWC cell layout, anchor-major).
    truths: (T, 5) normalized (cx, cy, w, h, class); w==0 rows are padding.
    anchors_all: (N, 2) full anchor table in pixels; mask: indices owned by
    this scale.
    Returns (delta, metrics) with delta shaped like raw reshaped to
    (G, G, A, 5+C).
    """
    G = raw.shape[0]
    A, C = len(mask), num_classes
    T = truths.shape[0]
    p = raw.reshape(G, G, A, 5 + C)

    txy = jax.nn.sigmoid(p[..., 0:2])
    tobj = jax.nn.sigmoid(p[..., 4])
    tcls = jax.nn.sigmoid(p[..., 5:])

    # decoded pred boxes, normalized (get_yolo_box, yolo_layer.c:85-91)
    col = lax.broadcasted_iota(jnp.float32, (G, G, A), 1)
    row = lax.broadcasted_iota(jnp.float32, (G, G, A), 0)
    anchors_px = anchors_all[jnp.asarray(mask)]
    bx = (col + txy[..., 0]) / G
    by = (row + txy[..., 1]) / G
    # clamp exp so a transiently large logit can't overflow the IoU math
    # (darknet runs the same risk but at its lr never trips it)
    bw = jnp.exp(jnp.minimum(p[..., 2], 10.0)) * anchors_px[:, 0] / input_size
    bh = jnp.exp(jnp.minimum(p[..., 3], 10.0)) * anchors_px[:, 1] / input_size
    pred = jnp.stack([bx, by, bw, bh], -1)                     # (G,G,A,4)

    tvalid = truths[:, 2] > 0                                  # (T,)
    # best IoU of each pred vs any truth (yolo_layer.c:166-176)
    ious = _box_iou_xywh(pred[:, :, :, None, :], truths[None, None, None, :, :4])
    ious = jnp.where(tvalid[None, None, None, :], ious, -1.0)
    best_iou = jnp.max(ious, axis=-1)                          # (G,G,A)

    delta = jnp.zeros((G, G, A, 5 + C), jnp.float32)
    # noobj delta everywhere, zeroed where best_iou > ignore (yolo:178-183)
    dobj = jnp.where(best_iou > ignore_thresh, 0.0, 0.0 - tobj)
    delta = delta.at[..., 4].set(dobj)
    # (truth_thresh branch, yolo:184-193 — default 1.0 so normally inert,
    # implemented for cfg parity)
    if truth_thresh < 1.0:
        best_t = jnp.argmax(ious, axis=-1)
        over = best_iou > truth_thresh
        t_sel = truths[best_t]                                 # (G,G,A,5)
        cls_sel = t_sel[..., 4].astype(jnp.int32)
        onehot = jax.nn.one_hot(cls_sel, C)
        delta = delta.at[..., 4].set(jnp.where(over, 1.0 - tobj, delta[..., 4]))
        dcls = jnp.where(over[..., None], onehot - tcls, 0.0)
        delta = delta.at[..., 5:].add(dcls)

    # per-truth assignment (yolo_layer.c:196-240): best anchor over the FULL
    # table by wh-only IoU; only applied if it belongs to this scale's mask.
    mask_arr = jnp.asarray(mask, jnp.int32)
    anchors_norm = anchors_all / input_size                    # normalized wh

    if truth_assign == "vectorized":
        return _assign_vectorized(
            delta, truths, anchors_all, anchors_norm, mask_arr, G, A, C,
            input_size, txy, p, tobj, tcls, pred)

    def per_truth(k, state):
        delta, n_assigned, iou_sum, obj_sum, cls_sum = state
        t = truths[k]
        valid = t[2] > 0
        wh_iou = _box_iou_xywh(
            jnp.concatenate([jnp.zeros(2), t[2:4]])[None, :],
            jnp.concatenate([jnp.zeros_like(anchors_norm), anchors_norm], -1))
        best_n = jnp.argmax(wh_iou)
        in_scale = jnp.any(mask_arr == best_n)
        slot = jnp.argmax(mask_arr == best_n)                  # anchor slot here
        ci = jnp.clip((t[0] * G).astype(jnp.int32), 0, G - 1)
        cj = jnp.clip((t[1] * G).astype(jnp.int32), 0, G - 1)
        do = valid & in_scale

        scale = 2.0 - t[2] * t[3]
        tx = t[0] * G - ci
        ty = t[1] * G - cj
        tw = jnp.log(jnp.maximum(t[2] * input_size / anchors_all[best_n, 0], 1e-9))
        th = jnp.log(jnp.maximum(t[3] * input_size / anchors_all[best_n, 1], 1e-9))
        dbox = jnp.stack([
            scale * (tx - txy[cj, ci, slot, 0]),
            scale * (ty - txy[cj, ci, slot, 1]),
            scale * (tw - p[cj, ci, slot, 2]),
            scale * (th - p[cj, ci, slot, 3]),
        ])
        cls = t[4].astype(jnp.int32)
        donehot = jax.nn.one_hot(cls, C) - tcls[cj, ci, slot]

        cur = delta[cj, ci, slot]
        new = jnp.concatenate([dbox, (1.0 - tobj[cj, ci, slot])[None], donehot])
        delta = delta.at[cj, ci, slot].set(jnp.where(do, new, cur))

        # metrics (Avg IOU / Obj / Class, yolo_layer.c:241)
        iou_k = _box_iou_xywh(pred[cj, ci, slot], t[:4])
        n_assigned = n_assigned + do.astype(jnp.float32)
        iou_sum = iou_sum + jnp.where(do, iou_k, 0.0)
        obj_sum = obj_sum + jnp.where(do, tobj[cj, ci, slot], 0.0)
        cls_sum = cls_sum + jnp.where(do, tcls[cj, ci, slot, cls], 0.0)
        return delta, n_assigned, iou_sum, obj_sum, cls_sum

    delta, n_assigned, iou_sum, obj_sum, cls_sum = lax.fori_loop(
        0, T, per_truth, (delta, jnp.float32(0), jnp.float32(0),
                          jnp.float32(0), jnp.float32(0)))
    metrics = {"count": n_assigned, "iou_sum": iou_sum,
               "obj_sum": obj_sum, "cls_sum": cls_sum,
               "avg_anyobj": jnp.mean(tobj)}
    return delta, metrics


def _assign_vectorized(delta, truths, anchors_all, anchors_norm, mask_arr,
                       G, A, C, input_size, txy, p, tobj, tcls, pred):
    """Vectorized twin of the sequential per-truth assignment scan.

    The C walks truths in order and *overwrites* the owning
    (cell, anchor-slot)'s delta (yolo_layer.c:196-240), so a truth loses to
    any LATER truth mapping to the same slot. This form computes every
    truth's row at once, resolves collisions with an explicit
    last-writer-wins mask (a (T, T) comparison — T is ~90), and applies the
    winners in one scatter, replacing T sequential dynamic-update-slices
    with one MXU/VPU-friendly batch. Per-row math is elementwise the same
    as the scan's — deltas agree to 1 ulp (XLA fuses the two forms
    differently); the metric SUMS are reassociated (jnp.sum vs sequential
    +=), differing only in f32 rounding.
    """
    T = truths.shape[0]
    t = truths                                                 # (T, 5)
    valid = t[:, 2] > 0
    wh = jnp.concatenate([jnp.zeros((T, 2)), t[:, 2:4]], -1)   # (T, 4)
    anc = jnp.concatenate(
        [jnp.zeros_like(anchors_norm), anchors_norm], -1)      # (N, 4)
    wh_iou = _box_iou_xywh(wh[:, None, :], anc[None, :, :])    # (T, N)
    best_n = jnp.argmax(wh_iou, axis=-1)                       # (T,)
    hit = mask_arr[None, :] == best_n[:, None]                 # (T, A)
    in_scale = jnp.any(hit, axis=-1)
    slot = jnp.argmax(hit, axis=-1)
    ci = jnp.clip((t[:, 0] * G).astype(jnp.int32), 0, G - 1)
    cj = jnp.clip((t[:, 1] * G).astype(jnp.int32), 0, G - 1)
    do = valid & in_scale

    scale = 2.0 - t[:, 2] * t[:, 3]
    tx = t[:, 0] * G - ci
    ty = t[:, 1] * G - cj
    tw = jnp.log(jnp.maximum(t[:, 2] * input_size / anchors_all[best_n, 0],
                             1e-9))
    th = jnp.log(jnp.maximum(t[:, 3] * input_size / anchors_all[best_n, 1],
                             1e-9))
    txy_sel = txy[cj, ci, slot]                                # (T, 2)
    p_sel = p[cj, ci, slot]                                    # (T, 5+C)
    tobj_sel = tobj[cj, ci, slot]                              # (T,)
    tcls_sel = tcls[cj, ci, slot]                              # (T, C)
    dbox = jnp.stack([
        scale * (tx - txy_sel[:, 0]),
        scale * (ty - txy_sel[:, 1]),
        scale * (tw - p_sel[:, 2]),
        scale * (th - p_sel[:, 3]),
    ], -1)
    cls = t[:, 4].astype(jnp.int32)
    donehot = jax.nn.one_hot(cls, C) - tcls_sel
    new = jnp.concatenate([dbox, (1.0 - tobj_sel)[:, None], donehot], -1)

    key = (cj * G + ci) * A + slot
    kk = lax.broadcasted_iota(jnp.int32, (T, T), 0)
    k2 = lax.broadcasted_iota(jnp.int32, (T, T), 1)
    beaten = jnp.any((key[None, :] == key[:, None]) & (k2 > kk) & do[None, :],
                     axis=-1)
    win = do & ~beaten
    # losers are routed out of bounds and dropped by the scatter
    delta = delta.at[jnp.where(win, cj, G), jnp.where(win, ci, G),
                     jnp.where(win, slot, A)].set(new, mode="drop")

    # metrics accumulate for EVERY applied truth, overwritten or not,
    # exactly like the C's running sums (yolo_layer.c:232-238)
    iou_k = _box_iou_xywh(pred[cj, ci, slot], t[:, :4])        # (T,)
    dof = do.astype(jnp.float32)
    metrics = {"count": jnp.sum(dof),
               "iou_sum": jnp.sum(jnp.where(do, iou_k, 0.0)),
               "obj_sum": jnp.sum(jnp.where(do, tobj_sel, 0.0)),
               "cls_sum": jnp.sum(jnp.where(do, tcls_sel[jnp.arange(T), cls],
                                            0.0)),
               "avg_anyobj": jnp.mean(tobj)}
    return delta, metrics


def yolo_v3_loss(raw_scales, truths, cfg, *, anchor_masks,
                 ignore_thresh=0.5, truth_thresh=1.0,
                 truth_assign: str = "vectorized"):
    """Full v3 loss over all FPN scales.

    raw_scales: list of (B, G, G, A*(5+C)) raw feature maps (spec order).
    truths: (B, T, 5) normalized (cx, cy, w, h, class), w==0 padding.
    Returns (loss, metrics); ``loss`` backpropagates darknet's exact delta,
    its *value* is sum(delta^2) (darknet's printed cost), metrics mirror the
    Region-line stats (yolo_layer.c:241). ``truth_assign`` selects the
    one-shot scatter with an explicit last-writer-wins mask ("vectorized",
    the default — the TPU-idiomatic form, measured 430 vs 368 img/s
    full-step at 416/batch-128, tools/sweep_train.py) or the sequential
    per-truth fori-loop ("scan", the literal yolo_layer.c form kept as the
    transcription reference) — deltas agree to 1 ulp, metric sums differ
    only by f32 reassociation (tests/test_losses.py).
    """
    anchors_all = jnp.asarray(cfg.anchors, jnp.float32)
    total_cost = 0.0
    surrogate = 0.0
    agg = None
    batch = raw_scales[0].shape[0]
    for raw, mask in zip(raw_scales, anchor_masks):
        fn = functools.partial(
            _v3_scale_delta, anchors_all=anchors_all, mask=tuple(mask),
            input_size=cfg.input_size, ignore_thresh=ignore_thresh,
            truth_thresh=truth_thresh, num_classes=cfg.num_classes,
            truth_assign=truth_assign)
        delta, m = jax.vmap(fn)(raw, truths)
        delta = lax.stop_gradient(delta)
        # 1/batch: darknet applies learning_rate/batch at update time
        # (src/convolutional_layer.c update_convolutional_layer), so the
        # per-weight step matches darknet at the same configured lr
        surrogate = surrogate - jnp.sum(
            delta.reshape(batch, -1) * raw.reshape(batch, -1)) / batch
        total_cost = total_cost + jnp.sum(jnp.square(delta))
        agg = m if agg is None else {k: agg[k] + m[k] for k in m}
    count = jnp.maximum(jnp.sum(agg["count"]), 1.0)
    metrics = {
        "cost": total_cost,
        "avg_iou": jnp.sum(agg["iou_sum"]) / count,
        "avg_obj": jnp.sum(agg["obj_sum"]) / count,
        "avg_cat": jnp.sum(agg["cls_sum"]) / count,
        "count": jnp.sum(agg["count"]),
    }
    # value = darknet cost; gradient = darknet -delta (via the surrogate)
    loss = surrogate - lax.stop_gradient(surrogate) + lax.stop_gradient(total_cost)
    return loss, metrics


# --------------------------------------------------------------------------
# YOLOv2 loss (Loss.py semantics)
# --------------------------------------------------------------------------

def build_v2_targets(truths, cfg, grid: int):
    """Build the (coords, confs, probs) target tensors Loss.py consumes from
    padded truth boxes. For each valid truth: the owning cell gets, at every
    anchor slot, coords=(cell-offset x, y, sqrt image-w, sqrt image-h),
    conf=1, one-hot probs. (The best-anchor selection happens inside the
    loss via the IoU mask, matching Loss.py:63-66.)"""
    H = W = grid
    A, C = cfg.num_anchors, cfg.num_classes
    B, T, _ = truths.shape

    def one(truth_img):
        coords = jnp.zeros((H * W, A, 4), jnp.float32)
        confs = jnp.zeros((H * W, A), jnp.float32)
        probs = jnp.zeros((H * W, A, C), jnp.float32)

        def body(k, state):
            coords, confs, probs = state
            t = truth_img[k]
            valid = t[2] > 0
            ci = jnp.clip((t[0] * W).astype(jnp.int32), 0, W - 1)
            cj = jnp.clip((t[1] * H).astype(jnp.int32), 0, H - 1)
            cell = cj * W + ci
            xy = jnp.stack([t[0] * W - ci, t[1] * H - cj])
            wh = jnp.sqrt(jnp.maximum(t[2:4], 1e-9))
            row = jnp.concatenate([xy, wh])
            onehot = jax.nn.one_hot(t[4].astype(jnp.int32), C)
            coords = coords.at[cell].set(
                jnp.where(valid, jnp.broadcast_to(row, (A, 4)), coords[cell]))
            confs = confs.at[cell].set(jnp.where(valid, 1.0, confs[cell]))
            probs = probs.at[cell].set(
                jnp.where(valid, jnp.broadcast_to(onehot, (A, C)), probs[cell]))
            return coords, confs, probs

        return lax.fori_loop(0, T, body, (coords, confs, probs))

    coords, confs, probs = jax.vmap(one)(truths)
    return {"coords": coords, "confs": confs, "probs": probs}


def yolo_v2_loss(raw, targets, cfg, *, grid: int = 13,
                 scales=(1.0, 5.0, 1.0, 1.0)):
    """Loss.py:10-79 semantics. raw: (B, H, W, A*(5+C)); targets from
    build_v2_targets. scales = (sprob, sconf, snoob, scoor) — Loss.py's
    per-term weights."""
    H = W = grid
    A, C = cfg.num_anchors, cfg.num_classes
    B = raw.shape[0]
    sprob, sconf, snoob, scoor = scales
    anchors = jnp.asarray(cfg.anchors, jnp.float32).reshape(1, 1, A, 2)

    p = raw.reshape(B, H * W, A, 5 + C)
    coords_xy = jax.nn.sigmoid(p[..., 0:2])
    coords_wh = jnp.sqrt(jnp.exp(p[..., 2:4]) * anchors /
                         jnp.asarray([W, H], jnp.float32))
    coords = jnp.concatenate([coords_xy, coords_wh], -1)
    confs = jax.nn.sigmoid(p[..., 4:5])
    probs = jax.nn.softmax(p[..., 5:], axis=-1)

    _coords = targets["coords"]
    _confs = targets["confs"]
    _probs = targets["probs"]

    # IoU between prediction and truth in (cell-xy, sqrt-wh) space
    def corners(c):
        wh = jnp.square(c[..., 2:4]) * jnp.asarray([W, H], jnp.float32)
        ctr = c[..., 0:2]
        return ctr - wh * 0.5, ctr + wh * 0.5, wh[..., 0] * wh[..., 1]

    ul, dr, area = corners(coords)
    _ul, _dr, _area = corners(_coords)
    iw = jnp.maximum(jnp.minimum(dr, _dr) - jnp.maximum(ul, _ul), 0.0)
    inter = iw[..., 0] * iw[..., 1]
    ious = inter / jnp.maximum(area + _area - inter, 1e-9)

    best = (ious >= jnp.max(ious, axis=2, keepdims=True)).astype(jnp.float32)
    mask = (best * _confs)[..., None]                      # (B,HW,A,1)

    confs_w = snoob * (1.0 - mask) + sconf * mask
    coords_w = scoor * mask
    probs_w = sprob * mask
    weights = jnp.concatenate(
        [jnp.broadcast_to(coords_w, coords.shape),
         jnp.broadcast_to(confs_w, confs.shape),
         jnp.broadcast_to(probs_w, probs.shape)], -1)

    preds = jnp.concatenate([coords, confs, probs], -1)
    truths_cat = jnp.concatenate([_coords, _confs[..., None], _probs], -1)
    per_image = jnp.sum(jnp.square(preds - truths_cat) * weights, axis=(1, 2, 3))
    loss = 0.5 * jnp.mean(per_image)
    return loss, {"cost": loss, "avg_iou": jnp.sum(ious * mask[..., 0]) /
                  jnp.maximum(jnp.sum(mask), 1.0)}


# --------------------------------------------------------------------------
# YOLOv2 darknet-C loss (region_layer.c semantics)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RegionHyper:
    """[region] section options (parse_region, src/parser.c:341-391).
    Defaults are upstream yolov2.cfg's trained values."""
    thresh: float = 0.6
    object_scale: float = 5.0
    noobject_scale: float = 1.0
    class_scale: float = 1.0
    coord_scale: float = 1.0
    bias_match: bool = True
    rescore: bool = True
    softmax: bool = True
    warmup_seen: int = 12800

    @classmethod
    def from_options(cls, opts):
        """Build from a parsed [region] cfg section dict."""
        kw = {}
        for field, key in [("thresh", "thresh"),
                           ("object_scale", "object_scale"),
                           ("noobject_scale", "noobject_scale"),
                           ("class_scale", "class_scale"),
                           ("coord_scale", "coord_scale")]:
            if key in opts:
                kw[field] = float(opts[key])
        for field, key in [("bias_match", "bias_match"),
                           ("rescore", "rescore"), ("softmax", "softmax")]:
            if key in opts:
                kw[field] = bool(int(opts[key]))
        return cls(**kw)


def _tree_tables(tree):
    """Static numpy tables for the traced tree-class delta: ancestor path
    matrix (n, depth+1, -1 padded) and each node's group id."""
    import numpy as np
    n = tree.n
    depth = tree.max_depth
    paths = np.full((n, depth + 1), -1, np.int32)
    for c in range(n):
        k, d = c, 0
        while k >= 0:
            paths[c, d] = k
            k = tree.parent[k]
            d += 1
    return paths, np.asarray(tree.group, np.int32)


def _tree_class_delta(cls_out, cls_id, scale, tree):
    """delta_region_class's softmax_tree branch (region_layer.c:112-128)
    for ONE anchor cell: walking up from ``cls_id``, every ancestor's
    sibling group gets delta scale*(target - out) where target is 1 on the
    path and 0 elsewhere; channels outside those groups stay 0.
    cls_out: (n,) group-softmaxed; cls_id traced int."""
    paths, group_ids = _tree_tables(tree)
    path = jnp.asarray(paths)[cls_id]                    # (depth+1,)
    valid = path >= 0
    pc = jnp.maximum(path, 0)
    onehot = jnp.zeros(tree.n).at[pc].add(
        valid.astype(jnp.float32))                        # path indicator
    pg = jnp.asarray(group_ids)[pc]                       # path groups
    gmask = jnp.zeros(tree.groups).at[pg].max(
        valid.astype(jnp.float32))
    mask = gmask[jnp.asarray(group_ids)]                  # (n,)
    return scale * (onehot - cls_out) * mask


def _region_delta(raw, truths, anchors, seen, hyper: RegionHyper,
                  num_classes: int, tree=None):
    """Per-image delta, transcribing forward_region_layer
    (src/region_layer.c:158-320). raw: (H, W, A*(5+C)) anchor-major per-cell
    blocks of (tx, ty, tw, th, obj, classes); truths: (T, 5) normalized
    (cx, cy, w, h, class) with w==0 tail padding (darknet stops at the first
    truth.x==0, data is tail-padded the same way); anchors: (A, 2) in grid
    units (l.biases); seen: traced image counter for the <12800 warmup.

    Darknet activates xy/obj with LOGISTIC and classes with softmax in-place
    (region_layer.c:163-185), then builds delta against the activated values
    without applying activation derivatives (backward_region_layer_gpu
    axpy's delta directly), so grad w.r.t. the raw map is exactly -delta.

    tree: a models.tree.SoftmaxTree enables the YOLO9000 softmax_tree
    branches — per-group class softmax, hierarchy class deltas, and the
    classification-only-image path (truth x > 1e5 sentinel).
    """
    H, W = raw.shape[0], raw.shape[1]
    A, C = anchors.shape[0], num_classes
    T = truths.shape[0]
    p = raw.reshape(H, W, A, 5 + C)

    sxy = jax.nn.sigmoid(p[..., 0:2])
    sobj = jax.nn.sigmoid(p[..., 4])
    if tree is not None:
        from yolo_tensorflow_tpu.models.tree import group_softmax
        cls_out = group_softmax(p[..., 5:], tree)
    elif hyper.softmax:
        cls_out = jax.nn.softmax(p[..., 5:], axis=-1)
    else:
        cls_out = jax.nn.sigmoid(p[..., 5:])

    # decoded pred boxes, normalized (get_region_box, region_layer.c:76-84)
    col = lax.broadcasted_iota(jnp.float32, (H, W, A), 1)
    row = lax.broadcasted_iota(jnp.float32, (H, W, A), 0)
    bx = (col + sxy[..., 0]) / W
    by = (row + sxy[..., 1]) / H
    bw = jnp.exp(jnp.minimum(p[..., 2], 10.0)) * anchors[:, 0] / W
    bh = jnp.exp(jnp.minimum(p[..., 3], 10.0)) * anchors[:, 1] / H
    pred = jnp.stack([bx, by, bw, bh], -1)                      # (H,W,A,4)

    tvalid = truths[:, 2] > 0
    ious = _box_iou_xywh(pred[:, :, :, None, :],
                         truths[None, None, None, :, :4])
    ious = jnp.where(tvalid[None, None, None, :], ious, -1.0)
    best_iou = jnp.max(ious, axis=-1)                           # (H,W,A)

    delta = jnp.zeros((H, W, A, 5 + C), jnp.float32)
    # noobj everywhere, zeroed above thresh (region_layer.c:243-250)
    dobj = jnp.where(best_iou > hyper.thresh, 0.0,
                     hyper.noobject_scale * (0.0 - sobj))
    delta = delta.at[..., 4].set(dobj)

    # bias-matching warmup (region_layer.c:256-263): while seen < 12800 every
    # box is pulled toward its cell-centered anchor with scale .01 —
    # tx=ty=.5, tw=th target log(1)=0 on the raw logits.
    warm = (seen < hyper.warmup_seen).astype(jnp.float32) * 0.01
    delta = delta.at[..., 0:2].set(warm * (0.5 - sxy))
    delta = delta.at[..., 2:4].set(warm * (0.0 - p[..., 2:4]))

    def per_truth(k, state):
        delta, met = state
        t = truths[k]
        valid = t[2] > 0
        ci = jnp.clip((t[0] * W).astype(jnp.int32), 0, W - 1)
        cj = jnp.clip((t[1] * H).astype(jnp.int32), 0, H - 1)

        # best anchor at the truth cell by origin-shifted IoU
        # (region_layer.c:272-290); bias_match compares anchor wh, else the
        # predicted wh at that cell.
        if hyper.bias_match:
            cand_wh = anchors / jnp.asarray([W, H], jnp.float32)     # (A,2)
        else:
            cand_wh = pred[cj, ci, :, 2:4]
        zeros = jnp.zeros((A, 2), jnp.float32)
        wh_iou = _box_iou_xywh(
            jnp.concatenate([jnp.zeros(2), t[2:4]])[None, :],
            jnp.concatenate([zeros, cand_wh], -1))
        best_n = jnp.argmax(wh_iou)

        # delta_region_box (region_layer.c:87-104) at (cj, ci, best_n)
        scale = hyper.coord_scale * (2.0 - t[2] * t[3])
        tx = t[0] * W - ci
        ty = t[1] * H - cj
        tw = jnp.log(jnp.maximum(t[2] * W / anchors[best_n, 0], 1e-9))
        th = jnp.log(jnp.maximum(t[3] * H / anchors[best_n, 1], 1e-9))
        dbox = jnp.stack([
            scale * (tx - sxy[cj, ci, best_n, 0]),
            scale * (ty - sxy[cj, ci, best_n, 1]),
            scale * (tw - p[cj, ci, best_n, 2]),
            scale * (th - p[cj, ci, best_n, 3]),
        ])
        iou = _box_iou_xywh(pred[cj, ci, best_n], t[:4])

        # objectness (region_layer.c:300-308)
        obj = sobj[cj, ci, best_n]
        dobj = hyper.object_scale * ((iou if hyper.rescore else 1.0) - obj)

        # class (delta_region_class, region_layer.c:112-139; tag=0 when
        # softmax, so the full one-hot row is written)
        cls = t[4].astype(jnp.int32)
        if tree is not None:
            dcls = _tree_class_delta(cls_out[cj, ci, best_n], cls,
                                     hyper.class_scale, tree)
        else:
            dcls = hyper.class_scale * (jax.nn.one_hot(cls, C) -
                                        cls_out[cj, ci, best_n])

        new = jnp.concatenate([dbox, dobj[None], dcls])
        cur = delta[cj, ci, best_n]
        delta = delta.at[cj, ci, best_n].set(jnp.where(valid, new, cur))

        do = valid.astype(jnp.float32)
        if tree is not None:
            # avg_cat accumulates the hierarchy path product (tree.c:27)
            paths, _ = _tree_tables(tree)
            path = jnp.asarray(paths)[cls]
            pvals = jnp.where(path >= 0,
                              cls_out[cj, ci, best_n, jnp.maximum(path, 0)],
                              1.0)
            cat = jnp.prod(pvals)
        else:
            cat = cls_out[cj, ci, best_n, cls]
        met = {
            "count": met["count"] + do,
            "iou_sum": met["iou_sum"] + do * iou,
            "recall": met["recall"] + do * (iou > 0.5),
            "obj_sum": met["obj_sum"] + do * obj,
            "cls_sum": met["cls_sum"] + do * cat,
        }
        return delta, met

    met0 = {k: jnp.float32(0) for k in
            ("count", "iou_sum", "recall", "obj_sum", "cls_sum")}
    delta, met = lax.fori_loop(0, T, per_truth, (delta, met0))

    if tree is not None:
        # YOLO9000 joint-training branch (region_layer.c:199-231): a truth
        # with x > 100000 marks a classification-only image — noobject
        # deltas everywhere (no ignore-thresh, no warmup, no box deltas),
        # tree class delta at the single (cell, anchor) whose
        # obj*hierarchy_prob(class) is highest, obj delta zeroed there.
        oc = truths[:, 0] > 1e5
        has_oc = jnp.any(oc)
        oc_cls = truths[jnp.argmax(oc), 4].astype(jnp.int32)
        paths, _ = _tree_tables(tree)
        path = jnp.asarray(paths)[oc_cls]
        pvals = jnp.where(path >= 0,
                          cls_out[..., jnp.maximum(path, 0)], 1.0)
        hprob = jnp.prod(pvals, axis=-1)                    # (H,W,A)
        score = sobj * hprob
        flat = jnp.argmax(score.reshape(-1))
        mj, mi, mn = jnp.unravel_index(flat, score.shape)
        d_only = jnp.zeros_like(delta)
        d_only = d_only.at[..., 4].set(hyper.noobject_scale * (0.0 - sobj))
        d_only = d_only.at[mj, mi, mn, 4].set(0.0)
        dcls = _tree_class_delta(cls_out[mj, mi, mn], oc_cls,
                                 hyper.class_scale, tree)
        d_only = d_only.at[mj, mi, mn, 5:].set(dcls)
        delta = jnp.where(has_oc, d_only, delta)
        met_only = dict(met0, cls_sum=hprob[mj, mi, mn])
        met = {k: jnp.where(has_oc, met_only[k], met[k]) for k in met}

    met["avg_anyobj"] = jnp.mean(sobj)
    return delta, met


def yolo_v2_region_loss(raw, truths, cfg, *, seen=None,
                        hyper: RegionHyper = RegionHyper(), tree=None):
    """Darknet-exact v2 training loss (forward_region_layer,
    src/region_layer.c:158). raw: (B, H, W, A*(5+C)); truths: (B, T, 5)
    normalized with w==0 padding; seen: images processed so far (traced ok),
    drives the <12800 bias-match warmup — None means past warmup.
    cfg.anchors must be in grid units (anchor_units == 'grid').

    Returns (loss, metrics): loss value is sum(delta^2) (darknet's
    *(l.cost) = pow(mag_array(l.delta),2)) and its gradient w.r.t. raw is
    -delta/batch via the linear surrogate; metrics mirror the Region
    stat line (region_layer.c:319)."""
    B = raw.shape[0]
    anchors = jnp.asarray(cfg.anchors, jnp.float32)
    seen_v = jnp.asarray(hyper.warmup_seen if seen is None else seen,
                         jnp.int32)
    num_out = tree.n if tree is not None else cfg.num_classes
    fn = functools.partial(_region_delta, anchors=anchors, seen=seen_v,
                           hyper=hyper, num_classes=num_out, tree=tree)
    delta, met = jax.vmap(fn)(raw, truths)
    delta = lax.stop_gradient(delta)
    # 1/batch: darknet applies learning_rate/batch at update time
    surrogate = -jnp.sum(delta.reshape(B, -1) * raw.reshape(B, -1)) / B
    cost = jnp.sum(jnp.square(delta))
    count = jnp.maximum(jnp.sum(met["count"]), 1.0)
    metrics = {
        "cost": cost,
        "avg_iou": jnp.sum(met["iou_sum"]) / count,
        "avg_cat": jnp.sum(met["cls_sum"]) / count,
        "avg_obj": jnp.sum(met["obj_sum"]) / count,
        "avg_anyobj": jnp.mean(met["avg_anyobj"]),
        "recall": jnp.sum(met["recall"]) / count,
        "count": jnp.sum(met["count"]),
    }
    loss = surrogate - lax.stop_gradient(surrogate) + lax.stop_gradient(cost)
    return loss, metrics


# --------------------------------------------------------------------------
# YOLOv1 loss (detection_layer.c semantics)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DetectionHyper:
    """[detection] section options (parse_detection, src/parser.c:393-415).
    Defaults are upstream yolov1.cfg's trained values. ``forced`` pins
    responsibility by truth area (detection_layer.c:137-142); ``random``
    randomizes it while seen<64000 (:143-145) — drawn from a counter-keyed
    PRNG rather than the C's global rand() stream (same distribution,
    reproducible). Both default to 0 in every shipped v1 cfg."""
    object_scale: float = 1.0
    noobject_scale: float = 0.5
    class_scale: float = 1.0
    coord_scale: float = 5.0
    sqrt: bool = True
    rescore: bool = True
    softmax: bool = False
    forced: bool = False
    random: bool = False

    @classmethod
    def from_options(cls, opts):
        kw = {}
        for field in ("object_scale", "noobject_scale", "class_scale",
                      "coord_scale"):
            if field in opts:
                kw[field] = float(opts[field])
        for field in ("sqrt", "rescore", "softmax", "forced", "random"):
            if field in opts:
                kw[field] = bool(int(opts[field]))
        return cls(**kw)


def build_v1_truth_grid(truths, num_classes: int, side: int):
    """(B, T, 5) padded truths -> (B, S*S, 1+C+4) dense grid targets,
    transcribing fill_truth_region (src/data.c:254-300): per box, cell
    (col,row) = int(xy*S); first box per cell wins; boxes with w or h < .005
    skipped; row layout [is_obj, one-hot classes, x-cell-offset,
    y-cell-offset, w, h]."""
    S, C = side, num_classes
    B, T, _ = truths.shape

    def one(tr):
        grid = jnp.zeros((S * S, 1 + C + 4), jnp.float32)

        def body(k, grid):
            t = tr[k]
            valid = (t[2] >= 0.005) & (t[3] >= 0.005)
            col = jnp.clip((t[0] * S).astype(jnp.int32), 0, S - 1)
            row = jnp.clip((t[1] * S).astype(jnp.int32), 0, S - 1)
            cell = row * S + col
            free = grid[cell, 0] == 0.0
            onehot = jax.nn.one_hot(t[4].astype(jnp.int32), C)
            rowvec = jnp.concatenate([
                jnp.ones(1), onehot,
                jnp.stack([t[0] * S - col, t[1] * S - row, t[2], t[3]])])
            return grid.at[cell].set(
                jnp.where(valid & free, rowvec, grid[cell]))

        return lax.fori_loop(0, T, body, grid)

    return jax.vmap(one)(truths)


def _v1_delta(pred, truth_grid, rand_idx, use_random,
              hyper: DetectionHyper, side: int,
              num_boxes: int, num_classes: int):
    """Per-image delta, transcribing forward_detection_layer
    (src/detection_layer.c:50-222). pred: flat (S*S*C + S*S*n + S*S*n*4)
    raw FC output in darknet order [class probs | confidences | boxes];
    truth_grid: (S*S, 1+C+4) from build_v1_truth_grid; rand_idx (locs,)
    int32 + use_random (scalar bool) drive the ``random`` responsibility
    override (detection_layer.c:143-145)."""
    S, n, C = side, num_boxes, num_classes
    locs = S * S
    probs = pred[:locs * C].reshape(locs, C)
    if hyper.softmax:
        probs = jax.nn.softmax(probs, axis=-1)
    confs = pred[locs * C:locs * (C + n)].reshape(locs, n)
    boxes = pred[locs * (C + n):].reshape(locs, n, 4)

    is_obj = truth_grid[:, 0]                                    # (locs,)
    t_cls = truth_grid[:, 1:1 + C]                               # (locs,C)
    t_box = truth_grid[:, 1 + C:]                                # (locs,4)

    # class deltas for object cells (detection_layer.c:98-104)
    dprobs = hyper.class_scale * (t_cls - probs) * is_obj[:, None]

    # responsibility: per object cell pick best of n boxes by IoU, falling
    # back to rmse while every IoU is zero (detection_layer.c:106-136).
    # Boxes compared with xy as cell-offset/side and (optionally squared) wh.
    truth_cmp = jnp.concatenate(
        [t_box[:, 0:2] / S, t_box[:, 2:4]], -1)                  # (locs,4)
    wh = jnp.square(boxes[..., 2:4]) if hyper.sqrt else boxes[..., 2:4]
    out_cmp = jnp.concatenate([boxes[..., 0:2] / S, wh], -1)     # (locs,n,4)
    ious = _box_iou_xywh(out_cmp, truth_cmp[:, None, :])         # (locs,n)
    rmses = jnp.sqrt(jnp.sum(jnp.square(out_cmp - truth_cmp[:, None, :]),
                             -1))

    # sequential argmax replicating the C scan: once any iou > 0 has been
    # seen the rmse branch is dead; best_index starts -1 (C would index OOB;
    # with rmse init 20 that needs rmse >= 20 on every box — we clamp to 0).
    best_index = jnp.full((locs,), -1, jnp.int32)
    best_iou = jnp.zeros((locs,))
    best_rmse = jnp.full((locs,), 20.0)
    for j in range(n):
        iou_j, rmse_j = ious[:, j], rmses[:, j]
        cond = (best_iou > 0) | (iou_j > 0)
        pick = jnp.where(cond, iou_j > best_iou, rmse_j < best_rmse)
        best_index = jnp.where(pick, j, best_index)
        best_iou = jnp.where(pick & cond, iou_j, best_iou)
        best_rmse = jnp.where(pick & ~cond, rmse_j, best_rmse)
    best = jnp.maximum(best_index, 0)

    # responsibility overrides (applied BEFORE sel/iou/conf like the C,
    # which recomputes out/iou from the overridden box_index):
    # forced (detection_layer.c:137-142): small truths -> box 1, else box 0;
    # random (:143-145): uniform draw while seen < 64000
    if hyper.forced:
        best = jnp.where(t_box[:, 2] * t_box[:, 3] < 0.1, 1, 0) \
            .astype(jnp.int32)
    if hyper.random:
        best = jnp.where(use_random, rand_idx, best)

    sel = jax.nn.one_hot(best, n) * is_obj[:, None]              # (locs,n)
    iou_best = jnp.take_along_axis(ious, best[:, None], 1)[:, 0]
    conf_best = jnp.take_along_axis(confs, best[:, None], 1)[:, 0]

    # confidence deltas: noobject everywhere, object/rescore at the
    # responsible box (detection_layer.c:85, :160-168)
    dconfs = hyper.noobject_scale * (0.0 - confs)
    tgt = iou_best if hyper.rescore else jnp.ones_like(iou_best)
    dconfs = jnp.where(sel > 0,
                       (hyper.object_scale * (tgt - conf_best))[:, None],
                       dconfs)

    # coord deltas at the responsible box (detection_layer.c:170-177);
    # sqrt: targets are sqrt(w),sqrt(h) against the raw outputs
    twh = jnp.sqrt(t_box[:, 2:4]) if hyper.sqrt else t_box[:, 2:4]
    t_enc = jnp.concatenate([t_box[:, 0:2], twh], -1)            # (locs,4)
    dboxes = hyper.coord_scale * (t_enc[:, None, :] - boxes) * sel[..., None]

    delta = jnp.concatenate(
        [dprobs.reshape(-1), dconfs.reshape(-1), dboxes.reshape(-1)])
    met = {
        "count": jnp.sum(is_obj),
        "iou_sum": jnp.sum(iou_best * is_obj),
        "cat_sum": jnp.sum(probs * t_cls * is_obj[:, None]),
        "allcat_sum": jnp.sum(probs * is_obj[:, None]),
        "obj_sum": jnp.sum(conf_best * is_obj),
        "anyobj_sum": jnp.sum(confs),
    }
    return delta, met


def yolo_v1_loss(pred_flat, truths, cfg, *,
                 hyper: DetectionHyper = DetectionHyper(), seen=None):
    """Darknet-exact v1 training loss (forward_detection_layer,
    src/detection_layer.c:50). pred_flat: (B, S*S*(C+n*5)) raw FC output;
    truths: (B, T, 5) normalized padded boxes (converted to the dense grid
    internally). Loss value is sum(delta^2), gradient -delta/batch.
    ``seen`` (traced images-processed counter) gates hyper.random's
    while-seen<64000 responsibility draw."""
    B = pred_flat.shape[0]
    S, n, C = cfg.grid, cfg.boxes_per_cell, cfg.num_classes
    grid = build_v1_truth_grid(truths, C, S)
    if hyper.random:
        if seen is None:
            raise ValueError(
                "hyper.random=True needs the `seen` counter: it seeds the "
                "per-step responsibility draw and gates the seen<64000 "
                "warmup (detection_layer.c:143-145); without it every step "
                "would reuse one fixed pseudo-random pattern forever")
        s = jnp.asarray(seen)
        key = jax.random.PRNGKey(s.astype(jnp.int32))
        rand_idx = jax.random.randint(key, (B, S * S), 0, n, jnp.int32)
        use_random = jnp.broadcast_to(s < 64000, (B,))
    else:
        rand_idx = jnp.zeros((B, S * S), jnp.int32)
        use_random = jnp.zeros((B,), bool)
    fn = functools.partial(_v1_delta, hyper=hyper, side=S, num_boxes=n,
                           num_classes=C)
    delta, met = jax.vmap(fn)(pred_flat.astype(jnp.float32), grid,
                              rand_idx, use_random)
    delta = lax.stop_gradient(delta)
    surrogate = -jnp.sum(delta * pred_flat.astype(jnp.float32)) / B
    cost = jnp.sum(jnp.square(delta))
    count = jnp.maximum(jnp.sum(met["count"]), 1.0)
    metrics = {
        "cost": cost,
        "avg_iou": jnp.sum(met["iou_sum"]) / count,
        "avg_cat": jnp.sum(met["cat_sum"]) / count,
        "avg_allcat": jnp.sum(met["allcat_sum"]) / (count * C),
        "avg_obj": jnp.sum(met["obj_sum"]) / count,
        "avg_anyobj": jnp.sum(met["anyobj_sum"]) / (B * S * S * n),
        "count": jnp.sum(met["count"]),
    }
    loss = surrogate - lax.stop_gradient(surrogate) + lax.stop_gradient(cost)
    return loss, metrics


# --------------------------------------------------------------------------
# Classifier loss (darknet cost/softmax layers, examples/classifier.c)
# --------------------------------------------------------------------------

def classifier_loss(logits_or_probs, labels, *, from_probs: bool = True):
    """Softmax cross-entropy for head=0 models. Our classifier specs end in
    an explicit Softmax layer (matching darknet's [softmax]+[cost]), so by
    default this consumes probabilities; pass from_probs=False for raw
    logits. labels: (B,) int class ids. Returns (loss, metrics)."""
    if from_probs:
        logp = jnp.log(jnp.maximum(logits_or_probs, 1e-12))
    else:
        logp = jax.nn.log_softmax(logits_or_probs, axis=-1)
    B = labels.shape[0]
    nll = -logp[jnp.arange(B), labels]
    loss = jnp.mean(nll)
    acc = jnp.mean((jnp.argmax(logp, -1) == labels).astype(jnp.float32))
    return loss, {"cost": loss, "accuracy": acc}
