"""YOLO9000 softmax-tree (WordTree) — src/tree.c + the region layer's
softmax_tree branches (src/region_layer.c:173-181 group softmax, :413-424
tree decode; delta_region_class's hierarchy walk for the loss).

File format (read_tree, tree.c:82): one node per line, "name parent_index";
runs of consecutive nodes sharing a parent form a GROUP (a softmax over
siblings). parent index < node index always, so path products can cascade
in index order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SoftmaxTree:
    """Static tree tables. Hashable (tuples) so it can close into a jit."""

    names: Tuple[str, ...]
    parent: Tuple[int, ...]        # (n,) -1 for roots
    group: Tuple[int, ...]         # (n,) group id of each node
    group_offset: Tuple[int, ...]  # (G,) first node of each group
    group_size: Tuple[int, ...]    # (G,)
    child: Tuple[int, ...]         # (n,) group id of the node's children, -1
    leaf: Tuple[int, ...]          # (n,) 1 if no children

    @property
    def n(self) -> int:
        return len(self.parent)

    @property
    def groups(self) -> int:
        return len(self.group_offset)

    @property
    def max_depth(self) -> int:
        d = 0
        for i in range(self.n):
            k, c = i, 0
            while self.parent[k] >= 0:
                k = self.parent[k]
                c += 1
            d = max(d, c)
        return d

    @classmethod
    def parse(cls, text: str) -> "SoftmaxTree":
        """read_tree (tree.c:82-131) transcription."""
        names, parent = [], []
        group, group_offset, group_size = [], [], []
        child = []
        last_parent, cur_size, groups, n = -1, 0, 0, 0
        for line in text.splitlines():
            line = line.strip()
            if not line:
                continue
            parts = line.split()
            names.append(parts[0])
            p = int(parts[1]) if len(parts) > 1 else -1
            parent.append(p)
            child.append(-1)
            if p != last_parent:
                groups += 1
                group_offset.append(n - cur_size)
                group_size.append(cur_size)
                cur_size = 0
                last_parent = p
            group.append(groups)
            if p >= 0:
                child[p] = groups
            n += 1
            cur_size += 1
        groups += 1
        group_offset.append(n - cur_size)
        group_size.append(cur_size)
        leaf = [1] * n
        for p in parent:
            if p >= 0:
                leaf[p] = 0
        return cls(tuple(names), tuple(parent), tuple(group),
                   tuple(group_offset), tuple(group_size), tuple(child),
                   tuple(leaf))

    @classmethod
    def load(cls, path: str) -> "SoftmaxTree":
        with open(path) as f:
            return cls.parse(f.read())


def group_softmax(x, tree: SoftmaxTree):
    """Per-group softmax along the last axis (forward_region_layer's
    softmax_cpu-per-group loop, region_layer.c:173-181). x: (..., n)."""
    gid = jnp.asarray(tree.group, jnp.int32)                  # (n,)
    G = tree.groups
    x32 = x.astype(jnp.float32)
    # segment max/sum over the static group partition
    gmax = jax.ops.segment_max(x32.reshape(-1, tree.n).T, gid,
                               num_segments=G)                # (G, B*)
    e = jnp.exp(x32 - gmax[gid].T.reshape(x.shape))
    gsum = jax.ops.segment_sum(e.reshape(-1, tree.n).T, gid,
                               num_segments=G)                # (G, B*)
    return (e / gsum[gid].T.reshape(x.shape)).astype(x.dtype)


def hierarchy_probs(p, tree: SoftmaxTree, *, only_leaves: bool = False):
    """Path products: each node's prob multiplied by all its ancestors'
    (hierarchy_predictions, tree.c:36-50). p: (..., n) group-softmaxed."""
    parent = jnp.asarray(tree.parent, jnp.int32)
    has_parent = parent >= 0
    parent_c = jnp.maximum(parent, 0)
    out = p.astype(jnp.float32)
    # cascade by depth: after d iterations every node of depth <= d holds
    # its full path product; deeper nodes multiply in already-final parents
    depth = np.zeros(tree.n, np.int32)
    for i in range(tree.n):
        if tree.parent[i] >= 0:
            depth[i] = depth[tree.parent[i]] + 1
    for d in range(1, int(depth.max()) + 1):
        lvl = jnp.asarray(depth == d)
        out = jnp.where(lvl, out * out[..., parent_c], out)
    if only_leaves:
        out = out * jnp.asarray(tree.leaf, out.dtype)
    return out


def get_hierarchy_probability(p, tree: SoftmaxTree, c: int):
    """Product of group-softmax probs along the path to node c
    (get_hierarchy_probability, tree.c:27-34). p: (..., n)."""
    prob = jnp.ones(p.shape[:-1], jnp.float32)
    k = c
    while k >= 0:
        prob = prob * p[..., k]
        k = tree.parent[k]
    return prob


def group_softmax_np(x: np.ndarray, tree: SoftmaxTree) -> np.ndarray:
    """Numpy twin of group_softmax for host postprocessing. x: (..., n)."""
    out = np.empty_like(x, np.float32)
    for off, size in zip(tree.group_offset, tree.group_size):
        if not size:
            continue
        seg = x[..., off:off + size].astype(np.float32)
        e = np.exp(seg - seg.max(-1, keepdims=True))
        out[..., off:off + size] = e / e.sum(-1, keepdims=True)
    return out


def hierarchy_probs_np(p: np.ndarray, tree: SoftmaxTree,
                       only_leaves: bool = False) -> np.ndarray:
    """Numpy twin of hierarchy_probs (sequential like the C loop —
    parents precede children, so in-order multiplication cascades)."""
    out = p.astype(np.float32).copy()
    for j in range(tree.n):
        if tree.parent[j] >= 0:
            out[..., j] *= out[..., tree.parent[j]]
    if only_leaves:
        out *= np.asarray(tree.leaf, np.float32)
    return out


def region_tree_detections(raw: np.ndarray, anchors, tree: SoftmaxTree, *,
                           thresh: float = 0.5, tree_thresh: float = 0.5,
                           class_map=None):
    """get_region_detections' softmax_tree branch (region_layer.c:395-424)
    for one image: raw (H, W, A*(5+n)) region output -> list of dicts in
    darknet's det order (index = anchor*H*W + cell). class_map (darknet's
    ``map`` file, e.g. coco9k.map) selects mapped-class probs; without it
    only the greedy top prediction gets prob = objectness."""
    H, W, ch = raw.shape
    A = len(anchors)
    n = tree.n
    p = raw.reshape(H, W, A, 5 + n).astype(np.float32)
    sxy = 1.0 / (1.0 + np.exp(-p[..., 0:2]))
    sobj = 1.0 / (1.0 + np.exp(-p[..., 4]))
    cls = group_softmax_np(p[..., 5:], tree)
    paths = hierarchy_probs_np(cls, tree)
    anchors = np.asarray(anchors, np.float32)

    dets = [None] * (H * W * A)
    for nn in range(A):
        for j in range(H):
            for i in range(W):
                scale = float(sobj[j, i, nn])
                box = (
                    (i + float(sxy[j, i, nn, 0])) / W,
                    (j + float(sxy[j, i, nn, 1])) / H,
                    float(np.exp(p[j, i, nn, 2])) * anchors[nn, 0] / W,
                    float(np.exp(p[j, i, nn, 3])) * anchors[nn, 1] / H)
                prob = np.zeros(len(class_map) if class_map else n,
                                np.float32)
                if class_map:
                    for k, src in enumerate(class_map):
                        v = scale * paths[j, i, nn, src]
                        prob[k] = v if v > thresh else 0.0
                else:
                    top = top_prediction_np(paths[j, i, nn], tree,
                                            tree_thresh)
                    prob[top] = scale if scale > thresh else 0.0
                dets[nn * H * W + j * W + i] = {
                    "box": box,
                    "objectness": scale if scale > thresh else 0.0,
                    "prob": prob,
                }
    return dets


def top_prediction_np(p: np.ndarray, tree: SoftmaxTree,
                      thresh: float) -> int:
    """Greedy root-to-leaf descent (hierarchy_top_prediction,
    tree.c:52-79). p: (n,) group-softmaxed probs for ONE box."""
    prob = 1.0
    group = 0
    while True:
        off = tree.group_offset[group]
        size = tree.group_size[group]
        sub = p[off:off + size]
        i = int(np.argmax(sub)) if size else 0
        max_i = off + i
        mx = float(sub[i]) if size else 0.0
        if prob * mx > thresh:
            prob = prob * mx
            if tree.child[max_i] < 0:
                return max_i
            group = tree.child[max_i]
        elif group == 0:
            return max_i
        else:
            return tree.parent[tree.group_offset[group]]
