"""YOLO9000 softmax-tree gates: parse vs a hand-traced read_tree run,
group softmax / hierarchy products / top prediction vs transcriptions, and
the tree-mode region loss deltas vs the delta_region_class hier branch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models.tree import (SoftmaxTree, group_softmax,
                                             group_softmax_np,
                                             hierarchy_probs,
                                             hierarchy_probs_np,
                                             top_prediction_np)
from yolo_tensorflow_tpu.train import losses

# 2 roots; n0 has children n2,n3; n1 has child n4; n3 has children n5,n6
TREE_TEXT = """n0 -1
n1 -1
n2 0
n3 0
n4 1
n5 3
n6 3
"""


@pytest.fixture
def tree():
    return SoftmaxTree.parse(TREE_TEXT)


def test_tree_parse_matches_read_tree(tree):
    """Hand-trace of read_tree (tree.c:82-131) on TREE_TEXT."""
    assert tree.n == 7 and tree.groups == 4
    assert tree.parent == (-1, -1, 0, 0, 1, 3, 3)
    assert tree.group == (0, 0, 1, 1, 2, 3, 3)
    assert tree.group_offset == (0, 2, 4, 5)
    assert tree.group_size == (2, 2, 1, 2)
    assert tree.child == (1, 2, -1, 3, -1, -1, -1)
    assert tree.leaf == (0, 0, 1, 0, 1, 1, 1)
    assert tree.max_depth == 2


def test_group_softmax_matches_numpy(tree, rng):
    x = rng.standard_normal((2, 3, tree.n), dtype=np.float32)
    got = np.asarray(group_softmax(jnp.asarray(x), tree))
    want = group_softmax_np(x, tree)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # each group sums to 1
    for off, size in zip(tree.group_offset, tree.group_size):
        np.testing.assert_allclose(got[..., off:off + size].sum(-1), 1.0,
                                   rtol=1e-5)


def test_hierarchy_probs_matches_sequential(tree, rng):
    p = group_softmax_np(
        rng.standard_normal((4, tree.n), dtype=np.float32), tree)
    got = np.asarray(hierarchy_probs(jnp.asarray(p), tree))
    want = hierarchy_probs_np(p, tree)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # explicit path product: n5's path is 5 <- 3 <- 0
    np.testing.assert_allclose(got[:, 5], p[:, 5] * p[:, 3] * p[:, 0],
                               rtol=1e-6)
    leaves = np.asarray(hierarchy_probs(jnp.asarray(p), tree,
                                        only_leaves=True))
    assert (leaves[:, 0] == 0).all() and (leaves[:, 2] > 0).all()


def test_top_prediction_transcription(tree):
    """hierarchy_top_prediction (tree.c:52-79) on crafted inputs."""
    p = np.zeros(tree.n, np.float32)
    # confident path n0 -> n3 -> n6
    p[[0, 1]] = [0.9, 0.1]
    p[[2, 3]] = [0.2, 0.8]
    p[[4]] = 1.0
    p[[5, 6]] = [0.1, 0.9]
    paths = hierarchy_probs_np(p, tree)
    assert top_prediction_np(paths, tree, 0.2) == 6
    # low thresh descent stops at n3 when the leaf group is uncertain
    p2 = p.copy()
    p2[[5, 6]] = [0.5, 0.5]
    paths2 = hierarchy_probs_np(p2, tree)
    assert top_prediction_np(paths2, tree, 0.4) == 3
    # nothing confident at the root -> argmax of root group
    p3 = np.full(tree.n, 0.01, np.float32)
    p3[1] = 0.4
    assert top_prediction_np(hierarchy_probs_np(p3, tree), tree, 0.9) == 1


def _region_tree_cfg(tree, A=2):
    anchors = tuple((1.0 + i, 1.5 + i) for i in range(A))
    return C.get_config("yolov2-tiny-voc",
                        custom_classes=tuple(tree.names),
                        anchors=anchors)


def test_tree_class_delta_matches_c_walk(tree, rng):
    """_tree_class_delta vs a literal transcription of
    delta_region_class's hier branch (region_layer.c:112-128)."""
    p = group_softmax_np(
        rng.standard_normal((tree.n,), dtype=np.float32), tree)
    scale = 1.3
    for cls in range(tree.n):
        got = np.asarray(losses._tree_class_delta(
            jnp.asarray(p), jnp.int32(cls), scale, tree))
        want = np.zeros(tree.n, np.float32)
        c = cls
        while c >= 0:
            g = tree.group[c]
            off, size = tree.group_offset[g], tree.group_size[g]
            for i in range(size):
                want[off + i] = scale * (0.0 - p[off + i])
            want[c] = scale * (1.0 - p[c])
            c = tree.parent[c]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_region_tree_loss_runs_and_marks_path(tree, rng):
    cfg = _region_tree_cfg(tree)
    A = cfg.num_anchors
    H = W = 3
    raw = rng.standard_normal((1, H, W, A * (5 + tree.n)), dtype=np.float32)
    truths = np.zeros((1, 2, 5), np.float32)
    truths[0, 0] = [0.5, 0.5, 0.4, 0.4, 5]      # leaf n5 (path 5<-3<-0)
    loss, met = losses.yolo_v2_region_loss(
        jnp.asarray(raw), jnp.asarray(truths), cfg, seen=jnp.int32(20000),
        tree=tree)
    assert np.isfinite(float(loss))
    assert float(met["count"]) == 1
    # gradient still -delta/batch
    g = jax.grad(lambda r: losses.yolo_v2_region_loss(
        r, jnp.asarray(truths), cfg, seen=jnp.int32(20000), tree=tree)[0])(
            jnp.asarray(raw))
    assert np.isfinite(np.asarray(g)).all()


def test_region_tree_onlyclass_branch(tree, rng):
    """Classification-only image (truth.x > 1e5): noobject deltas
    everywhere, tree class delta at exactly one (cell, anchor), zero box
    deltas (region_layer.c:199-231)."""
    cfg = _region_tree_cfg(tree)
    A = cfg.num_anchors
    H = W = 3
    raw = rng.standard_normal((H, W, A * (5 + tree.n)), dtype=np.float32)
    truths = np.zeros((4, 5), np.float32)
    truths[0] = [2e5, 2e5, 1.0, 1.0, 6]         # classification-only: n6
    anchors = jnp.asarray(np.asarray(cfg.anchors, np.float32))
    delta, met = losses._region_delta(
        jnp.asarray(raw), jnp.asarray(truths), anchors, jnp.int32(20000),
        losses.RegionHyper(), tree.n, tree=tree)
    delta = np.asarray(delta).reshape(H, W, A, 5 + tree.n)
    assert (delta[..., 0:4] == 0).all()          # no box deltas, no warmup
    cls_nonzero = (np.abs(delta[..., 5:]).sum(-1) > 0)
    assert cls_nonzero.sum() == 1                # one responsible anchor
    mj, mi, mn = np.argwhere(cls_nonzero)[0]
    assert delta[mj, mi, mn, 4] == 0             # obj delta zeroed there
    # every other obj delta is the plain noobject term
    p = raw.reshape(H, W, A, 5 + tree.n)
    sobj = 1 / (1 + np.exp(-p[..., 4]))
    want_obj = 1.0 * (0 - sobj)
    want_obj[mj, mi, mn] = 0
    np.testing.assert_allclose(delta[..., 4], want_obj, rtol=1e-5,
                               atol=1e-6)
    assert float(met["count"]) == 0
