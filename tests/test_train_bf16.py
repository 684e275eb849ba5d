"""Mixed-precision (bf16) training gates.

The reference trains in f32 C kernels; on TPU the MXU is bf16-native, so
the framework adds an opt-in mixed-precision training form: convs compute
in bf16 (f32 MXU accumulation, output rounded once to bf16 then upcast),
while BN statistics, loss, optimizer state and master weights stay f32
(ops/layers.conv2d train=True path). These gates pin that the path runs
forward+backward, that its gradients track the exact-f32 gradients, that
training converges, and that it composes with the sharded mesh step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.parallel import mesh as M
from yolo_tensorflow_tpu.train import loop as T

SIZE = 64


def _state_and_batch(model="yolov3-tiny", batch=4, lr=1e-3):
    cfg = C.get_config(model, input_size=SIZE)
    tx = T.make_optimizer(T.darknet_lr_schedule(lr, burn_in=4))
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                 input_size=SIZE)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (batch, SIZE, SIZE, 3), dtype=np.uint8)
    truths = np.zeros((batch, 4, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.7, 0.7, 3.0]
    truths[:, 1] = [0.25, 0.25, 0.2, 0.3, 1.0]
    return cfg, tx, state, images, truths


def _flat_delta(before, after):
    b = jax.tree_util.tree_leaves(before)
    a = jax.tree_util.tree_leaves(after)
    return np.concatenate([(np.asarray(x) - np.asarray(y)).ravel()
                           for x, y in zip(a, b)])


@pytest.mark.parametrize("model", ["yolov3-tiny", "yolov2-tiny-voc"])
def test_bf16_step_runs_and_tracks_f32_gradients(model):
    cfg, tx, state, images, truths = _state_and_batch(model)
    step32 = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE))
    step16 = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                       compute_dtype=jnp.bfloat16))
    s32, m32 = step32(state, images, truths)
    s16, m16 = step16(state, images, truths)
    assert np.isfinite(float(m16["cost"]))
    # SGD first step: param delta = -lr * (grad + wd); same state both ways,
    # so the deltas compare the gradients directly
    d32 = _flat_delta(state.params, s32.params)
    d16 = _flat_delta(state.params, s16.params)
    cos = float(d32 @ d16 / (np.linalg.norm(d32) * np.linalg.norm(d16)))
    # random-init nets give the weakest alignment (large activations, the
    # gradient is mostly rounding-sensitive noise); measured ~0.95 with
    # narrow bf16 activations. test_bf16_gradients_align_when_trained
    # gates the regime that matters.
    assert cos > 0.9, cos
    np.testing.assert_allclose(np.linalg.norm(d16), np.linalg.norm(d32),
                               rtol=0.05)
    # loss value itself within bf16 rounding of the exact one
    np.testing.assert_allclose(float(m16["cost"]), float(m32["cost"]),
                               rtol=0.05)


def test_bf16_gradients_align_when_trained():
    """After even a little training the gradient carries signal instead of
    random-init noise, and the bf16 step must track the exact-f32 step
    tightly there — that is the regime mixed precision actually runs in."""
    cfg, tx, state, images, truths = _state_and_batch(lr=1e-4)
    step32 = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE))
    for _ in range(5):  # light warmup in exact f32
        state, _ = step32(state, images, truths)
    step16 = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                       compute_dtype=jnp.bfloat16))
    s32, _ = step32(state, images, truths)
    s16, _ = step16(state, images, truths)
    d32 = _flat_delta(state.params, s32.params)
    d16 = _flat_delta(state.params, s16.params)
    cos = float(d32 @ d16 / (np.linalg.norm(d32) * np.linalg.norm(d16)))
    assert cos > 0.99, cos


def test_bf16_training_converges():
    cfg, tx, state, images, truths = _state_and_batch(lr=1e-4)
    step16 = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                       compute_dtype=jnp.bfloat16),
                     donate_argnums=(0,))
    costs = []
    for _ in range(8):
        state, m = step16(state, images, truths)
        costs.append(float(m["cost"]))
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[0] * 0.9, costs


def test_bf16_params_and_stats_stay_f32():
    cfg, tx, state, images, truths = _state_and_batch()
    step16 = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                       compute_dtype=jnp.bfloat16))
    s16, _ = step16(state, images, truths)
    for leaf in jax.tree_util.tree_leaves(s16.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(s16.batch_stats):
        assert leaf.dtype == jnp.float32


def test_remat_gradients_bit_exact():
    """remat_every=N (selective rematerialization, jax.checkpoint over the
    engine's tagged layer outputs) recomputes the identical ops in the
    backward sweep — the step must be BIT-exact vs plain backprop."""
    cfg, tx, state, images, truths = _state_and_batch()
    plain = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE))
    remat = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                      remat_every=4))
    s_p, m_p = plain(state, images, truths)
    s_r, m_r = remat(state, images, truths)
    assert float(m_p["cost"]) == float(m_r["cost"])
    for a, b in zip(jax.tree_util.tree_leaves(s_p.params),
                    jax.tree_util.tree_leaves(s_r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_composes_with_bf16_and_mesh():
    cfg, tx, state, images, truths = _state_and_batch(batch=8)
    mesh = M.make_mesh(8, 1)
    step = T.make_sharded_train_step(cfg, tx, mesh, input_size=SIZE,
                                     compute_dtype=jnp.bfloat16,
                                     remat_every=4)
    with mesh:
        im, tr = M.shard_batch(mesh, images, truths)
        s, m = step(state, im, tr)
    assert np.isfinite(float(m["cost"]))
    assert int(s.step) == 1


@pytest.mark.parametrize("mesh_shape,min_cos", [((8, 1), 0.99),
                                                ((4, 2), 0.5)])
def test_bf16_sharded_step_matches_unsharded(mesh_shape, min_cos):
    """Pure DP shards the batch only: per-example conv outputs round to
    bf16 identically on every device, so gradients track the unsharded
    step tightly (measured cos ~0.994). Spatial sharding retiles the convs,
    and the per-tile f32-accumulation order differences surface as bf16
    output-rounding flips that a RANDOM-INIT net amplifies chaotically —
    the LOSS still matches to ~0.1%, but the gradient direction is only
    loosely aligned (measured ~0.77); that looseness is a property of
    mixed precision, not of the sharding (the f32 spatial path is gated
    tightly in test_parallel.py)."""
    cfg, tx, state, images, truths = _state_and_batch(batch=8)
    mesh = M.make_mesh(*mesh_shape)
    sharded = T.make_sharded_train_step(cfg, tx, mesh, input_size=SIZE,
                                        compute_dtype=jnp.bfloat16)
    plain = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                      compute_dtype=jnp.bfloat16))
    # snapshot first: the sharded step donates (consumes) its state arg
    p0 = jax.tree.map(np.asarray, state.params)
    s_pl, m_pl = plain(state, images, truths)
    with mesh:
        im, tr = M.shard_batch(mesh, images, truths)
        s_sh, m_sh = sharded(state, im, tr)
    np.testing.assert_allclose(float(m_sh["cost"]), float(m_pl["cost"]),
                               rtol=2e-2)
    d_sh = _flat_delta(p0, s_sh.params)
    d_pl = _flat_delta(p0, s_pl.params)
    cos = float(d_sh @ d_pl / (np.linalg.norm(d_sh) * np.linalg.norm(d_pl)))
    assert cos > min_cos, (mesh_shape, cos)


def test_bn_onepass_stats_and_gradients_track_twopass():
    """bn_stats='onepass' (var = E[x^2]-E[x]^2, one fused activation read —
    PERF_TRAIN.md) must agree with darknet's exact two-pass variance to f32
    cancellation tolerance: batch stats elementwise-close, first-step param
    deltas (= gradients under SGD) aligned, loss value close."""
    cfg, tx, state, images, truths = _state_and_batch()
    two = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE))
    one = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                    bn_stats="onepass"))
    s2, m2 = two(state, images, truths)
    s1, m1 = one(state, images, truths)
    np.testing.assert_allclose(float(m1["cost"]), float(m2["cost"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    d2 = _flat_delta(state.params, s2.params)
    d1 = _flat_delta(state.params, s1.params)
    cos = float(d2 @ d1 / (np.linalg.norm(d2) * np.linalg.norm(d1)))
    assert cos > 0.9999, cos


def test_bn_onepass_bf16_is_wired_but_lossy():
    """bn_stats='onepass_bf16' (bfloat16 reduction accumulators) is the
    aggressive stat probe the perf anatomy listed. The MEASURED verdict
    (PERF_TRAIN.md): 8-bit-mantissa accumulation over B*H*W elements
    drifts the batch stats multiplicatively (small-magnitude channel
    means land 3x off on this fixture) and the 30-step convergence A/B
    goes NaN — the lever is REJECTED as a default and the flag kept only
    as a documented experimental probe. This test pins what must stay
    true for the probe to remain meaningful: the knob threads through the
    full train step and one step is finite — nothing more. Even the
    single-step update direction is uncorrelated with the exact step
    (measured cos ~0.08 on this fixture), because layer k's bf16-drifted
    stats mis-normalize the input every deeper layer differentiates
    through; asserting any agreement would pin noise."""
    cfg, tx, state, images, truths = _state_and_batch()
    onebf = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                      bn_stats="onepass_bf16"))
    s1, m1 = onebf(state, images, truths)
    assert np.isfinite(float(m1["cost"]))
    # finite, non-runaway magnitudes — the gate only excludes outright
    # breakage (drift measured up to ~3 absolute where the exact mean is
    # ~0.06 at the deepest BN here)
    for a in jax.tree_util.tree_leaves(s1.batch_stats):
        a = np.asarray(a, np.float64)
        assert np.all(np.isfinite(a))
        assert np.abs(a).max() < 1e3, np.abs(a).max()
    d1 = _flat_delta(state.params, s1.params)
    assert np.all(np.isfinite(d1)) and float(np.abs(d1).max()) > 0.0


def test_bn_ghost_stats_are_subsample_stats():
    """bn_stats='ghostN' must equal the onepass stats of the batch's first
    N images exactly: running the step on the full batch with ghostN
    produces the same batch stats as running the FORWARD on just those N
    images — and N >= batch degenerates to plain onepass."""
    from yolo_tensorflow_tpu.models import engine as E

    cfg, tx, state, images, truths = _state_and_batch(batch=8)
    specs = C.build_specs(cfg)
    from yolo_tensorflow_tpu.pipeline import normalize_images
    x = normalize_images(images, cfg)
    _, aux_g = E.apply(specs, state.params, x, train=True,
                       bn_stats="ghost2")
    _, aux_s = E.apply(specs, state.params, x[:2], train=True,
                       bn_stats="onepass")
    # batch-8 and batch-2 convs tile differently, so the shared rows
    # accumulate in a different order — equality here is up to f32
    # reassociation noise, not bit-exact
    for key, stg in aux_g["batch_stats"].items():
        sts = aux_s["batch_stats"][key]
        np.testing.assert_allclose(np.asarray(stg["mean"]),
                                   np.asarray(sts["mean"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(stg["var"]),
                                   np.asarray(sts["var"]),
                                   rtol=1e-4, atol=1e-5)
    _, aux_full = E.apply(specs, state.params, x, train=True,
                          bn_stats="ghost99")
    _, aux_one = E.apply(specs, state.params, x, train=True,
                         bn_stats="onepass")
    for key, stg in aux_full["batch_stats"].items():
        np.testing.assert_allclose(
            np.asarray(stg["var"]),
            np.asarray(aux_one["batch_stats"][key]["var"]), rtol=1e-6)


def test_bn_ghost_training_makes_progress():
    """Convergence probe for ghost-BN stat subsampling, pinning the
    MEASURED A/B verdict (PERF_TRAIN.md): ghost4 at batch 8 still
    optimizes — 30 steps on the fixed batch cut the cost well below its
    start — but lands far above the darknet-exact twopass run (measured
    ~5x: 2.47 vs 0.50 on this fixture), because half-batch stats are a
    noisy estimator the whole batch then gets normalized by. So ghost is
    REJECTED as a training default at small batch and stays an opt-in
    lever for large-batch stat-pass bandwidth, where N/B keeps the
    estimator tight. (onepass_bf16's A/B result was starker still — NaN
    by step 30 — which is asserted nowhere because pinning a divergence
    trajectory is noise; its rejection lives in PERF_TRAIN.md.)"""
    cfg, tx, state, images, truths = _state_and_batch(batch=8)
    costs = {}
    for mode in ("twopass", "ghost4"):
        st = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                  input_size=SIZE)
        step = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                         bn_stats=mode))
        first = None
        for _ in range(30):
            st, m = step(st, images, truths)
            if first is None:
                first = float(m["cost"])
        costs[mode] = (first, float(m["cost"]))
    g0, g30 = costs["ghost4"]
    assert np.isfinite(g30), costs
    assert g30 < 0.5 * g0, costs  # it trains...
    assert g30 > costs["twopass"][1], costs  # ...but exactness wins here


def test_bn_onepass_reaches_deconv_and_dense():
    """The onepass knob must thread into EVERY feedforward BN site — deconv
    and connected too, not just conv — so the A/B measures one mode, not a
    silent mix. Gate: engine.apply(train=True) batch stats track the
    two-pass form to cancellation tolerance on a net of all three."""
    from yolo_tensorflow_tpu.models import engine as E, specs as S

    specs = [S.Conv(8, 3, bn=True), S.Deconv(6, 3, stride=2, bn=True),
             S.GlobalAvgPool(), S.Dense(5, bn=True)]
    params, _ = E.init_params(specs, (1, 16, 16, 3), jax.random.PRNGKey(1),
                              folded=False)
    x = jnp.asarray(
        np.random.default_rng(2).normal(2.0, 3.0, (4, 16, 16, 3)),
        jnp.float32)
    outs = {}
    for mode in ("twopass", "onepass"):
        _, aux = E.apply(specs, params, x, train=True, bn_stats=mode)
        outs[mode] = aux["batch_stats"]
    for key, st2 in outs["twopass"].items():
        st1 = outs["onepass"][key]
        np.testing.assert_allclose(np.asarray(st1["var"]),
                                   np.asarray(st2["var"]),
                                   rtol=1e-3, atol=1e-5)
        # onepass is E[x^2]-E[x]^2 — with a nonzero mean it is NOT
        # bit-identical to the two-pass form, proving the knob reached
        # this layer's BN rather than silently keeping two-pass
        assert (np.asarray(st1["var"]) != np.asarray(st2["var"])).any(), key
