"""Data-parallel training step + schedules.

Replaces examples/detector.c:6 (train_detector) and src/network.c
(update_network, SGD+momentum+decay) with a functional optax step, jitted
over the device mesh. Where darknet averaged *weights* across GPUs every 4
batches (sync_nets), the sharded jit all-reduces *gradients* every step over
ICI — GSPMD inserts the psum from the sharding annotations alone.
"""

from __future__ import annotations

import dataclasses as _dc
import warnings
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine, specs as S
from yolo_tensorflow_tpu.parallel import mesh as M
from yolo_tensorflow_tpu.pipeline import normalize_images
from yolo_tensorflow_tpu.train import losses


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array
    # QAT activation scales {layer_key: f32 scalar} (ops/qat.py), or None
    # for ordinary float training. A NamedTuple default keeps every
    # pre-QAT construction site and checkpoint layout valid unchanged.
    qat_scales: Any = None


def darknet_lr_schedule(base_lr: float, *, burn_in: int = 1000,
                        power: float = 4.0,
                        steps: Sequence[int] = (400000, 450000),
                        scales: Sequence[float] = (0.1, 0.1)):
    """darknet 'steps' policy with burn-in (src/network.c get_current_rate:
    burn_in ramp lr*(i/burn_in)^power, then piecewise-constant decays)."""
    def schedule(step):
        lr = base_lr * jnp.minimum((step.astype(jnp.float32) + 1) / burn_in,
                                   1.0) ** power
        factor = jnp.float32(1.0)
        for s, sc in zip(steps, scales):
            factor = factor * jnp.where(step >= s, sc, 1.0)
        return lr * factor
    return schedule


@_dc.dataclass(frozen=True)
class NetTrainOptions:
    """[net] training hyperparameters — parse_net_options
    (src/parser.c:643-724). Everything get_current_rate (src/network.c:90)
    and update_network consume, so an arbitrary .cfg trains with ITS
    schedule, not a registry default."""
    learning_rate: float = 1e-3
    momentum: float = 0.9
    decay: float = 1e-4
    batch: int = 1
    subdivisions: int = 1
    burn_in: int = 0
    power: float = 4.0
    policy: str = "constant"
    step: int = 1
    scale: float = 1.0
    steps: Sequence[int] = ()
    scales: Sequence[float] = ()
    gamma: float = 1.0
    max_batches: int = 0
    adam: bool = False
    B1: float = 0.9
    B2: float = 0.999
    eps: float = 1e-7

    @classmethod
    def from_net(cls, net: dict) -> "NetTrainOptions":
        """Build from a parsed [net] section dict (io.cfg.parse_cfg)."""
        kw = dict(
            learning_rate=float(net.get("learning_rate", 1e-3)),
            momentum=float(net.get("momentum", 0.9)),
            decay=float(net.get("decay", 1e-4)),
            batch=int(net.get("batch", 1)),
            subdivisions=int(net.get("subdivisions", 1)),
            burn_in=int(net.get("burn_in", 0)),
            power=float(net.get("power", 4)),
            policy=net.get("policy", "constant"),
            gamma=float(net.get("gamma", 1)),
            step=int(net.get("step", 1)),
            scale=float(net.get("scale", 1)),
            max_batches=int(net.get("max_batches", 0)),
            # adam=1 + B1/B2/eps (src/parser.c:657-662)
            adam=bool(int(net.get("adam", 0))),
            B1=float(net.get("B1", 0.9)),
            B2=float(net.get("B2", 0.999)),
            eps=float(net.get("eps", 1e-7)),
        )
        if kw["policy"] == "steps":
            if "steps" not in net or "scales" not in net:
                raise ValueError(
                    "STEPS policy must have steps and scales in cfg file")
            kw["steps"] = tuple(int(v) for v in net["steps"].split(","))
            kw["scales"] = tuple(float(v) for v in net["scales"].split(","))
        return cls(**kw)


def darknet_schedule(opts: NetTrainOptions):
    """Traceable transcription of get_current_rate (src/network.c:90-120):
    burn-in ramp lr*(i/burn_in)^power while i < burn_in, then the cfg's
    policy. Policies: constant, step, steps, exp, poly, sigmoid, random
    (the cfg keywords get_policy accepts, src/parser.c:630-642); an
    unknown name warns and falls back to constant exactly like the C.
    'random' (lr*rand_uniform()^power fresh per batch) draws from a
    step-seeded PRNG: the same distribution as the C's rand(), but a pure
    function of the step as the jitted train step requires — and
    therefore reproducible across resumes, which the C's global rand()
    stream is not."""
    policy = opts.policy
    if policy not in ("constant", "step", "steps", "exp", "poly",
                      "sigmoid", "random"):
        # get_policy: "Couldn't find policy %s, going with constant"
        warnings.warn(f"Couldn't find policy {policy}, going with constant")
        policy = "constant"
    lr = opts.learning_rate

    def schedule(step):
        s = jnp.asarray(step).astype(jnp.float32)
        if policy == "step":
            rate = lr * opts.scale ** (jnp.asarray(step) // opts.step) \
                .astype(jnp.float32)
        elif policy == "steps":
            factor = jnp.float32(1.0)
            for si, sc in zip(opts.steps, opts.scales):
                factor = factor * jnp.where(jnp.asarray(step) >= si, sc, 1.0)
            rate = lr * factor
        elif policy == "exp":
            rate = lr * opts.gamma ** s
        elif policy == "poly":
            # C never evaluates past max_batches (training stops there);
            # clamp so steps beyond it hold ~0 instead of the negative base
            # resurging through an even power (or NaN for fractional ones)
            frac = jnp.minimum(s / max(opts.max_batches, 1), 1.0)
            rate = lr * (1.0 - frac) ** opts.power
        elif policy == "sigmoid":
            rate = lr * (1.0 / (1.0 + jnp.exp(opts.gamma
                                              * (s - opts.step))))
        elif policy == "random":
            key = jax.random.fold_in(jax.random.PRNGKey(0x5EED),
                                     jnp.asarray(step).astype(jnp.int32))
            rate = lr * jax.random.uniform(key) ** opts.power
        else:  # constant
            rate = jnp.float32(lr)
        if opts.burn_in > 0:
            burn = lr * (s / opts.burn_in) ** opts.power
            return jnp.where(s < opts.burn_in, burn, rate)
        return rate

    return schedule


def make_optimizer(schedule, *, momentum: float = 0.9,
                   weight_decay: float = 5e-4):
    """SGD + momentum + decoupled weight decay, darknet's update rule
    (src/convolutional_layer.c update_convolutional_layer: momentum .9,
    decay .0005 on conv weights, not biases/BN)."""
    def decay_mask(params):
        return jax.tree.map_with_path(
            lambda path, _: path[-1].key == "w", params)
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        optax.sgd(schedule, momentum=momentum),
    )


class DarknetAdamState(NamedTuple):
    count: jax.Array
    m: Any
    v: Any


def darknet_adam(schedule, *, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-7, decay: float = 0.0, batch: int = 1):
    """darknet's Adam (``[net] adam=1``), transcribed from the GPU kernels —
    adam_update_gpu / adam_kernel (src/blas_kernels.cu):

        d  = weight_updates - decay*batch*weights      (decay on EVERY
             tensor under adam, biases and BN scales included — unlike the
             SGD branch, update_convolutional_layer_gpu passes ``decay``
             to all three adam_update_gpu calls)
        m <- B1*m + (1-B1)*d ;  v <- B2*v + (1-B2)*d^2
        w <- w + rate * (m/(1-B1^t)) / (sqrt(v/(1-B2^t)) + eps) ;  d <- 0

    where ``rate`` is the schedule's learning rate UNdivided by batch
    (Adam normalizes the step itself) and t counts updates from 1.
    Our gradients are g = -d/batch (the delta identity the loss tests
    pin), so d is reconstructed as -batch*(g + decay*w): the batch factor
    cancels in m/sqrt(v) except against ``eps``, and keeping it makes the
    step bit-comparable to the C at any batch size. Note the C's CPU
    update path silently IGNORES adam=1 (update_convolutional_layer has
    no adam branch); this matches the GPU path — the one that actually
    honors the option.
    """
    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return DarknetAdamState(count=jnp.zeros([], jnp.int32), m=z,
                                v=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("darknet_adam requires params (weight decay)")
        rate = schedule(state.count)
        t = (state.count + 1).astype(jnp.float32)
        d = jax.tree.map(lambda g, w: -batch * (g + decay * w),
                         grads, params)
        m = jax.tree.map(lambda m_, d_: b1 * m_ + (1.0 - b1) * d_,
                         state.m, d)
        v = jax.tree.map(lambda v_, d_: b2 * v_ + (1.0 - b2) * d_ * d_,
                         state.v, d)
        c1 = 1.0 - jnp.float32(b1) ** t
        c2 = 1.0 - jnp.float32(b2) ** t
        upd = jax.tree.map(
            lambda m_, v_: rate * (m_ / c1) / (jnp.sqrt(v_ / c2) + eps),
            m, v)
        return upd, DarknetAdamState(count=state.count + 1, m=m, v=v)

    return optax.GradientTransformation(init, update)


def optimizer_from_net(opts: "NetTrainOptions", *, batch: Optional[int] =
                       None, schedule=None):
    """The optimizer update_network would run for this [net] section:
    darknet_adam when adam=1, else SGD+momentum+decay (src/network.c
    update_network -> l.update)."""
    schedule = darknet_schedule(opts) if schedule is None else schedule
    if opts.adam:
        return darknet_adam(schedule, b1=opts.B1, b2=opts.B2, eps=opts.eps,
                            decay=opts.decay,
                            batch=batch or max(opts.batch, 1))
    return make_optimizer(schedule, momentum=opts.momentum,
                          weight_decay=opts.decay)


def create_train_state(cfg: C.ModelConfig, tx, rng, *,
                       input_size: Optional[int] = None,
                       specs=None, qat: bool = False) -> TrainState:
    specs = C.build_specs(cfg) if specs is None else specs
    size = input_size or cfg.input_size
    params, batch_stats = engine.init_params(
        specs, (1, size, size, 3), rng, folded=False)
    qat_scales = None
    if qat:
        from yolo_tensorflow_tpu.ops import qat as Q
        qat_scales = Q.init_scales(specs)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.int32(0),
                      rng=rng, qat_scales=qat_scales)


def loss_for_config(cfg: C.ModelConfig, specs, raw_scales, truths, *,
                    ignore_thresh=0.5, truth_thresh=1.0, input_size=None,
                    seen=None, v2_variant: str = "darknet",
                    region_hyper: Optional[losses.RegionHyper] = None,
                    detection_hyper: Optional[losses.DetectionHyper] = None,
                    truth_assign: str = "vectorized"):
    """Dispatch to the loss for the model family.

    v2 trains with darknet's region_layer.c semantics by default (rescore,
    bias-match warmup driven by ``seen``); v2_variant='tf' selects the TF
    reference's Loss.py weighted MSE instead. v1 uses detection_layer.c.
    ``seen`` is the traced images-processed counter (darknet *net.seen).
    """
    if cfg.head == 3:
        masks = [spec.anchor_mask for spec in specs
                 if isinstance(spec, S.Detect)]
        eff_cfg = cfg if input_size is None else \
            _dc.replace(cfg, input_size=input_size)
        return losses.yolo_v3_loss(raw_scales, truths, eff_cfg,
                                   anchor_masks=masks,
                                   ignore_thresh=ignore_thresh,
                                   truth_thresh=truth_thresh,
                                   truth_assign=truth_assign)
    if cfg.head == 2:
        (raw,) = raw_scales
        grid = raw.shape[1]
        if v2_variant == "tf":
            targets = losses.build_v2_targets(truths, cfg, grid)
            return losses.yolo_v2_loss(raw, targets, cfg, grid=grid)
        hyper = region_hyper or losses.RegionHyper()
        return losses.yolo_v2_region_loss(raw, truths, cfg, seen=seen,
                                          hyper=hyper)
    if cfg.head == 1:
        (pred_flat,) = raw_scales
        hyper = detection_hyper or losses.DetectionHyper()
        return losses.yolo_v1_loss(pred_flat, truths, cfg, hyper=hyper,
                                   seen=seen)
    if cfg.head == 0:
        (probs,) = raw_scales
        return losses.classifier_loss(probs, truths.astype(jnp.int32))
    raise ValueError(f"unknown head {cfg.head}")


def make_train_step(cfg: C.ModelConfig, tx, *, input_size: Optional[int] = None,
                    ignore_thresh: float = 0.5, compute_dtype=None,
                    specs=None, remat_every: Optional[int] = None,
                    bn_stats: str = "twopass", qat_momentum: float = 0.99,
                    **loss_kw):
    """Build the pure (state, images_u8, truths) -> (state, metrics) step.

    Multi-scale training (darknet's every-10-batches random resize,
    examples/detector.c:63-82) is expressed by building one step per input
    size — each compiles once and is cached by shape. Extra ``loss_kw``
    (v2_variant, region_hyper, detection_hyper) pass to loss_for_config;
    the darknet ``seen`` counter is derived as step * batch. ``specs``
    overrides the registry builder for arbitrary-cfg models.

    ``remat_every=N`` enables selective rematerialization: only every Nth
    layer's activation is kept as a backward-pass residual
    (jax.checkpoint + save_only_these_names over the engine's tagged layer
    outputs); the layers between checkpoints are recomputed during the
    backward sweep. Peak activation memory drops ~N-fold for one extra
    forward's FLOPs — the TPU HBM/FLOPs trade that lets batch size grow
    past what plain backprop fits. Numerically exact (the recomputation
    re-runs the identical ops; gated in tests/test_train_bf16.py).
    """
    specs = C.build_specs(cfg) if specs is None else specs

    def forward(params, x, drng, qscales):
        dets, aux = engine.apply(specs, params, x, train=True,
                                 bn_eps=cfg.bn_eps,
                                 compute_dtype=compute_dtype,
                                 dropout_rng=drng, bn_stats=bn_stats,
                                 qat_scales=qscales)
        return [f.astype(jnp.float32) for f, _ in dets], \
            aux["batch_stats"], aux.get("act_ranges", {})

    if remat_every:
        saved = [engine.layer_key(i)
                 for i in range(remat_every - 1, len(specs), remat_every)]
        forward = jax.checkpoint(
            forward,
            policy=jax.checkpoint_policies.save_only_these_names(*saved))

    def loss_fn(params, batch_stats, images, truths, drng, seen, qscales):
        x = normalize_images(images, cfg)
        raw_scales, new_bn_stats, ranges = forward(params, x, drng, qscales)
        loss, metrics = loss_for_config(
            cfg, specs, raw_scales, truths,
            ignore_thresh=ignore_thresh, input_size=input_size,
            seen=seen, **loss_kw)
        return loss, (new_bn_stats, ranges, metrics)

    def train_step(state: TrainState, images, truths):
        rng, drng = jax.random.split(state.rng)
        seen = state.step * images.shape[0]
        grads, (new_stats, ranges, metrics) = jax.grad(
            loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, truths, drng, seen,
            state.qat_scales)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        m = cfg.bn_momentum
        batch_stats = jax.tree.map(
            lambda run, new: m * run + (1.0 - m) * new,
            state.batch_stats, new_stats) if new_stats else state.batch_stats
        qat_scales = state.qat_scales
        if qat_scales is not None and ranges:
            from yolo_tensorflow_tpu.ops import qat as Q
            qat_scales = Q.update_scales(qat_scales, ranges,
                                         momentum=qat_momentum)
        metrics = dict(metrics, step=state.step)
        return TrainState(params, batch_stats, opt_state,
                          state.step + 1, rng, qat_scales), metrics

    return train_step


def make_sharded_train_step(cfg: C.ModelConfig, tx, mesh, **kw):
    """jit the step over the mesh: batch over 'data', activation height over
    'spatial', params/state replicated. GSPMD inserts the gradient psum."""
    step = make_train_step(cfg, tx, **kw)
    rep = M.replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, M.image_sharding(mesh), M.batch_sharding(mesh)),
        out_shardings=None,
        donate_argnums=(0,),
    )


def make_multi_step(cfg: C.ModelConfig, tx, n_steps: int, **kw):
    """Scan ``n_steps`` train steps inside one jit: (state, images (N,B,...),
    truths (N,B,...)) -> (state, stacked metrics). One dispatch per N steps
    amortizes host/launch overhead (essential on high-latency links, useful
    everywhere); equivalent to N sequential steps by construction
    (lax.scan over the same pure step)."""
    step = make_train_step(cfg, tx, **kw)

    def multi(state, images, truths):
        def body(s, xt):
            im, tr = xt
            s, m = step(s, im, tr)
            return s, m
        return jax.lax.scan(body, state, (images, truths))

    return multi
