"""Arbitrary-cfg training + partial/prefix weights gates.

Covers the reference behaviors: get_current_rate's learning-rate policies
(src/network.c:90-120), parse_net_options' training hyperparameters
(src/parser.c:643-724), the `partial` backbone truncation
(examples/darknet.c:491 -> save_weights_upto src/parser.c:992), and
prefix loading (load_weights_upto src/parser.c:1241).
"""

import argparse
import dataclasses
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.io import weights as W
from yolo_tensorflow_tpu.models import engine, specs as S
from yolo_tensorflow_tpu.train import loop as T


# --------------------------------------------------------------------------
# get_current_rate transcription (numpy twin of src/network.c:90-120)
# --------------------------------------------------------------------------

def _c_get_current_rate(o: T.NetTrainOptions, batch_num: int) -> float:
    lr = o.learning_rate
    if o.burn_in and batch_num < o.burn_in:
        return lr * (batch_num / o.burn_in) ** o.power
    if o.policy == "constant":
        return lr
    if o.policy == "step":
        return lr * o.scale ** (batch_num // o.step)
    if o.policy == "steps":
        rate = lr
        for s, sc in zip(o.steps, o.scales):
            if s > batch_num:
                return rate
            rate *= sc
        return rate
    if o.policy == "exp":
        return lr * o.gamma ** batch_num
    if o.policy == "poly":
        return lr * (1 - batch_num / o.max_batches) ** o.power
    if o.policy == "sigmoid":
        return lr * (1.0 / (1.0 + math.exp(o.gamma * (batch_num - o.step))))
    raise ValueError(o.policy)


@pytest.mark.parametrize("opts", [
    T.NetTrainOptions(learning_rate=1e-3, burn_in=100, power=4.0,
                      policy="steps", steps=(400, 450), scales=(0.1, 0.1)),
    T.NetTrainOptions(learning_rate=2e-3, burn_in=0,
                      policy="step", step=50, scale=0.5),
    T.NetTrainOptions(learning_rate=1e-2, burn_in=10, policy="constant"),
    T.NetTrainOptions(learning_rate=1e-2, policy="exp", gamma=0.999),
    T.NetTrainOptions(learning_rate=1e-2, policy="poly", power=2.0,
                      max_batches=500),
    T.NetTrainOptions(learning_rate=1e-2, policy="sigmoid", gamma=0.1,
                      step=200),
])
def test_darknet_schedule_matches_c_transcription(opts):
    """Pin the traced schedule against the C loop at burn-in and step
    boundaries (the VERDICT-ordered gate)."""
    sched = T.darknet_schedule(opts)
    probe = {0, 1}
    if opts.burn_in:
        probe |= {opts.burn_in - 1, opts.burn_in, opts.burn_in + 1}
    for s in opts.steps:
        probe |= {s - 1, s, s + 1}
    if opts.policy == "step":
        probe |= {opts.step - 1, opts.step, opts.step + 1,
                  2 * opts.step, 2 * opts.step + 1}
    probe |= {137, 449, 451, 499}
    for b in sorted(probe):
        if b < 0 or (opts.policy == "poly" and b > opts.max_batches):
            continue
        got = float(sched(jnp.int32(b)))
        want = _c_get_current_rate(opts, b)
        # rel 1e-4: the traced schedule computes in float32, like the C
        # (get_current_rate is float math); the transcription is float64
        assert got == pytest.approx(want, rel=1e-4), (b, got, want)


def test_random_policy_step_seeded():
    """policy=random (lr*rand_uniform()^power per batch,
    src/network.c:111) draws from a step-seeded PRNG: deterministic per
    step (resume-reproducible, unlike the C's global rand() stream),
    fresh across steps, bounded by lr, matching the pow-law shaping."""
    opts = T.NetTrainOptions(learning_rate=1e-2, policy="random",
                             power=4.0)
    sched = T.darknet_schedule(opts)
    r = [float(sched(jnp.int32(b))) for b in range(32)]
    assert all(0.0 <= v <= opts.learning_rate for v in r)
    assert len({round(v, 12) for v in r}) > 16          # fresh draws
    assert float(sched(jnp.int32(7))) == r[7]           # pure in step
    # pow(u,4) of uniform u has mean 1/5
    assert 0.05 < sum(r) / len(r) / opts.learning_rate < 0.5


def test_unknown_policy_warns_constant():
    """get_policy falls back to constant with a warning for unknown names
    (src/parser.c:639-641) — including 'sig', which is only the C's
    internal enum name, not a cfg keyword."""
    with pytest.warns(UserWarning, match="going with constant"):
        sched = T.darknet_schedule(
            T.NetTrainOptions(learning_rate=3e-3, policy="sig"))
    assert float(sched(jnp.int32(123))) == pytest.approx(3e-3)


def test_poly_policy_clamps_past_max_batches():
    """Past max_batches (where the C simply stops training) the poly rate
    must hold ~0, not resurge through the even power."""
    sched = T.darknet_schedule(T.NetTrainOptions(
        learning_rate=1e-2, policy="poly", power=4.0, max_batches=100))
    assert float(sched(jnp.int32(100))) == 0.0
    assert float(sched(jnp.int32(200))) == 0.0


def test_net_options_from_cfg_section():
    net = {"batch": "64", "subdivisions": "16", "learning_rate": "0.001",
           "momentum": "0.949", "decay": "0.0005", "burn_in": "1000",
           "max_batches": "500200", "policy": "steps",
           "steps": "400000,450000", "scales": ".1,.1"}
    o = T.NetTrainOptions.from_net(net)
    assert o.batch == 64 and o.subdivisions == 16
    assert o.momentum == 0.949 and o.decay == 5e-4
    assert o.steps == (400000, 450000) and o.scales == (0.1, 0.1)
    assert o.max_batches == 500200
    with pytest.raises(ValueError):
        T.NetTrainOptions.from_net({"policy": "steps"})  # missing steps


# --------------------------------------------------------------------------
# partial / prefix weights
# --------------------------------------------------------------------------

def _backbone_output(specs, params, stats, x, bn_eps):
    """Activation at the end of a truncated spec list (append a Detect
    marker so engine.apply returns it)."""
    dets, _ = engine.apply(tuple(specs) + (S.Detect(),), params, x,
                           batch_stats=stats, bn_eps=bn_eps)
    (feat, _), = dets
    return np.asarray(feat)


def test_partial_truncation_and_prefix_load(tmp_path):
    """The darknet19_448.conv.23 workflow: save a classifier's first 23
    darknet layers with `partial`, load the truncated file into yolov2's
    backbone (allow_partial), and gate the shared layers' ACTIVATIONS as
    identical."""
    clf_cfg = C.get_config("darknet19-classifier")
    clf_specs = C.build_specs(clf_cfg)
    params, stats = engine.init_params(clf_specs, (1, 64, 64, 3),
                                       jax.random.PRNGKey(3), folded=False)
    params = jax.tree.map(np.asarray, params)
    stats = jax.tree.map(lambda a: np.abs(np.asarray(a)) + 0.1, stats)

    full = tmp_path / "clf.weights"
    W.save_darknet_weights(clf_specs, clf_cfg.input_size, params, stats,
                           str(full))

    # partial: first 23 darknet layers (== the classifier/yolov2 shared
    # backbone, verified below)
    v2_cfg = C.get_config("yolov2")
    v2_specs = C.build_specs(v2_cfg)
    n_shared = 0
    for a, b in zip(clf_specs, v2_specs):
        if a != b:
            break
        n_shared += 1
    dk = W.darknet_layer_indices(v2_specs)
    cutoff = dk[n_shared]
    assert cutoff == 23  # the reference's .conv.23 cut, exactly

    trunc = tmp_path / "clf.conv.23"
    from yolo_tensorflow_tpu.cli import cmd_partial
    cmd_partial(argparse.Namespace(model="darknet19-classifier", cfg=None,
                                   weights=str(full), out=str(trunc),
                                   upto=cutoff))

    # a truncated file must NOT full-load (unconsumed-floats guard inverse:
    # file exhausted mid-spec-list)
    with pytest.raises(W.WeightsFormatError):
        W.load_darknet_weights(v2_specs, 416, str(trunc), fold=False)

    loaded, lstats, _ = W.load_darknet_weights(
        v2_specs, 416, str(trunc), fold=False, allow_partial=True)
    keys = sorted(loaded)
    expect_keys = sorted(
        engine.layer_key(i) for i in range(n_shared)
        if W._has_weights(v2_specs[i]))
    assert keys == expect_keys

    # activation oracle: classifier prefix == yolov2 prefix on real pixels
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (1, 64, 64, 3)).astype(np.float32) / 255.0)
    a = _backbone_output(clf_specs[:n_shared], params, stats, x,
                         clf_cfg.bn_eps)
    b = _backbone_output(v2_specs[:n_shared], loaded, lstats, x,
                         clf_cfg.bn_eps)
    np.testing.assert_array_equal(a, b)

    # seen reset (partial resets the header counter, examples/darknet.c:495
    # via load_network(clear=1))
    hdr = W.read_header(open(trunc, "rb"))
    assert hdr["seen"] == 0


def test_save_upto_equals_prefix_of_full(tmp_path):
    """save_darknet_weights(upto=N) bytes == the first-N-layers prefix of
    the full file (after the header) — save_weights_upto semantics."""
    cfg = C.get_config("yolov2-tiny-voc")
    specs = C.build_specs(cfg)
    params, stats = engine.init_params(specs, (1, 416, 416, 3),
                                       jax.random.PRNGKey(1), folded=False)
    full, part = tmp_path / "f.weights", tmp_path / "p.weights"
    W.save_darknet_weights(specs, 416, params, stats, str(full))
    W.save_darknet_weights(specs, 416, params, stats, str(part), upto=6)
    fb, pb = full.read_bytes(), part.read_bytes()
    assert len(pb) < len(fb)
    assert fb[:len(pb)] == pb


# --------------------------------------------------------------------------
# arbitrary-cfg end-to-end training
# --------------------------------------------------------------------------

TINY_REGION_CFG = """
[net]
batch=4
subdivisions=1
height=64
width=64
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.002
burn_in=2
max_batches=6
policy=steps
steps=4
scales=.5

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=14
size=1
stride=1
pad=1
activation=linear

[region]
anchors=1.0,1.5,2.0,2.5
bias_match=1
classes=2
coords=4
num=2
softmax=1
jitter=.3
rescore=1
object_scale=5
noobject_scale=1
class_scale=1
coord_scale=1
thresh=.6
random=0
"""


def _make_dataset(tmp_path, n=8):
    import cv2
    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = np.full((96, 128, 3), 25, np.uint8)
        w, h = int(rng.integers(40, 80)), int(rng.integers(30, 60))
        x0, y0 = int(rng.integers(0, 128 - w)), int(rng.integers(0, 96 - h))
        img[y0:y0 + h, x0:x0 + w] = 210
        p = img_dir / f"im{i}.jpg"
        cv2.imwrite(str(p), img)
        (lab_dir / f"im{i}.txt").write_text(
            f"1 {(x0+w/2)/128:.4f} {(y0+h/2)/96:.4f} "
            f"{w/128:.4f} {h/96:.4f}\n")
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst)


def test_train_arbitrary_cfg_end_to_end(tmp_path, capsys):
    """A custom (non-registry) region cfg trains end-to-end with its own
    [net] schedule + [region] hypers, checkpoints, and evaluates — the
    VERDICT order-2 done-gate."""
    from yolo_tensorflow_tpu.train.runner import run_training
    cfg_path = tmp_path / "tiny-region.cfg"
    cfg_path.write_text(TINY_REGION_CFG)
    names = tmp_path / "names.txt"
    names.write_text("thing\nother\n")
    lst = _make_dataset(tmp_path)
    args = argparse.Namespace(
        model=None, cfg=str(cfg_path), list=lst, val_list=lst,
        names=str(names), weights=None, ckpt_dir=str(tmp_path / "ck"),
        batch_size=None, steps=None, lr=None, burn_in=None,
        multiscale=False, num_data=2, num_spatial=1, save_every=6,
        log_every=2, input_size=None, eval_every=6)
    run_training(args)
    out = capsys.readouterr().out
    # [net] options honored: lr/policy/batch from the cfg
    assert "[net] lr 0.002 policy steps" in out
    assert "batch 4" in out
    # trained to the cfg's max_batches
    assert "step 6" in out
    assert "val mAP@0.5" in out
    import json
    meta = json.loads((tmp_path / "ck" / "latest.json").read_text())
    assert meta["step"] == 6


def test_train_cfg_through_cli_argparse(tmp_path, capsys):
    """Same flow through the real argparse surface (cli.main), catching
    wiring gaps the Namespace-based test can't."""
    from yolo_tensorflow_tpu.cli import main
    cfg_path = tmp_path / "tiny.cfg"
    cfg_path.write_text(TINY_REGION_CFG)
    names = tmp_path / "names.txt"
    names.write_text("thing\nother\n")
    lst = _make_dataset(tmp_path)
    main(["train", "--cfg", str(cfg_path), "--names", str(names),
          "--list", lst, "--ckpt-dir", str(tmp_path / "ck"),
          "--steps", "2", "--save-every", "2", "--log-every", "1",
          "--num-data", "2"])
    out = capsys.readouterr().out
    assert "[net] lr 0.002" in out and "step 2" in out


def test_partial_through_cli_argparse(tmp_path, capsys):
    from yolo_tensorflow_tpu.cli import main
    cfg = C.get_config("yolov2-tiny-voc")
    specs = C.build_specs(cfg)
    params, stats = engine.init_params(specs, (1, 416, 416, 3),
                                       jax.random.PRNGKey(0), folded=False)
    full = tmp_path / "full.weights"
    W.save_darknet_weights(specs, 416, params, stats, str(full))
    out = tmp_path / "backbone.conv.6"
    main(["partial", "--model", "yolov2-tiny-voc", "--weights", str(full),
          "--out", str(out), "--upto", "6"])
    assert out.exists() and out.stat().st_size < full.stat().st_size
    text = capsys.readouterr().out
    assert "first 6 darknet layers" in text


TINY_V1_CFG = """[net]
batch=4
subdivisions=1
height=64
width=64
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
burn_in=0
max_batches=4
policy=steps
steps=3
scales=.5

[convolutional]
batch_normalize=1
filters=8
size=3
stride=4
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[connected]
output=112
activation=linear

[detection]
classes=2
coords=4
rescore=1
side=4
num=1
object_scale=1
noobject_scale=.5
class_scale=1
coord_scale=5
softmax=0
sqrt=1
jitter=.2
random=1
"""


def test_v1_detection_random_is_not_multiscale(tmp_path, capsys):
    """A [detection] section's random=1 is the v1 random-responsibility
    override (detection_layer.c:143), NOT darknet's multi-scale resize flag
    (detector.c:63 applies only to region/yolo heads) — training a v1 cfg
    with random=1 must run, not abort with the '--multiscale is
    incompatible with v1' SystemExit."""
    from yolo_tensorflow_tpu.train.runner import run_training
    cfg_path = tmp_path / "tiny-v1.cfg"
    cfg_path.write_text(TINY_V1_CFG)
    names = tmp_path / "names.txt"
    names.write_text("thing\nother\n")
    lst = _make_dataset(tmp_path)
    args = argparse.Namespace(
        model=None, cfg=str(cfg_path), list=lst, val_list=None,
        names=str(names), weights=None, ckpt_dir=str(tmp_path / "ck"),
        batch_size=None, steps=1, lr=None, burn_in=None,
        multiscale=False, num_data=2, num_spatial=1, save_every=1,
        log_every=1, input_size=None, eval_every=0)
    run_training(args)
    out = capsys.readouterr().out
    assert "step 1" in out


# --------------------------------------------------------------------------
# [net] adam=1 — darknet's Adam (adam_update_gpu, src/blas_kernels.cu)
# --------------------------------------------------------------------------

def _c_adam_update(w, d, m, v, B1, B2, eps, decay, rate, batch, t):
    """Float32 transcription of adam_update_gpu + adam_kernel
    (src/blas_kernels.cu): the in-place op sequence darknet runs per
    parameter tensor per update. Returns (w, m, v); d is zeroed by the C
    (fill_gpu) so the caller passes a fresh accumulation next step."""
    f = np.float32
    m = (f(B1) * m).astype(np.float32)
    v = (f(B2) * v).astype(np.float32)
    d = (d - f(decay) * f(batch) * w).astype(np.float32)
    m = (m + f(1 - B1) * d).astype(np.float32)
    d2 = (d * d).astype(np.float32)
    v = (v + f(1 - B2) * d2).astype(np.float32)
    mhat = m / f(1 - B1 ** t)
    vhat = v / f(1 - B2 ** t)
    w = (w + f(rate) * mhat / (np.sqrt(vhat) + f(eps))).astype(np.float32)
    return w, m, v


def test_darknet_adam_matches_c_transcription():
    """Drive darknet_adam with g = -d/batch (the gradient identity every
    loss test pins) and diff the weight trajectory against the C op
    sequence over several steps, decay included on every tensor (the
    adam branch applies decay to biases/scales too)."""
    import optax
    rng = np.random.default_rng(7)
    B1, B2, eps, decay, lr, batch = 0.9, 0.999, 1e-7, 0.0005, 0.01, 4
    shapes = {"w": (3, 3, 2, 4), "b": (4,), "s": (4,)}
    params_np = {k: rng.normal(0, 0.5, sh).astype(np.float32)
                 for k, sh in shapes.items()}
    ds = [{k: rng.normal(0, 1.0, sh).astype(np.float32)
           for k, sh in shapes.items()} for _ in range(6)]

    # C side
    w_c = {k: v.copy() for k, v in params_np.items()}
    m_c = {k: np.zeros_like(v) for k, v in params_np.items()}
    v_c = {k: np.zeros_like(v) for k, v in params_np.items()}
    for t, d in enumerate(ds, start=1):
        for k in shapes:
            w_c[k], m_c[k], v_c[k] = _c_adam_update(
                w_c[k], d[k].copy(), m_c[k], v_c[k],
                B1, B2, eps, decay, lr, batch, t)

    # ours
    tx = T.darknet_adam(lambda step: jnp.float32(lr), b1=B1, b2=B2,
                        eps=eps, decay=decay, batch=batch)
    params = jax.tree.map(jnp.asarray, params_np)
    st = tx.init(params)
    for d in ds:
        g = jax.tree.map(lambda d_: jnp.asarray(-d_ / batch), d)
        upd, st = tx.update(g, st, params)
        params = optax.apply_updates(params, upd)
    for k in shapes:
        # atol 1e-6: six chained f32 steps; XLA fuses the kernel's op
        # sequence in a different association order than the numpy twin
        np.testing.assert_allclose(np.asarray(params[k]), w_c[k],
                                   rtol=2e-5, atol=1e-6, err_msg=k)


def test_net_options_adam_parse_and_dispatch():
    o = T.NetTrainOptions.from_net({"adam": "1", "B1": "0.95",
                                    "B2": "0.99", "eps": "1e-6",
                                    "batch": "8"})
    assert o.adam and o.B1 == 0.95 and o.B2 == 0.99 and o.eps == 1e-6
    # dispatch: adam=1 -> DarknetAdamState; default -> SGD chain state
    tx = T.optimizer_from_net(o)
    st = tx.init({"w": jnp.zeros((2, 2))})
    assert isinstance(st, T.DarknetAdamState)
    o2 = T.NetTrainOptions.from_net({"batch": "8"})
    assert not o2.adam
    st2 = T.optimizer_from_net(o2).init({"w": jnp.zeros((2, 2))})
    assert not isinstance(st2, T.DarknetAdamState)


def test_train_cfg_adam_end_to_end(tmp_path, capsys):
    """adam=1 in a custom cfg reaches the optimizer and trains (the [net]
    option darknet's CPU update path silently drops; we honor the GPU
    semantics)."""
    from yolo_tensorflow_tpu.cli import main
    cfg_path = tmp_path / "tiny-adam.cfg"
    cfg_path.write_text(TINY_REGION_CFG.replace(
        "momentum=0.9", "momentum=0.9\nadam=1\nB1=0.9\nB2=0.999"))
    names = tmp_path / "names.txt"
    names.write_text("thing\nother\n")
    lst = _make_dataset(tmp_path)
    main(["train", "--cfg", str(cfg_path), "--names", str(names),
          "--list", lst, "--ckpt-dir", str(tmp_path / "ck"),
          "--steps", "2", "--save-every", "2", "--log-every", "1",
          "--num-data", "2"])
    out = capsys.readouterr().out
    assert "adam B1=0.9 B2=0.999" in out and "step 2" in out


# --------------------------------------------------------------------------
# [net]/head augmentation hypers -> loader (get_base_args plumbing)
# --------------------------------------------------------------------------

def test_aug_from_cfg_defaults_and_values():
    from yolo_tensorflow_tpu.train.runner import aug_from_cfg
    # darknet defaults (parse_net_options:675-679; parse_yolo/region max)
    d = aug_from_cfg({}, {}, head=3)
    assert d == {"jitter": 0.2, "hue": 0.0, "sat": 1.0, "exposure": 1.0,
                 "max_boxes": 90}
    assert aug_from_cfg({}, {}, head=2)["max_boxes"] == 30
    d = aug_from_cfg({"saturation": "1.5", "exposure": "1.5",
                      "hue": ".1"}, {"jitter": ".3", "max": "60"}, head=3)
    assert d == {"jitter": 0.3, "hue": 0.1, "sat": 1.5, "exposure": 1.5,
                 "max_boxes": 60}


def test_cfg_aug_reaches_loader(tmp_path, monkeypatch):
    """train --cfg must construct the loader with the cfg's jitter/HSV/max
    boxes, not the registry defaults."""
    from yolo_tensorflow_tpu.train.runner import run_training
    import yolo_tensorflow_tpu.data.loader as DL
    captured = {}

    class _Probe(Exception):
        pass

    def fake_loader(*a, **kw):
        captured.update(kw)
        raise _Probe

    monkeypatch.setattr(DL, "DetectionLoader", fake_loader)
    cfg_path = tmp_path / "aug.cfg"
    cfg_path.write_text(TINY_REGION_CFG.replace(
        "momentum=0.9", "momentum=0.9\nsaturation=1.7\nexposure=1.3\nhue=.05"
    ).replace("jitter=.3", "jitter=.25\nmax=12"))
    names = tmp_path / "names.txt"
    names.write_text("thing\nother\n")
    lst = _make_dataset(tmp_path, n=4)
    args = argparse.Namespace(
        model=None, cfg=str(cfg_path), list=lst, val_list=None,
        names=str(names), weights=None, ckpt_dir=str(tmp_path / "ck"),
        batch_size=None, steps=1, lr=None, burn_in=None,
        multiscale=False, num_data=1, num_spatial=1, save_every=100,
        log_every=1, input_size=None, eval_every=0)
    with pytest.raises(_Probe):
        run_training(args)
    assert captured["jitter"] == 0.25 and captured["max_boxes"] == 12
    assert captured["sat"] == 1.7 and captured["exposure"] == 1.3
    assert captured["hue"] == 0.05


def test_specs_to_cfg_scaled_schedule():
    """specs_to_cfg(max_batches=N) places the steps-policy LR drops at
    80%/90% of N (the stock yolov3 cfg's 500200:400000,450000
    proportions) and round-trips through the parser — the fix for the
    flagship run's constant-LR oscillation (a 6000-step run never
    reached the stock boundaries; held-out mAP fell 0.913 -> 0.744 over
    the last 1000 steps; see tools/flagship_train.py)."""
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.io.cfg import parse_cfg_file, specs_to_cfg

    cfg = C.get_config("yolov2-tiny-voc", input_size=96)
    text = specs_to_cfg(cfg, batch=8, max_batches=6000)
    assert "max_batches=6000" in text
    assert "steps=4800,5400" in text and "scales=.1,.1" in text
    # default emission keeps the stock schedule byte-for-byte
    stock = specs_to_cfg(cfg, batch=8)
    assert "max_batches=500200" in stock
    assert "steps=400000,450000" in stock

    # the parser reads the scaled boundaries back, and the schedule the
    # trainer builds from them really drops x0.1 / x0.01
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.cfg")
        with open(p, "w") as f:
            f.write(text)
        _, net, _ = parse_cfg_file(p)
    assert net["steps"] == "4800,5400"
    from yolo_tensorflow_tpu.train import loop as T
    opts = T.NetTrainOptions.from_net(dict(net))
    sched = T.darknet_schedule(opts)
    lr = float(opts.learning_rate)
    import numpy as np
    assert np.isclose(float(sched(4799)), lr, rtol=1e-6)
    assert np.isclose(float(sched(4801)), lr * 0.1, rtol=1e-6)
    assert np.isclose(float(sched(5401)), lr * 0.01, rtol=1e-6)
