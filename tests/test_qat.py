"""Quantization-aware training gates (ops/qat.py).

QAT simulates the int8 serving lattice (ops/quant.py) inside training with
straight-through gradients. These tests pin: the fake-quant forward IS the
serving quantizer's lattice, the STE gradient contract, the BN-fold /
per-channel-grid commutation that makes export exact, scale tracking in the
train step, eval parity between the fake-quant network and its int8
export, and the checkpoint/runner plumbing (float -> QAT fine-tune).
"""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine, specs as S
from yolo_tensorflow_tpu.ops import qat as QA
from yolo_tensorflow_tpu.ops import quant as Q
from yolo_tensorflow_tpu.train import loop as T

SIZE = 64


def test_fake_quant_matches_serving_lattice(rng):
    """fake_quant snaps to exactly the ints quant.conv2d_int8's input
    quantizer produces: clip(round(x/s), -127, 127)."""
    x = rng.standard_normal(512).astype(np.float32) * 3.0
    s = np.float32(np.abs(x).max() / 100.0)   # force some clipping
    y = np.asarray(QA.fake_quant(jnp.asarray(x), s))
    want_q = np.clip(np.round(x / s), -127, 127)
    np.testing.assert_allclose(y / s, want_q, rtol=0, atol=1e-4)


def test_ste_gradient_identity_inside_clip():
    """d fake_quant/dx == 1 inside the representable range, 0 where the
    clip saturates (clip-aware STE)."""
    s = jnp.float32(0.1)
    x = jnp.asarray([0.0, 0.04, -1.3, 12.69, 12.8, -12.8, 500.0],
                    jnp.float32)
    g = jax.grad(lambda v: jnp.sum(QA.fake_quant(v, s)))(x)
    # |round(x/0.1)| <= 127 for the first four, saturated for the rest
    np.testing.assert_allclose(np.asarray(g),
                               [1, 1, 1, 1, 0, 0, 0], atol=0)


def test_weight_scale_is_ptq_formula(rng):
    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    s = np.asarray(QA.weight_scale(jnp.asarray(w)))
    want = np.abs(w).max(axis=(0, 1, 2)) / 127.0
    np.testing.assert_allclose(s, want, rtol=1e-6)


def test_fold_commutes_with_weight_fake_quant(rng):
    """Per-output-channel fake-quant commutes with per-channel scaling —
    the reason folding BN (w[..., o] *= gamma_o/sigma_o) AFTER QAT lands on
    the very grid training saw. Includes negative channel factors (negative
    gamma): round-half-to-even is odd-symmetric, so the grid just flips
    sign with the channel."""
    w = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    c = rng.standard_normal(8).astype(np.float32) * 2.0
    c[::3] *= -1.0   # make sure sign flips are exercised
    c[np.abs(c) < 0.1] = 0.5
    a = np.asarray(QA.fake_quant_weights(jnp.asarray(w * c)))
    b = np.asarray(QA.fake_quant_weights(jnp.asarray(w))) * c
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_quantizable_layers_complement_heads():
    cfg = C.get_config("yolov3-tiny")
    specs = C.build_specs(cfg)
    qs = QA.quantizable_layers(specs)
    heads = Q.head_conv_layers(specs)
    convs = {i for i, sp in enumerate(specs) if isinstance(sp, S.Conv)}
    assert set(qs) == convs - heads
    assert len(qs) == 11


def _tiny_batch(n, rng):
    imgs = np.full((n, SIZE, SIZE, 3), 30, np.uint8)
    truths = np.zeros((n, 2, 5), np.float32)
    for b in range(n):
        w, h = int(rng.integers(28, 48)), int(rng.integers(28, 48))
        x0 = int(rng.integers(0, SIZE - w))
        y0 = int(rng.integers(0, SIZE - h))
        imgs[b, y0:y0 + h, x0:x0 + w] = 220
        truths[b, 0] = [(x0 + w / 2) / SIZE, (y0 + h / 2) / SIZE,
                        w / SIZE, h / SIZE, 0]
    return imgs, truths


def test_qat_train_step_tracks_scales_and_learns(rng):
    """The QAT train step warms every activation scale from the first
    batch, EMAs them after, and still optimizes the loss."""
    cfg = C.get_config("yolov3-tiny", input_size=SIZE)
    tx = T.make_optimizer(T.darknet_lr_schedule(1e-3, burn_in=10),
                          weight_decay=0)
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                 input_size=SIZE, qat=True)
    assert state.qat_scales is not None
    assert all(float(v) == 0.0 for v in state.qat_scales.values())
    step = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE))
    imgs, truths = _tiny_batch(4, rng)
    state, m = step(state, imgs, truths)
    warm = {k: float(v) for k, v in state.qat_scales.items()}
    assert all(v > 0 for v in warm.values()), warm
    costs = [float(m["cost"])]
    for _ in range(60):
        state, m = step(state, imgs, truths)
        costs.append(float(m["cost"]))
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[3] * 0.5, (costs[3], costs[-1])
    # EMA moved but stayed the same order of magnitude
    for k, v in state.qat_scales.items():
        assert 0.05 * warm[k] < float(v) < 20 * warm[k], (k, warm[k], v)


def test_qat_eval_matches_int8_export(rng):
    """engine.apply with qat_scales (train=False, unfolded params, 'tf'
    BN) computes the same network the int8 export serves: fold+quantize on
    the tracked scales, run the engine's w_q path, compare raw head maps."""
    cfg = C.get_config("yolov3-tiny", input_size=SIZE)
    specs = C.build_specs(cfg)
    tx = T.make_optimizer(T.darknet_lr_schedule(1e-3, burn_in=10),
                          weight_decay=0)
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(1),
                                 input_size=SIZE, qat=True)
    step = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE))
    imgs, truths = _tiny_batch(4, rng)
    for _ in range(8):
        state, _ = step(state, imgs, truths)

    from yolo_tensorflow_tpu.pipeline import normalize_images
    x = normalize_images(jnp.asarray(imgs), cfg)
    params = jax.tree.map(np.asarray, state.params)
    stats = jax.tree.map(np.asarray, state.batch_stats)
    scales = jax.tree.map(np.asarray, state.qat_scales)

    fq_dets, _ = engine.apply(specs, params, x, batch_stats=stats,
                              bn_eps=cfg.bn_eps, bn_formula="tf",
                              qat_scales=QA.qat_eval_scales(scales))
    qparams = QA.export_int8(specs, params, stats, scales,
                             bn_eps=cfg.bn_eps)
    assert sum(1 for v in qparams.values() if "w_q" in v) == 11
    q_dets, _ = engine.apply(specs, qparams, x, bn_eps=cfg.bn_eps)
    for (a, _), (b, _) in zip(fq_dets, q_dets):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.abs(a - b).max() / (a.std() + 1e-6)
        # f32 fake-quant arithmetic vs int32 accumulation + fold
        # association: tiny, nothing like the 0.12 PTQ-vs-f32 noise bound
        assert err < 2e-2, err


def test_qat_checkpoint_roundtrip(tmp_path, rng):
    """TrainState with qat_scales survives save/restore; a float ckpt
    restored into a QAT template raises (the runner catches this and
    re-warms the scales)."""
    from yolo_tensorflow_tpu.io import checkpoint as ckpt
    cfg = C.get_config("yolov3-tiny", input_size=SIZE)
    tx = T.make_optimizer(T.darknet_lr_schedule(1e-3), weight_decay=0)
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                 input_size=SIZE, qat=True)
    imgs, truths = _tiny_batch(2, rng)
    step = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE))
    state, _ = step(state, imgs, truths)
    ckpt.save_train_state(state, str(tmp_path / "q"), 1)
    restored, n = ckpt.restore_train_state(state, str(tmp_path / "q"))
    assert n == 1
    for k, v in state.qat_scales.items():
        np.testing.assert_allclose(np.asarray(restored.qat_scales[k]),
                                   np.asarray(v))
    # float checkpoint, QAT template -> missing scale keys
    fstate = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                  input_size=SIZE)
    ckpt.save_train_state(fstate, str(tmp_path / "f"), 1)
    with pytest.raises(KeyError):
        ckpt.restore_train_state(state, str(tmp_path / "f"))


def test_qat_run_training_smoke(tmp_path, capsys):
    """`train --qat` end to end on the registry model: scales tracked, the
    in-loop eval scores the int8 export, and int8-qat.npz ships and
    detects."""
    import cv2
    from yolo_tensorflow_tpu.train.runner import run_training

    img_dir = tmp_path / "img"
    lab_dir = tmp_path / "img"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        img = np.full((96, 128, 3), 25, np.uint8)
        w, h = int(rng.integers(40, 80)), int(rng.integers(30, 60))
        x0, y0 = int(rng.integers(0, 128 - w)), int(rng.integers(0, 96 - h))
        img[y0:y0 + h, x0:x0 + w] = 210
        p = img_dir / f"im{i}.jpg"
        cv2.imwrite(str(p), img)
        (lab_dir / f"im{i}.txt").write_text(
            f"0 {(x0+w/2)/128:.4f} {(y0+h/2)/96:.4f} "
            f"{w/128:.4f} {h/96:.4f}\n")
        paths.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(paths) + "\n")

    args = argparse.Namespace(
        model="yolov3-tiny", cfg=None, list=str(lst), val_list=str(lst),
        names=None, weights=None, ckpt_dir=str(tmp_path / "ck"),
        batch_size=4, steps=6, lr=1e-3, burn_in=2, multiscale=False,
        num_data=2, num_spatial=1, save_every=6, log_every=2,
        input_size=SIZE, eval_every=6, qat=True)
    run_training(args)
    out = capsys.readouterr().out
    assert "val mAP@0.5" in out          # evaluate_model took the QAT path
    assert "QAT export:" in out
    qnpz = tmp_path / "ck" / "int8-qat.npz"
    assert qnpz.exists()

    from yolo_tensorflow_tpu.pipeline import Detector
    import yolo_tensorflow_tpu.cli as cli
    qparams = cli._load_npz_params(str(qnpz))
    assert sum(1 for v in qparams.values() if "w_q" in v) == 11
    det = Detector("yolov3-tiny", params=qparams, input_size=SIZE,
                   num_candidates=64, conf_threshold=0.05)
    res = det.detect(np.full((96, 128, 3), 25, np.uint8))
    assert isinstance(res, list)

    # resuming the QAT checkpoint works (template has scales)
    args2 = argparse.Namespace(**{**vars(args), "steps": 7})
    run_training(args2)
    out2 = capsys.readouterr().out
    assert "resumed from step 6" in out2

    # resuming the same checkpoint WITHOUT --qat is a silent mode
    # downgrade (scales dropped, no int8 export) — the runner must say so
    args3 = argparse.Namespace(**{**vars(args), "steps": 8, "qat": False})
    run_training(args3)
    out3 = capsys.readouterr().out
    assert "WARNING: checkpoint has QAT scales but --qat is off" in out3


def test_qat_step_honors_bf16(rng):
    """--qat --bf16: quantized convs keep the requested compute dtype (MXU
    bf16 speed) instead of silently forcing exact-f32 convolutions; the
    step still warms scales and optimizes."""
    cfg = C.get_config("yolov3-tiny", input_size=SIZE)
    tx = T.make_optimizer(T.darknet_lr_schedule(1e-3, burn_in=10),
                          weight_decay=0)
    state = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                 input_size=SIZE, qat=True)
    step = jax.jit(T.make_train_step(cfg, tx, input_size=SIZE,
                                     compute_dtype=jnp.bfloat16))
    imgs, truths = _tiny_batch(4, rng)
    state, m = step(state, imgs, truths)
    assert all(float(v) > 0 for v in state.qat_scales.values())
    costs = [float(m["cost"])]
    for _ in range(40):
        state, m = step(state, imgs, truths)
        costs.append(float(m["cost"]))
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[3], (costs[3], costs[-1])
