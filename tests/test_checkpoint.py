"""Checkpoint save/restore/resume gates."""

import numpy as np
import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.io import checkpoint as ckpt
from yolo_tensorflow_tpu.train import loop as T


def _state():
    cfg = C.get_config("yolov2-tiny-voc", input_size=64)
    tx = T.make_optimizer(T.darknet_lr_schedule(1e-3))
    return cfg, tx, T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                         input_size=64)


def test_roundtrip(tmp_path):
    cfg, tx, state = _state()
    ckpt.save_train_state(state, str(tmp_path), 7)
    restored, step = ckpt.restore_train_state(state, str(tmp_path))
    assert step == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prune_keeps_latest(tmp_path):
    cfg, tx, state = _state()
    for s in (1, 2, 3, 4, 5):
        ckpt.save_train_state(state, str(tmp_path), s, keep=2)
    files = sorted(p.name for p in tmp_path.glob("ckpt-*.npz"))
    assert files == ["ckpt-4.npz", "ckpt-5.npz"]
    _, step = ckpt.restore_train_state(state, str(tmp_path))
    assert step == 5


def test_restore_missing(tmp_path):
    cfg, tx, state = _state()
    restored, step = ckpt.restore_train_state(state, str(tmp_path))
    assert restored is None and step == 0


def test_resume_continues_training(tmp_path):
    """Save mid-training, restore, and confirm the next step is identical to
    an uninterrupted run — the resume-from-.backup contract."""
    cfg, tx, state = _state()
    step_fn = jax.jit(T.make_train_step(cfg, tx, input_size=64))
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    truths = np.zeros((2, 4, 5), np.float32)
    truths[:, 0] = [0.5, 0.5, 0.5, 0.5, 1]

    s1, _ = step_fn(state, images, truths)
    ckpt.save_train_state(s1, str(tmp_path), 1)
    s2_direct, m_direct = step_fn(s1, images, truths)

    s1r, step = ckpt.restore_train_state(s1, str(tmp_path))
    assert step == 1
    s2_resumed, m_resumed = step_fn(s1r, images, truths)
    np.testing.assert_allclose(float(m_direct["cost"]),
                               float(m_resumed["cost"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s2_direct.params),
                    jax.tree.leaves(s2_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_checkpoint_has_field(tmp_path):
    """checkpoint_has_field sees NamedTuple fields the restore template
    would silently drop (None = empty pytree) — the QAT-resumed-without-
    --qat detector."""
    cfg = C.get_config("yolov2-tiny-voc", input_size=64)
    tx = T.make_optimizer(T.darknet_lr_schedule(1e-3))
    qstate = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                  input_size=64, qat=True)
    fstate = T.create_train_state(cfg, tx, jax.random.PRNGKey(0),
                                  input_size=64)
    qdir, fdir = str(tmp_path / "q"), str(tmp_path / "f")
    ckpt.save_train_state(qstate, qdir, 1)
    ckpt.save_train_state(fstate, fdir, 1)
    assert ckpt.checkpoint_has_field(qdir, "qat_scales")
    assert not ckpt.checkpoint_has_field(fdir, "qat_scales")
    assert not ckpt.checkpoint_has_field(str(tmp_path / "nope"),
                                         "qat_scales")


def test_crashed_save_leaves_previous_checkpoint_usable(tmp_path,
                                                        monkeypatch):
    """Atomic-save gate: a process killed mid-save (the truncated-npz
    failure darknet's in-place save_weights is exposed to,
    src/parser.c:992) must leave no partial ckpt-N.npz under its final
    name and must not move the latest pointer — resume still lands on the
    last complete checkpoint."""
    cfg, tx, state = _state()
    ckpt.save_train_state(state, str(tmp_path), 10)

    real_savez = np.savez

    def dying_savez(f, **kw):
        # write a partial byte stream, then "crash"
        keys = list(kw)
        real_savez(f, **{k: kw[k] for k in keys[:2]})
        raise KeyboardInterrupt("simulated kill mid-save")

    monkeypatch.setattr(np, "savez", dying_savez)
    try:
        ckpt.save_train_state(state, str(tmp_path), 20)
    except KeyboardInterrupt:
        pass
    monkeypatch.undo()

    # no corrupt final-name file, no leftover temp, pointer unmoved
    assert not (tmp_path / "ckpt-20.npz").exists()
    assert not list(tmp_path.glob("*.tmp"))
    restored, step = ckpt.restore_train_state(state, str(tmp_path))
    assert step == 10
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_train_params_template_free(tmp_path):
    """load_train_params extracts (params, batch_stats, step) from a
    training checkpoint with NO TrainState template — the export-darknet
    --ckpt path that closes the C's pretrain loop (classifier.c
    save_weights feeding darknet `partial`, examples/darknet.c:491)."""
    cfg, tx, state = _state()
    ckpt.save_train_state(state, str(tmp_path), 12)

    # by dir (latest) and by explicit file, both recover the step
    for src in (str(tmp_path), str(tmp_path / "ckpt-12.npz")):
        params, stats, step = ckpt.load_train_params(src)
        assert step == 12
        assert params.keys() == dict(state.params).keys()
        assert stats.keys() == dict(state.batch_stats).keys()
        for lk, sub in params.items():
            for f, v in sub.items():
                np.testing.assert_array_equal(
                    v, np.asarray(state.params[lk][f]))

    # the extracted trees round-trip through the .weights writer
    from yolo_tensorflow_tpu.io import weights as W
    specs = C.build_specs(cfg)
    params, stats, _ = ckpt.load_train_params(str(tmp_path))
    out = tmp_path / "exported.weights"
    W.save_darknet_weights(specs, 64, params, stats, str(out))
    p2, s2, _ = W.load_darknet_weights(specs, 64, str(out), fold=False)
    for lk in params:
        for f in params[lk]:
            np.testing.assert_allclose(p2[lk][f], params[lk][f],
                                       rtol=0, atol=0)


def test_load_train_params_rejects_flat_npz(tmp_path):
    """A convert/quantize-style flat layer/field npz is NOT a training
    checkpoint — the loader must say so instead of returning empties."""
    import pytest
    np.savez(tmp_path / "flat.npz", **{"L000/w": np.zeros((3, 3, 3, 4))})
    with pytest.raises(ValueError, match="training checkpoint"):
        ckpt.load_train_params(str(tmp_path / "flat.npz"))
