"""Recurrent layer family ([rnn]/[gru]/[lstm]/[crnn]) gates.

Covers the last rows of the reference's native component inventory
(SURVEY.md §2b: src/rnn_layer.c, src/gru_layer.c, src/lstm_layer.c,
src/crnn_layer.c): C-oracle forward parity on (cfg, weights) pairs this
framework emits, .weights round-trips, functional state threading, and
trainability (grads flow through the scan).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import dataclasses

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.io import weights as W
from yolo_tensorflow_tpu.io.cfg import parse_cfg, specs_to_cfg
from yolo_tensorflow_tpu.models import engine, specs as S

REFERENCE = "/root/reference/Darknet2Tensorflow/darknet-master"

IN, OUT, T = 12, 16, 5


def _carrier():
    """Any registry config works as the specs_to_cfg carrier for headless
    (no-Detect) nets; only input_size is read, and the flat-input form
    (inputs=) bypasses even that."""
    return C.get_config("darknet19-classifier")


def _rand_stats(stats, rng):
    out = {}
    for k, v in stats.items():
        if "mean" in v:
            n = v["mean"].shape[0]
            out[k] = {"mean": rng.standard_normal(n).astype(np.float32) * .1,
                      "var": rng.random(n).astype(np.float32) * 0.5 + 0.75}
        else:
            out[k] = _rand_stats(v, rng)
    return out


def _flat_specs(layer):
    return (S.TransposeFlatten(), layer, S.Detect(()))


def _init(specs, input_shape, rng, seed=0):
    params, stats = engine.init_params(specs, input_shape,
                                       jax.random.PRNGKey(seed))
    params = jax.tree.map(np.asarray, params)
    stats = _rand_stats(stats, rng)
    return params, stats


FLAT_CASES = [
    ("rnn-leaky", S.Rnn(OUT, act="leaky"), False),
    ("rnn-logistic-bn", S.Rnn(OUT, act="logistic", bn=True), True),
    ("rnn-shortcut", S.Rnn(OUT, act="tanh", shortcut=True), False),
    ("gru", S.Gru(OUT), False),
    ("gru-tanh-bn", S.Gru(OUT, tanh=True, bn=True), True),
    ("lstm", S.Lstm(OUT), False),
    ("lstm-bn", S.Lstm(OUT, bn=True), True),
]


class TestForwardShapes:
    def test_flat_families(self, rng):
        for _, layer, _bn in FLAT_CASES:
            specs = _flat_specs(layer)
            params, stats = _init(specs, (T, 1, 1, IN), rng)
            folded = W.fold_params(params, stats, 1e-5, "darknet")
            x = jnp.asarray(rng.standard_normal((T, 1, 1, IN)),
                            jnp.float32)
            (out, _), = engine.apply(specs, folded, x, time_steps=T)[0]
            assert out.shape == (T, OUT)
            assert np.isfinite(np.asarray(out)).all()

    def test_crnn(self, rng):
        specs = (S.Crnn(6, 4, act="leaky"), S.Detect(()))  # no conv needed:
        # our engine has no workspace concept (XLA owns scratch memory)
        params, stats = _init(specs, (T, 8, 8, 3), rng)
        folded = W.fold_params(params, stats, 1e-5, "darknet")
        x = jnp.asarray(rng.standard_normal((T, 8, 8, 3)), jnp.float32)
        (out, _), = engine.apply(specs, folded, x, time_steps=T)[0]
        assert out.shape == (T, 8, 8, 6)
        assert np.isfinite(np.asarray(out)).all()


class TestStateThreading:
    """One T=4 scan == two T=2 calls chained through aux['rec_state'] —
    the functional twin of darknet's persistent l.state buffers."""

    @pytest.mark.parametrize("layer", [
        S.Rnn(OUT, act="leaky"), S.Rnn(OUT, shortcut=True),
        S.Gru(OUT), S.Lstm(OUT)])
    def test_split_equals_joint(self, layer, rng):
        specs = _flat_specs(layer)
        params, stats = _init(specs, (4, 1, 1, IN), rng)
        folded = W.fold_params(params, stats, 1e-5, "darknet")
        x = jnp.asarray(rng.standard_normal((4, 1, 1, IN)), jnp.float32)

        dets, _ = engine.apply(specs, folded, x, time_steps=4)
        joint = np.asarray(dets[0][0])

        dets1, aux1 = engine.apply(specs, folded, x[:2], time_steps=2)
        dets2, _ = engine.apply(specs, folded, x[2:], time_steps=2,
                                rec_state=aux1["rec_state"])
        split = np.concatenate([np.asarray(dets1[0][0]),
                                np.asarray(dets2[0][0])])
        np.testing.assert_allclose(split, joint, rtol=1e-5, atol=1e-6)

    def test_crnn_state(self, rng):
        specs = (S.Crnn(6, 4), S.Detect(()))
        params, stats = _init(specs, (4, 6, 6, 3), rng)
        folded = W.fold_params(params, stats, 1e-5, "darknet")
        x = jnp.asarray(rng.standard_normal((4, 6, 6, 3)), jnp.float32)
        dets, _ = engine.apply(specs, folded, x, time_steps=4)
        joint = np.asarray(dets[0][0])
        dets1, aux1 = engine.apply(specs, folded, x[:2], time_steps=2)
        dets2, _ = engine.apply(specs, folded, x[2:], time_steps=2,
                                rec_state=aux1["rec_state"])
        split = np.concatenate([np.asarray(dets1[0][0]),
                                np.asarray(dets2[0][0])])
        np.testing.assert_allclose(split, joint, rtol=1e-5, atol=1e-6)


class TestWeightsRoundTrip:
    @pytest.mark.parametrize("name,layer,bn", FLAT_CASES)
    def test_flat(self, name, layer, bn, rng, tmp_path):
        specs = _flat_specs(layer)
        params, stats = _init(specs, (1, 1, 1, IN), rng)
        path = str(tmp_path / "r.weights")
        W.save_darknet_weights(specs, 1, params, stats, path,
                               in_channels=IN)
        n_expected = W.param_count(specs, 1, in_channels=IN)
        payload = (os.path.getsize(path) - 20) // 4
        assert payload == n_expected
        p2, s2, _ = W.load_darknet_weights(specs, 1, path, fold=False,
                                           in_channels=IN)
        jax.tree.map(np.testing.assert_allclose, params, p2)
        jax.tree.map(np.testing.assert_allclose, stats, s2)

    def test_crnn(self, rng, tmp_path):
        specs = (S.Crnn(6, 4, bn=True), S.Detect(()))
        params, stats = _init(specs, (1, 8, 8, 3), rng)
        path = str(tmp_path / "c.weights")
        W.save_darknet_weights(specs, 8, params, stats, path)
        p2, s2, _ = W.load_darknet_weights(specs, 8, path, fold=False)
        jax.tree.map(np.testing.assert_allclose, params, p2)
        jax.tree.map(np.testing.assert_allclose, stats, s2)


class TestCfgRoundTrip:
    def test_flat_net(self):
        cfg = _carrier()
        specs = (S.TransposeFlatten(), S.Rnn(OUT, act="leaky", bn=True),
                 S.Gru(OUT, tanh=True), S.Lstm(OUT))
        text = specs_to_cfg(cfg, specs, inputs=IN, time_steps=T)
        assert "inputs=12" in text and "time_steps=5" in text
        parsed, net, _ = parse_cfg(text)
        assert parsed == specs
        assert int(net["time_steps"]) == T

    def test_crnn_net(self):
        cfg = dataclasses.replace(_carrier(), input_size=8)
        specs = (S.Crnn(6, 4, act="leaky", shortcut=True),)
        text = specs_to_cfg(cfg, specs, time_steps=T)
        parsed, net, _ = parse_cfg(text)
        assert parsed == specs


class TestTraining:
    @pytest.mark.parametrize("cell", [
        S.Rnn(16, act="tanh", bn=True),
        S.Gru(16, tanh=True),
        S.Lstm(16),
    ], ids=["rnn-bn", "gru", "lstm"])
    def test_grads_flow_and_loss_drops(self, cell, rng):
        """A tiny recurrent+Dense next-token model on cyclic sequences —
        the examples/rnn.c char-rnn task in miniature, for each cell
        family. Gates that BPTT through the scan trains (train-mode BN
        included for the RNN case; B=4 parallel streams, as BN over a
        single row would zero out the signal — darknet trains char-rnn
        with batch>1 for the same reason)."""
        import optax
        vocab, steps, B = 8, 16, 4
        specs = (S.TransposeFlatten(), cell,
                 S.Dense(vocab, act="linear"), S.Detect(()))
        params, stats = engine.init_params(specs, (steps * B, 1, 1, vocab),
                                           jax.random.PRNGKey(3))

        # B cyclic streams offset by b; step-major rows (t*B + b)
        t_idx = np.arange(steps + 1)[:, None]            # (T+1, 1)
        b_off = np.arange(B)[None, :]                    # (1, B)
        grid = (t_idx + b_off) % vocab                   # (T+1, B)
        xs = np.eye(vocab, dtype=np.float32)[grid[:-1]].reshape(-1, vocab)
        ys = grid[1:].reshape(-1)

        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        def loss_fn(p, st, x, y):
            dets, aux = engine.apply(specs, p, x, train=True,
                                     batch_stats=st, time_steps=steps,
                                     bn_formula="tf")
            logits = dets[0][0]
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return ce.mean(), aux["batch_stats"]

        @jax.jit
        def step(p, st, opt_state, x, y):
            (loss, new_st), g = jax.value_and_grad(
                loss_fn, has_aux=True)(p, st, x, y)
            upd, opt_state = tx.update(g, opt_state, p)
            p = optax.apply_updates(p, upd)
            st = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, st, new_st)
            return p, st, opt_state, loss

        x = jnp.asarray(xs[:, None, None, :])
        y = jnp.asarray(ys)
        first = None
        for i in range(150):
            params, stats, opt_state, loss = step(params, stats, opt_state,
                                                  x, y)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.5 * first, (first, float(loss))


class TestCharRnn:
    """textgen.py — the examples/rnn.c application layer."""

    CFG = """[net]
inputs=8
batch=4
time_steps=16

[rnn]
batch_normalize=1
output=32
activation=tanh

[connected]
output=8
activation=linear

[softmax]
"""

    def _write_cfg(self, tmp_path):
        p = tmp_path / "char.cfg"
        p.write_text(self.CFG)
        return str(p)

    def test_learns_cycle_and_generates_it(self, tmp_path):
        """Train on a deterministic byte cycle, then low-temperature
        sampling must reproduce the cycle — the end-to-end gate
        train_char_rnn -> fold -> generate (state threading included)."""
        from yolo_tensorflow_tpu import textgen
        cfg = self._write_cfg(tmp_path)
        text = bytes(range(97, 105)) * 100        # 8-byte cycle
        losses = []
        specs, params, vocab = textgen.train_char_rnn(
            text, cfg, steps_per_seq=16, batch=8, iters=250, lr=5e-3,
            log_every=1, log=lambda s: losses.append(s))
        final = float(losses[-1].split()[-1])
        assert final < 0.3, losses[-5:]

        seed = chr(97 % 8)                         # batch_text folds % vocab
        out = textgen.generate(specs, params, vocab, seed_text=seed,
                               n=16, temperature=0.1, rng_seed=0)
        codes = [ord(c) for c in out]
        hits = sum((codes[i + 1] - codes[i]) % vocab == 1
                   for i in range(len(codes) - 1))
        assert hits >= 14, codes

    def test_generate_deterministic_and_cli(self, tmp_path, capsys):
        from yolo_tensorflow_tpu import textgen
        from yolo_tensorflow_tpu import cli
        cfg = self._write_cfg(tmp_path)
        specs, params, vocab = textgen.load_charrnn(cfg)
        a = textgen.generate(specs, params, vocab, n=20, rng_seed=7)
        b = textgen.generate(specs, params, vocab, n=20, rng_seed=7)
        assert a == b and len(a) == 20
        cli.main(["generate", "--cfg", cfg, "-n", "10", "--rng-seed", "1"])
        out = capsys.readouterr().out
        assert len(out.rstrip("\n")) == 10

    def test_no_softmax_cfg_trains_and_generates(self, tmp_path):
        """A cfg whose head has no [softmax] trains through the logits-CE
        branch; the sampler must softmax the raw logits itself —
        previously temper_probs clipped logits into a garbage distribution
        silently. Gate: the learned cycle still generates."""
        from yolo_tensorflow_tpu import textgen
        p = tmp_path / "nosm.cfg"
        p.write_text(self.CFG.replace("[softmax]", ""))
        text = bytes(range(97, 105)) * 100
        specs, params, vocab = textgen.train_char_rnn(
            text, str(p), steps_per_seq=16, batch=8, iters=250, lr=5e-3,
            log_every=250, log=lambda s: None)
        seed = chr(97 % 8)
        out = textgen.generate(specs, params, vocab, seed_text=seed,
                               n=16, temperature=0.1, rng_seed=0)
        codes = [ord(c) for c in out]
        hits = sum((codes[i + 1] - codes[i]) % vocab == 1
                   for i in range(len(codes) - 1))
        assert hits >= 14, codes

    def test_temper_probs_matches_c_order(self):
        """Transcription of the C ordering (softmax temperature FIRST,
        rnn.c 1e-4 floor on the TEMPERED probs): a raw prob of 5e-5
        survives T=2 tempering but would be wrongly zeroed if the floor
        ran first."""
        from yolo_tensorflow_tpu.textgen import temper_probs
        p = np.full(8, (1 - 5e-5) / 7, np.float32)
        p[0] = 5e-5
        got = np.asarray(temper_probs(jnp.asarray(p), 2.0))
        ref = p ** 0.5
        ref /= ref.sum()                       # softmax(log(p)/2)
        ref[ref < 1e-4] = 0                    # then the floor
        np.testing.assert_allclose(got, ref, rtol=1e-5)
        assert got[0] > 0                      # tail char stays sampleable
        # and at low temperature the floor DOES fire on tempered values
        low = np.asarray(temper_probs(jnp.asarray(p), 0.5))
        assert low[0] == 0.0

    def test_batch_text_bounds(self):
        from yolo_tensorflow_tpu.textgen import batch_text
        rng = np.random.default_rng(0)
        with pytest.raises(ValueError, match="training text has"):
            batch_text(b"abc", 8, batch=2, steps=8, rng=rng)
        # len == steps+1: exactly one legal window, must not crash
        x, y = batch_text(bytes(range(9)), 16, batch=4, steps=8, rng=rng)
        assert x.shape == (32, 16) and y.shape == (32,)
        np.testing.assert_array_equal(y[:4], [1, 1, 1, 1])  # only window

    def test_batch_tokens(self):
        from yolo_tensorflow_tpu.textgen import batch_tokens
        rng = np.random.default_rng(0)
        toks = np.arange(40) % 10
        x, y = batch_tokens(toks, 10, batch=3, steps=5, rng=rng)
        assert x.shape == (15, 10) and y.shape == (15,)
        # one-hot x at step t, stream b must be followed by y at same slot
        recon = np.argmax(x, axis=1)
        np.testing.assert_array_equal((recon + 1) % 10, y % 10)
        with pytest.raises(ValueError, match="token ids"):
            batch_tokens(np.array([3, 99]), 10, batch=1, steps=1, rng=rng)

    def test_rnn_train_cli_saves_loadable_weights(self, tmp_path, capsys):
        """rnn-train --out writes UNFOLDED .weights (BN cfg included) that
        load back and generate — the full train->save->reload loop."""
        from yolo_tensorflow_tpu import cli, textgen
        cfg = self._write_cfg(tmp_path)
        txt = tmp_path / "t.txt"
        txt.write_bytes(bytes(range(97, 105)) * 50)
        wout = str(tmp_path / "trained.weights")
        cli.main(["rnn-train", "--cfg", cfg, "--text", str(txt),
                  "--steps", "8", "--batch", "4", "--iters", "3",
                  "--out", wout])
        assert "wrote" in capsys.readouterr().out
        specs, params, vocab = textgen.load_charrnn(cfg, wout)
        out = textgen.generate(specs, params, vocab, n=5, rng_seed=0)
        assert len(out) == 5


# ---------------------------------------------------------------------------
# C-oracle parity
# ---------------------------------------------------------------------------

pytestmark_oracle = pytest.mark.skipif(
    not (os.path.isdir(REFERENCE) and shutil.which("gcc")),
    reason="darknet oracle needs the reference tree and gcc")


@pytest.fixture(scope="module")
def oracle():
    if not (os.path.isdir(REFERENCE) and shutil.which("gcc")):
        pytest.skip("darknet oracle needs the reference tree and gcc")
    from darknet_oracle import Oracle
    try:
        return Oracle()
    except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
        pytest.skip(f"oracle build failed: {e}")


@pytest.mark.parametrize("name,layer,bn", FLAT_CASES)
def test_flat_recurrent_matches_c_oracle(oracle, name, layer, bn, rng,
                                         tmp_path):
    specs = _flat_specs(layer)
    params, stats = _init(specs, (T, 1, 1, IN), rng)
    wpath = str(tmp_path / f"{name}.weights")
    W.save_darknet_weights(specs, 1, params, stats, wpath, in_channels=IN)
    cpath = str(tmp_path / f"{name}.cfg")
    with open(cpath, "w") as f:
        f.write(specs_to_cfg(_carrier(), specs, inputs=IN, time_steps=T))

    x = rng.standard_normal((T, IN)).astype(np.float32)
    folded = W.fold_params(params, stats, 1e-5, "darknet")
    dets, _ = engine.apply(specs, folded,
                           jnp.asarray(x.reshape(T, 1, 1, IN)),
                           time_steps=T)
    mine = np.asarray(dets[0][0])            # (T, OUT)

    net = oracle.load(cpath, wpath)
    ref = oracle.predict_flat(net, x, T * OUT).reshape(T, OUT)
    rel = np.abs(ref - mine).max() / (np.abs(ref).mean() + 1e-6)
    assert rel < 1e-4, (name, rel)


@pytest.mark.parametrize("bn", [False, True])
def test_crnn_matches_c_oracle(oracle, bn, rng, tmp_path):
    # darknet quirk: make_crnn_layer never propagates its conv sublayers'
    # workspace_size, so a CRNN-first net gets a NULL im2col workspace and
    # the C runtime SEGFAULTS (src/crnn_layer.c vs parser.c:837). A leading
    # 5x5 conv sizes the shared workspace (8*8*25*3 floats) above every
    # CRNN sublayer's need (8*8*9*4), letting the oracle run the same net.
    size = 8
    specs = (S.Conv(4, 5, bn=False, act="linear", pad=2),
             S.Crnn(6, 4, act="leaky", bn=bn), S.Detect(()))
    params, stats = _init(specs, (T, size, size, 3), rng)
    wpath = str(tmp_path / "crnn.weights")
    W.save_darknet_weights(specs, size, params, stats, wpath)
    cpath = str(tmp_path / "crnn.cfg")
    cfg = dataclasses.replace(_carrier(), input_size=size)
    with open(cpath, "w") as f:
        f.write(specs_to_cfg(cfg, specs, time_steps=T))

    img = rng.random((T, size, size, 3)).astype(np.float32)
    folded = W.fold_params(params, stats, 1e-5, "darknet")
    dets, _ = engine.apply(specs, folded, jnp.asarray(img), time_steps=T)
    mine = np.asarray(dets[0][0])            # (T, H, W, 6)

    # darknet wants the whole sequence as T stacked CHW frames
    flat = np.concatenate([f.transpose(2, 0, 1).ravel() for f in img])
    net = oracle.load(cpath, wpath)
    ref = oracle.predict_flat(net, flat, T * 6 * size * size) \
        .reshape(T, 6, size, size).transpose(0, 2, 3, 1)
    rel = np.abs(ref - mine).max() / (np.abs(ref).mean() + 1e-6)
    assert rel < 1e-4, rel


def test_connected_default_logistic_bn_matches_c_oracle(oracle, rng,
                                                        tmp_path):
    """[connected] with NO activation key defaults to LOGISTIC in darknet
    (parse_connected), and supports batch_normalize (bias-as-beta, file
    order bias/weights/scales/mean/var). Both were silently mishandled
    before round 2's recurrent work surfaced them."""
    from yolo_tensorflow_tpu.io.cfg import parse_cfg
    cfg_text = ("[net]\ninputs=12\nbatch=1\n\n"
                "[connected]\nbatch_normalize=1\noutput=16\n\n"
                "[connected]\noutput=8\nactivation=tanh\n")
    specs, _, _ = parse_cfg(cfg_text)
    assert specs[1] == S.Dense(16, act="logistic", bn=True)
    assert specs[2] == S.Dense(8, act="tanh")
    specs = specs + (S.Detect(()),)

    params, stats = _init(specs, (1, 1, 1, 12), rng)
    wpath = str(tmp_path / "fc.weights")
    W.save_darknet_weights(specs, 1, params, stats, wpath, in_channels=12)
    cpath = str(tmp_path / "fc.cfg")
    with open(cpath, "w") as f:
        f.write(cfg_text)

    x = rng.standard_normal((1, 12)).astype(np.float32)
    folded = W.fold_params(params, stats, 1e-5, "darknet")
    dets, _ = engine.apply(specs, folded, jnp.asarray(x.reshape(1, 1, 1, 12)))
    mine = np.asarray(dets[0][0]).reshape(-1)

    net = oracle.load(cpath, wpath)
    ref = oracle.predict_flat(net, x, 8)
    rel = np.abs(ref - mine).max() / (np.abs(ref).mean() + 1e-6)
    assert rel < 1e-4, rel


def test_softmax_groups_temperature_matches_c_oracle(oracle, rng,
                                                     tmp_path):
    """[softmax] groups= (contiguous-chunk softmax, softmax_cpu) and
    temperature= (exp((x-max)/T), the char-rnn sampling knob) vs the C."""
    cfg_text = ("[net]\ninputs=12\nbatch=1\n\n"
                "[connected]\noutput=24\nactivation=linear\n\n"
                "[softmax]\ngroups=4\ntemperature=2.0\n")
    from yolo_tensorflow_tpu.io.cfg import parse_cfg
    specs, _, _ = parse_cfg(cfg_text)
    assert specs[-1] == S.Softmax(groups=4, temperature=2.0)
    specs = specs + (S.Detect(()),)
    params, stats = _init(specs, (1, 1, 1, 12), rng)
    wpath = str(tmp_path / "sm.weights")
    W.save_darknet_weights(specs, 1, params, stats, wpath, in_channels=12)
    cpath = str(tmp_path / "sm.cfg")
    with open(cpath, "w") as f:
        f.write(cfg_text)

    x = rng.standard_normal((1, 12)).astype(np.float32)
    folded = W.fold_params(params, stats, 1e-5, "darknet")
    dets, _ = engine.apply(specs, folded,
                           jnp.asarray(x.reshape(1, 1, 1, 12)))
    mine = np.asarray(dets[0][0]).reshape(-1)
    net = oracle.load(cpath, wpath)
    ref = oracle.predict_flat(net, x, 24)
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)
    # each 6-wide group sums to 1 independently
    np.testing.assert_allclose(mine.reshape(4, 6).sum(1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("shortcut", [False, True])
def test_rnn_state_persists_across_oracle_calls(oracle, shortcut, rng,
                                                tmp_path):
    """Two consecutive darknet predicts continue from l.state — our
    rec_state threading must reproduce call 2 exactly, for both the
    state-overwrite and the shortcut state-accumulate variants
    (rnn_layer.c:112)."""
    layer = S.Rnn(OUT, act="leaky", shortcut=shortcut)
    specs = _flat_specs(layer)
    params, stats = _init(specs, (T, 1, 1, IN), rng)
    wpath = str(tmp_path / "s.weights")
    W.save_darknet_weights(specs, 1, params, stats, wpath, in_channels=IN)
    cpath = str(tmp_path / "s.cfg")
    with open(cpath, "w") as f:
        f.write(specs_to_cfg(_carrier(), specs, inputs=IN, time_steps=T))

    x1 = rng.standard_normal((T, IN)).astype(np.float32)
    x2 = rng.standard_normal((T, IN)).astype(np.float32)
    net = oracle.load(cpath, wpath)
    oracle.predict_flat(net, x1, T * OUT)
    ref2 = oracle.predict_flat(net, x2, T * OUT).reshape(T, OUT)

    folded = W.fold_params(params, stats, 1e-5, "darknet")
    _, aux1 = engine.apply(specs, folded,
                           jnp.asarray(x1.reshape(T, 1, 1, IN)),
                           time_steps=T)
    dets2, _ = engine.apply(specs, folded,
                            jnp.asarray(x2.reshape(T, 1, 1, IN)),
                            time_steps=T, rec_state=aux1["rec_state"])
    mine2 = np.asarray(dets2[0][0])
    rel = np.abs(ref2 - mine2).max() / (np.abs(ref2).mean() + 1e-6)
    assert rel < 1e-4, rel
