"""Char-RNN application layer — the examples/rnn.c equivalent.

The reference's darknet binary ships a character-level RNN driver
(examples/rnn.c): ``train_char_rnn`` trains [rnn]/[gru]/[lstm] nets on raw
bytes (one-hot input, next-byte target, get_rnn_data:127) and
``test_char_rnn`` generates text by feeding one character per
``network_predict`` call, relying on the layers' persistent ``l.state``
(rnn_layer.c) and sampling from the tempered softmax (``sample_array``,
temperature folded into the softmax layer).

Here both run on the functional engine: generation threads the recurrent
state explicitly (engine.apply's ``rec_state``) through a jitted
single-step function and runs the whole sampling loop as one
``lax.scan`` — the TPU-native form of the C byte-at-a-time loop: one
compiled program, no host round-trip per character. Training uses the
same step-major (T, B) layout darknet's get_rnn_data builds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tensorflow_tpu.io import weights as W
from yolo_tensorflow_tpu.io.cfg import parse_cfg_file
from yolo_tensorflow_tpu.models import engine, specs as S


def _with_output_marker(specs):
    """Char-rnn cfgs have no [yolo]-style head, so parse_cfg emits no
    Detect marker; append one so engine.apply exposes the net output."""
    if any(isinstance(s, S.Detect) for s in specs):
        return specs
    return tuple(specs) + (S.Detect(()),)


def load_charrnn(cfg_path: str, weights_path: Optional[str] = None):
    """Parse a recurrent .cfg (+ optional .weights) -> (specs, params,
    inputs). BN is folded at load (inference form), matching the detect
    pipelines."""
    specs, net, _ = parse_cfg_file(cfg_path)
    inputs = int(net.get("inputs", 0))
    if not inputs:
        raise ValueError("char-rnn cfg needs [net] inputs=<vocab>")
    if weights_path:
        params, _, _ = W.load_darknet_weights(specs, 1, weights_path,
                                              in_channels=inputs)
    else:
        params, stats = engine.init_params(specs, (1, 1, 1, inputs),
                                           jax.random.PRNGKey(0))
        params = W.fold_params(params, stats, 1e-5, "darknet")
    return _with_output_marker(specs), params, inputs


def _step_fn(specs, params, inputs: int):
    """One generation step: (rec_state, char) -> (rec_state', probs)."""

    def step(state, c):
        x = jax.nn.one_hot(c, inputs)[None, None, None, :]
        dets, aux = engine.apply(specs, params, x, time_steps=1,
                                 rec_state=state)
        probs = dets[-1][0].reshape(-1)[:inputs]
        return aux["rec_state"], probs

    return step


def _zero_state(specs, params, inputs: int):
    """Initial rec_state pytree (zeros — a freshly loaded darknet net).
    Shapes come from jax.eval_shape: no FLOPs, no device work."""
    step = _step_fn(specs, params, inputs)
    state_sh, _ = jax.eval_shape(lambda c: step(None, c), jnp.int32(0))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), state_sh)


def temper_probs(probs, temperature: float):
    """The C driver's sampling transform, in its order of operations:
    temperature is applied INSIDE the softmax layer
    (forward_softmax_layer: softmax(logits/T), equivalently p**(1/T)
    renormalized), THEN probabilities below 1e-4 are zeroed
    (examples/rnn.c ``if (out[j] < .0001) out[j] = 0``); sample_array
    normalizes whatever remains."""
    logp = jnp.log(jnp.clip(probs, 1e-30, 1.0)) / temperature
    pt = jax.nn.softmax(logp)
    return jnp.where(pt < 1e-4, 0.0, pt)


class CharRnnSampler:
    """Reusable jitted sampler — build once, generate many times (each
    generate() on a fresh sampler would re-trace the scans).

    Sampling matches the C driver's order of operations exactly
    (examples/rnn.c test_char_rnn): the softmax LAYER applies temperature
    first (forward_softmax_layer, softmax(logits/T) == p**(1/T)
    renormalized), then probabilities below 1e-4 are zeroed (rnn.c
    ``if (out[j] < .0001) out[j] = 0``), then sample_array draws from
    what remains. Both loops (priming, sampling) are single on-device
    lax.scans.
    """

    def __init__(self, specs, params, inputs: int,
                 temperature: float = 1.0):
        step = _step_fn(specs, params, inputs)
        self.inputs = inputs
        self._state0 = _zero_state(specs, params, inputs)

        # test_char_rnn OVERWRITES every layer's temperature with the flag
        # (rnn.c: net->layers[i].temperature = temp) — if the cfg's own
        # [softmax] already tempered by T_net, the probs we see are
        # softmax(l/T_net); raising them to the power T_net/T_req yields
        # softmax(l/T_req), the C's sampling distribution. temper_probs
        # raises to 1/temperature, so divide the request by T_net.
        t_net = 1.0
        has_softmax = False
        for sp in specs:
            if isinstance(sp, S.Softmax):
                t_net = sp.temperature
                has_softmax = True
        temperature = temperature / t_net

        @jax.jit
        def prime_fn(state, chars):
            def body(st, c):
                st, _ = step(st, c)
                return st, None
            st, _ = jax.lax.scan(body, state, chars)
            return st

        def sample_fn(state, c0, key, n):
            def body(carry, _):
                st, c, k = carry
                st, probs = step(st, c)
                if not has_softmax:
                    # cfg without a [softmax] layer (train_char_rnn's
                    # logits-CE branch): the net emits raw logits, which
                    # temper_probs would clip into garbage — normalize
                    # first, mirroring the loss
                    probs = jax.nn.softmax(probs.astype(jnp.float32),
                                           axis=-1)
                pt = temper_probs(probs, temperature)
                k, sub = jax.random.split(k)
                nxt = jax.random.categorical(sub, jnp.log(pt))
                return (st, nxt.astype(jnp.int32), k), nxt
            (_, _, _), out = jax.lax.scan(body, (state, c0, key), None,
                                          length=n)
            return out

        self._prime = prime_fn
        self._sample = jax.jit(sample_fn, static_argnums=3)

    def generate(self, *, seed_text: str = "", n: int = 100,
                 rng_seed: int = 0, tokens=None) -> str:
        """tokens: optional list of vocab strings (rnn.c read_tokens);
        symbols then render as 'token ' instead of bytes (print_symbol)."""
        # symbols are BYTES, exactly like training (batch_text reads raw
        # UTF-8 bytes) and like the C driver (seed[i] is a char) — going
        # through code points would desync non-ASCII seeds from the
        # byte-stream the model was trained on. Training folds % vocab;
        # fold the seed the same way.
        prime = [b % self.inputs for b in seed_text.encode("utf-8")]
        state = self._state0
        if len(prime) > 1:
            state = self._prime(state, jnp.asarray(prime[:-1], jnp.int32))
        last = prime[-1] if prime else 0
        out = self._sample(state, jnp.int32(last),
                           jax.random.PRNGKey(rng_seed), n)
        if tokens is not None:
            return seed_text + "".join(
                tokens[int(c)] + " " for c in np.asarray(out))
        raw = bytes(int(c) % 256 for c in np.asarray(out))
        return seed_text + raw.decode("utf-8", errors="replace")


def generate(specs, params, inputs: int, *, seed_text: str = "",
             n: int = 100, temperature: float = 1.0,
             rng_seed: int = 0, tokens=None) -> str:
    """One-shot convenience wrapper over CharRnnSampler (test_char_rnn,
    examples/rnn.c). Hold a CharRnnSampler instead when sampling
    repeatedly from the same model."""
    sampler = CharRnnSampler(specs, params, inputs, temperature=temperature)
    return sampler.generate(seed_text=seed_text, n=n, rng_seed=rng_seed,
                            tokens=tokens)


def batch_text(text: bytes, vocab: int, batch: int, steps: int,
               rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """get_rnn_data (examples/rnn.c:127): ``batch`` random windows of
    ``steps+1`` bytes -> one-hot x (steps*batch, vocab) step-major and
    integer next-byte targets (steps*batch,)."""
    arr = np.frombuffer(text, dtype=np.uint8)
    if arr.max(initial=0) >= vocab:
        arr = arr % vocab
    return _batch_windows(arr, vocab, batch, steps, rng)


def batch_tokens(tokens: np.ndarray, vocab: int, batch: int, steps: int,
                 rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """get_rnn_token_data (examples/rnn.c:70): windows over a pre-tokenized
    int stream instead of raw bytes (darknet's ``rnn train --tokenized``
    with read_tokenized_data)."""
    arr = np.asarray(tokens, np.int64)
    if arr.size and (arr.min() < 0 or arr.max() >= vocab):
        raise ValueError(
            f"token ids must be in [0, {vocab}); got range "
            f"[{arr.min()}, {arr.max()}]")
    return _batch_windows(arr, vocab, batch, steps, rng)


def _batch_windows(arr, vocab, batch, steps, rng):
    if len(arr) < steps + 1:
        raise ValueError(
            f"training text has {len(arr)} symbols; one BPTT window needs "
            f"steps+1 = {steps + 1} (shrink --steps or use more text)")
    offs = rng.integers(0, len(arr) - steps, size=batch)
    win = np.stack([arr[o:o + steps + 1] for o in offs])  # (B, T+1)
    # direct one-hot: np.eye(vocab)[...] would materialize a dense (V, V)
    # identity per call — 10 GB at a 50k token vocabulary
    idx = win[:, :-1].T.reshape(-1)                       # step-major
    x = np.zeros((steps * batch, vocab), np.float32)
    x[np.arange(idx.size), idx] = 1.0
    y = win[:, 1:].T.reshape(-1).astype(np.int32)
    return x, y


def train_char_rnn(text, cfg_path: str, *, steps_per_seq: int = 64,
                   batch: int = 32, iters: int = 200, lr: float = 2e-3,
                   seed: int = 0, log_every: int = 20, log=print,
                   return_raw: bool = False, tokenized: bool = False):
    """train_char_rnn (examples/rnn.c): next-byte cross-entropy over random
    text windows. Returns (specs, folded_params, inputs) ready for
    generate(); with return_raw=True appends (raw_params, raw_stats) —
    the unfolded form save_darknet_weights needs for batch_normalize
    cfgs. Adam instead of darknet's SGD+momentum (the loop is the
    parity surface here, not the optimizer — the detection trainer keeps
    darknet's exact update rule)."""
    import optax

    specs, net, _ = parse_cfg_file(cfg_path)
    specs = _with_output_marker(specs)
    vocab = int(net.get("inputs", 0))
    if not vocab:
        raise ValueError("char-rnn cfg needs [net] inputs=<vocab>")
    params, stats = engine.init_params(
        specs, (steps_per_seq * batch, 1, 1, vocab), jax.random.PRNGKey(seed))

    has_softmax = any(isinstance(s, S.Softmax) for s in specs)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, st, x, y):
        dets, aux = engine.apply(specs, p, x, train=True, batch_stats=st,
                                 time_steps=steps_per_seq, bn_formula="tf")
        out = dets[-1][0] if dets else None
        if out is None:
            raise ValueError("cfg needs a final output layer")
        if has_softmax:   # engine already applied softmax: CE on log probs
            logp = jnp.log(jnp.clip(out, 1e-9, 1.0))
            ce = -jnp.take_along_axis(logp, y[:, None], axis=1).mean()
        else:
            ce = optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean()
        return ce, aux["batch_stats"]

    @jax.jit
    def train_step(p, st, opt_state, x, y):
        (loss, new_st), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, st, x, y)
        upd, opt_state = tx.update(g, opt_state, p)
        p = optax.apply_updates(p, upd)
        st = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, st, new_st) \
            if new_st else st
        return p, st, opt_state, loss

    rng = np.random.default_rng(seed)
    batcher = batch_tokens if tokenized else batch_text
    for it in range(iters):
        x, y = batcher(text, vocab, batch, steps_per_seq, rng)
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, jnp.asarray(x[:, None, None, :]),
            jnp.asarray(y))
        if log_every and (it % log_every == 0 or it == iters - 1):
            log(f"iter {it}: loss {float(loss):.4f}")
    raw_params = jax.tree.map(np.asarray, params)
    raw_stats = jax.tree.map(np.asarray, stats)
    folded = W.fold_params(raw_params, raw_stats, 1e-5, "tf")
    if return_raw:
        return specs, folded, vocab, (raw_params, raw_stats)
    return specs, folded, vocab
