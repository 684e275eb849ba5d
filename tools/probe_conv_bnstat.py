"""Probe: Pallas bf16 3x3 conv with the BN batch-stat reduction fused
into the kernel epilogue, raced against XLA's unfused form.

PERF_TRAIN.md section 5 asserted the last identified training lever —
fusing the per-channel batch-stat pass (sum, sum-of-squares for the
onepass var = E[x^2] - E[x]^2 form) into the conv that produced the
activation — was out of scope "while XLA's conv kernels win everywhere
we measured". PERF_INT8.md set the repo's standard for such claims:
race real formulations before declaring a ceiling. This probe does that
for the training forward.

What fusion can buy: in the unfused form XLA writes the conv output to
HBM and a separate reduction kernel reads it back — the stat pass costs
one extra full activation read (the measured 11.9 ms/step across the 75
convs at batch 128). A fused kernel computes the per-channel partials
while the output tile is still in VMEM, so the ceiling on the win is
exactly that re-read — IF the hand conv itself matches XLA's conv speed
(the int8 probe showed XLA's emitter is hard to beat).

Formulation (the strongest one from tools/probe_int8_3x3.py, adapted to
bf16 + stat epilogue): conv as NINE SHIFTED FLAT GEMMS over the padded
flattened input; grid (Cout tiles, M tiles) with the M axis INNERMOST so
each Cout tile's stat accumulator block stays resident across its M
sweep; pad rows are masked out of the stat partials (the shift trick
leaves wrap-around garbage only in rows the conv output never reads, but
a stat sum WOULD read them).

Shapes: the two 3x3 families that dominate darknet-53 at 416, at the
bench training batch.

Run on the real chip:  python tools/probe_conv_bnstat.py
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_conv3x3_bnstat(x, w, *, tm: int, co_tile: int,
                          fuse_stats: bool = True):
    """x: (B, H, W, Cin) bf16; w: (3, 3, Cin, Cout) bf16.

    Returns (y, csum, csumsq): y (B, H, W, Cout) bf16; csum/csumsq
    (Cout,) f32 per-channel sums over the batch*spatial axis — the
    onepass BN stat inputs. With fuse_stats=False the same kernel skips
    the stat epilogue (isolates the epilogue's cost)."""
    B, H, W, Cin = x.shape
    Hp, Wp = H + 2, W + 2
    Cout = w.shape[-1]
    halo = Wp + 1
    win = -(-(tm + 2 * halo) // 32) * 32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xflat = xp.reshape(B * Hp * Wp, Cin)
    M = xflat.shape[0]
    m_pad = (-M) % tm
    xflat = jnp.pad(xflat, ((halo, (win - tm - halo) + m_pad), (0, 0)))
    wflat = w.reshape(9, Cin, Cout)
    n_tiles = (M + m_pad) // tm

    # interior mask in PADDED flat coordinates: row p = ((b*Hp)+h)*Wp+w
    # is a real output pixel iff 1<=h<=H and 1<=w<=W. Pad rows carry the
    # shift trick's wrap-around garbage — the conv output slices them
    # away, but the stat sum must mask them.
    p = np.arange(M + m_pad)
    h = (p // Wp) % Hp
    wcol = p % Wp
    valid = ((p < M) & (h >= 1) & (h <= H) & (wcol >= 1)
             & (wcol <= W)).astype(np.float32)
    mask = jnp.asarray(valid[:, None])          # (M+m_pad, 1)

    def kernel(x_hbm, w_ref, mask_ref, out_ref, sum_ref=None, sq_ref=None):
        def body(xbuf, sem):
            i = pl.program_id(1)                # M axis, innermost
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * tm, win), :], xbuf, sem)
            dma.start()
            dma.wait()
            acc = jnp.zeros((tm, co_tile), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    d = ky * Wp + kx
                    acc = acc + lax.dot_general(
                        xbuf[pl.ds(d, tm), :], w_ref[ky * 3 + kx],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            out_ref[:] = acc.astype(jnp.bfloat16)
            if fuse_stats:
                m = mask_ref[:]
                part = (acc * m).sum(axis=0, keepdims=True)
                partsq = (acc * acc * m).sum(axis=0, keepdims=True)

                @pl.when(i == 0)
                def _init():
                    sum_ref[:] = part
                    sq_ref[:] = partsq

                @pl.when(i != 0)
                def _accum():
                    sum_ref[:] += part
                    sq_ref[:] += partsq

        pl.run_scoped(
            body,
            xbuf=pltpu.VMEM((win, Cin), jnp.bfloat16),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    out_specs = [pl.BlockSpec((tm, co_tile), lambda j, i: (i, j),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((M + m_pad, Cout), jnp.bfloat16)]
    if fuse_stats:
        out_specs += [pl.BlockSpec((1, co_tile), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM)] * 2
        out_shape += [jax.ShapeDtypeStruct((1, Cout), jnp.float32)] * 2
    res = pl.pallas_call(
        kernel,
        grid=(Cout // co_tile, n_tiles),        # M innermost
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, Cin, co_tile), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * (M + m_pad) * Cin * Cout * 9,
            transcendentals=0,
            bytes_accessed=(M + m_pad) * Cin * 2 + 9 * Cin * Cout * 2
            + (M + m_pad) * Cout * 2),
    )(xflat, wflat, mask)
    out = res[0]
    y = out[:M].reshape(B, Hp, Wp, Cout)[:, 1:-1, 1:-1, :]
    if fuse_stats:
        return y, res[1][0], res[2][0]
    zero = jnp.zeros((Cout,), jnp.float32)
    return y, zero, zero


def xla_conv_bnstat(x, w):
    """The unfused production form: XLA conv (bf16 in, f32 accumulate,
    bf16 out) then the onepass stat reductions re-reading the output."""
    y32 = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y32.astype(jnp.bfloat16)
    yf = y.astype(jnp.float32)
    csum = yf.sum(axis=(0, 1, 2))
    csq = (yf * yf).sum(axis=(0, 1, 2))
    return y, csum, csq


def xla_conv_only(x, w):
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    z = y.astype(jnp.bfloat16)
    zero = jnp.zeros((w.shape[-1],), jnp.float32)
    return z, zero, zero


def measure_chain(fn, x0, w, iters):
    """Chained: each iteration's input depends on the previous output AND
    its stat sums, so neither the conv nor the reductions can be elided."""

    @jax.jit
    def chained(x, w):
        def body(_, carry):
            xc, acc = carry
            y, cs, cq = fn(xc, w)
            s = cs.sum() + cq.sum() * 1e-9 + y[0, 0, 0, :8].sum()
            bump = (s * 0 + (s % 2)).astype(jnp.bfloat16) * 1e-6
            return xc + bump, acc + s.astype(jnp.float32)
        _, acc = lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    _ = float(chained(x0, w))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chained(x0, w))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def probe_shape(name, B, H, W, Cin, Cout, co_tile, tm=1024, iters=20):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, Cin, Cout)), jnp.bfloat16)
    flops = 2.0 * B * H * W * Cin * Cout * 9

    # correctness gates before timing: conv output and masked stats
    ref_y, ref_s, ref_q = jax.jit(xla_conv_bnstat)(x, w)
    got_y, got_s, got_q = jax.jit(functools.partial(
        pallas_conv3x3_bnstat, tm=tm, co_tile=co_tile))(x, w)
    np.testing.assert_allclose(np.asarray(got_y, np.float32),
                               np.asarray(ref_y, np.float32),
                               rtol=0.02, atol=0.05)
    # stats: fused sums f32-accumulate the raw f32 acc; the XLA form sums
    # the rounded-to-bf16 activation — tolerance covers that rounding
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=5e-3, atol=2.0)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               rtol=5e-3, atol=2.0)

    t_xla_fused = measure_chain(xla_conv_bnstat, x, w, iters)
    t_xla_conv = measure_chain(xla_conv_only, x, w, iters)
    t_pal_stat = measure_chain(
        functools.partial(pallas_conv3x3_bnstat, tm=tm, co_tile=co_tile),
        x, w, iters)
    t_pal_conv = measure_chain(
        functools.partial(pallas_conv3x3_bnstat, tm=tm, co_tile=co_tile,
                          fuse_stats=False),
        x, w, iters)

    def tf(t):
        return flops / t / 1e12

    print(f"{name}: B{B} {H}x{W} {Cin}->{Cout} 3x3 bf16")
    print(f"  XLA conv only          : {t_xla_conv*1e3:8.3f} ms  {tf(t_xla_conv):6.1f} TFLOPs")
    print(f"  XLA conv+stats (unfused): {t_xla_fused*1e3:8.3f} ms  {tf(t_xla_fused):6.1f} TFLOPs")
    print(f"  Pallas conv only       : {t_pal_conv*1e3:8.3f} ms  {tf(t_pal_conv):6.1f} TFLOPs")
    print(f"  Pallas conv+stats FUSED: {t_pal_stat*1e3:8.3f} ms  {tf(t_pal_stat):6.1f} TFLOPs")
    print(f"  stat pass cost: XLA {1e3*(t_xla_fused-t_xla_conv):.3f} ms, "
          f"Pallas epilogue {1e3*(t_pal_stat-t_pal_conv):.3f} ms")
    print(f"  fused-Pallas vs unfused-XLA: {t_xla_fused/t_pal_stat:.2f}x")
    return dict(name=name,
                xla_conv_ms=t_xla_conv * 1e3,
                xla_unfused_ms=t_xla_fused * 1e3,
                pallas_conv_ms=t_pal_conv * 1e3,
                pallas_fused_ms=t_pal_stat * 1e3,
                speedup_vs_xla=t_xla_fused / t_pal_stat)


def main():
    print(f"devices: {jax.devices()}")
    results = [
        probe_shape("A(mid)", 128, 52, 52, 128, 256, co_tile=256),
        # co_tile 512 VMEM-OOMs (the (9,512,512) bf16 weight block
        # double-buffers to 9.4M; measured 18M total vs the 16M budget)
        probe_shape("B(deep)", 128, 13, 13, 512, 1024, co_tile=256),
    ]
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
