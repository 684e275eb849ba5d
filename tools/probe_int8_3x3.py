"""Probe: hand-written Pallas int8 3x3 conv vs XLA's int8 conv emitter on
the darknet-53 3x3 shapes (PERF_INT8.md section 2 follow-up — the 1x1 GEMM
question was closed in round 2; this closes the 3x3 half of the FLOPs).

Shapes probed (the two 3x3 families that dominate darknet-53 at 416):
  A: 52x52, 128 -> 256   (mid-network residual blocks)
  B: 13x13, 512 -> 1024  (deep blocks)

Kernel: direct 3x3 conv as NINE MXU matmuls over shifted VMEM windows
(im2col without materializing it): for each (ky, kx), the (H, W, Cin)
window of the pre-padded input contracts with the (Cin, Tco) weight slice,
accumulating int32. Grid = (batch, Cout tiles); whole 54x54 (or 15x15)
padded image per program sits in VMEM.

Methodology mirrors bench.py: iterations chained by a data dependency so
XLA can't elide work; both harnesses (XLA conv / Pallas) use the identical
chain. Reports ms/iter and effective TOPS for int8-XLA, int8-Pallas, and
bf16-XLA (the ratio baseline).

Run on the real chip:  python tools/probe_int8_3x3.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_conv3x3_int8(x_padded, w, *, co_tile: int):
    """x_padded: (B, H+2, W+2, Cin) int8; w: (3, 3, Cin, Cout) int8 ->
    (B, H, W, Cout) int32. Stride 1, pad already applied."""
    B, Hp, Wp, Cin = x_padded.shape
    H, W = Hp - 2, Wp - 2
    Cout = w.shape[-1]
    assert Cout % co_tile == 0

    def kernel(x_ref, w_ref, out_ref):
        acc = jnp.zeros((H, W, co_tile), jnp.int32)
        for ky in range(3):
            for kx in range(3):
                patch = x_ref[0, ky:ky + H, kx:kx + W, :]
                acc = acc + lax.dot_general(
                    patch, w_ref[ky, kx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        out_ref[0] = acc

    flops = 2 * H * W * Cin * co_tile * 9
    return pl.pallas_call(
        kernel,
        grid=(B, Cout // co_tile),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, Cin), lambda b, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Cin, co_tile), lambda b, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, co_tile),
                               lambda b, j: (b, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=Hp * Wp * Cin + 9 * Cin * co_tile
            + H * W * co_tile * 4),
    )(x_padded, w)


def pallas_conv3x3_shiftgemm_int8(x, w, *, tm: int, co_tile: int):
    """Stronger formulation: conv as NINE SHIFTED FLAT GEMMS.

    Flatten the padded input to (B*Hp*Wp, Cin) rows; for kernel offset
    (ky, kx) the contribution to flat output row p is
    X[p + (ky-1)*Wp + (kx-1)] @ W[ky,kx] — a pure row shift, so each
    program DMAs one (tm + 2*halo, Cin) halo window from HBM and runs 9
    (tm, Cin)x(Cin, co_tile) MXU matmuls with proper M tiles (the naive
    per-image kernel's M=52 rows underfed the MXU). Wrap-around garbage
    lands only in pad rows/columns, which the caller never reads.

    x: (B, H, W, Cin) int8; returns flat (B*Hp*Wp, Cout) int32 in PADDED
    coordinates (caller slices interior rows)."""
    B, H, W, Cin = x.shape
    Hp, Wp = H + 2, W + 2
    Cout = w.shape[-1]
    halo = Wp + 1
    # DMA window must be sublane-aligned (Mosaic: HBM slices along dim 0
    # align to the tiling) — round the halo'd window up to 32 rows
    win = -(-(tm + 2 * halo) // 32) * 32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xflat = xp.reshape(B * Hp * Wp, Cin)
    M = xflat.shape[0]
    m_pad = (-M) % tm
    xflat = jnp.pad(xflat, ((halo, (win - tm - halo) + m_pad), (0, 0)))
    wflat = w.reshape(9, Cin, Cout)
    n_tiles = (M + m_pad) // tm

    def kernel(x_hbm, w_ref, out_ref):
        def body(xbuf, sem):
            i = pl.program_id(0)
            start = i * tm     # into the halo-padded flat X
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, win), :], xbuf, sem)
            dma.start()
            dma.wait()
            acc = jnp.zeros((tm, co_tile), jnp.int32)
            for ky in range(3):
                for kx in range(3):
                    d = ky * Wp + kx   # 0..2*Wp+2 into the halo'd buffer
                    acc = acc + lax.dot_general(
                        xbuf[pl.ds(d, tm), :], w_ref[ky * 3 + kx],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            out_ref[:] = acc

        pl.run_scoped(
            body,
            xbuf=pltpu.VMEM((win, Cin), jnp.int8),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, Cout // co_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, Cin, co_tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, co_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M + m_pad, Cout), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * tm * Cin * co_tile * 9,
            transcendentals=0,
            bytes_accessed=(tm + 2 * halo) * Cin + 9 * Cin * co_tile
            + tm * co_tile * 4),
    )(xflat, wflat)
    return out[:M].reshape(B, Hp, Wp, Cout)[:, 1:-1, 1:-1, :]


def pallas_conv3x3_k3gemm_int8(x, w, *, tm: int, co_tile: int):
    """Third formulation: per kernel ROW, concatenate the three kx-shifted
    windows into a (tm, 3*Cin) patch so each of the 3 matmuls contracts
    K = 3*Cin (deeper MXU passes; the shift-GEMM's K=Cin underfills the
    pipeline when Cin=128). Same flat-shift/halo trick otherwise."""
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
    wk = w.reshape(3, 3 * Cin, Cout)   # ky-major, kx within the K axis
    n_tiles = (M + m_pad) // tm

    def kernel(x_hbm, w_ref, out_ref):
        def body(xbuf, pbuf, sem):
            i = pl.program_id(0)
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * tm, win), :], xbuf, sem)
            dma.start()
            dma.wait()
            acc = jnp.zeros((tm, co_tile), jnp.int32)
            for ky in range(3):
                # stage the three kx-shifted windows side by side (Mosaic
                # cannot concat sublane-misaligned reads directly; the
                # stores force the relayout)
                for kx in range(3):
                    pbuf[:, kx * Cin:(kx + 1) * Cin] = \
                        xbuf[pl.ds(ky * Wp + kx, tm), :]
                acc = acc + lax.dot_general(
                    pbuf[:], w_ref[ky],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            out_ref[:] = acc

        pl.run_scoped(
            body,
            xbuf=pltpu.VMEM((win, Cin), jnp.int8),
            pbuf=pltpu.VMEM((tm, 3 * Cin), jnp.int8),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, Cout // co_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3 * Cin, co_tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, co_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M + m_pad, Cout), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * tm * Cin * co_tile * 9,
            transcendentals=0,
            bytes_accessed=win * Cin + 9 * Cin * co_tile
            + tm * co_tile * 4),
    )(xflat, wk)
    return out[:M].reshape(B, Hp, Wp, Cout)[:, 1:-1, 1:-1, :]


def xla_conv_int8(x, w):
    """(B, H, W, Cin) int8 SAME conv via XLA's emitter -> int32."""
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def xla_conv_bf16(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def measure_chain(conv_fn, x0, w, iters, *, perturb_dtype):
    """Chained iterations: each iteration's input depends on the previous
    output's sum, so nothing can be hoisted. Returns seconds/iter."""

    @jax.jit
    def chained(x, w):
        def body(_, carry):
            xc, acc = carry
            out = conv_fn(xc, w)
            s = out.sum()
            bump = (s.astype(jnp.int32) % 2).astype(perturb_dtype)
            return xc + bump, acc + s.astype(jnp.float32)
        _, acc = lax.fori_loop(0, iters, body,
                               (x, jnp.float32(0)))
        return acc

    _ = float(chained(x0, w))            # compile + warm
    t0 = time.perf_counter()
    _ = float(chained(x0, w))
    return (time.perf_counter() - t0) / iters


def probe_shape(name, B, H, W, Cin, Cout, co_tile, iters=30):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-100, 100, (B, H, W, Cin)), jnp.int8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w8 = jnp.asarray(rng.integers(-100, 100, (3, 3, Cin, Cout)), jnp.int8)
    xb = x.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    flops = 2.0 * B * H * W * Cin * Cout * 9

    # correctness gates for the hand kernels before timing them
    ref = np.asarray(xla_conv_int8(x, w8))
    got = np.asarray(pallas_conv3x3_shiftgemm_int8(x, w8, tm=1024,
                                                   co_tile=co_tile))
    np.testing.assert_array_equal(got, ref)
    got3 = np.asarray(pallas_conv3x3_k3gemm_int8(x, w8, tm=1024,
                                                 co_tile=co_tile))
    np.testing.assert_array_equal(got3, ref)
    gotd = np.asarray(_pallas_on_unpadded(x, w8, co_tile=co_tile))
    np.testing.assert_array_equal(gotd, ref)

    t_xla8 = measure_chain(xla_conv_int8, x, w8, iters,
                           perturb_dtype=jnp.int8)
    t_pal = measure_chain(
        functools.partial(_pallas_on_unpadded, co_tile=co_tile),
        x, w8, iters, perturb_dtype=jnp.int8)
    t_sg = measure_chain(
        functools.partial(pallas_conv3x3_shiftgemm_int8, tm=1024,
                          co_tile=co_tile),
        x, w8, iters, perturb_dtype=jnp.int8)
    t_k3 = measure_chain(
        functools.partial(pallas_conv3x3_k3gemm_int8, tm=1024,
                          co_tile=co_tile),
        x, w8, iters, perturb_dtype=jnp.int8)
    t_bf16 = measure_chain(xla_conv_bf16, xb, wb, iters,
                           perturb_dtype=jnp.bfloat16)

    def tops(t):
        return flops / t / 1e12

    print(f"{name}: B{B} {H}x{W} {Cin}->{Cout} 3x3")
    print(f"  XLA  int8        : {t_xla8*1e3:8.3f} ms/iter  {tops(t_xla8):6.1f} TOPS")
    print(f"  Pallas naive int8: {t_pal*1e3:8.3f} ms/iter  {tops(t_pal):6.1f} TOPS")
    print(f"  Pallas shiftGEMM : {t_sg*1e3:8.3f} ms/iter  {tops(t_sg):6.1f} TOPS")
    print(f"  Pallas k3GEMM    : {t_k3*1e3:8.3f} ms/iter  {tops(t_k3):6.1f} TOPS")
    print(f"  XLA  bf16        : {t_bf16*1e3:8.3f} ms/iter  {tops(t_bf16):6.1f} TFLOPs")
    best = min(t_pal, t_sg, t_k3)
    print(f"  int8/bf16 ratio: XLA {t_bf16/t_xla8:.2f}  "
          f"best-Pallas {t_bf16/best:.2f}   "
          f"best-Pallas/XLA {t_xla8/best:.2f}x")
    return dict(name=name, xla_int8_tops=tops(t_xla8),
                pallas_naive_tops=tops(t_pal),
                pallas_shiftgemm_tops=tops(t_sg),
                pallas_k3gemm_tops=tops(t_k3),
                bf16_tflops=tops(t_bf16))


def _pallas_on_unpadded(x, w, *, co_tile):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pallas_conv3x3_int8(xp, w, co_tile=co_tile)


def main():
    print(f"devices: {jax.devices()}")
    results = [
        probe_shape("A(mid)", 64, 52, 52, 128, 256, co_tile=256),
        probe_shape("B(deep)", 32, 13, 13, 512, 1024, co_tile=512),
    ]
    return results


if __name__ == "__main__":
    main()
