"""A/B probe: can a manually double-buffered input DMA overlap the MXU?

docs/PERF.md round 3 found the fused demod kernel sits exactly on the
SERIAL no-overlap roofline — measured rate = 1/(1/mem_SOL + 1/comp_SOL)
within 1% — implying Mosaic's automatic grid pipeline is not hiding the
input stream behind the matmuls at the headline block shapes. VERDICT
round 3 item 1 asks for either a pipelined kernel (>= 80 GS/s) or
kernel-level proof the overlap is unreachable. This probe is that
experiment, isolated from the full demod plumbing:

  dma      — inputs stay in HBM (pl.ANY); the kernel streams them
             chunk-by-chunk into double-buffered VMEM scratch with
             pltpu.make_async_copy and does ~no compute.
  compute  — the same chunk loop and matmul schedule, but on VMEM-
             resident data (no HBM traffic beyond the first chunk).
  both     — double-buffered: start chunk c+1's DMA, wait chunk c,
             run the full headline math (single-pass Gauss DFT +
             MMSE + 16-QAM max-log LLR + sum).
  baseline — the shipped demod_chain path at the same shape.

If both ~= max(dma, compute): the overlap works -> build it into the
real kernel. If both ~= dma + compute: DMA and MXU serialize in this
environment and PERF.md gets the proof section.

Usage: python scripts/pipe_probe.py [dma|compute|both|baseline|all]
       [--chunk-channels K] [--iters N]
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("SDR_TPU_MXU_PRECISION", "default")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels import _matmul
from sdr_tpu.kernels.demod_pallas import _dft_mats, equalize_llr_bits

BATCH = int(os.environ.get("SDR_BENCH_BATCH", "32768"))
N_SYMS = 64
N_FFT = 256
# Default CP=128 keeps sym_len lane-aligned (384 = 3x128): Mosaic's
# memref_slice rejects HBM refs whose minor dim is not a multiple of
# 128 (even at full extent), so the headline's 320 needs a layout fix
# — but the OVERLAP question is shape-independent; answer it here.
CP = int(os.environ.get("SDR_PROBE_CP", "128"))
SYM_LEN = N_FFT + CP
MOD = Modulation.QAM16
NV = 0.05


SPLIT = int(os.environ.get("SDR_PROBE_SPLIT", "1"))


def _make_pipelined(tb_c: int, variant: str):
    """One pallas_call, grid=(1,): pltpu.emit_pipeline over channel chunks.

    The pipeline emitter double-buffers the HBM->VMEM input copies and
    overlaps them with the body — the exact facility docs/PERF.md says
    the automatic grid pipeline fails to exploit at the headline shapes.
    """
    mode = _matmul.mxu_mode()
    n_chunks = BATCH // tb_c
    rows = tb_c * N_SYMS
    inv_nv = np.float32(1.0 / NV)

    def kernel(re_hbm, im_hbm, hr_hbm, hi_hbm, *rest):
        w_refs = rest[: _matmul.n_w_operands(mode)]
        out_ref = rest[-1]

        def inner(sre, sim, shr, shi, out):
            xr = sre[:].reshape(rows, SYM_LEN)[:, CP:]
            xi = sim[:].reshape(rows, SYM_LEN)[:, CP:]
            if variant == "dma":
                # Touch the data so the DMA can't be elided; ~no FLOPs.
                total = jnp.sum(
                    xr[0:8, 0:128].astype(jnp.float32)
                    + xi[0:8, 0:128].astype(jnp.float32),
                    dtype=jnp.float32,
                )
            else:
                hr = jnp.broadcast_to(
                    shr[:], (tb_c, N_SYMS, N_FFT)
                ).reshape(rows, N_FFT)
                hi = jnp.broadcast_to(
                    shi[:], (tb_c, N_SYMS, N_FFT)
                ).reshape(rows, N_FFT)
                # Software pipeline: emit sub-chunk c+1's matmul between
                # sub-chunk c's matmul and its VPU tail so Mosaic can
                # overlap the MXU and VPU legs.
                rc = rows // SPLIT

                def tail(c, y):
                    yr, yi = y
                    sl = slice(c * rc, (c + 1) * rc)
                    bits = equalize_llr_bits(yr, yi, hr[sl], hi[sl], inv_nv, MOD)
                    t = jnp.float32(0.0)
                    for b in bits:
                        t = t + jnp.sum(b, dtype=jnp.float32)
                    return t

                total = jnp.float32(0.0)
                prev = None
                for c in range(SPLIT):
                    sl = slice(c * rc, (c + 1) * rc)
                    y = _matmul.complex_dot_xbf16(xr[sl], xi[sl], w_refs, mode)
                    if prev is not None:
                        total = total + tail(c - 1, prev)
                    prev = y
                total = total + tail(SPLIT - 1, prev)
            out[:] = jnp.broadcast_to(total, (8, 128))

        pipeline = pltpu.emit_pipeline(
            inner,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((tb_c, N_SYMS, SYM_LEN), lambda c: (c, 0, 0)),
                pl.BlockSpec((tb_c, N_SYMS, SYM_LEN), lambda c: (c, 0, 0)),
                pl.BlockSpec((tb_c, 1, N_FFT), lambda c: (c, 0, 0)),
                pl.BlockSpec((tb_c, 1, N_FFT), lambda c: (c, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((8, 128), lambda c: (0, 0))],
            should_accumulate_out=True,
        )
        pipeline(re_hbm, im_hbm, hr_hbm, hi_hbm, out_ref)

    w_ops = _matmul.prepare_w(*_dft_mats(N_FFT), mode)

    def fn(re, im, hr, hi):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w_ops],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(re, im, hr, hi, *w_ops)
        return out[0, 0]

    return fn


def _make_grid(tb_c: int):
    """Standard pallas_call grid pipeline (the shipped kernel's shape)
    with pl.Buffered(SDR_PROBE_BUFS) on the sample-plane inputs."""
    mode = _matmul.mxu_mode()
    rows = tb_c * N_SYMS
    inv_nv = np.float32(1.0 / NV)
    bufs = int(os.environ.get("SDR_PROBE_BUFS", "2"))
    pm = pl.Buffered(buffer_count=bufs) if bufs != 2 else None

    def kernel(re_ref, im_ref, hr_ref, hi_ref, *rest):
        w_refs = rest[: _matmul.n_w_operands(mode)]
        out_ref = rest[-1]
        xr = re_ref[:].reshape(rows, SYM_LEN)[:, CP:]
        xi = im_ref[:].reshape(rows, SYM_LEN)[:, CP:]
        hr = jnp.broadcast_to(hr_ref[:], (tb_c, N_SYMS, N_FFT)).reshape(rows, N_FFT)
        hi = jnp.broadcast_to(hi_ref[:], (tb_c, N_SYMS, N_FFT)).reshape(rows, N_FFT)
        yr, yi = _matmul.complex_dot_xbf16(xr, xi, w_refs, mode)
        llr_bits = equalize_llr_bits(yr, yi, hr, hi, inv_nv, MOD)
        total = jnp.float32(0.0)
        for b in llr_bits:
            total = total + jnp.sum(b, dtype=jnp.float32)
        out_ref[0] = jnp.broadcast_to(total, (8, 128))

    w_ops = _matmul.prepare_w(*_dft_mats(N_FFT), mode)
    grid = (BATCH // tb_c,)

    def fn(re, im, hr, hi):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb_c, N_SYMS, SYM_LEN), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=pm),
                pl.BlockSpec((tb_c, N_SYMS, SYM_LEN), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=pm),
                pl.BlockSpec((tb_c, 1, N_FFT), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb_c, 1, N_FFT), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            + [pl.BlockSpec((N_FFT, N_FFT), lambda i: (0, 0), memory_space=pltpu.VMEM)
               for _ in w_ops],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        )(re, im, hr, hi, *w_ops)
        return jnp.sum(out[:, 0, 0], dtype=jnp.float32)

    return fn


LB = int(os.environ.get("SDR_PROBE_LB", "512"))  # channel lanes per block


def _f128_ops():
    """Gauss triple (A, B, C) for the 128-point DFT as LHS, bf16."""
    wr, wi = _dft_mats(128)
    a, b, c = wr, wr + wi, wi - wr
    return tuple(np.asarray(w.astype(np.float32).astype(jnp.bfloat16)) for w in (a, b, c))


def _twiddle_consts():
    n = np.arange(128)
    w = np.exp(-2j * np.pi * n / N_FFT)
    return (
        np.real(w).astype(np.float32).reshape(128, 1),
        np.imag(w).astype(np.float32).reshape(128, 1),
    )


def _llr16_dfree(p, h2, inv_nv):
    """Division-free 16-QAM per-axis max-log LLRs from p = Re/Im of
    conj(h)·y (UN-divided) using g(l) = l²·h2 − 2·l·p: the common
    p²/h2 term cancels in d1−d0, so no reciprocal is needed and
    LLR = (min_{S1} g − min_{S0} g)·inv_nv exactly equals the
    equalize-then-distance form (up to the h2≈0 clamp)."""
    norm = np.float32(1.0 / np.sqrt(10.0))
    a1 = h2 * jnp.float32(0.1)
    a9 = h2 * jnp.float32(0.9)
    t1 = p * jnp.float32(2.0 * norm)
    t3 = p * jnp.float32(6.0 * norm)
    gp1 = a1 - t1
    gm1 = a1 + t1
    gp3 = a9 - t3
    gm3 = a9 + t3
    # Gray PAM levels [-3,-1,3,1] carry bits (b0,b1) = (00,01,10,11):
    # b0 (MSB) = 1 for l>0; b1 = 1 for |l|==1.
    b0 = jnp.minimum(gp1, gp3) - jnp.minimum(gm1, gm3)
    b1 = jnp.minimum(gp1, gm1) - jnp.minimum(gp3, gm3)
    return [b0 * inv_nv, b1 * inv_nv]


def _make_cl(s_blk: int = 1):
    """Channels-last pipelined kernel: emit_pipeline over (chan, sym)
    blocks, DIF radix-2 + two 128-pt LHS-Gauss matmuls (half the MXU
    flops of the 256-pt matmul), division-free 16-QAM tail."""
    n_cc = BATCH // LB
    inv_nv = np.float32(1.0 / NV)
    f_ops = _f128_ops()
    twr, twi = _twiddle_consts()

    def kernel(re_hbm, im_hbm, hr_hbm, hi_hbm, a_ref, b_ref, c_ref,
               twr_ref, twi_ref, out_ref):
        twr = twr_ref[:]
        twi = twi_ref[:]
        def cdot_lhs(xr, xi):
            d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
            m1 = d(a_ref[:], xr + xi)
            m2 = d(b_ref[:], xi)
            m3 = d(c_ref[:], xr)
            return m1 - m2, m1 + m3

        def inner(sre, sim, shr, shi, out):
            total = jnp.float32(0.0)
            for s in range(s_blk):
                o = s * SYM_LEN + CP
                x1r = sre[o : o + 128, :]
                x2r = sre[o + 128 : o + 256, :]
                x1i = sim[o : o + 128, :]
                x2i = sim[o + 128 : o + 256, :]
                ar = x1r + x2r
                ai = x1i + x2i
                dr = (x1r - x2r).astype(jnp.float32)
                di = (x1i - x2i).astype(jnp.float32)
                br = (dr * twr - di * twi).astype(jnp.bfloat16)
                bi = (dr * twi + di * twr).astype(jnp.bfloat16)
                er, ei = cdot_lhs(ar, ai)
                orr, oi = cdot_lhs(br, bi)
                yr = jnp.concatenate((er, orr), axis=0)
                yi = jnp.concatenate((ei, oi), axis=0)
                hr = shr[:]
                hi = shi[:]
                h2 = hr * hr + hi * hi
                pr = hr * yr + hi * yi
                pi = hr * yi - hi * yr
                bits = _llr16_dfree(pr, h2, inv_nv) + _llr16_dfree(pi, h2, inv_nv)
                acc = bits[0] + bits[1] + bits[2] + bits[3]
                total = total + jnp.sum(acc, dtype=jnp.float32)
            out[:] = jnp.broadcast_to(total, (8, 128))

        pipeline = pltpu.emit_pipeline(
            inner,
            grid=(n_cc, N_SYMS // s_blk),
            in_specs=[
                pl.BlockSpec((s_blk * SYM_LEN, LB), lambda c, s: (s, c)),
                pl.BlockSpec((s_blk * SYM_LEN, LB), lambda c, s: (s, c)),
                pl.BlockSpec((N_FFT, LB), lambda c, s: (0, c)),
                pl.BlockSpec((N_FFT, LB), lambda c, s: (0, c)),
            ],
            out_specs=[pl.BlockSpec((8, 128), lambda c, s: (0, 0))],
            should_accumulate_out=True,
        )
        pipeline(re_hbm, im_hbm, hr_hbm, hi_hbm, out_ref)

    def fn(re_t, im_t, hr_t, hi_t):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(re_t, im_t, hr_t, hi_t, *[jnp.asarray(w) for w in f_ops],
          jnp.asarray(twr), jnp.asarray(twi))
        return out[0, 0]

    return fn


def _make_compute_only(tb_c: int, what: str = "full"):
    """Same chunk-loop compute schedule on VMEM-resident data (no HBM).

    ``what``: full = matmul + tail; mxu = matmuls only; vpu = tail only.
    """
    mode = _matmul.mxu_mode()
    n_chunks = BATCH // tb_c
    rows = tb_c * N_SYMS
    inv_nv = np.float32(1.0 / NV)

    def kernel(re_ref, im_ref, hr_ref, hi_ref, *rest):
        w_refs = rest[: _matmul.n_w_operands(mode)]
        out_ref = rest[-1]

        def loop(c, total):
            xr = re_ref[:].reshape(rows, SYM_LEN)[:, CP:]
            xi = im_ref[:].reshape(rows, SYM_LEN)[:, CP:]
            # fold c in so iterations are not CSE-able
            xr = xr + (c.astype(jnp.float32) * jnp.float32(1e-30)).astype(xr.dtype)
            hr = jnp.broadcast_to(hr_ref[:], (tb_c, N_SYMS, N_FFT)).reshape(rows, N_FFT)
            hi = jnp.broadcast_to(hi_ref[:], (tb_c, N_SYMS, N_FFT)).reshape(rows, N_FFT)
            if what == "vpu":
                yr = xr[:, :N_FFT].astype(jnp.float32)
                yi = xi[:, :N_FFT].astype(jnp.float32)
            else:
                yr, yi = _matmul.complex_dot_xbf16(xr, xi, w_refs, mode)
            if what == "mxu":
                return total + jnp.sum(yr, dtype=jnp.float32) + jnp.sum(
                    yi, dtype=jnp.float32
                )
            llr_bits = equalize_llr_bits(yr, yi, hr, hi, inv_nv, MOD)
            for b in llr_bits:
                total = total + jnp.sum(b, dtype=jnp.float32)
            return total

        total = lax.fori_loop(0, n_chunks, loop, jnp.float32(0.0))
        out_ref[:] = jnp.broadcast_to(total, (8, 128))

    w_ops = _matmul.prepare_w(*_dft_mats(N_FFT), mode)

    def fn(re, im, hr, hi):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w_ops],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(re[: tb_c], im[: tb_c], hr[: tb_c], hi[: tb_c], *w_ops)
        return out[0, 0]

    return fn


def _baseline():
    from sdr_tpu.ops.demod import demod_chain

    def fn(re, im, hr, hi):
        return demod_chain(re, im, hr, hi, CP, MOD, NV, reduce_sum=True)

    return fn


def _measure(fn, iters: int, channels_last: bool = False) -> float:
    key = jax.random.PRNGKey(0)
    kr, ki, kh = jax.random.split(key, 3)
    if channels_last:
        shape = (N_SYMS * SYM_LEN, BATCH)
        re = (
            jax.random.normal(kr, shape, jnp.float32)
            * np.float32(1 / np.sqrt(2 * N_FFT))
        ).astype(jnp.bfloat16)
        im = (
            jax.random.normal(ki, shape, jnp.float32)
            * np.float32(1 / np.sqrt(2 * N_FFT))
        ).astype(jnp.bfloat16)
        hr = jax.random.normal(kh, (N_FFT, BATCH), jnp.float32)
        hi = jax.random.normal(jax.random.fold_in(kh, 1), (N_FFT, BATCH), jnp.float32)

        @jax.jit
        def run(re, im, hr, hi):
            def body(_, acc):
                s = fn(re, im, hr + acc * jnp.float32(1e-30), hi)
                return acc + s * jnp.float32(1e-12)

            return lax.fori_loop(0, iters, body, jnp.float32(0.0))

        _ = float(run(re, im, hr, hi))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(re, im, hr, hi))
            best = min(best, time.perf_counter() - t0)
        return best / iters
    shape = (BATCH, N_SYMS, SYM_LEN)
    re = (
        jax.random.normal(kr, shape, jnp.float32)
        * np.float32(1 / np.sqrt(2 * N_FFT))
    ).astype(jnp.bfloat16)
    im = (
        jax.random.normal(ki, shape, jnp.float32)
        * np.float32(1 / np.sqrt(2 * N_FFT))
    ).astype(jnp.bfloat16)
    hr = jax.random.normal(kh, (BATCH, 1, N_FFT), jnp.float32)
    hi = jax.random.normal(jax.random.fold_in(kh, 1), (BATCH, 1, N_FFT), jnp.float32)

    @jax.jit
    def run(re, im, hr, hi):
        def body(_, acc):
            s = fn(re, im, hr + acc * jnp.float32(1e-30), hi)
            return acc + s * jnp.float32(1e-12)

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _ = float(run(re, im, hr, hi))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(re, im, hr, hi))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    args = sys.argv[1:]
    tb_c = 8
    iters = 12
    variants = []
    skip = False
    for i, a in enumerate(args):
        if skip:
            skip = False
            continue
        if a == "--chunk-channels":
            tb_c = int(args[i + 1])
            skip = True
        elif a == "--iters":
            iters = int(args[i + 1])
            skip = True
        elif not a.startswith("--"):
            variants.append(a)
    variants = variants or ["all"]
    if variants == ["all"]:
        variants = ["dma", "compute", "both", "baseline"]
    samples = BATCH * N_SYMS * SYM_LEN
    results = {}
    for v in variants:
        if v == "baseline":
            fn = _baseline()
        elif v == "compute":
            fn = _make_compute_only(tb_c)
        elif v in ("mxu", "vpu"):
            fn = _make_compute_only(tb_c, v)
        elif v == "grid":
            fn = _make_grid(tb_c)
        elif v == "cl":
            fn = _make_cl(s_blk=int(os.environ.get("SDR_PROBE_SBLK", "1")))
        else:
            fn = _make_pipelined(tb_c, v)
        dt = _measure(fn, iters, channels_last=(v == "cl"))
        results[v] = dt
        print(
            f"{v:9s} chunk={tb_c:3d}ch  {dt * 1e3:7.3f} ms/iter  "
            f"{samples / dt / 1e9:6.1f} GS/s",
            flush=True,
        )
    if "dma" in results and "compute" in results and "both" in results:
        d, c, b = results["dma"], results["compute"], results["both"]
        print(
            f"serial d+c = {(d + c) * 1e3:.3f} ms, max(d,c) = "
            f"{max(d, c) * 1e3:.3f} ms, measured both = {b * 1e3:.3f} ms "
            f"-> overlap fraction {(d + c - b) / min(d, c):.2f}"
        )


if __name__ == "__main__":
    main()
