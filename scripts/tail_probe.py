"""Per-op budget of the channels-last demod kernel's compute leg.

VERDICT round 4 item 6: the VPU tail is the named 81.6-GS/s bottleneck
("tail ≈ MXU time, serialized") but was unquantified below totals.
This probe times the CL kernel's compute stages on VMEM-RESIDENT data
(no HBM traffic — the pure compute leg), emulating the full-batch
schedule by looping the per-block computation grid-many times inside
one kernel:

  mxu       — the post-DIF 128-pt leaf matmuls only
  cascade   — the DIF butterfly/twiddle cascade only (VPU)
  dft       — cascade + leaf matmuls (the full transform)
  ip        — conj(h)·y inner products + |h|² only (VPU tail, part 1)
  llr       — division-free max-log axis LLRs from precomputed inner
              products (VPU tail, part 2: the min-scan)
  full      — the real per-symbol chain (dft + ip + llr + sum)

Shapes: SDR_PROBE_NFFT (256 headline / 4096 wideband), SDR_PROBE_CP,
SDR_PROBE_LB lanes, SDR_PROBE_SBLK symbols per block, SDR_PROBE_BATCH
and SDR_PROBE_SYMS set the emulated grid. Input dtype bf16 (the bench
mode). Prints ms per emulated full-batch pass and the GS/s each leg
alone would support.
"""

from __future__ import annotations

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
from sdr_tpu.kernels.demod_pallas import _dft_mats
from sdr_tpu.kernels.demod_cl_pallas import (
    _BASE,
    _h_dtype,
    _twiddle_levels,
    _llr_axis_dfree,
    equalize_llr_bits_cl,
)

N_FFT = int(os.environ.get("SDR_PROBE_NFFT", "256"))
CP = int(os.environ.get("SDR_PROBE_CP", "64"))
LB = int(os.environ.get("SDR_PROBE_LB", "256"))
S_BLK = int(os.environ.get("SDR_PROBE_SBLK", "16"))
BATCH = int(os.environ.get("SDR_PROBE_BATCH", "32768"))
N_SYMS = int(os.environ.get("SDR_PROBE_SYMS", "64"))
MOD = Modulation.QAM16
NV = 0.05
SYM_LEN = N_FFT + CP


def make(what: str):
    mode = _matmul.mxu_mode()
    n_w = _matmul.n_w_operands(mode)
    n_lvl = len(_twiddle_levels(N_FFT))
    inv_nv = np.float32(1.0 / NV)
    n_reps = (BATCH // LB) * (N_SYMS // S_BLK)
    leafwise = N_FFT >= 1024

    def kernel(re_ref, im_ref, hr_ref, hi_ref, *rest):
        w_refs = rest[:n_w]
        tw_refs = rest[n_w : n_w + 2 * n_lvl]
        out_ref = rest[-1]
        tw_consts = [
            (tw_refs[2 * i][:], tw_refs[2 * i + 1][:]) for i in range(n_lvl)
        ]
        hr = hr_ref[:].astype(jnp.float32)
        hi = hi_ref[:].astype(jnp.float32)

        def per_symbol(xr, xi, acc):
            x_dtype = xr.dtype
            if what in ("ip", "llr"):
                # Tail-only legs: feed the first n_fft rows as "y".
                yr = xr[:N_FFT].astype(jnp.float32)
                yi = xi[:N_FFT].astype(jnp.float32)
                h2 = hr * hr + hi * hi
                pr = hr * yr + hi * yi
                pi = hr * yi - hi * yr
                if what == "ip":
                    return acc + jnp.sum(pr, dtype=jnp.float32) + jnp.sum(
                        pi, dtype=jnp.float32
                    ) + jnp.sum(h2, dtype=jnp.float32)
                for b in _llr_axis_dfree(pr, h2, inv_nv, MOD):
                    acc = acc + jnp.sum(b, dtype=jnp.float32)
                for b in _llr_axis_dfree(pi, h2, inv_nv, MOD):
                    acc = acc + jnp.sum(b, dtype=jnp.float32)
                return acc
            if what == "mxu":
                # Leaf matmuls on contiguous 128-row slices (the DIF
                # output geometry without the cascade).
                for l in range(N_FFT // _BASE):
                    sl = slice(l * _BASE, (l + 1) * _BASE)
                    yr, yi = _matmul.complex_dot_lhs(
                        xr[sl], xi[sl], w_refs, mode
                    )
                    acc = acc + jnp.sum(yr, dtype=jnp.float32) + jnp.sum(
                        yi, dtype=jnp.float32
                    )
                return acc
            # cascade / dft / full share the DIF walk.
            def walk(br, bi, lvl, row0, acc):
                if br.shape[0] == _BASE:
                    if what == "cascade":
                        return acc + jnp.sum(
                            br.astype(jnp.float32), dtype=jnp.float32
                        ) + jnp.sum(bi.astype(jnp.float32), dtype=jnp.float32)
                    yr, yi = _matmul.complex_dot_lhs(
                        br.astype(x_dtype), bi.astype(x_dtype), w_refs, mode
                    )
                    if what == "dft":
                        return acc + jnp.sum(yr, dtype=jnp.float32) + jnp.sum(
                            yi, dtype=jnp.float32
                        )
                    sl = slice(row0, row0 + _BASE)
                    for b in equalize_llr_bits_cl(
                        yr, yi, hr[sl], hi[sl], inv_nv, MOD
                    ):
                        acc = acc + jnp.sum(b, dtype=jnp.float32)
                    return acc
                twr, twi = tw_consts[lvl]
                h2_ = br.shape[0] // 2
                x1r, x2r = br[:h2_], br[h2_:]
                x1i, x2i = bi[:h2_], bi[h2_:]
                f32c = n_lvl >= 2
                if f32c:
                    sr_ = x1r + x2r
                    si_ = x1i + x2i
                    dr = x1r - x2r
                    di = x1i - x2i
                    er = dr * twr - di * twi
                    ei = dr * twi + di * twr
                else:
                    dt = br.dtype
                    sr_ = x1r + x2r
                    si_ = x1i + x2i
                    dr = (x1r - x2r).astype(jnp.float32)
                    di = (x1i - x2i).astype(jnp.float32)
                    er = (dr * twr - di * twi).astype(dt)
                    ei = (dr * twi + di * twr).astype(dt)
                acc = walk(sr_, si_, lvl + 1, row0, acc)
                return walk(er, ei, lvl + 1, row0 + h2_, acc)

            if n_lvl >= 2:
                return walk(
                    xr.astype(jnp.float32), xi.astype(jnp.float32), 0, 0, acc
                )
            return walk(xr, xi, 0, 0, acc)

        def rep(c, total):
            eps = (c.astype(jnp.float32) * jnp.float32(1e-30))
            for s in range(S_BLK):
                o = s * SYM_LEN + CP
                xr = re_ref[o : o + N_FFT, :]
                xr = (xr.astype(jnp.float32) + eps).astype(xr.dtype)
                xi = im_ref[o : o + N_FFT, :]
                total = per_symbol(xr, xi, total)
            return total

        total = lax.fori_loop(0, n_reps, rep, jnp.float32(0.0))
        out_ref[:] = jnp.broadcast_to(total, (8, 128))

    w_ops = [
        jnp.asarray(w)
        for w in _matmul.prepare_w(*_dft_mats(_BASE), mode)
    ]
    tw_ops = []
    for twr, twi in _twiddle_levels(N_FFT):
        tw_ops.append(jnp.asarray(twr))
        tw_ops.append(jnp.asarray(twi))

    def fn(re, im, hr, hi):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(w_ops) + len(tw_ops)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 << 20,
            ),
        )(re, im, hr, hi, *w_ops, *tw_ops)
        return out[0, 0]

    return fn


def main():
    whats = sys.argv[1:] or ["mxu", "cascade", "dft", "ip", "llr", "full"]
    iters = int(os.environ.get("SDR_PROBE_ITERS", "8"))
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    re = (
        jax.random.normal(ks[0], (S_BLK * SYM_LEN, LB), jnp.float32) * 0.06
    ).astype(jnp.bfloat16)
    im = (
        jax.random.normal(ks[1], (S_BLK * SYM_LEN, LB), jnp.float32) * 0.06
    ).astype(jnp.bfloat16)
    hdt = _h_dtype(N_FFT)
    hr = jax.random.normal(ks[2], (N_FFT, LB), jnp.float32).astype(hdt)
    hi = jax.random.normal(ks[3], (N_FFT, LB), jnp.float32).astype(hdt)
    samples = BATCH * N_SYMS * SYM_LEN
    print(
        f"# nfft={N_FFT} cp={CP} lb={LB} s_blk={S_BLK} emulated "
        f"batch={BATCH}x{N_SYMS} ({samples/1e6:.0f} MS/pass)"
    )
    for what in whats:
        fn = make(what)

        @jax.jit
        def run(re, im, hr, hi):
            def body(_, acc):
                v = fn(
                    re,
                    im,
                    (hr.astype(jnp.float32) + acc * jnp.float32(1e-30)).astype(hr.dtype),
                    hi,
                )
                return acc + v * jnp.float32(1e-12)

            return lax.fori_loop(0, iters, body, jnp.float32(0.0))

        _ = float(run(re, im, hr, hi))
        t0 = time.perf_counter()
        _ = float(run(re, im, hr, hi))
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{what:8s} {dt * 1e3:8.3f} ms/pass  "
            f"(alone would bound {samples / dt / 1e9:6.1f} GS/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
