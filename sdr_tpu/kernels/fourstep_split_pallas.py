"""Two-phase four-step wideband demodulator (HBM-staged variant).

The single-kernel four-step (kernels/fourstep_pallas.py) keeps every
chunk of the transform live in VMEM at once, which caps its row tile
at ~32 rows — and 32-row matmuls fill a quarter of the MXU's sublanes.
Measured on hardware, that granularity (N1 small matmuls + ~80 VPU
butterflies per block) leaves it slower than the XLA-FFT hybrid.

This variant trades one HBM round trip of the intermediate for
full-size tiles, the same trade XLA's own FFT makes internally —
except both phases here stay fused with their neighbors:

- Phase A (VPU): CP strip → stage-1 chunk FFT → twiddle, written to
  HBM in digit-major layout (N1, B, S, N2). Row tiles are small but
  the phase is pure elementwise — no MXU to under-fill.
- Phase B (MXU): per (k1, batch-tile) block: ONE (rows, N2)·(N2, N2)
  Gauss matmul with rows up to 512 — the exact shape of the proven
  256sc kernel — followed by fused equalize + max-log LLR.

HBM per input sample: 8 B (input) + 2·(N/sym_len)·8 B (intermediate
write+read) ≈ 22 B → memory speed-of-light ≈ 19 GS/s at the measured
healthy bandwidth, vs the compute-bound ~2 GS/s the small-tile
single-kernel variant achieves. Same numerics contract as
fourstep_pallas (tests/test_fourstep.py).

``SDR_TPU_FOURSTEP_STAGE=bf16`` stores the intermediate in bfloat16:
the staging traffic halves (≈22 → ≈15 B/sample, SOL ≈ 28 GS/s) and
phase B's x-side bf16 split collapses (9 → 6 MXU passes under the
default bf16x3 — see kernels._matmul.complex_dot_xbf16). Accuracy is
bf16x2-class (~2e-3 relative on the transform; the bf16x2 hardware BER
gate in docs/PERF.md measured error-count movement at noise level).
Default stays f32 until a healthy-window A/B shows a win.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels import _matmul
from sdr_tpu.kernels.demod_pallas import count_errors_bits, equalize_llr_bits
from sdr_tpu.kernels.fourstep_pallas import (
    _fft_chunks,
    _pick_n2,
    _stage2_mats,
    _twiddles,
    permute_h,
)

def stage_dtype():
    """Intermediate dtype for the HBM-staged hop (env-selected).

    Default bf16 (round 2c): halves staging traffic and collapses
    phase B to 6 MXU passes; hardware BER gate at 4096sc/8 dB measured
    error counts jnp 77228 / f32-stage 77227 / bf16-stage 77293 — a
    +0.08% movement, i.e. noise level. Set SDR_TPU_FOURSTEP_STAGE=f32
    for exact f32 staging.
    """
    s = os.environ.get("SDR_TPU_FOURSTEP_STAGE", "bf16").lower()
    if s in ("f32", "float32"):
        return jnp.float32
    if s in ("bf16", "bfloat16"):
        return jnp.bfloat16
    raise ValueError(f"unknown SDR_TPU_FOURSTEP_STAGE {s!r}")


def _pick_tile_a(batch: int, n_syms: int, n_fft: int, n2: int) -> int:
    """Phase-A batch tile: the live chunk set is rows·N·16 B; keep the
    ESTIMATE within ~2 MB (Mosaic uses ~2.5x the estimate)."""
    best = 0
    for tb in range(1, batch + 1):
        if batch % tb == 0 and tb * n_syms * n_fft * 16 <= (2 << 20):
            best = tb
    return best


def _pick_tile_b(batch: int, n_syms: int, n2: int, bps: int) -> int:
    """Phase-B batch tile: target up to 512 rows (the 256sc kernel's
    proven MXU shape), bounded by a ~4 MB estimate."""
    best = 0
    for tb in range(1, batch + 1):
        if batch % tb:
            continue
        rows = tb * n_syms
        # rows is the second-to-last dim of the non-reduced output block;
        # Mosaic requires it divisible by 8 (or equal to the full axis).
        if rows % 8:
            continue
        if rows <= 512 and rows * n2 * (8 + 4 * bps + 16) <= (4 << 20):
            best = tb
    return best


def supported(shape, cp_len: int, mod: Modulation, h_syms: int = 1) -> bool:
    """Same numerology gate as the single-kernel four-step, plus
    feasible tiles for both phases."""
    if len(shape) != 3:
        return False
    batch, n_syms, sym_len = shape
    if (batch * n_syms) % 8 != 0:
        return False
    n_fft = sym_len - cp_len
    if n_fft < 1024 or n_fft & (n_fft - 1):
        return False
    n2 = _pick_n2(n_fft, cp_len)
    if n2 is None:
        return False
    return (
        _pick_tile_a(batch, n_syms, n_fft, n2) > 0
        and _pick_tile_b(batch, n_syms, n2, mod.bits_per_symbol) > 0
    )


def _stage1_call(re4, im4, n1, n2, cps, cp_chunks, tb, interpret, out_dtype):
    batch, n_syms = re4.shape[0], re4.shape[1]
    rows = tb * n_syms
    twr, twi = _twiddles(n1, n2)

    def kernel(re_ref, im_ref, twr_ref, twi_ref, tr_ref, ti_ref):
        # bf16 sample planes are consumed NATIVELY (round 4): the HBM
        # input read halves, the upcast happens in-register, and the
        # chunk-FFT butterflies run in f32 either way (bf16 arithmetic
        # through log2(N1) cascaded stages would compound truncation).
        x4r = re_ref[:].astype(jnp.float32)
        x4i = im_ref[:].astype(jnp.float32)
        chunks = [
            (
                x4r[:, :, cp_chunks + c, :].reshape(rows, n2),
                x4i[:, :, cp_chunks + c, :].reshape(rows, n2),
            )
            for c in range(n1)
        ]
        g = _fft_chunks(chunks)
        for k1 in range(n1):
            gr, gi = g[k1]
            wr = twr_ref[k1 : k1 + 1, :]
            wi = twi_ref[k1 : k1 + 1, :]
            tr_ref[k1] = (
                (gr * wr - gi * wi).reshape(tb, n_syms, n2).astype(out_dtype)
            )
            ti_ref[k1] = (
                (gr * wi + gi * wr).reshape(tb, n_syms, n2).astype(out_dtype)
            )

    out_spec = pl.BlockSpec(
        (n1, tb, n_syms, n2), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(batch // tb,),
        in_specs=[
            pl.BlockSpec((tb, n_syms, cps, n2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n_syms, cps, n2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n1, batch, n_syms, n2), out_dtype),
            jax.ShapeDtypeStruct((n1, batch, n_syms, n2), out_dtype),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(re4, im4, jnp.asarray(twr), jnp.asarray(twi))


def demod_chain_fourstep2(
    re: jnp.ndarray,
    im: jnp.ndarray,
    hr: jnp.ndarray,
    hi: jnp.ndarray,
    cp_len: int,
    mod: Modulation,
    noise_var: float,
    reduce_sum: bool = False,
    interpret: bool | None = None,
    count_idx: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Two-phase four-step demod; same contract as demod_chain_fourstep.

    With ``count_idx`` (batch, n_syms, n_fft) int32 transmitted symbol
    indices, phase B compares hard decisions in-kernel and returns
    per-channel (batch,) int32 error counts instead of LLRs — the
    wideband twin of demod_pallas.demod_count_pallas (no LLR plane or
    digit/bit-order restore transpose in HBM). The indices ride the
    same digit permutation as the channel plane, so bit plane j
    compares against public bit j of the same subcarrier."""
    if not supported(re.shape, cp_len, mod):
        raise ValueError(f"unsupported shape {re.shape} for split four-step")
    batch, n_syms, sym_len = re.shape
    n_fft = sym_len - cp_len
    bps = mod.bits_per_symbol
    n2 = _pick_n2(n_fft, cp_len)
    n1 = n_fft // n2
    cps = sym_len // n2
    cp_chunks = cp_len // n2
    h_syms = hr.shape[1]
    if hr.shape != (batch, h_syms, n_fft) or h_syms not in (1, n_syms):
        raise ValueError(f"unsupported channel shape {hr.shape}")
    tba = _pick_tile_a(batch, n_syms, n_fft, n2)
    tbb = _pick_tile_b(batch, n_syms, n2, bps)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    re4 = re.reshape(batch, n_syms, cps, n2)
    im4 = im.reshape(batch, n_syms, cps, n2)
    # Chunk axis leading, matching tr/ti: a (1, tbb, h_syms, n2) block then
    # has its last two dims equal to the array's, which Mosaic requires
    # (h_syms is not divisible by 8 in the common h_syms=1 case).
    hr4 = (
        permute_h(hr, n_fft, n2)
        .reshape(batch, h_syms, n1, n2)
        .transpose(2, 0, 1, 3)
    )
    hi4 = (
        permute_h(hi, n_fft, n2)
        .reshape(batch, h_syms, n1, n2)
        .transpose(2, 0, 1, 3)
    )

    sdt = stage_dtype()
    tr, ti = _stage1_call(
        re4, im4, n1, n2, cps, cp_chunks, tba, interpret, sdt
    )

    rows = tbb * n_syms
    inv_nv = np.float32(1.0 / max(float(noise_var), 1e-12))
    mode = _matmul.mxu_mode()
    n_w = _matmul.n_w_operands(mode)
    w_ops = _matmul.prepare_w(*_stage2_mats(n2), mode)
    count = count_idx is not None

    def kernel_b(tr_ref, ti_ref, hr_ref, hi_ref, *rest):
        if count:
            idx_ref = rest[0]
            rest = rest[1:]
        w_refs = rest[:n_w]
        out_ref = rest[n_w]
        xr = tr_ref[0].reshape(rows, n2)
        xi = ti_ref[0].reshape(rows, n2)
        if xr.dtype == jnp.bfloat16:
            yr, yi = _matmul.complex_dot_xbf16(xr, xi, w_refs, mode)
        else:
            yr, yi = _matmul.complex_dot(xr, xi, w_refs, mode)
        hrb = jnp.broadcast_to(hr_ref[0], (tbb, n_syms, n2)).reshape(rows, n2)
        hib = jnp.broadcast_to(hi_ref[0], (tbb, n_syms, n2)).reshape(rows, n2)
        llr_bits = equalize_llr_bits(yr, yi, hrb, hib, inv_nv, mod)
        if count:
            idx_b = idx_ref[0].reshape(rows, n2)
            err = count_errors_bits(llr_bits, idx_b, bps)
            out_ref[0, 0] = jnp.sum(err.reshape(tbb, n_syms, n2), axis=1)
        elif reduce_sum:
            total = jnp.float32(0.0)
            for b_llr in llr_bits:
                total = total + jnp.sum(b_llr, dtype=jnp.float32)
            out_ref[0, 0] = jnp.broadcast_to(total, (8, 128))
        else:
            out_ref[0] = jnp.concatenate(llr_bits, axis=-1)

    in_specs = [
        pl.BlockSpec((1, tbb, n_syms, n2), lambda k, j: (k, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tbb, n_syms, n2), lambda k, j: (k, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tbb, h_syms, n2), lambda k, j: (k, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tbb, h_syms, n2), lambda k, j: (k, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if count:
        in_specs.append(
            pl.BlockSpec((1, tbb, n_syms, n2), lambda k, j: (k, j, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    in_specs += [
        pl.BlockSpec((n2, n2), lambda k, j: (0, 0), memory_space=pltpu.VMEM)
        for _ in w_ops
    ]
    grid = (n1, batch // tbb)
    params = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"))

    if count:
        # Transmitted indices in the kernel's digit-major layout — the
        # same permutation the channel plane rides.
        idx4 = (
            permute_h(count_idx.astype(jnp.int32), n_fft, n2)
            .reshape(batch, n_syms, n1, n2)
            .transpose(2, 0, 1, 3)
        )
        out = pl.pallas_call(
            kernel_b,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, tbb, n2), lambda k, j: (k, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n1, batch // tbb, tbb, n2), jnp.float32
            ),
            compiler_params=params,
            interpret=interpret,
        )(tr, ti, hr4, hi4, idx4, *w_ops)
        return (
            jnp.sum(out, axis=(0, 3), dtype=jnp.float32)
            .reshape(batch)
            .astype(jnp.int32)
        )

    if reduce_sum:
        partial = pl.pallas_call(
            kernel_b,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, 8, 128), lambda k, j: (k, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n1, batch // tbb, 8, 128), jnp.float32
            ),
            compiler_params=params,
            interpret=interpret,
        )(tr, ti, hr4, hi4, *w_ops)
        return jnp.sum(partial[:, :, 0, 0], dtype=jnp.float32)

    out = pl.pallas_call(
        kernel_b,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rows, n2 * bps), lambda k, j: (k, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n1, batch * n_syms, n2 * bps), jnp.float32
        ),
        compiler_params=params,
        interpret=interpret,
    )(tr, ti, hr4, hi4, *w_ops)
    out = out.reshape(n1, batch, n_syms, bps, n2)
    out = out.transpose(1, 2, 4, 0, 3)  # (B, S, N2, N1, bps) — see fourstep
    return out.reshape(batch, n_syms, n_fft * bps)


# ---------------------------------------------------------------------------
# Wideband SC-FDE (full-grid SC-FDMA receive), round 4.


def _pick_tile_c(batch: int, n_syms: int, n_fft: int, count: bool) -> int:
    """Phase-C batch tile: live chunk set rows·N·16 B (+ idx rows·N·4 B
    in count mode); keep the estimate within ~2 MB."""
    per = 20 if count else 16
    best = 0
    for tb in range(1, batch + 1):
        if batch % tb == 0 and tb * n_syms * n_fft * per <= (2 << 20):
            best = tb
    return best


def supported_fde(shape, cp_len: int, mod: Modulation, h_syms: int = 1) -> bool:
    if not supported(shape, cp_len, mod, h_syms):
        return False
    batch, n_syms, sym_len = shape
    return _pick_tile_c(batch, n_syms, sym_len - cp_len, True) > 0


def demod_chain_fourstep2_fde(
    re: jnp.ndarray,
    im: jnp.ndarray,
    hr: jnp.ndarray,
    hi: jnp.ndarray,
    cp_len: int,
    mod: Modulation,
    noise_var: float,
    reduce_sum: bool = False,
    interpret: bool | None = None,
    count_idx: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused WIDEBAND SC-FDE receiver (n_fft ≥ 1024) — three staged
    phases, each MXU/VPU-shaped (round-4; closes the jnp fallback that
    ran at 56% of wideband OFDM, docs/PERF.md):

    - Phase A: the OFDM kernel's stage-1 chunk FFT (reused verbatim).
    - Phase B′: per digit slice — stage-2 Gauss matmul (tones), the
      BIASED per-tone MMSE conj(H)/(|H|²+nv) (ops.equalize.
      equalize_mmse_fde's convention: a notch must not amplify noise
      across every despread symbol), then the DESPREAD's stage-1
      inverse matmul + TX twiddle fused in. The key identity: the
      demod staging's digit-major tone slices (k ≡ k1 mod N1, ordered
      by k2) are EXACTLY the TX four-step's phase-A input layout, so
      the despread IDFT is the TX transform with √N scaling.
    - Phase C: the TX kernel's chunk IFFT (time chunks are CONTIGUOUS
      sample runs — no reorder) + symbol-level bias correction
      (tone-mean b, computed OUTSIDE from h alone) + max-log LLR →
      scalar sum or in-kernel error counts vs time-domain indices.

    ``count_idx``: (batch, n_syms, n_fft) int32 TIME-domain
    constellation indices → per-channel (batch,) int32 error counts.
    Otherwise returns the scalar LLR sum (``reduce_sum=True``; the
    full-LLR plane stays on the jnp path — it is a validation surface,
    not a throughput one).
    """
    if not supported_fde(re.shape, cp_len, mod, h_syms=hr.shape[1]):
        raise ValueError(f"unsupported shape {re.shape} for wideband SC-FDE")
    if count_idx is None and not reduce_sum:
        raise ValueError("fused wideband SC-FDE emits counts or a sum only")
    from sdr_tpu.kernels.demod_pallas import _llr_axis
    from sdr_tpu.kernels.fourstep_tx_pallas import _stage1_mats, _tx_twiddles

    batch, n_syms, sym_len = re.shape
    n_fft = sym_len - cp_len
    bps = mod.bits_per_symbol
    n2 = _pick_n2(n_fft, cp_len)
    n1 = n_fft // n2
    cps = sym_len // n2
    cp_chunks = cp_len // n2
    h_syms = hr.shape[1]
    if hr.shape != (batch, h_syms, n_fft) or h_syms not in (1, n_syms):
        raise ValueError(f"unsupported channel shape {hr.shape}")
    count = count_idx is not None
    tba = _pick_tile_a(batch, n_syms, n_fft, n2)
    tbb = _pick_tile_b(batch, n_syms, n2, bps)
    tbc = _pick_tile_c(batch, n_syms, n_fft, count)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nv = np.float32(max(float(noise_var), 1e-12))
    sdt = stage_dtype()

    re4 = re.reshape(batch, n_syms, cps, n2)
    im4 = im.reshape(batch, n_syms, cps, n2)
    hr4 = (
        permute_h(hr, n_fft, n2)
        .reshape(batch, h_syms, n1, n2)
        .transpose(2, 0, 1, 3)
    )
    hi4 = (
        permute_h(hi, n_fft, n2)
        .reshape(batch, h_syms, n1, n2)
        .transpose(2, 0, 1, 3)
    )

    # Symbol-level SC-FDE statistics from h alone (h-sized, not
    # sample-sized): useful-signal gain b = mean_k |H|²/(|H|²+nv),
    # post-despread SINR b/(1−b) (ops.equalize.equalize_mmse_fde).
    h2full = hr.astype(jnp.float32) ** 2 + hi.astype(jnp.float32) ** 2
    bias = jnp.maximum(
        jnp.mean(h2full / (h2full + nv), axis=-1), jnp.float32(1e-9)
    )  # (batch, h_syms)
    inv_bias = 1.0 / bias
    inv_eff = bias / jnp.maximum(1.0 - bias, jnp.float32(1e-9))

    tr, ti = _stage1_call(
        re4, im4, n1, n2, cps, cp_chunks, tba, interpret, sdt
    )

    mode = _matmul.mxu_mode()
    n_w = _matmul.n_w_operands(mode)
    w_fwd = _matmul.prepare_w(*_stage2_mats(n2), mode)
    # Despread = the TX inverse transform scaled √N (conj(F)/√N overall
    # — link.pipeline's ifft(s)·√N convention).
    w_dsp = _matmul.prepare_w(
        *_stage1_mats(n2, n_fft, float(np.sqrt(n_fft))), mode
    )
    twr, twi = _tx_twiddles(n1, n2)
    twr4 = jnp.asarray(twr).reshape(n1, 1, 1, n2)
    twi4 = jnp.asarray(twi).reshape(n1, 1, 1, n2)

    rows_b = tbb * n_syms

    def kernel_bp(tr_ref, ti_ref, hr_ref, hi_ref, twr_ref, twi_ref, *rest):
        w_refs = rest[:n_w]
        wd_refs = rest[n_w : 2 * n_w]
        sr_ref, si_ref = rest[2 * n_w], rest[2 * n_w + 1]
        xr = tr_ref[0].reshape(rows_b, n2)
        xi = ti_ref[0].reshape(rows_b, n2)
        if xr.dtype == jnp.bfloat16:
            yr, yi = _matmul.complex_dot_xbf16(xr, xi, w_refs, mode)
        else:
            yr, yi = _matmul.complex_dot(xr, xi, w_refs, mode)
        hrb = jnp.broadcast_to(hr_ref[0], (tbb, n_syms, n2)).reshape(rows_b, n2)
        hib = jnp.broadcast_to(hi_ref[0], (tbb, n_syms, n2)).reshape(rows_b, n2)
        h2 = hrb * hrb + hib * hib
        inv_d = jnp.float32(1.0) / (h2 + nv)
        sr = (hrb * yr + hib * yi) * inv_d
        si = (hrb * yi - hib * yr) * inv_d
        dr, di = _matmul.complex_dot(sr, si, wd_refs, mode)
        wr = twr_ref[0, 0]
        wi = twi_ref[0, 0]
        sr_ref[0] = (dr * wr - di * wi).reshape(tbb, n_syms, n2).astype(sdt)
        si_ref[0] = (dr * wi + di * wr).reshape(tbb, n_syms, n2).astype(sdt)

    stage_spec_b = pl.BlockSpec(
        (1, tbb, n_syms, n2), lambda k, j: (k, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tw_spec = pl.BlockSpec(
        (1, 1, 1, n2), lambda k, j: (k, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sr, si = pl.pallas_call(
        kernel_bp,
        grid=(n1, batch // tbb),
        in_specs=[
            stage_spec_b,
            stage_spec_b,
            pl.BlockSpec((1, tbb, h_syms, n2), lambda k, j: (k, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tbb, h_syms, n2), lambda k, j: (k, j, 0, 0),
                         memory_space=pltpu.VMEM),
            tw_spec,
            tw_spec,
        ] + [
            pl.BlockSpec((n2, n2), lambda k, j: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in (*w_fwd, *w_dsp)
        ],
        out_specs=(stage_spec_b, stage_spec_b),
        out_shape=(
            jax.ShapeDtypeStruct((n1, batch, n_syms, n2), sdt),
            jax.ShapeDtypeStruct((n1, batch, n_syms, n2), sdt),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(tr, ti, hr4, hi4, twr4, twi4, *w_fwd, *w_dsp)

    rows_c = tbc * n_syms

    def kernel_c(sr_ref, si_ref, ib_ref, ie_ref, *rest):
        if count:
            idx_ref = rest[0]
            rest = rest[1:]
        out_ref = rest[0]
        chunks = [
            (
                sr_ref[c].reshape(rows_c, n2).astype(jnp.float32),
                si_ref[c].reshape(rows_c, n2).astype(jnp.float32),
            )
            for c in range(n1)
        ]
        x = _fft_chunks(chunks, inverse=True)  # contiguous time chunks
        ib = jnp.broadcast_to(
            ib_ref[:, :, :1], (tbc, n_syms, 1)
        ).reshape(rows_c, 1)
        ie = jnp.broadcast_to(
            ie_ref[:, :, :1], (tbc, n_syms, 1)
        ).reshape(rows_c, 1)
        acc = None
        total = jnp.float32(0.0)
        for c in range(n1):
            xr_c, xi_c = x[c]
            tr_c = xr_c * ib
            ti_c = xi_c * ib
            if mod is Modulation.BPSK:
                llr_bits = _llr_axis(tr_c, ie, mod)
            else:
                llr_bits = _llr_axis(tr_c, ie, mod) + _llr_axis(ti_c, ie, mod)
            if count:
                idx_c = idx_ref[:, :, c, :].reshape(rows_c, n2)
                err = count_errors_bits(llr_bits, idx_c, bps)
                err = jnp.sum(err.reshape(tbc, n_syms, n2), axis=1)
                acc = err if acc is None else acc + err
            else:
                for b_llr in llr_bits:
                    total = total + jnp.sum(b_llr, dtype=jnp.float32)
        if count:
            out_ref[:] = acc[:, None, :]
        else:
            out_ref[:] = jnp.broadcast_to(total, (8, 128))

    in_specs_c = [
        pl.BlockSpec((n1, tbc, n_syms, n2), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n1, tbc, n_syms, n2), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        # (batch, h_syms, 128) lane-duplicated planes: Mosaic's block
        # rule constrains only the LAST TWO dims, so the tiny batch
        # tile rides the leading axis.
        pl.BlockSpec((tbc, h_syms, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tbc, h_syms, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args_c = [
        sr,
        si,
        jnp.broadcast_to(inv_bias[:, :, None], (batch, h_syms, 128)),
        jnp.broadcast_to(inv_eff[:, :, None], (batch, h_syms, 128)),
    ]
    if count:
        in_specs_c.append(
            pl.BlockSpec((tbc, n_syms, n1, n2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args_c.append(
            count_idx.astype(jnp.int32).reshape(batch, n_syms, n1, n2)
        )
        out = pl.pallas_call(
            kernel_c,
            grid=(batch // tbc,),
            in_specs=in_specs_c,
            out_specs=pl.BlockSpec(
                (tbc, 1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, 1, n2), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=interpret,
        )(*args_c)
        return jnp.sum(
            out.reshape(batch, n2), axis=-1, dtype=jnp.float32
        ).astype(jnp.int32)

    partial = pl.pallas_call(
        kernel_c,
        grid=(batch // tbc,),
        in_specs=in_specs_c,
        out_specs=pl.BlockSpec(
            (8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8 * (batch // tbc), 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args_c)
    return jnp.sum(partial[::8, 0], dtype=jnp.float32)
