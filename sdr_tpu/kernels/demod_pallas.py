"""Fused Pallas TPU demodulator: CP strip → DFT → MMSE → max-log LLR.

One kernel owns the whole receive chain the north-star metric counts
(BASELINE.json; the reference's equivalent path is ofdm.hpp:37-54 +
modulation.hpp:50-67 run serially on CPU). Fusing it means the only
HBM traffic is the planar input read (+ the LLR write when not
reducing): every intermediate — the CP-stripped symbol matrix, the
frequency-domain grid, the equalized symbols, the per-level distance
metrics — lives in VMEM.

Design notes (TPU-first, not a translation):

- The DFT is a dense matmul against a precomputed N×N DFT matrix run
  on the MXU via Gauss's 3-multiplication complex product at multi-
  pass bf16 precision (kernels/_matmul.py). The reference's
  bit-reverse + butterfly recurrence (fft.hpp:35-155) is a scalar-CPU
  formulation with no TPU analog; at OFDM sizes the O(N²) matmul
  beats the O(N log N) butterfly because it runs at MXU rates
  instead of VPU rates.
- Rows = OFDM symbols: a (TB·S, sym_len) tile puts the transform on
  the lane axis and the symbol batch on sublanes, so the matmul tiles
  cleanly onto the 128×128 systolic array.
- Unbiased per-tap MMSE equals ZF for a one-tap channel:
  s = conj(h)·y / |h|², eff_var = nv / |h|². The kernel never divides
  by eff_var: LLR = (d1 − d0) · |h|² / nv, so h→0 fades LLRs to zero
  instead of amplifying noise.
- Max-log LLR over a Gray square constellation separates per axis
  (I bits from Re, Q bits from Im). The per-level distance scan is
  unrolled at trace time (L ≤ 32 levels) keeping only 2·m running
  minima — no (rows, N, L) tensor is ever materialized.

Bit ordering matches sdr_tpu.ops.llr.llr_maxlog exactly: per
subcarrier, m I-axis bits (MSB first) then m Q-axis bits.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels import _matmul
from sdr_tpu.ops.modulation import _tables

# Largest n_fft the single-matmul kernel supports: the three Gauss W
# operands must fit VMEM alongside the row tile (at 1024 they alone are
# 12 MB). Larger transforms fall back to the XLA FFT composition; an
# in-kernel four-step factorization is blocked on Mosaic reshape/
# transpose support (docs/PERF.md).
_MAX_N_FFT = 512


def supported(shape, cp_len: int, mod: Modulation) -> bool:
    """Whether the fused kernel handles this problem shape.

    Requires 3-D (batch, n_syms, sym_len) planar input, an n_fft that
    fills whole 128-lane registers and fits the VMEM budget
    (_MAX_N_FFT), a row count that tiles the sublane dimension, and an
    n_syms small enough that even a batch-tile of 1 keeps the row block
    inside VMEM (the grid only tiles the batch axis).
    """
    if len(shape) != 3:
        return False
    batch, n_syms, sym_len = shape
    n_fft = sym_len - cp_len
    if n_fft < 128 or n_fft % 128 != 0 or n_fft > _MAX_N_FFT:
        return False
    if (batch * n_syms) % 8 != 0:
        return False
    if n_syms > _matmul.row_target(n_fft):
        return False
    return True


@functools.lru_cache(maxsize=None)
def _dft_mats(n: int):
    """(Wr, Wi) float32 (n, n), forward unscaled kernel e^{-2πi jk/n}.

    Same convention as the reference's forward transform (fft.hpp:114
    with inverse=false); precomputed in float64 — no twiddle recurrence,
    hence none of the drift the reference renormalizes (fft.hpp:144-150).
    """
    jk = np.outer(np.arange(n), np.arange(n)).astype(np.float64)
    w = np.exp(-2j * np.pi * jk / n)
    return np.real(w).astype(np.float32), np.imag(w).astype(np.float32)


def _idft_mats(n: int):
    """(W2r, W2i) for the SC-FDE despread: conj(F)/sqrt(n) — matches
    link.pipeline's ifft(s)·sqrt(n) convention exactly."""
    wr, wi = _dft_mats(n)
    s = np.float32(1.0 / np.sqrt(n))
    return wr * s, -wi * s


def equalize_llr_bits(yr, yi, hr, hi, inv_nv, mod: Modulation):
    """Shared fused-kernel tail: unbiased one-tap MMSE + max-log LLR.

    s = conj(h)·y/|h|², LLRs scaled by |h|²/nv (h→0 fades LLRs to zero
    instead of dividing by ~0). Returns the per-bit LLR plane list
    (I-axis bits then Q-axis bits, MSB first) — the exact block every
    fused kernel (demod, llr, fourstep, fourstep-split) ends with.
    """
    h2 = hr * hr + hi * hi
    inv_h2 = jnp.float32(1.0) / jnp.maximum(h2, jnp.float32(1e-12))
    sr = (hr * yr + hi * yi) * inv_h2
    si = (hr * yi - hi * yr) * inv_h2
    inv_eff = h2 * inv_nv
    if mod is Modulation.BPSK:
        return _llr_axis(sr, inv_eff, mod)
    return _llr_axis(sr, inv_eff, mod) + _llr_axis(si, inv_eff, mod)


def equalize_despread_llr_bits(
    yr, yi, hr, hi, noise_var: float, mod: Modulation, w2_refs, mode: str
):
    """SC-FDE tail: per-tone biased MMSE → IDFT despread → symbol-level
    bias correction → LLR (ops.equalize.equalize_mmse_fde's math).

    Full-grid SC-FDMA is single-carrier with a CP (the DFT precode and
    the IFFT cancel), so the receiver is the classic frequency-domain
    equalizer: the BIASED per-tone MMSE weight conj(H)/(|H|²+nv)
    (a notch must not amplify noise — ZF's 1/|H| spreads it across
    EVERY despread symbol; measured 3× more errors), then ONE more
    Gauss matmul against W2 = conj(F)/sqrt(N) brings the symbols back
    to time, where the useful-signal gain is the tone mean
    b = mean(|H|²/(|H|²+nv)) (divide once per row) and the
    post-despread SINR is the classic b/(1−b).
    """
    nv = jnp.float32(max(float(noise_var), 1e-12))
    h2 = hr * hr + hi * hi
    inv_d = jnp.float32(1.0) / (h2 + nv)
    sr = (hr * yr + hi * yi) * inv_d
    si = (hr * yi - hi * yr) * inv_d
    bias = jnp.maximum(
        jnp.mean(h2 * inv_d, axis=-1, keepdims=True), jnp.float32(1e-9)
    )
    inv_bias = jnp.float32(1.0) / bias
    inv_eff = bias / jnp.maximum(1.0 - bias, jnp.float32(1e-9))  # SINR
    tr, ti = _matmul.complex_dot(sr, si, w2_refs, mode)
    tr = tr * inv_bias
    ti = ti * inv_bias
    if mod is Modulation.BPSK:
        return _llr_axis(tr, inv_eff, mod)
    return _llr_axis(tr, inv_eff, mod) + _llr_axis(ti, inv_eff, mod)


def _llr_axis(v, inv_eff, mod: Modulation):
    """Per-axis max-log LLRs; strategy picked by constellation size.

    L <= 4 (BPSK/QPSK/16-QAM): the unrolled per-level distance scan —
    fewer VPU ops than the fold recursion's sign/round/clip chain
    (measured: recursion costs +20% at 16-QAM).
    L >= 8 (64-QAM up): the exact Gray fold recursion — O(m) instead of
    O(L) (measured: 1.8x at 1024-QAM). Both exact max-log; parity vs
    ops.llr's reference scan in tests/test_demod.py.
    """
    if mod.levels_per_axis <= 4:
        return _llr_axis_unrolled(v, inv_eff, mod)
    return _llr_axis_recursive(v, inv_eff, mod)


def _llr_axis_unrolled(v, inv_eff, mod: Modulation):
    """Per-level distance scan keeping 2·m running minima."""
    from sdr_tpu.ops.llr import _axis_bit_masks

    _, pam, norm, _ = _tables(mod)
    levels = [float(a) * float(norm) for a in pam]
    masks = _axis_bit_masks(mod)  # (m, L) numpy bool
    m = mod.bits_per_axis
    big = jnp.float32(3.4e38)
    d0 = [None] * m
    d1 = [None] * m
    for l, lev in enumerate(levels):
        d2 = (v - jnp.float32(lev)) ** 2
        for j in range(m):
            if masks[j, l]:
                d1[j] = d2 if d1[j] is None else jnp.minimum(d1[j], d2)
            else:
                d0[j] = d2 if d0[j] is None else jnp.minimum(d0[j], d2)
    for j in range(m):
        if d0[j] is None:
            d0[j] = big
        if d1[j] is None:
            d1[j] = big
    return [(d1[j] - d0[j]) * inv_eff for j in range(m)]


def _llr_axis_recursive(v, inv_eff, mod: Modulation):
    """Exact max-log LLRs via the Gray fold recursion.

    In the UNNORMALIZED domain (levels ±1..±(Lc−1)) the MSB's max-log
    metric has the closed form −sign(z)·(q+1)·(2|z| − (q−1)) with q the
    nearest positive level, and the remaining bits are exactly the same
    problem on the folded coordinate z' = Lc/2 − |z| with Lc/2 levels
    (binary-reflected Gray self-similarity). Equal to the unrolled scan
    to float rounding for every scheme.
    """
    _, _, norm, inorm = _tables(mod)
    m = mod.bits_per_axis
    # LLRs accumulate in the unnormalized domain; one combined scale
    # norm²·inv_eff restores the normalized-metric convention.
    scale = inv_eff * jnp.float32(float(norm) * float(norm))
    z = v * jnp.float32(float(inorm))
    Lc = mod.levels_per_axis
    out = []
    for _ in range(m):
        az = jnp.abs(z)
        half = Lc // 2
        q = 2.0 * jnp.clip(jnp.round((az - 1.0) * 0.5), 0.0, float(half - 1)) + 1.0
        out.append(-jnp.sign(z) * ((q + 1.0) * (2.0 * az - (q - 1.0))) * scale)
        z = jnp.float32(half) - az
        Lc = half
    return out


def count_errors_bits(llr_bits, idx, bps: int):
    """Shared fused-kernel counting tail: hard decisions vs the
    transmitted symbol indices, summed over bit planes.

    ``llr_bits`` is the kernel-order plane list (I bits then Q bits,
    MSB first — position j IS public bit j of each subcarrier), so the
    transmitted bit plane is ``(idx >> (bps−1−j)) & 1``, matching
    ops.modulation._ints_to_bits' MSB-first unpack exactly. Returns the
    float32 error plane (rows, n) — counts ≤ 2²⁴ so f32 is exact."""
    err = None
    for j, b_llr in enumerate(llr_bits):
        tx_j = ((idx >> (bps - 1 - j)) & jnp.int32(1)) != 0
        e = jnp.where((b_llr < 0) != tx_j, jnp.float32(1.0), jnp.float32(0.0))
        err = e if err is None else err + e
    return err


def _demod_split(rows: int) -> int:
    """Software-pipelining factor for the fused kernel (env knob).

    SDR_TPU_DEMOD_SPLIT=k > 1 processes the row block in k chunks with
    chunk c+1's MXU matmul emitted BETWEEN chunk c's matmul and its VPU
    equalize/LLR tail, so the scheduler can overlap the two units —
    the cross-block MXU/VPU overlap docs/PERF.md identifies as the
    residual at the ~20 GS/s plateau. Numerically exact vs split=1
    (the matmul and the tail are row-independent). Falls back to 1
    when the chunking would break sublane alignment.
    """
    k = int(os.environ.get("SDR_TPU_DEMOD_SPLIT", "1"))
    if k <= 1 or rows % k or (rows // k) % 8:
        return 1
    return k


def _make_kernel(
    tb: int, n_syms: int, sym_len: int, cp_len: int, mod: Modulation,
    noise_var: float, reduce_sum: bool, count: bool = False,
    x_bf16: bool = False, despread: bool = False, taps_lp: int = 0,
):
    n_fft = sym_len - cp_len
    rows = tb * n_syms
    m = mod.bits_per_axis
    bps = mod.bits_per_symbol
    inv_nv = np.float32(1.0 / max(noise_var, 1e-12))

    mode = _matmul.mxu_mode()
    n_w = _matmul.n_w_operands(mode)
    split = _demod_split(rows)
    rows_c = rows // split

    def kernel(re_ref, im_ref, hr_ref, hi_ref, *rest):
        if count:
            idx_ref = rest[0]
            rest = rest[1:]
        w_refs = rest[:n_w]
        rest = rest[n_w:]
        if despread:
            w2_refs = rest[:n_w]
            rest = rest[n_w:]
        if taps_lp:
            pr_ref, pi_ref = rest[:2]
            rest = rest[2:]
        out_ref = rest[0]
        # CP strip + row-major reshape: (tb, S, sym_len) → (rows, n_fft).
        xr = re_ref[:].reshape(rows, sym_len)[:, cp_len:]
        xi = im_ref[:].reshape(rows, sym_len)[:, cp_len:]

        if taps_lp:
            # FACTORIZED channel plane (round 5, TDL models): hr/hi
            # carry the per-(channel, symbol) TAPS (tb, S, Lp) and the
            # (rows, n_fft) frequency response is computed ON-CHIP with
            # one tiny high-precision matmul against the padded DFT
            # phase rows — the (B, S, N) complex plane (sample-plane-
            # sized) is never materialized in HBM.
            tr = hr_ref[:].reshape(rows, taps_lp)
            ti = hi_ref[:].reshape(rows, taps_lp)

            def _pdot(a, b):
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )

            pr = pr_ref[:]
            pi = pi_ref[:]
            hr = _pdot(tr, pr) - _pdot(ti, pi)
            hi = _pdot(tr, pi) + _pdot(ti, pr)
        else:
            # Channel response, broadcast over symbols: (tb,1,N) or the
            # per-symbol fading plane (tb,S,N) → (rows,N).
            hr = jnp.broadcast_to(
                hr_ref[:], (tb, n_syms, n_fft)
            ).reshape(rows, n_fft)
            hi = jnp.broadcast_to(
                hi_ref[:], (tb, n_syms, n_fft)
            ).reshape(rows, n_fft)
        # idx rides HBM/VMEM narrow (int8/int16, round 5) and widens
        # in-register — the int32 plane read was 4 B/sample.
        idx = (
            idx_ref[:].reshape(rows, n_fft).astype(jnp.int32)
            if count
            else None
        )

        def tail(c, y):
            """VPU leg for row chunk c: equalize + max-log LLR (+count)."""
            yr, yi = y
            sl = slice(c * rows_c, (c + 1) * rows_c)
            if despread:
                llr_bits = equalize_despread_llr_bits(
                    yr, yi, hr[sl], hi[sl], noise_var, mod, w2_refs, mode
                )
            else:
                llr_bits = equalize_llr_bits(
                    yr, yi, hr[sl], hi[sl], inv_nv, mod
                )
            if count:
                return count_errors_bits(llr_bits, idx[sl], bps)
            if reduce_sum:
                total = jnp.float32(0.0)
                for b_llr in llr_bits:
                    total = total + jnp.sum(b_llr, dtype=jnp.float32)
                return total
            return jnp.concatenate(llr_bits, axis=-1)

        # DFT on the MXU: Gauss 3-matmul complex product at the mode's
        # multi-pass bf16 precision (default bf16x3 — BER-identical to
        # f32; single-pass bf16 drifts LLRs ~4% and fails the 0.1 dB
        # bound). See kernels/_matmul.py. With split > 1 the chunks are
        # software-pipelined: matmul(c+1) is emitted before tail(c).
        outs = [None] * split
        prev = None
        for c in range(split):
            sl = slice(c * rows_c, (c + 1) * rows_c)
            # bf16 INPUT mode (SDR_TPU_DEMOD_INPUT=bf16 at the bench,
            # or bf16 sample planes from a front end): halves the
            # kernel's HBM read; the x-side hi/lo split collapses so
            # the matmul runs the bf16x2 pass count with exact W.
            if x_bf16:
                y = _matmul.complex_dot_xbf16(xr[sl], xi[sl], w_refs, mode)
            else:
                y = _matmul.complex_dot(xr[sl], xi[sl], w_refs, mode)
            if prev is not None:
                outs[c - 1] = tail(c - 1, prev)
            prev = y
        outs[split - 1] = tail(split - 1, prev)

        if count:
            err = jnp.concatenate(outs, axis=0) if split > 1 else outs[0]
            # Per-CHANNEL partial counts: fold the symbol axis in-kernel,
            # keep the lane axis for the (tiny) XLA sum outside. The
            # write is tb·N floats per block — ~1000x less HBM than the
            # LLR plane + restore transpose this path replaces.
            out_ref[0] = jnp.sum(err.reshape(tb, n_syms, n_fft), axis=1)
        elif reduce_sum:
            total = outs[0]
            for t in outs[1:]:
                total = total + t
            # One (8,128) VMEM tile per grid block (SMEM scalar outputs
            # don't tile across grids); caller reads [:, 0, 0].
            out_ref[0] = jnp.broadcast_to(total, (8, 128))
        else:
            # Bit-major lane concat (Mosaic cannot lower the per-
            # subcarrier interleave reshape); the caller transposes to
            # the public (..., subcarrier-major) bit order.
            if split == 1:
                out_ref[:] = outs[0]
            else:
                for c in range(split):
                    out_ref[c * rows_c : (c + 1) * rows_c] = outs[c]

    return kernel


def demod_chain_pallas(
    re: jnp.ndarray,
    im: jnp.ndarray,
    hr: jnp.ndarray,
    hi: jnp.ndarray,
    cp_len: int,
    mod: Modulation,
    noise_var: float,
    reduce_sum: bool = False,
    interpret: bool | None = None,
    despread: bool = False,
) -> jnp.ndarray:
    """Fused demod chain over (batch, n_syms, sym_len) planar inputs.

    hr/hi: (batch, 1, n_fft) per-link channel response. Returns LLRs
    (batch, n_syms, n_fft·bps) float32, or their scalar sum when
    ``reduce_sum``. Matches ops.demod.demod_chain_jnp to float32
    matmul tolerance (tests/test_demod.py).

    ``despread``: the SC-FDE variant (full-grid SC-FDMA): one more
    Gauss matmul (conj(F)/sqrt(N)) after the per-tone equalizer brings
    the symbols back to time, LLRs scaled by the tone-mean noise.
    """
    if not supported(re.shape, cp_len, mod):
        raise ValueError(f"unsupported shape {re.shape} for fused demod kernel")
    batch, n_syms, sym_len = re.shape
    n_fft = sym_len - cp_len
    bps = mod.bits_per_symbol
    # h is per-link (batch, 1, n_fft) or per-symbol (batch, n_syms, n_fft)
    # — the fading axis broadcast happens inside the kernel either way.
    h_syms = hr.shape[1]
    if hr.shape != (batch, h_syms, n_fft) or h_syms not in (1, n_syms):
        raise ValueError(f"unsupported channel shape {hr.shape}")
    tb = _matmul.pick_batch_tile(batch, n_syms, n_fft)
    grid = (batch // tb,)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    w_ops = _matmul.prepare_w(*_dft_mats(n_fft), _matmul.mxu_mode())
    if despread:
        w_ops = w_ops + _matmul.prepare_w(
            *_idft_mats(n_fft), _matmul.mxu_mode()
        )
    kernel = _make_kernel(
        tb, n_syms, sym_len, cp_len, mod, float(noise_var), reduce_sum,
        x_bf16=(re.dtype == jnp.bfloat16), despread=despread,
    )

    in_specs = [
        pl.BlockSpec((tb, n_syms, sym_len), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n_syms, sym_len), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h_syms, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h_syms, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((n_fft, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in w_ops
    ]
    rows = tb * n_syms
    cost = pl.CostEstimate(
        flops=6 * rows * n_fft * n_fft * grid[0],
        bytes_accessed=(2 * batch * n_syms * sym_len + 2 * batch * h_syms * n_fft) * 4
        + (0 if reduce_sum else batch * n_syms * n_fft * bps * 4),
        transcendentals=0,
    )

    if reduce_sum:
        partial = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=interpret,
        )(re, im, hr, hi, *w_ops)
        return jnp.sum(partial[:, 0, 0], dtype=jnp.float32)

    rows_per_block = tb * n_syms
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rows_per_block, n_fft * bps), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch * n_syms, n_fft * bps), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(re, im, hr, hi, *w_ops)
    # Kernel emits bit-major lanes [j·N + k]; public order is
    # subcarrier-major [k·bps + j] (matches ops.llr.llr_maxlog). One
    # XLA transpose restores it.
    out = out.reshape(batch * n_syms, bps, n_fft).transpose(0, 2, 1)
    return out.reshape(batch, n_syms, n_fft * bps)


def demod_count_pallas(
    re: jnp.ndarray,
    im: jnp.ndarray,
    hr: jnp.ndarray,
    hi: jnp.ndarray,
    idx: jnp.ndarray,
    cp_len: int,
    mod: Modulation,
    noise_var: float,
    interpret: bool | None = None,
    despread: bool = False,
    taps: tuple | None = None,
) -> jnp.ndarray:
    """Fused demod + hard-decision error count vs transmitted indices.

    ``taps``: optional factorized per-symbol channel — a (taps_r,
    taps_i) pair of (batch, n_syms, L≤8) planes; the (rows, n_fft)
    frequency response is computed ON-CHIP (one tiny HIGHEST-precision
    matmul per block against the padded DFT phase rows), so the
    sample-plane-sized (B, S, N) complex response never exists in HBM
    (round 5; hr/hi are ignored and may be None).

    The BER-counting twin of ``demod_chain_pallas``: identical chain
    (CP strip → DFT → MMSE → max-log LLR) but the hard decisions are
    compared against ``idx`` (batch, n_syms, n_fft) int32 IN the
    kernel, so the only HBM traffic is the planar input read + the
    int32 index read + a tb·n_fft count write per block. No LLR plane
    is materialized and no bit-order restore transpose runs — the
    error count is invariant to the kernel's bit-major layout.
    Returns per-channel (batch,) int32 error counts, decision-exact vs
    counting on ``demod_chain_pallas``'s public-order LLRs.
    """
    if not supported(re.shape, cp_len, mod):
        raise ValueError(f"unsupported shape {re.shape} for fused demod kernel")
    batch, n_syms, sym_len = re.shape
    n_fft = sym_len - cp_len
    taps_lp = 0
    if taps is not None:
        # Factorized per-symbol channel (TDL): hr/hi slots carry the
        # zero-padded taps (batch, n_syms, 8); H computed in-kernel.
        tr, ti = taps
        if tr.shape[:2] != (batch, n_syms) or tr.shape[-1] > 8:
            raise ValueError(f"unsupported taps shape {tr.shape}")
        taps_lp = 8
        pad = taps_lp - tr.shape[-1]
        hr = jnp.pad(tr.astype(jnp.float32), ((0, 0), (0, 0), (0, pad)))
        hi = jnp.pad(ti.astype(jnp.float32), ((0, 0), (0, 0), (0, pad)))
        h_syms = n_syms
    else:
        h_syms = hr.shape[1]
        if hr.shape != (batch, h_syms, n_fft) or h_syms not in (1, n_syms):
            raise ValueError(f"unsupported channel shape {hr.shape}")
    if idx.shape != (batch, n_syms, n_fft):
        raise ValueError(f"unsupported index shape {idx.shape}")
    tb = _matmul.pick_batch_tile(batch, n_syms, n_fft)
    grid = (batch // tb,)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    w_ops = _matmul.prepare_w(*_dft_mats(n_fft), _matmul.mxu_mode())
    if despread:
        # SC-FDE: idx indexes TIME-domain constellation symbols.
        w_ops = w_ops + _matmul.prepare_w(
            *_idft_mats(n_fft), _matmul.mxu_mode()
        )
    kernel = _make_kernel(
        tb, n_syms, sym_len, cp_len, mod, float(noise_var),
        reduce_sum=False, count=True,
        x_bf16=(re.dtype == jnp.bfloat16), despread=despread,
        taps_lp=taps_lp,
    )
    h_minor = taps_lp if taps_lp else n_fft
    in_specs = [
        pl.BlockSpec((tb, n_syms, sym_len), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n_syms, sym_len), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h_syms, h_minor), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h_syms, h_minor), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n_syms, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((n_fft, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in w_ops
    ]
    rows = tb * n_syms
    cost = pl.CostEstimate(
        flops=6 * rows * n_fft * n_fft * grid[0],
        bytes_accessed=(2 * batch * n_syms * sym_len
                        + 2 * batch * h_syms * n_fft
                        + batch * n_syms * n_fft) * 4,
        transcendentals=0,
    )
    p_ops = []
    if taps_lp:
        k = np.arange(n_fft)
        l = np.arange(taps_lp)
        ang = 2.0 * np.pi * np.outer(l, k) / n_fft
        p_ops = [
            jnp.asarray(np.cos(ang).astype(np.float32)),
            jnp.asarray(-np.sin(ang).astype(np.float32)),
        ]
        in_specs += [
            pl.BlockSpec((taps_lp, n_fft), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in p_ops
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tb, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0], tb, n_fft), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(
        re, im, hr, hi,
        idx.astype(jnp.int8 if mod.bits_per_symbol <= 7 else jnp.int16),
        *w_ops, *p_ops,
    )
    return jnp.sum(
        out.reshape(batch, n_fft), axis=-1, dtype=jnp.float32
    ).astype(jnp.int32)
