"""Channels-last pipelined demod kernel: the round-4 headline path.

Round 3 left the fused demod kernel (kernels/demod_pallas.py) sitting
EXACTLY on the serial no-overlap roofline — measured rate equal to
1/(1/mem_SOL + 1/comp_SOL) within 1% (docs/PERF.md) — because Mosaic's
automatic grid pipeline does not overlap the input DMA with the MXU at
the headline block shapes, and is hard-capped at double buffering
(pl.Buffered(3+) fails to compile). This kernel attacks that directly
with three structural changes, each measured on hardware
(scripts/pipe_probe.py, docs/PERF.md round 4):

1. **Explicit in-kernel pipelining** via ``pltpu.emit_pipeline``: the
   sample planes stay in HBM (``pl.ANY``) and the pipeline emitter
   double-buffers chunk c+1's HBM→VMEM copy behind chunk c's compute.
   Measured overlap fraction: 0.94 — DMA is effectively free.
2. **Channels-last layout** ``(time, channel)``: the minor (lane) axis
   is the channel batch — always a multiple of 128 — so HBM block
   slicing is lane-aligned for ANY symbol length. The row-major layout
   cannot be manually sliced at sym_len=320 (Mosaic memref_slice
   requires 128-aligned minor dims), which is what blocked pipelining
   the original kernel.
3. **DIF radix-2 split of the DFT**: one decimation-in-frequency level
   turns the N-point DFT matmul into two N/2-point matmuls on
   contiguous row halves — HALF the MXU MACs — plus a cheap VPU
   butterfly/twiddle. Output bins land in even/odd (recursively,
   ``dif_perm``) order; the channel/index operands are pre-permuted
   outside the kernel so the in-kernel tail never reorders rows.
   The per-axis LLR tail is division-free for m ≤ 2 bits/axis
   (``_llr_axis_dfree``): the common p²/|h|² term cancels inside the
   max-log difference, so no reciprocal is needed.

Replaces (as the throughput path) the reference receive chain
ofdm.hpp:37-54 + modulation.hpp:50-67; conventions (forward unscaled
DFT, Gray mapping, MSB-first bit order) identical to
kernels/demod_pallas.py, parity-tested against ops.demod.demod_chain_jnp.

Layout contract (the "channels-last front end"):
  re_t/im_t : (n_syms·sym_len, batch)  planar samples, time-major —
              symbol s occupies rows [s·sym_len, (s+1)·sym_len), the
              first cp_len rows of each symbol being the CP.
  hr_t/hi_t : (n_fft, batch) per-link channel response, natural bin
              order (the wrappers permute to DIF order internally;
              pass ``h_in_dif_order=True`` if already permuted).
  idx_t     : (n_syms·n_fft, batch) int32 transmitted symbol indices
              (count mode), natural bin order per symbol.
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
from sdr_tpu.kernels.demod_pallas import _dft_mats, _llr_axis_recursive
from sdr_tpu.ops.modulation import _tables

_BASE = 128  # leaf DFT size: one MXU tile edge


def _cl_lb() -> int:
    """Channel lanes per block (minor-axis block width)."""
    return int(os.environ.get("SDR_TPU_CL_LB", "256"))


def _cl_sblk() -> int:
    """OFDM symbols per block (row-axis block height)."""
    return int(os.environ.get("SDR_TPU_CL_SBLK", "16"))


def supported_cl(n_fft: int, batch: int, n_syms: int, mod: Modulation) -> bool:
    """Shapes the channels-last kernel handles: n_fft = 128·2^k up to
    4096 (k DIF levels down to the 128-point leaf matmul — at wideband
    sizes this replaces the split four-step's TWO HBM staging round
    trips with zero, and its N2=512 stage-2 matmul with 128-wide
    leaves: ~4× fewer MXU MACs/sample), a channel batch that tiles the
    lane blocks, and a symbol count that tiles the row blocks (the
    wrappers shrink the block knobs to fit). At n_fft ≥ 1024 the
    channel planes ride VMEM in bfloat16 (the f32 planes alone would
    blow the block budget); the BER gate for that truncation is
    measured in docs/PERF.md."""
    if n_fft < 128 or n_fft > 4096 or n_fft % 128 or (
        (n_fft // 128) & (n_fft // 128 - 1)
    ):
        return False
    if batch % 128 != 0:
        return False
    del n_syms, mod
    return True


@functools.lru_cache(maxsize=None)
def dif_perm(n_fft: int) -> np.ndarray:
    """Kernel-row → natural-bin map of the recursive DIF split.

    Row r of the kernel's frequency output is natural bin perm[r]:
    perm(N) = concat(2·perm(N/2), 2·perm(N/2)+1), perm(128) = arange.
    Operands indexed by bin (h, idx) are gathered with this permutation
    BEFORE the kernel; ``inv_dif_perm`` restores natural order after.
    """
    if n_fft == _BASE:
        return np.arange(_BASE)
    half = dif_perm(n_fft // 2)
    return np.concatenate([2 * half, 2 * half + 1])


@functools.lru_cache(maxsize=None)
def inv_dif_perm(n_fft: int) -> np.ndarray:
    p = dif_perm(n_fft)
    inv = np.empty_like(p)
    inv[p] = np.arange(n_fft)
    return inv


@functools.lru_cache(maxsize=None)
def _twiddle_levels(n_fft: int):
    """Per-DIF-level twiddles ((M/2, 1) f32 pairs), M = n_fft, n_fft/2, …

    Forward convention w = e^{-2πi k/M} matching _dft_mats (and the
    reference's θ = −2π/N, fft.hpp:114)."""
    out = []
    m = n_fft
    while m > _BASE:
        k = np.arange(m // 2)
        w = np.exp(-2j * np.pi * k / m)
        out.append(
            (
                np.real(w).astype(np.float32).reshape(-1, 1),
                np.imag(w).astype(np.float32).reshape(-1, 1),
            )
        )
        m //= 2
    return tuple(out)


def dif_blocks(xr, xi, tw_levels):
    """Apply the DIF butterfly/twiddle cascade down to 128-row blocks.

    xr/xi: (n_fft, lanes) in f32 or bf16. Returns (blocks, leaf_dtype):
    the list of 2^k (128, lanes) block pairs whose per-block 128-pt
    DFTs concatenate to the full transform in ``dif_perm`` row order,
    plus the dtype leaves should be cast to before the matmul.

    Cascade precision: one level (n_fft ≤ 512) keeps sums in the input
    dtype and computes the twiddled branch in f32 cast back — the
    round-4 scheme. At ≥ 2 levels the WHOLE cascade runs in f32 with a
    single downcast at the leaf (tail_probe measured the per-level
    bf16↔f32 cast pairs at ~1/3 of the wideband cascade leg, which is
    as expensive as the MXU leg there — docs/PERF.md round 5); the
    leaf downcast preserves the matmul's operand precision, and the
    f32 intermediate is strictly MORE accurate than per-level
    truncation.
    """
    dtype = xr.dtype
    f32_cascade = len(tw_levels) >= 2
    if f32_cascade:
        xr = xr.astype(jnp.float32)
        xi = xi.astype(jnp.float32)
    blocks = [(xr, xi)]
    for twr, twi in tw_levels:
        nxt = []
        for br, bi in blocks:
            h = br.shape[0] // 2
            x1r, x2r = br[:h], br[h:]
            x1i, x2i = bi[:h], bi[h:]
            sr = x1r + x2r
            si = x1i + x2i
            if f32_cascade:
                dr = x1r - x2r
                di = x1i - x2i
                er = dr * twr - di * twi
                ei = dr * twi + di * twr
            else:
                dr = (x1r - x2r).astype(jnp.float32)
                di = (x1i - x2i).astype(jnp.float32)
                er = (dr * twr - di * twi).astype(dtype)
                ei = (dr * twi + di * twr).astype(dtype)
            nxt.append((sr, si))
            nxt.append((er, ei))
        blocks = nxt
    return blocks, dtype


def dft_cl(xr, xi, w_refs, tw_consts, mode: str):
    """(Yr, Yi) = DFT over the ROW axis of (n_fft, lanes) planar input,
    rows of the result in ``dif_perm`` order. The DIF cascade feeds
    2^k 128-point LHS Gauss matmuls (half the MACs per level vs the
    direct N-point matmul)."""
    blocks, leaf_dt = dif_blocks(xr, xi, tw_consts)
    outs = [
        _matmul.complex_dot_lhs(
            br.astype(leaf_dt), bi.astype(leaf_dt), w_refs, mode
        )
        for br, bi in blocks
    ]
    if len(outs) == 1:
        return outs[0]
    yr = jnp.concatenate([o[0] for o in outs], axis=0)
    yi = jnp.concatenate([o[1] for o in outs], axis=0)
    return yr, yi


def dfree_h_consts(hr, hi, mod: Modulation):
    """Symbol-INVARIANT h-derived terms of the division-free tail:
    |h|² and the per-level h²·lev² planes (shared between ±lev — two
    distinct planes for 16-QAM). Round 4 recomputed these every symbol
    (16× per block at the headline shape); hoisting them across the
    s_blk loop is tail-thinning fix 1 of VERDICT round 4 item 6
    (per-op budget in scripts/tail_probe.py / docs/PERF.md round 5)."""
    h2 = hr * hr + hi * hi
    _, pam, norm, _ = _tables(mod)
    cache = {}
    hlev2 = []
    for a in pam:
        lev = float(a) * float(norm)
        k = lev * lev
        if k not in cache:
            cache[k] = h2 * jnp.float32(k)
        hlev2.append(cache[k])
    return h2, tuple(hlev2)


def _llr_axis_dfree(p, h2, inv_nv, mod: Modulation, hlev2=None,
                    scale_out=True):
    """Division-free per-axis max-log LLRs from UN-equalized inner
    products: p = Re/Im of conj(h)·y, h2 = |h|².

    With g(l) = l²·|h|² − 2·l·p, the equalized metric
    (p/|h|² − l)²·|h|²/nv differs from g(l)·inv_nv only by the common
    p²/|h|² term, which cancels in min_{S1} − min_{S0} — so
    LLR = (min_{S1} g − min_{S0} g)·inv_nv with NO reciprocal, exactly
    the unrolled-scan LLR (demod_pallas._llr_axis_unrolled) up to fp
    rounding, and with the better h→0 limit (LLR → 0 with no clamp).

    ``hlev2``: optional pre-hoisted h²·lev² planes (``dfree_h_consts``).
    The ±lev level pairs share one |2·lev·p| product either way.
    ``scale_out=False`` skips the final ·inv_nv (sign-invariant — the
    count terminal's decisions don't need it)."""
    from sdr_tpu.ops.llr import _axis_bit_masks

    _, pam, norm, _ = _tables(mod)
    masks = _axis_bit_masks(mod)  # (m, L) numpy bool
    m = mod.bits_per_axis
    big = jnp.float32(3.4e38)
    d0 = [None] * m
    d1 = [None] * m
    qcache = {}
    for l, a in enumerate(pam):
        lev = float(a) * float(norm)
        hl = hlev2[l] if hlev2 is not None else h2 * jnp.float32(lev * lev)
        al = abs(lev)
        if al not in qcache:
            qcache[al] = p * jnp.float32(2.0 * al)
        g = hl - qcache[al] if lev >= 0 else hl + qcache[al]
        for j in range(m):
            if masks[j, l]:
                d1[j] = g if d1[j] is None else jnp.minimum(d1[j], g)
            else:
                d0[j] = g if d0[j] is None else jnp.minimum(d0[j], g)
    for j in range(m):
        if d0[j] is None:
            d0[j] = big
        if d1[j] is None:
            d1[j] = big
    if not scale_out:
        return [d1[j] - d0[j] for j in range(m)]
    return [(d1[j] - d0[j]) * inv_nv for j in range(m)]


def equalize_llr_bits_cl(yr, yi, hr, hi, inv_nv, mod: Modulation,
                         h_consts=None, scale_out=True):
    """Channels-last fused tail: conj(h)·y inner products + max-log LLR.

    For m ≤ 2 bits/axis (BPSK/QPSK/16-QAM) the whole tail is
    division-free (``_llr_axis_dfree``). Denser constellations pay one
    VPU reciprocal and reuse the exact Gray fold recursion
    (demod_pallas._llr_axis_recursive). Plane order identical to the
    row-major kernel: I-axis bits then Q-axis bits, MSB first.

    ``h_consts``: pre-hoisted ``dfree_h_consts`` output (symbol-
    invariant); ``scale_out=False`` returns UNSCALED metric differences
    (same signs — the count terminal's form). Both only apply on the
    division-free path.
    """
    if h_consts is not None and mod.bits_per_axis <= 2:
        h2, hlev2 = h_consts
    else:
        h2 = hr * hr + hi * hi
        hlev2 = None
    pr = hr * yr + hi * yi
    pi = hr * yi - hi * yr
    if mod.bits_per_axis <= 2:
        if mod is Modulation.BPSK:
            return _llr_axis_dfree(pr, h2, inv_nv, mod, hlev2, scale_out)
        return _llr_axis_dfree(
            pr, h2, inv_nv, mod, hlev2, scale_out
        ) + _llr_axis_dfree(pi, h2, inv_nv, mod, hlev2, scale_out)
    inv_h2 = jnp.float32(1.0) / jnp.maximum(h2, jnp.float32(1e-12))
    inv_eff = h2 * inv_nv
    vr = pr * inv_h2
    vi = pi * inv_h2
    if mod is Modulation.BPSK:
        return _llr_axis_recursive(vr, inv_eff, mod)
    return _llr_axis_recursive(vr, inv_eff, mod) + _llr_axis_recursive(
        vi, inv_eff, mod
    )


def _symbol_tail(
    yr, yi, hr, hi, inv_nv, mod: Modulation, out_mode: str, idx=None,
    h_consts=None,
):
    """Per-symbol VPU leg shared by the kernel and the jnp twin.

    Returns the per-symbol contribution: f32 scalar-plane sum ("sum"),
    the (n_fft, lanes) error plane ("count"), or the (bps·n_fft, lanes)
    bit-major LLR plane ("llr"). The count terminal consumes the
    UNSCALED metric differences (·inv_nv is sign-invariant — dropped,
    tail-thinning fix 2 of VERDICT round 4 item 6)."""
    llr_bits = equalize_llr_bits_cl(
        yr, yi, hr, hi, inv_nv, mod, h_consts=h_consts,
        scale_out=(out_mode != "count" or mod.bits_per_axis > 2),
    )
    if out_mode == "llr":
        if len(llr_bits) == 1:
            return llr_bits[0]
        return jnp.concatenate(llr_bits, axis=0)
    if out_mode == "count":
        bps = mod.bits_per_symbol
        err = None
        for j, b_llr in enumerate(llr_bits):
            tx_j = ((idx >> (bps - 1 - j)) & jnp.int32(1)) != 0
            e = jnp.where((b_llr < 0) != tx_j, jnp.float32(1.0), jnp.float32(0.0))
            err = e if err is None else err + e
        return err
    total = jnp.float32(0.0)
    for b_llr in llr_bits:
        total = total + jnp.sum(b_llr, dtype=jnp.float32)
    return total


def _make_cl_kernel(
    n_fft: int,
    cp_len: int,
    lb: int,
    s_blk: int,
    n_syms: int,
    batch: int,
    mod: Modulation,
    noise_var: float,
    out_mode: str,
    mode: str,
    out_dtype=jnp.float32,
):
    sym_len = n_fft + cp_len
    inv_nv = np.float32(1.0 / max(noise_var, 1e-12))
    n_w = _matmul.n_w_operands(mode)
    n_lvl = len(_twiddle_levels(n_fft))
    bps = mod.bits_per_symbol

    def kernel(re_hbm, im_hbm, hr_hbm, hi_hbm, *rest):
        if out_mode == "count":
            idx_hbm = rest[0]
            rest = rest[1:]
        w_refs = rest[:n_w]
        tw_refs = rest[n_w : n_w + 2 * n_lvl]
        out_ref = rest[-1]
        tw_consts = [
            (tw_refs[2 * i][:], tw_refs[2 * i + 1][:]) for i in range(n_lvl)
        ]

        def inner(*refs):
            if out_mode == "count":
                sre, sim, shr, shi, sidx, out = refs
            else:
                sre, sim, shr, shi, out = refs
            # h may ride VMEM in bf16 at wideband sizes; the tail math
            # (|h|², conj(h)·y) always runs in f32.
            hr = shr[:].astype(jnp.float32)
            hi = shi[:].astype(jnp.float32)
            # Symbol-invariant h terms hoisted across the s_blk loop
            # (narrowband: the full-plane tail; wideband's leafwise
            # path keeps per-leaf computation — s_blk is 1-2 there and
            # the hoisted planes would blow the VMEM stack).
            h_consts = (
                dfree_h_consts(hr, hi, mod)
                if n_fft < 1024 and mod.bits_per_axis <= 2
                else None
            )
            acc = None
            outs = []
            # Wideband (n_fft ≥ 1024): the full-width y (and working
            # LLR) planes would blow the VMEM stack (measured 19.4 MB
            # at 4096) — run the tail PER 128-ROW LEAF instead. DIF
            # order makes the h, idx AND output planes leaf-CONTIGUOUS,
            # so each leaf's matmul feeds its tail immediately (llr
            # mode: writes its bit-plane rows of the output block) and
            # only one (128, lb) working set is ever live.
            leafwise = n_fft >= 1024
            for s in range(s_blk):
                o = s * sym_len + cp_len
                xr = sre[o : o + n_fft, :]
                xi = sim[o : o + n_fft, :]
                idx_s = (
                    sidx[s * n_fft : (s + 1) * n_fft, :].astype(jnp.int32)
                    if out_mode == "count"
                    else None
                )
                if leafwise:
                    # DEPTH-FIRST cascade: only one root-to-leaf path of
                    # butterfly temps is ever live (~input-sized), vs the
                    # breadth-first dif_blocks whose per-level temp sets
                    # blew the VMEM stack at 4096 (measured 19.4 MB).
                    # DFS leaf order equals dif_perm's BFS order (both
                    # expand [sum-subtree ‖ diff-subtree] recursively).
                    llr_base = s * bps * n_fft

                    def consume(row0, br, bi):
                        nonlocal acc
                        # Leaf downcast to the input dtype: preserves
                        # the matmul's operand precision while the
                        # cascade above ran un-truncated in f32.
                        yr, yi = _matmul.complex_dot_lhs(
                            br.astype(x_dt), bi.astype(x_dt), w_refs, mode
                        )
                        sl = slice(row0, row0 + _BASE)
                        r = _symbol_tail(
                            yr, yi, hr[sl], hi[sl], inv_nv, mod, out_mode,
                            idx_s[sl] if out_mode == "count" else None,
                        )
                        if out_mode == "llr":
                            # Bit-major rows of this symbol's plane:
                            # plane j's leaf rows live at
                            # llr_base + j·n_fft + row0.
                            for j in range(bps):
                                o_j = llr_base + j * n_fft + row0
                                out[o_j : o_j + _BASE, :] = r[
                                    j * _BASE : (j + 1) * _BASE, :
                                ].astype(out_dtype)
                            return
                        if out_mode == "count":
                            r = jnp.sum(
                                r.reshape(8, _BASE // 8, lb), axis=1
                            )
                        acc = r if acc is None else acc + r

                    def walk(br, bi, lvl, row0):
                        # f32 cascade (≥3 levels here): no per-level
                        # truncation, one downcast at the leaf.
                        if br.shape[0] == _BASE:
                            consume(row0, br, bi)
                            return
                        twr, twi = tw_consts[lvl]
                        h2 = br.shape[0] // 2
                        x1r, x2r = br[:h2], br[h2:]
                        x1i, x2i = bi[:h2], bi[h2:]
                        sr_ = x1r + x2r
                        si_ = x1i + x2i
                        dr = x1r - x2r
                        di = x1i - x2i
                        er = dr * twr - di * twi
                        ei = dr * twi + di * twr
                        walk(sr_, si_, lvl + 1, row0)
                        walk(er, ei, lvl + 1, row0 + h2)

                    x_dt = xr.dtype
                    walk(
                        xr.astype(jnp.float32), xi.astype(jnp.float32), 0, 0
                    )
                    continue
                yr, yi = dft_cl(xr, xi, w_refs, tw_consts, mode)
                r = _symbol_tail(
                    yr, yi, hr, hi, inv_nv, mod, out_mode, idx_s,
                    h_consts=h_consts,
                )
                if out_mode == "llr":
                    outs.append(r)
                else:
                    acc = r if acc is None else acc + r
            if out_mode == "llr":
                if not leafwise:  # leafwise wrote out per leaf above
                    out[:] = (
                        jnp.concatenate(outs, axis=0)
                        if len(outs) > 1
                        else outs[0]
                    ).astype(out_dtype)
            elif out_mode == "count":
                # Per-lane partial counts, folded to 8 sublane groups so
                # the (8, lb) block stays tile-shaped (the leafwise path
                # already accumulated in that shape).
                if leafwise:
                    out[:] = acc
                else:
                    out[:] = jnp.sum(
                        acc.reshape(8, n_fft // 8, lb), axis=1
                    )
            else:
                out[:] = jnp.broadcast_to(acc, (8, 128))

        # Every (c, s) grid step writes its OWN output block — the
        # emitter's should_accumulate_out only keeps one step per
        # revisited block (measured: a 4-revisit sum came back exactly
        # 1/4), so partial results are laid out disjointly and reduced
        # by XLA outside the kernel (a few MB — negligible vs the
        # sample-plane read).

        in_specs = [
            pl.BlockSpec((s_blk * sym_len, lb), lambda c, s: (s, c)),
            pl.BlockSpec((s_blk * sym_len, lb), lambda c, s: (s, c)),
            pl.BlockSpec((n_fft, lb), lambda c, s: (0, c)),
            pl.BlockSpec((n_fft, lb), lambda c, s: (0, c)),
        ]
        if out_mode == "count":
            in_specs.append(
                pl.BlockSpec((s_blk * n_fft, lb), lambda c, s: (s, c))
            )
        if out_mode == "llr":
            out_specs = [
                pl.BlockSpec((s_blk * bps * n_fft, lb), lambda c, s: (s, c))
            ]
        elif out_mode == "count":
            out_specs = [pl.BlockSpec((8, lb), lambda c, s: (s, c))]
        else:
            out_specs = [pl.BlockSpec((8, 128), lambda c, s: (c, s))]

        pipeline = pltpu.emit_pipeline(
            inner,
            grid=(batch // lb, n_syms // s_blk),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        if out_mode == "count":
            pipeline(re_hbm, im_hbm, hr_hbm, hi_hbm, idx_hbm, out_ref)
        else:
            pipeline(re_hbm, im_hbm, hr_hbm, hi_hbm, out_ref)

    return kernel


_VMEM_BUDGET = 11 * 2**20  # operand-buffer budget; ~5 MB headroom for
#                            compute temporaries under the 16 MB limit


def _vmem_budget(n_fft: int, out_mode: str = "sum") -> int:
    """Wideband kernels — and the llr mode at ANY size (its output
    window is 4·bps× the input's, and a larger s_blk is what amortizes
    the per-block h window) — raise the compiler's scoped-vmem cap to
    64 MB (v5e VMEM is 128 MB; 16 MB is only the default), so their
    operand budget scales accordingly."""
    if n_fft > 512 or out_mode == "llr":
        return 40 << 20
    return _VMEM_BUDGET


def _h_dtype(n_fft: int):
    """Channel-plane VMEM dtype: f32 up to 512; bfloat16 at wideband
    sizes, where two f32 (n_fft, lb) planes double-buffered would blow
    the block budget on their own (4096·128·4·2·2 = 8.4 MB). The
    truncation perturbs the equalizer coefficients by ~4e-3 relative —
    the same class as the single-pass MXU operand truncation the bench
    mode already gates (measured at 4096sc, docs/PERF.md round 4)."""
    return jnp.float32 if n_fft <= 512 else jnp.bfloat16


def _block_bytes(
    n_fft: int, cp_len: int, lb: int, s_blk: int, out_mode: str,
    mod: Modulation, x_item: int, out_item: int = 4,
) -> int:
    """Double-buffered VMEM bytes of the pipeline's operand windows."""
    sym_len = n_fft + cp_len
    h_item = 4 if n_fft <= 512 else 2
    b = 2 * (2 * s_blk * sym_len * lb * x_item)  # re+im, 2 buffers
    b += 2 * (2 * n_fft * lb * h_item)  # hr+hi
    if out_mode == "count":
        idx_item = 1 if mod.bits_per_symbol <= 7 else 2
        b += 2 * (s_blk * n_fft * lb * idx_item + 8 * lb * 4)
    elif out_mode == "llr":
        b += 2 * (s_blk * mod.bits_per_symbol * n_fft * lb * out_item)
    return b


def _pick_blocks(
    n_fft: int, cp_len: int, batch: int, n_syms: int, out_mode: str,
    mod: Modulation, x_item: int, out_item: int = 4,
):
    """Resolve (lb, s_blk) to divisors of (batch, n_syms) near the
    measured optimum (256 lanes × 16 symbols at the bf16 headline
    shape, docs/PERF.md round 4), shrunk to the VMEM operand budget
    (the llr/count modes carry extra output/index windows — llr mode's
    output window dominates, so it lands on smaller s_blk; round 4's
    hard s_blk=1 restriction is gone, which is what amortizes the h
    window across symbols and took the llr terminal from 4.7 GS/s to
    the output-roofline class, docs/PERF.md round 5)."""
    lb = _cl_lb()
    while batch % lb:
        lb //= 2
    if lb < 128:
        raise ValueError(f"batch {batch} does not tile 128 lanes")
    s_blk = _cl_sblk()
    if n_fft >= 1024 and out_mode != "llr" and "SDR_TPU_CL_SBLK" not in os.environ:
        # Wideband sum/count optimum is ONE symbol per block (measured
        # 29.7 vs 28.8 GS/s at s_blk=2 same-window, and the round-5
        # 30.8 GS/s config-5 capture — the deep leafwise DFS already
        # fills the pipeline, and s_blk=1 halves the live x window).
        s_blk = 1
    while n_syms % s_blk:
        s_blk //= 2
    s_blk = max(s_blk, 1)
    while (
        _block_bytes(n_fft, cp_len, lb, s_blk, out_mode, mod, x_item,
                     out_item)
        > _vmem_budget(n_fft, out_mode)
    ):
        if s_blk > 1 and n_syms % (s_blk // 2) == 0:
            s_blk //= 2
        elif lb > 128 and batch % (lb // 2) == 0:
            lb //= 2
        else:
            break
    return lb, s_blk


def _operands(n_fft: int, mode: str):
    w_ops = _matmul.prepare_w(*_dft_mats(_BASE), mode)
    tw = []
    for twr, twi in _twiddle_levels(n_fft):
        tw.append(jnp.asarray(twr))
        tw.append(jnp.asarray(twi))
    return [jnp.asarray(w) for w in w_ops], tw


def _run_cl(
    re_t, im_t, hr_t, hi_t, cp_len, mod, noise_var, out_mode,
    idx_t=None, h_in_dif_order=False, out_dtype=jnp.float32,
):
    n_fft = hr_t.shape[0]
    sym_len = n_fft + cp_len
    rows, batch = re_t.shape
    if rows % sym_len:
        raise ValueError(f"rows {rows} not a multiple of sym_len {sym_len}")
    n_syms = rows // sym_len
    if not supported_cl(n_fft, batch, n_syms, mod):
        raise ValueError(
            f"unsupported channels-last shape n_fft={n_fft} batch={batch}"
        )
    mode = _matmul.mxu_mode()
    out_dtype = jnp.dtype(out_dtype)
    lb, s_blk = _pick_blocks(
        n_fft, cp_len, batch, n_syms, out_mode, mod, re_t.dtype.itemsize,
        out_item=out_dtype.itemsize if out_mode == "llr" else 4,
    )

    perm = dif_perm(n_fft)
    if not h_in_dif_order:
        hr_t = hr_t[perm]
        hi_t = hi_t[perm]
    hdt = _h_dtype(n_fft)
    hr_t = hr_t.astype(hdt)
    hi_t = hi_t.astype(hdt)
    if out_mode == "count":
        idx_t = (
            idx_t.reshape(n_syms, n_fft, batch)[:, perm, :]
            .reshape(n_syms * n_fft, batch)
            # Narrow index plane: the idx read is 4 B/sample in int32 —
            # as much HBM as BOTH bf16 sample planes. int8 covers
            # bps ≤ 8 (through 256-QAM), int16 the rest; the kernel
            # widens in-register.
            .astype(jnp.int8 if mod.bits_per_symbol <= 7 else jnp.int16)
        )

    w_ops, tw_ops = _operands(n_fft, mode)
    kernel = _make_cl_kernel(
        n_fft, cp_len, lb, s_blk, n_syms, batch, mod,
        float(noise_var), out_mode, mode, out_dtype=out_dtype,
    )

    n_in = 5 if out_mode == "count" else 4
    if out_mode == "llr":
        out_shape = jax.ShapeDtypeStruct(
            (n_syms * mod.bits_per_symbol * n_fft, batch), out_dtype
        )
    elif out_mode == "count":
        out_shape = jax.ShapeDtypeStruct(
            ((n_syms // s_blk) * 8, batch), jnp.float32
        )
    else:
        out_shape = jax.ShapeDtypeStruct(
            ((batch // lb) * 8, (n_syms // s_blk) * 128), jnp.float32
        )

    args = [re_t, im_t, hr_t, hi_t]
    if out_mode == "count":
        args.append(idx_t)
    flops = 6 * n_syms * batch * n_fft * _BASE  # post-DIF leaf matmuls
    bytes_in = (2 * rows * batch) * re_t.dtype.itemsize + 8 * n_fft * batch
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(w_ops) + len(tw_ops)),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_in, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Wideband windows (x + double-buffered bf16 h + cascade
            # temps) — and llr-mode output windows at any size —
            # legitimately exceed the compiler's 16 MB DEFAULT
            # scoped-vmem cap; v5e VMEM is 128 MB.
            vmem_limit_bytes=(
                (64 << 20)
                if (n_fft >= 1024 or out_mode == "llr")
                else None
            ),
        ),
    )(*args, *w_ops, *tw_ops)
    return out


def demod_sum_cl(
    re_t, im_t, hr_t, hi_t, cp_len: int, mod: Modulation, noise_var: float,
    h_in_dif_order: bool = False,
) -> jnp.ndarray:
    """Scalar LLR sum over the whole channels-last grid (bench terminal)."""
    out = _run_cl(
        re_t, im_t, hr_t, hi_t, cp_len, mod, noise_var, "sum",
        h_in_dif_order=h_in_dif_order,
    )
    # Each (8, 128) block is a broadcast scalar partial: one element
    # per block, exact (no divide).
    return jnp.sum(out[::8, ::128], dtype=jnp.float32)


def demod_count_cl(
    re_t, im_t, hr_t, hi_t, idx_t, cp_len: int, mod: Modulation,
    noise_var: float, h_in_dif_order: bool = False,
) -> jnp.ndarray:
    """Per-channel (batch,) int32 hard-decision bit-error counts."""
    out = _run_cl(
        re_t, im_t, hr_t, hi_t, cp_len, mod, noise_var, "count",
        idx_t=idx_t, h_in_dif_order=h_in_dif_order,
    )
    return jnp.sum(out, axis=0, dtype=jnp.float32).astype(jnp.int32)


def demod_llr_cl(
    re_t, im_t, hr_t, hi_t, cp_len: int, mod: Modulation, noise_var: float,
    out_dtype=jnp.float32, kernel_order: bool = False,
    h_in_dif_order: bool = False,
) -> jnp.ndarray:
    """LLR-materializing terminal (the coded receiver's product plane).

    ``kernel_order=True`` (the THROUGHPUT form): returns the raw
    (n_syms·bps·n_fft, batch) plane exactly as the kernel writes it —
    per symbol, bit-major planes whose rows are in ``dif_perm`` bin
    order. A coded consumer composes its (de)interleaver with
    ``dif_perm`` at trace time (permutation composition is free), so
    no restore pass is ever paid; link.coded's fused fast path and the
    llr bench terminal consume this form.

    ``kernel_order=False`` (the VALIDATION/compat form): un-permutes
    bins and transposes to the public (batch, n_syms, n_fft·bps)
    layout (matches ops.demod.demod_chain for transposed inputs) —
    costs an extra HBM round trip of the plane.

    ``out_dtype=jnp.bfloat16`` halves the output write traffic (the
    llr-terminal bottleneck); LLR magnitudes carry ~3 significant
    digits there — the BER/decoder impact is gated in
    tests/test_demod_cl.py and docs/PERF.md round 5.
    """
    n_fft = hr_t.shape[0]
    rows, batch = re_t.shape
    n_syms = rows // (n_fft + cp_len)
    bps = mod.bits_per_symbol
    out = _run_cl(
        re_t, im_t, hr_t, hi_t, cp_len, mod, noise_var, "llr",
        h_in_dif_order=h_in_dif_order, out_dtype=out_dtype,
    )
    if kernel_order:
        return out
    out = out.reshape(n_syms, bps, n_fft, batch)[:, :, inv_dif_perm(n_fft), :]
    # (syms, bps, n_fft, batch) → (batch, syms, n_fft, bps) public order.
    return out.transpose(3, 0, 2, 1).reshape(batch, n_syms, n_fft * bps)


def demod_cl_jnp(
    re_t, im_t, hr_t, hi_t, cp_len: int, mod: Modulation, noise_var: float,
    out_mode: str = "llr", idx_t=None, out_dtype=jnp.float32,
    kernel_order: bool = False,
):
    """Pure-jnp twin of the kernel's exact math (DIF cascade + LHS Gauss
    matmuls + division-free tail) for any backend. Used by the CPU test
    suite to pin the CL math against ops.demod.demod_chain_jnp, and by
    the TPU parity check to isolate kernel-scheduling effects from
    arithmetic ones. Output conventions match the public wrappers
    (natural bin order / public LLR layout)."""
    n_fft = hr_t.shape[0]
    sym_len = n_fft + cp_len
    rows, batch = re_t.shape
    n_syms = rows // sym_len
    mode = _matmul.mxu_mode()
    inv_nv = np.float32(1.0 / max(float(noise_var), 1e-12))
    w_ops, _ = _operands(n_fft, mode)
    tw_consts = [
        (jnp.asarray(a), jnp.asarray(b)) for a, b in _twiddle_levels(n_fft)
    ]
    perm = dif_perm(n_fft)
    hr_d = hr_t[perm]
    hi_d = hi_t[perm]
    bps = mod.bits_per_symbol
    outs = []
    acc = None
    for s in range(n_syms):
        o = s * sym_len + cp_len
        yr, yi = dft_cl(
            re_t[o : o + n_fft], im_t[o : o + n_fft], w_ops, tw_consts, mode
        )
        idx_s = None
        if out_mode == "count":
            idx_s = idx_t.reshape(n_syms, n_fft, batch)[s][perm].astype(
                jnp.int32
            )
        r = _symbol_tail(yr, yi, hr_d, hi_d, inv_nv, mod, out_mode, idx_s)
        if out_mode == "llr":
            outs.append(r)
        else:
            acc = r if acc is None else acc + r
    if out_mode == "sum":
        return acc
    if out_mode == "count":
        return jnp.sum(acc, axis=0, dtype=jnp.float32).astype(jnp.int32)
    out = jnp.stack(outs).astype(out_dtype)
    if kernel_order:
        return out.reshape(n_syms * bps * n_fft, batch)
    out = out.reshape(n_syms, bps, n_fft, batch)[:, :, inv_dif_perm(n_fft), :]
    return out.transpose(3, 0, 2, 1).reshape(batch, n_syms, n_fft * bps)
