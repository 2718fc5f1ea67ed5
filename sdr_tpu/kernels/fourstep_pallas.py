"""Fused wideband Pallas demodulator: four-step DFT + MMSE + LLR.

The large-``n_fft`` counterpart of kernels/demod_pallas.py (which is
VMEM-gated at n_fft <= 512: its dense DFT-matrix operands grow as N²).
This kernel factors the N-point transform as N = N1·N2 (Cooley–Tukey /
Bailey four-step) so the only MXU operand is the N2×N2 DFT matrix:

    x[n1·N2 + n2]                      (n1 = chunk, n2 = lane)
    G[k1, n2] = Σ_{n1} x[n1, n2] W_{N1}^{n1·k1}      (stage 1)
    T[k1, n2] = G[k1, n2] · W_N^{n2·k1}              (twiddle)
    X[k1 + N1·k2] = Σ_{n2} T[k1, n2] W_{N2}^{n2·k2}  (stage 2)

TPU-first design notes — this shape exists because of what Mosaic can
and cannot lower (docs/PERF.md "Large n_fft"):

- Mosaic rejects the (rows, N) → (rows, N1, N2) shape cast and the
  last-two-dims transpose that a textbook in-kernel four-step needs.
  Instead the input arrives as a 4-D block (tb, S, chunks, N2) —
  a FREE host-side reshape of the contiguous symbol stream — and
  stage 1 runs over the chunk axis as a trace-time-unrolled radix-2
  FFT on chunk SLICES: N1·log2(N1)/2 butterflies of (rows, N2)
  VPU ops, never materializing a 3-D value in a layout Mosaic must
  re-infer. The chunk axis also absorbs the CP: cp_len/N2 leading
  chunks are simply never read (the CP strip costs nothing).
- Stage 2 contracts the LANE axis — the one place Mosaic loves a
  matmul — against a single resident N2×N2 operand set (Gauss
  3-multiplication complex product at bf16x3, kernels/_matmul.py),
  reused by all N1 chunks.
- The result leaves the kernel in digit-permuted subcarrier order
  κ = k1·N2 + k2 (true subcarrier k = k1 + N1·k2). Equalization and
  max-log LLR are order-agnostic per subcarrier, so the permutation is
  pushed to the edges: ``permute_h`` reorders the (small) channel plane
  on the way in, and the public-order restore rides the same XLA
  transpose that already converts bit-major lanes to subcarrier-major
  (free in reduce mode).

Replaces /root/reference/lib/inc/fft.hpp:87-155 + ofdm.hpp:37-54 +
modulation.hpp:50-67 at transform sizes the reference's scalar
butterfly could never reach (soft output included).
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels import _matmul
from sdr_tpu.kernels.demod_pallas import equalize_llr_bits

# Stage-2 lane width. 256 balances MXU matmul efficiency against
# stage-1 VPU butterfly count (N1 = N/N2); override to re-tune.
_DEFAULT_N2 = 256
_MAX_N1 = 32
# Estimated-bytes budget per grid block. Mosaic's real scoped-VMEM use
# runs ~2.5x this estimate (double-buffered inputs + stack temps;
# measured: est 7.4M -> 17.8M actual at the old 10M budget), so the
# estimate must stay well under the 16M hardware limit. Env-tunable.
_VMEM_BUDGET = int(os.environ.get("SDR_TPU_FOURSTEP_VMEM", str(4 << 20)))


def _pick_n2(n_fft: int, cp_len: int) -> int | None:
    """Stage-2 width: N2 | n_fft, N2 | cp_len, 2 <= n_fft/N2 <= 32."""
    env = os.environ.get("SDR_TPU_FOURSTEP_N2")
    cands = (int(env),) if env else (_DEFAULT_N2, 512, 128)
    for n2 in cands:
        n1 = n_fft // n2 if n2 and n_fft % n2 == 0 else 0
        if (
            2 <= n1 <= _MAX_N1
            and (n1 & (n1 - 1)) == 0
            and cp_len % n2 == 0
        ):
            return n2
    return None


def _block_bytes(tb: int, n_syms: int, cps: int, n1: int, n2: int, bps: int,
                 reduce_sum: bool, h_syms: int = 1) -> int:
    rows = tb * n_syms
    inp = tb * n_syms * cps * n2 * 4 * 2
    h_inp = tb * h_syms * n1 * n2 * 4 * 2
    stages = 4 * n1 * rows * n2 * 4          # live stage-1/2 planes (re+im, ~2 gens)
    w_ops = 6 * n2 * n2 * 2 + n1 * n2 * 8
    out = 0 if reduce_sum else n1 * rows * n2 * bps * 4
    return inp + h_inp + stages + w_ops + out


def _pick_tile(batch: int, n_syms: int, cps: int, n1: int, n2: int, bps: int,
               reduce_sum: bool, h_syms: int = 1) -> int:
    best = 0
    for tb in range(1, batch + 1):
        if batch % tb:
            continue
        if (
            _block_bytes(tb, n_syms, cps, n1, n2, bps, reduce_sum, h_syms)
            <= _VMEM_BUDGET
        ):
            best = tb
    return best


def supported(shape, cp_len: int, mod: Modulation, h_syms: int = 1) -> bool:
    """Gate: 3-D planar input, n_fft >= 1024 with a valid N1·N2 split
    (N2 must divide both n_fft and cp_len so chunks align), and a
    batch tile that fits VMEM. The tile check uses the WORST case
    (non-reduce LLR output block + the caller's h_syms channel plane)
    so a shape this gate admits works in every mode — auto-dispatch
    must never claim a shape the kernel then rejects."""
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
    cps = sym_len // n2
    n1 = n_fft // n2
    return (
        _pick_tile(
            batch, n_syms, cps, n1, n2, mod.bits_per_symbol, False, h_syms
        )
        > 0
    )


def permute_h(h: jnp.ndarray, n_fft: int, n2: int) -> jnp.ndarray:
    """Natural-order channel plane (..., n_fft) → kernel digit order.

    Kernel subcarrier κ = k1·N2 + k2 carries true subcarrier
    k = k1 + N1·k2; natural h viewed (N2, N1) [k2 slow] transposes to
    (N1, N2) and re-flattens. O(n_fft) per link — negligible next to
    the sample planes.
    """
    n1 = n_fft // n2
    lead = h.shape[:-1]
    return (
        h.reshape(lead + (n2, n1)).swapaxes(-1, -2).reshape(lead + (n_fft,))
    )


@functools.lru_cache(maxsize=None)
def _stage2_mats(n2: int):
    """(Wr, Wi) for the N2-point forward DFT (unscaled, fft.hpp:114
    sign convention), built in float64."""
    jk = np.outer(np.arange(n2), np.arange(n2)).astype(np.float64)
    w = np.exp(-2j * np.pi * jk / n2)
    return np.real(w).astype(np.float32), np.imag(w).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddles(n1: int, n2: int):
    """(twr, twi) (N1, N2): tw[k1, n2] = W_N^{n2·k1}, N = N1·N2."""
    n = n1 * n2
    kk = np.outer(np.arange(n1), np.arange(n2)).astype(np.float64)
    w = np.exp(-2j * np.pi * kk / n)
    return np.real(w).astype(np.float32), np.imag(w).astype(np.float32)


def _bit_reverse(p: int) -> list[int]:
    bits = p.bit_length() - 1
    return [int(format(i, f"0{bits}b")[::-1], 2) for i in range(p)]


def _fft_chunks(xs: list, inverse: bool = False):
    """Radix-2 DIT (I)FFT across a Python list of (re, im) planar pairs.

    The list axis is the transform axis: every butterfly is a pair of
    elementwise ops on (rows, N2) tiles, fully unrolled at trace time
    (N1 <= 32 → at most 80 butterflies). Twiddles are host floats;
    multiplies by ±1/±i reduce to adds/swaps. ``inverse`` flips the
    twiddle sign (no 1/P scaling — callers fold it elsewhere).
    """
    sign = 1.0 if inverse else -1.0
    p = len(xs)
    a = [xs[i] for i in _bit_reverse(p)]
    m = 1
    while m < p:
        step = 2 * m
        nxt = list(a)
        for start in range(0, p, step):
            for j in range(m):
                ang = sign * 2.0 * math.pi * j / step
                wr, wi = math.cos(ang), math.sin(ang)
                er, ei = a[start + j]
                br, bi = a[start + j + m]
                if j == 0:  # w = 1
                    tr, ti = br, bi
                elif 4 * j == step:  # w = ∓i
                    tr, ti = (-bi, br) if inverse else (bi, -br)
                else:
                    wr32, wi32 = jnp.float32(wr), jnp.float32(wi)
                    tr = br * wr32 - bi * wi32
                    ti = br * wi32 + bi * wr32
                nxt[start + j] = (er + tr, ei + ti)
                nxt[start + j + m] = (er - tr, ei - ti)
        a = nxt
        m = step
    return a


def _make_kernel(tb: int, n_syms: int, cps: int, cp_chunks: int, n1: int,
                 n2: int, h_syms: int, mod: Modulation, noise_var: float,
                 reduce_sum: bool):
    rows = tb * n_syms
    inv_nv = np.float32(1.0 / max(noise_var, 1e-12))
    mode = _matmul.mxu_mode()
    n_w = _matmul.n_w_operands(mode)

    def kernel(re_ref, im_ref, hr_ref, hi_ref, twr_ref, twi_ref, *rest):
        w_refs = rest[:n_w]
        out_ref = rest[n_w]
        x4r = re_ref[:]  # (tb, S, cps, N2)
        x4i = im_ref[:]

        # CP strip = skipping the first cp_chunks chunk slices; each
        # data chunk flattens (tb, S, N2) → (rows, N2).
        chunks = [
            (
                x4r[:, :, cp_chunks + c, :].reshape(rows, n2),
                x4i[:, :, cp_chunks + c, :].reshape(rows, n2),
            )
            for c in range(n1)
        ]

        # Stage 1: N1-point DFT across the chunk axis (VPU butterflies).
        g = _fft_chunks(chunks)

        total = jnp.float32(0.0)
        for k1 in range(n1):
            gr, gi = g[k1]
            # Twiddle row W_N^{n2·k1}: (1, N2) broadcast over rows.
            twr = twr_ref[k1 : k1 + 1, :]
            twi = twi_ref[k1 : k1 + 1, :]
            tr = gr * twr - gi * twi
            ti = gr * twi + gi * twr

            # Stage 2 on the MXU: one resident N2×N2 operand set
            # shared by every chunk (Gauss 3-matmul, bf16x3 default).
            yr, yi = _matmul.complex_dot(tr, ti, w_refs, mode)

            # Equalize + LLR in the kernel's digit order; h arrives
            # pre-permuted (permute_h), sliced to this chunk's lanes
            # and broadcast over the symbol axis (h_syms ∈ {1, S}).
            hr = jnp.broadcast_to(
                hr_ref[:, :, k1, :], (tb, n_syms, n2)
            ).reshape(rows, n2)
            hi_ = jnp.broadcast_to(
                hi_ref[:, :, k1, :], (tb, n_syms, n2)
            ).reshape(rows, n2)
            llr_bits = equalize_llr_bits(yr, yi, hr, hi_, inv_nv, mod)

            if reduce_sum:
                for b_llr in llr_bits:
                    total = total + jnp.sum(b_llr, dtype=jnp.float32)
            else:
                # Chunk-major rows, bit-major lanes; the caller's one
                # XLA transpose restores public subcarrier-major order.
                out_ref[k1] = jnp.concatenate(llr_bits, axis=-1)

        if reduce_sum:
            out_ref[0] = jnp.broadcast_to(total, (8, 128))

    return kernel


def demod_chain_fourstep(
    re: jnp.ndarray,
    im: jnp.ndarray,
    hr: jnp.ndarray,
    hi: jnp.ndarray,
    cp_len: int,
    mod: Modulation,
    noise_var: float,
    reduce_sum: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused four-step demod over (batch, n_syms, sym_len) planar input.

    hr/hi: (batch, 1, n_fft) or (batch, n_syms, n_fft) in NATURAL
    subcarrier order (the digit permutation is internal). Returns LLRs
    (batch, n_syms, n_fft·bps) in the public order, or their scalar
    sum when ``reduce_sum``. Parity vs ops.demod.demod_chain_jnp in
    tests/test_fourstep.py.
    """
    if not supported(re.shape, cp_len, mod):
        raise ValueError(f"unsupported shape {re.shape} for four-step kernel")
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
    tb = _pick_tile(batch, n_syms, cps, n1, n2, bps, reduce_sum, h_syms)
    if tb == 0:
        raise ValueError(f"no VMEM-feasible batch tile for {re.shape}")
    grid = (batch // tb,)
    rows = tb * n_syms
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # Free reshapes: chunked sample view + digit-permuted channel view.
    re4 = re.reshape(batch, n_syms, cps, n2)
    im4 = im.reshape(batch, n_syms, cps, n2)
    hr4 = permute_h(hr, n_fft, n2).reshape(batch, h_syms, n1, n2)
    hi4 = permute_h(hi, n_fft, n2).reshape(batch, h_syms, n1, n2)

    twr, twi = _twiddles(n1, n2)
    w_ops = _matmul.prepare_w(*_stage2_mats(n2), _matmul.mxu_mode())
    kernel = _make_kernel(
        tb, n_syms, cps, cp_chunks, n1, n2, h_syms, mod, float(noise_var),
        reduce_sum,
    )

    in_specs = [
        pl.BlockSpec((tb, n_syms, cps, n2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n_syms, cps, n2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h_syms, n1, n2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h_syms, n1, n2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in w_ops
    ]
    cost = pl.CostEstimate(
        flops=(6 * n_fft * n2 + 5 * n_fft * max(n1.bit_length() - 1, 1))
        * batch * n_syms,
        bytes_accessed=(2 * batch * n_syms * sym_len + 2 * batch * h_syms * n_fft)
        * 4
        + (0 if reduce_sum else batch * n_syms * n_fft * bps * 4),
        transcendentals=0,
    )
    params = pltpu.CompilerParams(dimension_semantics=("parallel",))

    if reduce_sum:
        partial = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
            cost_estimate=cost,
            compiler_params=params,
            interpret=interpret,
        )(re4, im4, hr4, hi4, twr, twi, *w_ops)
        return jnp.sum(partial[:, 0, 0], dtype=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n1, rows, n2 * bps), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n1, batch * n_syms, n2 * bps), jnp.float32
        ),
        cost_estimate=cost,
        compiler_params=params,
        interpret=interpret,
    )(re4, im4, hr4, hi4, twr, twi, *w_ops)
    # Rows are chunk-major (k1 leading), lanes bit-major (j·N2 + k2);
    # true subcarrier k = k1 + N1·k2. One XLA transpose to the public
    # (batch, n_syms, subcarrier-major bits) order.
    out = out.reshape(n1, batch, n_syms, bps, n2)
    out = out.transpose(1, 2, 4, 0, 3)  # (B, S, N2, N1, bps)
    return out.reshape(batch, n_syms, n_fft * bps)
