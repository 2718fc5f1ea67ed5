"""Fused wideband Pallas modulator: Gray map → four-step IDFT → CP.

TX twin of kernels/fourstep_pallas.py for n_fft >= 1024 (the wideband
numerology the single-matmul TX kernel cannot hold in VMEM — its IDFT
matrix grows as N²). The reference chain it supersedes at these sizes
is to_constl + ofdm::tx (modulation.hpp:79-94, ofdm.hpp:13-35).

Factorization (N = N1·N2, time sample n = n1·N2 + n2, subcarrier
k = k1 + N1·k2):

    Y[k1, n2] = Σ_{k2} X[k1 + N1·k2] · W_{N2}^{-n2·k2} / N   (MXU matmul)
    T[k1, n2] = Y[k1, n2] · W_N^{-n2·k1}                     (twiddle)
    x[n1·N2 + n2] = Σ_{k1} T[k1, n2] · W_{N1}^{-n1·k1}       (chunk IFFT)

(with the e^{+2πi} inverse convention and the reference's 1/N scaling,
fft.hpp:197-204, folded into the stage-1 matrix). The per-subcarrier
digit permutation is applied to the int32 INDEX grid outside the
kernel (a free XLA gather); inside, stage 1 contracts the lane axis,
stage 3 is the trace-time-unrolled radix-2 list FFT over chunk slices
— the same Mosaic-friendly shapes as the demod twin. The cyclic
prefix is chunk-granular (N2 | cp_len): the CP chunks are the last
cp/N2 time chunks written first (ofdm.hpp:21 layout exactly).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels import _matmul
from sdr_tpu.kernels.fourstep_pallas import _VMEM_BUDGET, _fft_chunks, _pick_n2
from sdr_tpu.kernels.tx_pallas import _gray_to_binary_vec


def _block_bytes(tb: int, n_syms: int, cps: int, n1: int, n2: int) -> int:
    rows = tb * n_syms
    idx = tb * n_syms * n1 * n2 * 4
    stages = 4 * n1 * rows * n2 * 4
    w_ops = 6 * n2 * n2 * 2 + n1 * n2 * 8
    out = tb * n_syms * cps * n2 * 4 * 2
    return idx + stages + w_ops + out


def _pick_tile(batch: int, n_syms: int, cps: int, n1: int, n2: int) -> int:
    best = 0
    for tb in range(1, batch + 1):
        if batch % tb == 0 and _block_bytes(tb, n_syms, cps, n1, n2) <= _VMEM_BUDGET:
            best = tb
    return best


def supported(shape, cp_len: int, mod: Modulation) -> bool:
    """(batch, n_syms, n_fft) int32 indices, n_fft >= 1024 with a
    valid N1·N2 split (N2 | n_fft and N2 | cp_len)."""
    if len(shape) != 3:
        return False
    batch, n_syms, n_fft = shape
    if (batch * n_syms) % 8 != 0:
        return False
    if n_fft < 1024 or n_fft & (n_fft - 1):
        return False
    n2 = _pick_n2(n_fft, cp_len)
    if n2 is None:
        return False
    n1 = n_fft // n2
    cps = (n_fft + cp_len) // n2
    return _pick_tile(batch, n_syms, cps, n1, n2) > 0


@functools.lru_cache(maxsize=None)
def _stage1_mats(n2: int, n: int, scale: float = 1.0):
    """(Wr, Wi) (n2, n2): W[k2, n2'] = e^{+2πi n2'·k2/N2} · scale / N —
    the inverse kernel with the 1/N scaling AND the constellation norm
    folded in, so the kernel matmuls raw PAM integers (bf16-exact →
    6-pass Gauss, see tx_pallas._idft_mats)."""
    jk = np.outer(np.arange(n2), np.arange(n2)).astype(np.float64)
    w = np.exp(2j * np.pi * jk / n2) * (float(scale) / n)
    return np.real(w).astype(np.float32), np.imag(w).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _tx_twiddles(n1: int, n2: int):
    """(twr, twi) (N1, N2): tw[k1, n2] = e^{+2πi n2·k1/N}."""
    n = n1 * n2
    kk = np.outer(np.arange(n1), np.arange(n2)).astype(np.float64)
    w = np.exp(2j * np.pi * kk / n)
    return np.real(w).astype(np.float32), np.imag(w).astype(np.float32)


def _make_kernel(tb: int, n_syms: int, cps: int, cp_chunks: int, n1: int,
                 n2: int, mod: Modulation):
    rows = tb * n_syms
    m = mod.bits_per_axis
    L = mod.levels_per_axis
    mode = _matmul.mxu_mode()
    n_w = _matmul.n_w_operands(mode)

    def kernel(idx_ref, twr_ref, twi_ref, *rest):
        w_refs = rest[:n_w]
        re_ref, im_ref = rest[n_w], rest[n_w + 1]

        chunks = []
        for k1 in range(n1):
            idx = idx_ref[:, :, k1, :].reshape(rows, n2)
            # Arithmetic Gray decode (no gathers) — tx_pallas.py.
            if mod is Modulation.BPSK:
                gi, gq = idx, None
            else:
                gi = idx >> m
                gq = idx & jnp.int32(L - 1)
            bi = _gray_to_binary_vec(gi, m)
            # Raw PAM integers (norm folded into W): bf16-exact.
            xr = (2 * bi - (L - 1)).astype(jnp.float32)
            if gq is None:
                xi = jnp.zeros_like(xr)
            else:
                bq = _gray_to_binary_vec(gq, m)
                xi = (2 * bq - (L - 1)).astype(jnp.float32)

            yr, yi = _matmul.complex_dot_xbf16(
                xr.astype(jnp.bfloat16), xi.astype(jnp.bfloat16), w_refs, mode
            )
            twr = twr_ref[k1 : k1 + 1, :]
            twi = twi_ref[k1 : k1 + 1, :]
            chunks.append((yr * twr - yi * twi, yr * twi + yi * twr))

        x = _fft_chunks(chunks, inverse=True)  # time chunks n1 = 0..N1

        # Chunk-granular CP: the LAST cp_chunks time chunks first
        # (ofdm.hpp:21), then the N1 data chunks.
        for j in range(cp_chunks):
            xr_c, xi_c = x[n1 - cp_chunks + j]
            re_ref[:, :, j, :] = xr_c.reshape(tb, n_syms, n2)
            im_ref[:, :, j, :] = xi_c.reshape(tb, n_syms, n2)
        for c in range(n1):
            xr_c, xi_c = x[c]
            re_ref[:, :, cp_chunks + c, :] = xr_c.reshape(tb, n_syms, n2)
            im_ref[:, :, cp_chunks + c, :] = xi_c.reshape(tb, n_syms, n2)

    return kernel


def tx_chain_fourstep(
    idx: jnp.ndarray,
    cp_len: int,
    mod: Modulation,
    interpret: bool | None = None,
):
    """(batch, n_syms, n_fft) int32 symbol indices (natural subcarrier
    order) → planar (re, im) (batch, n_syms, n_fft + cp_len).

    Matches ofdm_tx(modulate(bits)) to f32 matmul tolerance
    (tests/test_fourstep.py).
    """
    if not supported(idx.shape, cp_len, mod):
        raise ValueError(f"unsupported shape {idx.shape} for four-step TX")
    batch, n_syms, n_fft = idx.shape
    n2 = _pick_n2(n_fft, cp_len)
    n1 = n_fft // n2
    sym_len = n_fft + cp_len
    cps = sym_len // n2
    cp_chunks = cp_len // n2
    tb = _pick_tile(batch, n_syms, cps, n1, n2)
    grid = (batch // tb,)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # Digit permutation on the index grid (free XLA transpose of int32):
    # kernel position [k1, k2] must hold natural subcarrier k1 + N1·k2.
    idx4 = idx.reshape(batch, n_syms, n2, n1).swapaxes(-1, -2)

    twr, twi = _tx_twiddles(n1, n2)
    w_ops = _matmul.prepare_w(
        *_stage1_mats(n2, n_fft, mod.unit_energy_scale), _matmul.mxu_mode()
    )
    kernel = _make_kernel(tb, n_syms, cps, cp_chunks, n1, n2, mod)

    in_specs = [
        pl.BlockSpec((tb, n_syms, n1, n2), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in w_ops
    ]
    out_spec = pl.BlockSpec(
        (tb, n_syms, cps, n2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=(6 * n_fft * n2 + 5 * n_fft * max(n1.bit_length() - 1, 1))
        * batch * n_syms,
        bytes_accessed=(batch * n_syms * n_fft) * 4
        + 2 * batch * n_syms * sym_len * 4,
        transcendentals=0,
    )
    re4, im4 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, n_syms, cps, n2), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_syms, cps, n2), jnp.float32),
        ),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(idx4, twr, twi, *w_ops)
    return (
        re4.reshape(batch, n_syms, sym_len),
        im4.reshape(batch, n_syms, sym_len),
    )
