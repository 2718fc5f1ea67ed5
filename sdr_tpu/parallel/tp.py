"""Tensor parallelism: one OFDM transform split across mesh devices.

Rounds 1's de-scope note (docs/PARITY.md) stands for capacity — a
4096-point transform fits trivially in one chip's VMEM — but the
checklist row deserves a real implementation: this module demodulates
with the SUBCARRIER axis of a single FFT sharded over a mesh axis,
the distributed-FFT "transpose algorithm" expressed TPU-natively.

Factor N = N1·N2 (Cooley–Tukey, same decomposition as the wideband
Pallas kernels, kernels/fourstep_pallas.py):

    x[n1·N2 + n2]                                   (n1 chunk, n2 lane)
    G[k1, n2] = FFT_{N1} over n1                    — stage 1
    T[k1, n2] = G[k1, n2] · W_N^{n2·k1}             — twiddle
    X[k1 + N1·k2] = DFT_{N2} over n2                — stage 2

Sharding: stage 1 runs with the LANE axis (n2) sharded — each device
transforms its n2/D lanes locally. One ``lax.all_to_all`` re-shards
from lane-split to CHUNK-split (the distributed transpose — the only
communication in the whole transform), after which stage 2 and the
fused equalize + max-log LLR run locally on each device's n1/D digit
block. Output LLRs therefore leave subcarrier-sharded (digit-major),
and one XLA transpose at the edge restores public order — exactly the
permutation-at-the-edges design of the single-chip four-step kernel.

Comm inventory per frame: ONE all_to_all of the (B, S, N) working set
over the TP axis; no other collective. Compare DP/SP in
parallel/shard.py (ppermute halo + psum) — together the three modules
cover the full parallelism checklist of SURVEY.md §2.

Replaces (in distributed form) /root/reference/lib/inc/fft.hpp:87-155,
whose "intra-FFT parallelism" was a never-compiled OpenMP pragma
(fft.hpp:119).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sdr_tpu.core.config import Modulation
from sdr_tpu.ops.equalize import equalize_mmse
from sdr_tpu.ops.llr import llr_maxlog


def tp_split(n_fft: int, n_dev: int) -> tuple[int, int]:
    """Pick N = N1·N2 with D | N1 (chunk shards) and D | N2 (lane shards).

    N1 = D is always optimal when admissible: it minimizes the stage-1
    transform length (the replicated-work stage) and maximizes N2 (the
    perfectly-parallel stage-2 width). Requires D² | N.
    """
    if n_fft % (n_dev * n_dev) != 0:
        raise ValueError(
            f"subcarrier-split demod needs n_dev^2 | n_fft "
            f"(got n_fft={n_fft}, n_dev={n_dev})"
        )
    return n_dev, n_fft // n_dev


@functools.lru_cache(maxsize=None)
def _twiddle_np(n1: int, n2: int):
    """tw[k1, n2] = W_N^{n2·k1} as planar float32 (N = N1·N2)."""
    kk = np.outer(np.arange(n1), np.arange(n2)).astype(np.float64)
    w = np.exp(-2j * np.pi * kk / (n1 * n2))
    return np.real(w).astype(np.float32), np.imag(w).astype(np.float32)


def digit_permute_h(h: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """Natural-order (..., N) channel plane → digit-major (..., n1, n2).

    Digit subcarrier κ = (k1, k2) carries true subcarrier k = k1 + N1·k2
    (same convention as kernels.fourstep_pallas.permute_h).
    """
    lead = h.shape[:-1]
    return h.reshape(lead + (n2, n1)).swapaxes(-1, -2)


def digit_restore_llrs(llr4: jnp.ndarray, mod: Modulation) -> jnp.ndarray:
    """Digit-major LLRs (B, S, n1, n2·bps) → public (B, S, N·bps)."""
    b, s, n1, _ = llr4.shape
    bps = mod.bits_per_symbol
    n2 = llr4.shape[-1] // bps
    out = llr4.reshape(b, s, n1, n2, bps)
    out = out.transpose(0, 1, 3, 2, 4)  # subcarrier-major: k = k1 + N1·k2
    return out.reshape(b, s, n1 * n2 * bps)


def make_tp_demod_fn(
    n_fft: int,
    cp_len: int,
    mod: Modulation,
    noise_var: float,
    mesh: Mesh,
    axis: str = "time",
):
    """Build a jitted subcarrier-sharded demod chain over ``mesh[axis]``.

    Returns ``fn(re, im, hr, hi) -> llr`` with the same contract as
    ops.demod.demod_chain (planar (B, S, sym_len) input, natural-order
    (B, h_syms, n_fft) channel plane, public-order LLR output) — but
    with the transform, equalizer, and demapper all computed with the
    subcarrier axis sharded across the devices of ``axis``. Numerics
    match the same four-step decomposition computed unsharded to f32
    rounding (~1e-6 relative — the collective only moves data, but the
    local FFT batches take different SIMD paths); hard decisions are
    identical, and vs the plain-FFT jnp chain the usual f32
    re-association tolerance applies (tests/test_tp.py).
    """
    n_dev = mesh.shape[axis]
    n1, n2 = tp_split(n_fft, n_dev)
    twr, twi = _twiddle_np(n1, n2)

    def local_fn(re4, im4, hr4, hi4, twr_l, twi_l):
        # re4: (B, S, n1, n2/D) — lane-sharded chunk view, CP stripped.
        x = lax.complex(re4, im4)
        g = jnp.fft.fft(x, axis=2)  # stage 1: N1-point FFT, local
        t = g * lax.complex(twr_l, twi_l)  # twiddle (lane-sharded too)
        # The distributed transpose: lane-split -> chunk-split. Device d
        # ends up with digit block k1 ∈ [d·n1/D, (d+1)·n1/D) and FULL
        # lanes (peer-order concat restores natural n2 order).
        t = lax.all_to_all(t, axis, split_axis=2, concat_axis=3, tiled=True)
        y = jnp.fft.fft(t, axis=3)  # stage 2: N2-point DFT, local
        h = lax.complex(hr4, hi4)  # (B, h_syms, n1/D, n2) digit-sharded
        s, eff = equalize_mmse(y, h, noise_var)
        return llr_maxlog(s, mod, eff)  # (B, S, n1/D, n2·bps)

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, None, None, axis),
            P(None, None, None, axis),
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, axis),
            P(None, axis),
        ),
        out_specs=P(None, None, axis, None),
    )

    def fn(re, im, hr, hi):
        b, s, sym_len = re.shape
        if sym_len - cp_len != n_fft:
            raise ValueError(f"expected sym_len={n_fft + cp_len}, got {sym_len}")
        h_syms = hr.shape[1]
        if hr.shape != (b, h_syms, n_fft) or h_syms not in (1, s):
            raise ValueError(f"unsupported channel shape {hr.shape}")
        re4 = re[..., cp_len:].reshape(b, s, n1, n2)
        im4 = im[..., cp_len:].reshape(b, s, n1, n2)
        hr4 = digit_permute_h(hr, n1, n2)
        hi4 = digit_permute_h(hi, n1, n2)
        llr4 = sharded(
            re4, im4, hr4, hi4, jnp.asarray(twr), jnp.asarray(twi)
        )
        return digit_restore_llrs(llr4, mod)

    return jax.jit(fn)
