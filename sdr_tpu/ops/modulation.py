"""Gray-coded QAM constellation mapping — the full roster.

The reference implements only 16-QAM (modulation.hpp:15-68) and names
BPSK/QPSK/64QAM/256QAM/1024QAM as empty tags (modulation.hpp:13-14,
70-72). All are implemented here as square (BPSK: one-axis) Gray
constellations built from a per-axis binary-reflected-Gray PAM map.

Contract with the reference (validated in tests/test_modulation.py):

- The 16-QAM table here equals modulation.hpp:29-47 entry-for-entry:
  symbol index b3b2b1b0 maps I from the MSB bit-pair (b3b2) and Q from
  the LSB pair (b1b0); per-axis Gray map 00→-3, 01→-1, 11→+1, 10→+3
  (which IS binary-reflected Gray over levels -3,-1,+1,+3).
- Unit-average-power normalization: 1/sqrt(10) for 16-QAM
  (modulation.hpp:18-20), generalized per scheme.
- Byte packing is MSB-first nibbles (modulation.hpp:87-91, 108),
  generalized to MSB-first bit order everywhere.
- ``nearest_symbol`` reproduces ``e16QAM::nearest``
  (modulation.hpp:50-67): un-normalize then nearest constellation
  point — realized as per-axis slicing, which is exactly the
  brute-force min over a square grid, in O(1) instead of O(M).

Everything is pure-functional over arbitrary leading batch dims, jit-
and vmap-safe, complex64 by default.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from sdr_tpu.core.config import Modulation


# ---------------------------------------------------------------------------
# Static table construction (host-side numpy; tiny, hoisted as constants).
# ---------------------------------------------------------------------------


def _gray_to_binary(g: np.ndarray) -> np.ndarray:
    """Inverse Gray code via prefix-XOR."""
    b = g.copy()
    shift = 1
    while (b >> shift).any():
        b = b ^ (b >> shift)
        shift <<= 1
    # One more fold for the general case where the loop exits early.
    return b


def _pam_amplitudes(bits_per_axis: int) -> np.ndarray:
    """amplitude[gray_index] for a 2^m-level reflected-Gray PAM axis.

    Levels are the odd integers -(L-1), ..., +(L-1); a Gray index g maps
    to level 2*gray_to_binary(g) - (L-1). For m=2 this yields
    [-3, -1, +3, +1] indexed by g = 0,1,2,3 — the reference's per-axis
    order (modulation.hpp:29-47 column pattern).
    """
    L = 1 << bits_per_axis
    g = np.arange(L, dtype=np.int64)
    i = _gray_to_binary(g)
    return (2 * i - (L - 1)).astype(np.float64)


@functools.lru_cache(maxsize=None)
def _tables(mod: Modulation):
    """(constellation complex64 (M,), pam float32 (L,), norm, inorm)."""
    m = mod.bits_per_axis
    L = mod.levels_per_axis
    pam = _pam_amplitudes(m)
    norm = mod.unit_energy_scale
    if mod is Modulation.BPSK:
        const = pam.astype(np.complex128)
    else:
        gi = np.arange(1 << mod.bits_per_symbol, dtype=np.int64)
        i_gray = gi >> m
        q_gray = gi & (L - 1)
        const = pam[i_gray] + 1j * pam[q_gray]
    const = (const * norm).astype(np.complex64)
    return const, pam.astype(np.float32), np.float32(norm), np.float32(1.0 / norm)


def constellation(mod: Modulation) -> jnp.ndarray:
    """Normalized constellation, shape (2**bits_per_symbol,), complex64.

    Indexed by the symbol integer whose MSB half selects the I axis and
    LSB half the Q axis (for 16-QAM: identical to the reference table
    times 1/sqrt(10), modulation.hpp:29-47 with :18-20).
    """
    const, _, _, _ = _tables(mod)
    return jnp.asarray(const)


# ---------------------------------------------------------------------------
# Bit/byte packing (MSB-first, matching modulation.hpp:87-91, 108).
# ---------------------------------------------------------------------------


def bytes_to_bits(data: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., n) → int8 bits (..., 8n), MSB of each byte first."""
    data = data.astype(jnp.uint8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (data[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8).astype(jnp.int8)


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """int bits (..., 8n) → uint8 (..., n), MSB-first."""
    n = bits.shape[-1] // 8
    b = bits.reshape(*bits.shape[:-1], n, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8)).astype(jnp.uint8)
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def _bits_to_ints(bits: jnp.ndarray, width: int) -> jnp.ndarray:
    """(..., n*width) bits → (..., n) ints, MSB-first within each group."""
    n = bits.shape[-1] // width
    b = bits.reshape(*bits.shape[:-1], n, width).astype(jnp.int32)
    weights = 1 << jnp.arange(width - 1, -1, -1, dtype=jnp.int32)
    return jnp.sum(b * weights, axis=-1)


def _ints_to_bits(vals: jnp.ndarray, width: int) -> jnp.ndarray:
    """(..., n) ints → (..., n*width) bits, MSB-first."""
    shifts = jnp.arange(width - 1, -1, -1, dtype=jnp.int32)
    bits = (vals[..., :, None] >> shifts) & 1
    return bits.reshape(*vals.shape[:-1], vals.shape[-1] * width).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Mapping / demapping.
# ---------------------------------------------------------------------------


def modulate(bits: jnp.ndarray, mod: Modulation) -> jnp.ndarray:
    """Bits (..., n_sym * bits_per_symbol) → normalized points (..., n_sym).

    MSB-first within each symbol; table lookup + unit-power scale,
    the batched analog of ``to_constl`` (modulation.hpp:79-94).
    """
    bps = mod.bits_per_symbol
    if bits.shape[-1] % bps != 0:
        raise ValueError(
            f"bit count {bits.shape[-1]} not a multiple of bits/symbol {bps}"
        )
    idx = _bits_to_ints(bits, bps)
    return constellation(mod)[idx]


def _axis_hard_index(x: jnp.ndarray, mod: Modulation) -> jnp.ndarray:
    """Un-normalized axis amplitude → Gray index of the nearest level.

    Nearest odd-integer level via round+clip, binary index → Gray
    (g = i ^ (i>>1)). Equivalent to the reference's brute-force min
    scan (modulation.hpp:55-65) restricted to one axis.
    """
    L = mod.levels_per_axis
    i = jnp.clip(jnp.round((x + (L - 1)) * 0.5).astype(jnp.int32), 0, L - 1)
    return i ^ (i >> 1)


def nearest_symbol(points: jnp.ndarray, mod: Modulation) -> jnp.ndarray:
    """Normalized points (...,) → hard symbol indices (int32).

    Batched equivalent of ``e16QAM::nearest`` (modulation.hpp:50-67):
    multiply by inorm, then nearest constellation point — done per-axis.
    """
    _, _, _, inorm = _tables(mod)
    unp = points * inorm
    if mod is Modulation.BPSK:
        return _axis_hard_index(jnp.real(unp), mod)
    m = mod.bits_per_axis
    gi = _axis_hard_index(jnp.real(unp), mod)
    gq = _axis_hard_index(jnp.imag(unp), mod)
    return (gi << m) | gq


def demodulate_hard(points: jnp.ndarray, mod: Modulation) -> jnp.ndarray:
    """Normalized points (..., n_sym) → bits (..., n_sym*bits_per_symbol)."""
    return _ints_to_bits(nearest_symbol(points, mod), mod.bits_per_symbol)


# ---------------------------------------------------------------------------
# Reference byte-level API parity (to_constl / from_constl).
# ---------------------------------------------------------------------------


def to_constl(data: jnp.ndarray, mod: Modulation = Modulation.QAM16) -> jnp.ndarray:
    """Packed bytes (..., n) → constellation points, MSB bits first.

    For 16-QAM: each byte becomes two points (MSB nibble first), exactly
    ``modulation::to_constl<e16QAM>`` (modulation.hpp:79-94).
    """
    return modulate(bytes_to_bits(data), mod)


def from_constl(points: jnp.ndarray, mod: Modulation = Modulation.QAM16) -> jnp.ndarray:
    """Constellation points → packed bytes (hard decisions).

    16-QAM pairs → bytes, the batched ``from_constl`` (modulation.hpp:
    97-112). Point counts that don't fill a whole byte are truncated,
    mirroring the reference's dropped trailing odd point
    (modulation.hpp:103 loop bound).
    """
    bits = demodulate_hard(points, mod)
    usable = (bits.shape[-1] // 8) * 8
    return bits_to_bytes(bits[..., :usable])


def pam_table(mod: Modulation) -> jnp.ndarray:
    """Per-axis un-normalized PAM amplitudes indexed by Gray code."""
    _, pam, _, _ = _tables(mod)
    return jnp.asarray(pam)
