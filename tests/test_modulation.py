"""Modulation contract tests.

The 16-QAM table, normalization, nibble packing and nearest-point
demap must match /root/reference/lib/inc/modulation.hpp exactly; the
rest of the roster (BPSK..1024QAM — named but unimplemented in the
reference, modulation.hpp:13-14, 70-72) is validated for internal
consistency: Gray adjacency, unit power, bit round trips, and
hard-demap equivalence with a brute-force nearest scan.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sdr_tpu.core.config import Modulation
from sdr_tpu.ops.modulation import (
    bits_to_bytes,
    bytes_to_bits,
    constellation,
    demodulate_hard,
    from_constl,
    modulate,
    nearest_symbol,
    to_constl,
)

ALL_MODS = list(Modulation)

# The reference 16-QAM table verbatim (modulation.hpp:29-47), indexed
# by the 4-bit symbol, BEFORE the 1/sqrt(10) normalization.
REF_16QAM = np.array(
    [
        -3 - 3j, -3 - 1j, -3 + 3j, -3 + 1j,
        -1 - 3j, -1 - 1j, -1 + 3j, -1 + 1j,
        +3 - 3j, +3 - 1j, +3 + 3j, +3 + 1j,
        +1 - 3j, +1 - 1j, +1 + 3j, +1 + 1j,
    ],
    dtype=np.complex128,
)


def test_16qam_table_matches_reference():
    got = np.asarray(constellation(Modulation.QAM16))
    want = REF_16QAM / np.sqrt(10.0)
    np.testing.assert_allclose(got, want.astype(np.complex64), rtol=0, atol=1e-7)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_unit_average_power(mod):
    c = np.asarray(constellation(mod))
    assert abs(np.mean(np.abs(c) ** 2) - 1.0) < 1e-6


@pytest.mark.parametrize("mod", [m for m in ALL_MODS if m is not Modulation.BPSK])
def test_gray_adjacency(mod):
    """Nearest neighbors on each axis differ by exactly one bit."""
    c = np.asarray(constellation(mod)) / mod.unit_energy_scale
    M = len(c)
    pts = np.round(c).astype(np.complex128)
    lookup = {(p.real, p.imag): i for i, p in enumerate(pts)}
    for i, p in enumerate(pts):
        for dr, di in ((2, 0), (-2, 0), (0, 2), (0, -2)):
            nb = (p.real + dr, p.imag + di)
            if nb in lookup:
                j = lookup[nb]
                assert bin(i ^ j).count("1") == 1, (
                    f"{mod}: neighbors {i:0b} and {j:0b} differ in >1 bit"
                )


def test_hello_byte_roundtrip_16qam():
    """from_constl(to_constl('Hello')) == 'Hello' — ofdm_test.cpp:28-36."""
    data = jnp.asarray(np.frombuffer(b"Hello", np.uint8))
    pts = to_constl(data, Modulation.QAM16)
    assert pts.shape == (10,)  # two points per byte, MSB nibble first
    back = np.asarray(from_constl(pts, Modulation.QAM16))
    assert bytes(back.tolist()) == b"Hello"


def test_to_constl_msb_nibble_first():
    """Byte 0xAB → points table[0xA], table[0xB] (modulation.hpp:85-91)."""
    pts = np.asarray(to_constl(jnp.asarray([0xAB], jnp.uint8), Modulation.QAM16))
    want = REF_16QAM[[0xA, 0xB]] / np.sqrt(10.0)
    np.testing.assert_allclose(pts, want.astype(np.complex64), atol=1e-7)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_bit_roundtrip(rng, mod):
    bits = rng.integers(0, 2, size=(3, 4 * mod.bits_per_symbol)).astype(np.int8)
    pts = modulate(jnp.asarray(bits), mod)
    assert pts.shape == (3, 4)
    back = np.asarray(demodulate_hard(pts, mod))
    np.testing.assert_array_equal(back, bits)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_nearest_matches_bruteforce(rng, mod):
    """Per-axis slicing == brute-force min over the table, noisy input.

    The reference demaps by scanning all M points for the min squared
    distance (modulation.hpp:50-67); per-axis slicing must agree
    everywhere (ties cannot occur for generic noise).
    """
    c = np.asarray(constellation(mod)).astype(np.complex64)
    n = 4096
    sym = rng.integers(0, len(c), size=n)
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.1
    y = (c[sym] + noise).astype(np.complex64)
    got = np.asarray(nearest_symbol(jnp.asarray(y), mod))
    d2 = np.abs(y[:, None] - c[None, :]) ** 2
    want = np.argmin(d2, axis=1)
    np.testing.assert_array_equal(got, want)


def test_bytes_bits_roundtrip(rng):
    data = rng.integers(0, 256, size=(2, 17)).astype(np.uint8)
    bits = bytes_to_bits(jnp.asarray(data))
    assert bits.shape == (2, 17 * 8)
    back = np.asarray(bits_to_bytes(bits))
    np.testing.assert_array_equal(back, data)
    # MSB-first: 0x80 → bit pattern 1000 0000
    one = np.asarray(bytes_to_bits(jnp.asarray([0x80], jnp.uint8)))
    np.testing.assert_array_equal(one, [1, 0, 0, 0, 0, 0, 0, 0])


@pytest.mark.parametrize("mod", ALL_MODS)
def test_modulate_rejects_ragged_bits(mod):
    if mod.bits_per_symbol == 1:
        pytest.skip("any length divides 1")
    with pytest.raises(ValueError, match="multiple"):
        modulate(jnp.zeros(mod.bits_per_symbol + 1, jnp.int8), mod)
