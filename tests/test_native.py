"""Native C++ host runtime: build, data path, and oracle parity.

The native library (native/sdr_host.cpp) is an independent C++
implementation of the reference PHY contract; these tests (a) exercise
the host data path (ring, bit packing, CRC), and (b) use it as the
golden oracle the JAX ops must match — the same role the reference C++
library plays in the north star's BER-parity bound.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdr_tpu.core.config import Modulation
from sdr_tpu import native
from sdr_tpu.utils import SlidingBuffer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

MODS = [
    (Modulation.BPSK, 1),
    (Modulation.QPSK, 2),
    (Modulation.QAM16, 4),
    (Modulation.QAM64, 6),
    (Modulation.QAM256, 8),
    (Modulation.QAM1024, 10),
]


def test_native_ring_matches_python_sliding_buffer(rng):
    r = native.NativeRing(7)
    host = SlidingBuffer(7)
    for _ in range(25):
        n = int(rng.integers(1, 8))
        vals = rng.standard_normal(n).astype(np.float32)
        r.push(vals)
        host.push_back([float(v) for v in vals])
        np.testing.assert_array_equal(r.window(), np.array(host.tolist(), np.float32))


def test_native_ring_overflow_rejected():
    r = native.NativeRing(3)
    with pytest.raises(ValueError, match="overflows"):
        r.push(np.zeros(7, np.float32))


def test_bit_packing_round_trip(rng):
    data = rng.integers(0, 256, 64).astype(np.uint8)
    bits = native.unpack_bits(data)
    assert bits.shape == (512,)
    np.testing.assert_array_equal(native.pack_bits(bits), data)
    # MSB-first: parity with the JAX packing.
    from sdr_tpu.ops.modulation import bytes_to_bits

    np.testing.assert_array_equal(bits, np.asarray(bytes_to_bits(jnp.asarray(data))))


def test_crc32_known_vector():
    # IEEE 802.3 CRC-32 of "123456789" is 0xCBF43926.
    assert native.crc32(np.frombuffer(b"123456789", np.uint8)) == 0xCBF43926


def test_native_fft_matches_numpy(rng):
    for n in (8, 64, 256):
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        np.testing.assert_allclose(native.native_fft(x), np.fft.fft(x), atol=1e-9)
        np.testing.assert_allclose(native.native_ifft(x), np.fft.ifft(x), atol=1e-9)


def test_native_fft_rejects_non_power_of_two():
    with pytest.raises(ValueError, match="power of 2"):
        native.native_fft(np.zeros(12, np.complex128))


@pytest.mark.parametrize("mod,bps", MODS)
def test_jax_modulation_matches_native_oracle(rng, mod, bps):
    """ops.modulation must equal the independent C++ mapper bit-exactly."""
    from sdr_tpu.ops.modulation import demodulate_hard, modulate

    bits = rng.integers(0, 2, 32 * bps).astype(np.uint8)
    ours = np.asarray(modulate(jnp.asarray(bits, jnp.int8), mod))
    oracle = native.qam_map(bits, bps)
    np.testing.assert_allclose(ours, oracle.astype(np.complex64), rtol=1e-6, atol=1e-6)

    noisy = oracle + 0.01 * (rng.standard_normal(32) + 1j * rng.standard_normal(32))
    ours_bits = np.asarray(demodulate_hard(jnp.asarray(noisy, jnp.complex64), mod))
    oracle_bits = native.qam_demap_hard(noisy, bps)
    np.testing.assert_array_equal(ours_bits, oracle_bits)


def test_jax_ofdm_matches_native_oracle(rng):
    """ofdm_tx/rx vs the C++ oracle: same CP layout, same FFT scaling."""
    from sdr_tpu.ops.ofdm import ofdm_rx, ofdm_tx

    n_fft, cp = 64, 16
    pts = (rng.standard_normal(n_fft) + 1j * rng.standard_normal(n_fft)) / np.sqrt(2)
    ours_tx = np.asarray(ofdm_tx(jnp.asarray(pts, jnp.complex64), cp))
    oracle_tx = native.native_ofdm_tx(pts, cp)
    np.testing.assert_allclose(ours_tx, oracle_tx, atol=1e-6)

    ours_rx = np.asarray(ofdm_rx(jnp.asarray(oracle_tx, jnp.complex64), cp))
    oracle_rx = native.native_ofdm_rx(oracle_tx, cp)
    np.testing.assert_allclose(ours_rx, oracle_rx, atol=1e-5)
    np.testing.assert_allclose(oracle_rx, pts, atol=1e-9)  # oracle loopback


def test_native_16qam_table_matches_reference_contract():
    """The C++ oracle's 16-QAM table IS the reference's table
    (modulation.hpp:29-47 scaled by 1/sqrt(10)): spot-check the corner
    and Gray-adjacency properties the reference documents."""
    bits = np.array(
        [0, 0, 0, 0,   1, 0, 1, 0,   1, 1, 1, 1,   0, 1, 1, 0], np.uint8
    )
    pts = native.qam_map(bits, 4) * np.sqrt(10.0)
    np.testing.assert_allclose(
        pts, [(-3 - 3j), (3 + 3j), (1 + 1j), (-1 + 3j)], atol=1e-12
    )
