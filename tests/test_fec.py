"""Convolutional FEC: encoder vectors, Viterbi decoding, coded link BER."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdr_tpu.core.config import (
    ChannelConfig,
    ChannelModel,
    LinkConfig,
    Modulation,
    OFDMConfig,
)
from sdr_tpu.link.ber import ber_awgn_exact
from sdr_tpu.link.coded import info_bits_per_channel, make_coded_fn
from sdr_tpu.ops.fec import (
    DEFAULT_K,
    DEFAULT_POLYS,
    coded_len,
    conv_encode,
    viterbi_decode,
)
from sdr_tpu.ops.interleave import deinterleave, interleave


def _naive_encode(bits, polys=DEFAULT_POLYS, K=DEFAULT_K):
    """Independent reference encoder (same register convention)."""
    out = []
    s = 0
    for b in list(bits) + [0] * (K - 1):
        r = (int(b) << (K - 1)) | s
        for p in polys:
            out.append(bin(r & p).count("1") & 1)
        s = r >> 1
    return np.array(out, np.int8)


def test_encoder_matches_naive(rng):
    bits = rng.integers(0, 2, 40).astype(np.int8)
    ours = np.asarray(conv_encode(jnp.asarray(bits)))
    assert ours.shape == (coded_len(40),)
    np.testing.assert_array_equal(ours, _naive_encode(bits))


def test_encoder_batched(rng):
    bits = rng.integers(0, 2, (3, 5, 16)).astype(np.int8)
    out = np.asarray(conv_encode(jnp.asarray(bits)))
    assert out.shape == (3, 5, coded_len(16))
    np.testing.assert_array_equal(out[1, 2], _naive_encode(bits[1, 2]))


def test_viterbi_clean_round_trip(rng):
    n_info = 64
    bits = rng.integers(0, 2, (4, n_info)).astype(np.int8)
    cw = conv_encode(jnp.asarray(bits))
    llr = (1.0 - 2.0 * cw).astype(np.float32) * 8.0  # perfect LLRs
    dec = np.asarray(viterbi_decode(jnp.asarray(llr), n_info))
    np.testing.assert_array_equal(dec, bits)


def test_viterbi_corrects_bit_flips(rng):
    """K=7 (171,133) has free distance 10: scattered sign flips on a
    few coded bits must still decode exactly."""
    n_info = 128
    bits = rng.integers(0, 2, n_info).astype(np.int8)
    cw = np.asarray(conv_encode(jnp.asarray(bits)))
    llr = (1.0 - 2.0 * cw).astype(np.float32) * 4.0
    flip = rng.choice(len(llr), size=8, replace=False)  # spread-out errors
    llr[flip] *= -1.0
    dec = np.asarray(viterbi_decode(jnp.asarray(llr), n_info))
    np.testing.assert_array_equal(dec, bits)


def test_interleave_round_trip(rng):
    x = jnp.asarray(rng.standard_normal((2, 97)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(deinterleave(interleave(x))), np.asarray(x)
    )
    # actually permutes
    assert not np.array_equal(np.asarray(interleave(x)), np.asarray(x))


def test_coded_link_beats_uncoded_awgn():
    """Rate-1/2 K=7 over QPSK/AWGN at 4 dB: uncoded BER ≈ 1.25e-2;
    the coded link must be at least 10x better on information bits."""
    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(n_fft=64, cp_len=16),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=4.0),
        n_symbols=64,
        n_channels=16,
    )
    n_info = info_bits_per_channel(cfg)
    assert n_info == 64 * 64 * 2 // 2 - 6
    errors, counted = make_coded_fn(cfg)(jax.random.PRNGKey(3))
    ber = float(np.asarray(errors).sum()) / float(np.asarray(counted).sum())
    uncoded = ber_awgn_exact(Modulation.QPSK, 4.0)
    assert ber < uncoded / 10.0, f"coded {ber:.2e} vs uncoded {uncoded:.2e}"
