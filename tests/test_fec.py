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


def test_puncture_depuncture_layout():
    """Kept positions follow the 802.11a patterns; depuncture re-seats
    survivors and zeros the holes."""
    from sdr_tpu.ops.fec import depuncture, puncture, punctured_len

    T = 6  # steps
    coded = jnp.arange(1, T * 2 + 1, dtype=jnp.float32)  # [A1,B1,A2,B2,...]
    # rate 2/3: per 2 steps keep (A,B),(A,-)
    kept = np.asarray(puncture(coded, "2/3"))
    np.testing.assert_array_equal(kept, [1, 2, 3, 5, 6, 7, 9, 10, 11])
    # rate 3/4: per 3 steps keep (A,B),(A,-),(-,B)
    kept34 = np.asarray(puncture(coded, "3/4"))
    np.testing.assert_array_equal(kept34, [1, 2, 3, 6, 7, 8, 9, 12])
    back = np.asarray(depuncture(jnp.asarray(kept34), "3/4", T))
    expect = np.array(coded, copy=True)
    expect[[3, 4, 9, 10]] = 0.0  # B2, A3, B5, A6 punctured
    np.testing.assert_array_equal(back, expect)


def test_punctured_rates_effective():
    from sdr_tpu.ops.fec import punctured_len

    n = 994  # + 6 tail = 1000 steps
    assert punctured_len(n, "1/2") == 2000
    assert punctured_len(n, "2/3") == 1500
    assert punctured_len(n, "3/4") == 1334  # ceil(2000 * 2/3)


@pytest.mark.parametrize("rate", ["2/3", "3/4"])
def test_punctured_code_decodes_clean_channel(rate):
    """Noiseless round trip at the punctured rates."""
    from sdr_tpu.ops.fec import conv_encode, depuncture, puncture, viterbi_decode

    rng = np.random.default_rng(5)
    n_info = 200
    info = jnp.asarray(rng.integers(0, 2, n_info), jnp.int8)
    sent = puncture(conv_encode(info), rate)
    llr = (1.0 - 2.0 * sent.astype(jnp.float32)) * 8.0
    dec = viterbi_decode(depuncture(llr, rate, n_info + 6), n_info)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(info))


def test_coded_link_rate_ordering():
    """BER(3/4) >= BER(2/3) >= BER(1/2) at the same Eb/N0 (less
    redundancy decodes worse), and all beat uncoded at the same SNR."""
    import jax

    from sdr_tpu.core.config import (
        ChannelConfig,
        ChannelModel,
        LinkConfig,
        Modulation,
        OFDMConfig,
    )
    from sdr_tpu.link.coded import simulate_coded

    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=3.0),
        n_symbols=32,
        n_channels=16,
    )
    key = jax.random.PRNGKey(2)
    bers = {}
    for rate in ("1/2", "2/3", "3/4"):
        e, c = simulate_coded(cfg, key, rate=rate)
        bers[rate] = float(np.asarray(e).sum()) / float(np.asarray(c).sum())
    assert bers["1/2"] <= bers["2/3"] <= bers["3/4"]
    # At 3 dB the rate-1/2 K=7 code is far below uncoded QPSK (~2.3e-2).
    assert bers["1/2"] < 5e-3
