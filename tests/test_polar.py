"""Polar code tests: transform algebra, construction, SC decoding
(validated decision-for-decision against an independent recursive
reference), and the coded-link integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdr_tpu.core.config import (
    ChannelConfig,
    ChannelModel,
    Equalizer,
    LinkConfig,
    Modulation,
    OFDMConfig,
)
from sdr_tpu.ops.polar import (
    polar_construct,
    polar_decode_sc,
    polar_encode,
    polar_encode_info,
)


def test_encoder_is_natural_order_kronecker_f():
    """x = u·F^{⊗2}: the canonical N=4 generator, row for row."""
    G = np.asarray(polar_encode(jnp.eye(4, dtype=jnp.int8)))
    expect = np.array(
        [[1, 0, 0, 0], [1, 1, 0, 0], [1, 0, 1, 0], [1, 1, 1, 1]], np.int8
    )
    assert np.array_equal(G, expect)


def test_encoder_linearity():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 2, (64,)), jnp.int8)
    b = jnp.asarray(rng.integers(0, 2, (64,)), jnp.int8)
    xa, xb = polar_encode(a), polar_encode(b)
    assert np.array_equal(
        np.asarray(polar_encode(jnp.bitwise_xor(a, b))),
        np.asarray(jnp.bitwise_xor(xa, xb)),
    )


def test_construction_orders_by_reliability():
    info_idx, frozen = polar_construct(256, 128)
    assert len(info_idx) == 128 and int(frozen.sum()) == 128
    # The fully-polarized extremes: channel N-1 (best) is always
    # information, channel 0 (worst) always frozen.
    assert 255 in info_idx and 0 not in info_idx
    # More ones in the index -> more 'good' polarization steps; the
    # all-but-one-ones channels must all be info at rate 1/2.
    for i in (127, 191, 223, 239, 247, 251, 253, 254):
        assert i in info_idx


def test_noiseless_round_trip_exact():
    N, K = 128, 64
    rng = np.random.default_rng(0)
    info = jnp.asarray(rng.integers(0, 2, (8, K)), jnp.int8)
    cw = polar_encode_info(info, N)
    llr = (1.0 - 2.0 * np.asarray(cw, np.float32)) * 5.0
    dec = polar_decode_sc(jnp.asarray(llr), N, K)
    assert np.array_equal(np.asarray(dec), np.asarray(info))


def _sc_reference(llr, frozen):
    """Independent recursive SC (same min-sum f/g), natural order
    x = (p ⊕ q, q). Returns the full u vector."""

    def rec(L, fr):
        n = len(L)
        if n == 1:
            u = 0 if fr[0] else int(L[0] < 0)
            return np.array([u]), np.array([u])
        a, b = L[: n // 2], L[n // 2 :]
        Lf = np.sign(a) * np.sign(b) * np.minimum(np.abs(a), np.abs(b))
        u1, p = rec(Lf, fr[: n // 2])
        u2, q = rec(b + (1 - 2 * p) * a, fr[n // 2 :])
        return np.concatenate([u1, u2]), np.concatenate([p ^ q, q])

    return rec(np.asarray(llr, np.float64), frozen)[0]


@pytest.mark.parametrize("N,K", [(64, 32), (128, 96)])
def test_sc_scan_matches_recursive_reference(N, K):
    """The lax.scan decoder's DECISIONS equal the recursive oracle's on
    noisy inputs — a much stronger statement than BER agreement."""
    info_idx, frozen = polar_construct(N, K)
    rng = np.random.default_rng(7)
    for _ in range(20):
        info = rng.integers(0, 2, (K,)).astype(np.int8)
        cw = np.asarray(polar_encode_info(jnp.asarray(info[None]), N))[0]
        y = (1.0 - 2.0 * cw.astype(np.float32)) + rng.normal(0, 0.9, (N,))
        llr = 2.0 * y / 0.81
        mine = np.asarray(
            polar_decode_sc(jnp.asarray(llr[None], jnp.float32), N, K)
        )[0]
        ref = _sc_reference(llr, frozen)[info_idx]
        assert np.array_equal(mine, ref)


def test_polar_coded_link_beats_uncoded():
    """(256,128) SC over the QPSK/AWGN link: orders of magnitude under
    the uncoded BER at 4 dB (where uncoded QPSK reads ~1.25e-2)."""
    from sdr_tpu.link.coded import make_polar_fn

    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(128, 16),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=4.0),
        n_symbols=32,
        n_channels=8,
    )
    errors, counted = make_polar_fn(cfg, rate="1/2")(jax.random.PRNGKey(0))
    e, t = int(np.sum(np.asarray(errors))), int(np.sum(np.asarray(counted)))
    assert t == 8 * 32 * (128 * 2 // 256) * 128
    assert e / t < 2e-3  # uncoded theory is 1.25e-2 at this Eb/N0


@pytest.mark.parametrize("rate", ["2/3", "3/4"])
def test_polar_rates_run_and_decode(rate):
    from sdr_tpu.link.coded import make_polar_fn

    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(128, 16),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=7.0),
        n_symbols=16,
        n_channels=4,
    )
    errors, counted = make_polar_fn(cfg, rate=rate)(jax.random.PRNGKey(1))
    e, t = int(np.sum(np.asarray(errors))), int(np.sum(np.asarray(counted)))
    assert t > 0
    assert e / t < 2e-3


def test_polar_composes_with_fading_and_pilots():
    """The LLR chain feeding SC is the same one Viterbi/min-sum consume:
    multipath + MMSE + estimated CSI decodes cleanly at high SNR."""
    from sdr_tpu.link.coded import make_polar_fn

    cfg = LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(128, 16),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH, ebno_db=16.0, pdp=(1.0, 0.4)
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=8,
        n_symbols=16,
        n_channels=8,
    )
    errors, counted = make_polar_fn(cfg, rate="1/2")(jax.random.PRNGKey(2))
    e, t = int(np.sum(np.asarray(errors))), int(np.sum(np.asarray(counted)))
    assert e / t < 5e-3


def test_polar_guards():
    with pytest.raises(ValueError, match="power of 2"):
        polar_encode(jnp.zeros((6,), jnp.int8))
    with pytest.raises(ValueError, match="k must be"):
        polar_construct(64, 0)
    with pytest.raises(ValueError, match="last axis"):
        polar_decode_sc(jnp.zeros((32,), jnp.float32), 64, 32)
