"""End-to-end link tests: loopback parity and BER vs exact AWGN theory.

The statistical tier the reference lacks (SURVEY.md §4 implication
list): simulated BER must sit inside tight confidence bounds of the
Cho–Yoon exact curves, which is a far stronger parity statement than
the 0.1 dB bound — if these pass, BER parity with the C++ semantics
follows, because both implement the same constellation geometry.
"""

import math

import numpy as np
import pytest
import jax

from sdr_tpu.core.config import (
    ChannelConfig,
    ChannelModel,
    Equalizer,
    LinkConfig,
    Modulation,
    OFDMConfig,
)
from sdr_tpu.link.ber import ber_awgn_exact
from sdr_tpu.link.pipeline import make_simulate_fn


def _run(cfg, seed=0):
    fn = make_simulate_fn(cfg)
    res = fn(jax.random.PRNGKey(seed))
    errors = int(np.sum(np.asarray(res.bit_errors)))
    total = int(np.sum(np.asarray(res.bits_counted)))
    return errors, total


def _assert_ber_close(errors, total, p_theory):
    """Poisson 4-sigma band around the theoretical error count."""
    expect = p_theory * total
    slack = 4.0 * math.sqrt(max(expect, 1.0)) + 2.0
    assert abs(errors - expect) <= slack, (
        f"errors={errors}, expected {expect:.1f} ± {slack:.1f} "
        f"(BER {errors / total:.3e} vs theory {p_theory:.3e})"
    )


def test_identity_loopback_is_exact():
    """The reference demo's channel (QFDemoWindow.cpp:213-218): 0 errors."""
    for mod in Modulation:
        cfg = LinkConfig(
            modulation=mod,
            ofdm=OFDMConfig(64, 16),
            channel=ChannelConfig(model=ChannelModel.IDENTITY),
            n_symbols=8,
            n_channels=2,
        )
        errors, total = _run(cfg)
        assert errors == 0, f"{mod}: {errors} errors in noiseless loopback"
        assert total == cfg.bits_total


def test_config1_qpsk_64_cp16_awgn_10db_1e6_bits():
    """BASELINE.json config[0]: the CPU-parity anchor.

    QPSK/64-subcarrier/CP16/AWGN@10dB, ~1e6 bits. Theory BER ≈ 3.9e-6
    → a handful of errors; assert the Poisson band.
    """
    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=10.0),
        n_symbols=128,
        n_channels=62,  # 62*128*128 = 1,015,808 bits
    )
    assert cfg.bits_total >= 1_000_000
    errors, total = _run(cfg)
    _assert_ber_close(errors, total, ber_awgn_exact(Modulation.QPSK, 10.0))


@pytest.mark.parametrize(
    "mod,ebno_db,n_fft",
    [
        (Modulation.BPSK, 6.0, 64),
        (Modulation.QPSK, 4.0, 64),
        (Modulation.QAM16, 8.0, 256),
        (Modulation.QAM64, 12.0, 1024),
        (Modulation.QAM256, 16.0, 256),
        (Modulation.QAM1024, 20.0, 256),
    ],
)
def test_awgn_ber_matches_exact_theory(mod, ebno_db, n_fft):
    """Configs 2 & 3 style: BER vs Cho–Yoon exact AWGN curves."""
    cfg = LinkConfig(
        modulation=mod,
        ofdm=OFDMConfig(n_fft, n_fft // 4),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=ebno_db),
        n_symbols=32,
        n_channels=16,
    )
    errors, total = _run(cfg)
    _assert_ber_close(errors, total, ber_awgn_exact(mod, ebno_db))


def test_multipath_mmse_better_than_no_eq():
    base = dict(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH, ebno_db=15.0, pdp=(1.0, 0.5, 0.25, 0.125)
        ),
        n_symbols=64,
        n_channels=64,
    )
    e_none, t = _run(LinkConfig(**base, equalizer=Equalizer.NONE))
    e_mmse, _ = _run(LinkConfig(**base, equalizer=Equalizer.MMSE))
    e_zf, _ = _run(LinkConfig(**base, equalizer=Equalizer.ZF))
    assert e_mmse < e_none
    assert e_zf < e_none
    # Per-subcarrier fading here is Rayleigh (sum of 4 CN taps), so the
    # equalized 16-QAM BER at 15 dB sits near the flat-Rayleigh curve
    # (~1-2e-2); just bound it well below the unequalized wreckage.
    assert e_mmse / t < 0.05
    # One-tap unbiased MMSE is algebraically identical to ZF; the two
    # paths must agree exactly.
    assert e_mmse == e_zf


def test_rayleigh_flat_zf_ber_reasonable():
    """Flat Rayleigh + ZF, QPSK: exact theory 0.5*(1 - sqrt(g/(1+g)))."""
    ebno_db = 10.0
    g = 10.0 ** (ebno_db / 10.0)
    p_theory = 0.5 * (1.0 - math.sqrt(g / (1.0 + g)))
    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(model=ChannelModel.RAYLEIGH_FLAT, ebno_db=ebno_db),
        equalizer=Equalizer.ZF,
        n_symbols=16,
        n_channels=512,  # many independent fades for the average
    )
    errors, total = _run(cfg)
    # Fading BER averages converge slower; 15% relative band.
    assert abs(errors / total - p_theory) / p_theory < 0.15


def test_channel_batch_invariant_to_n_channels():
    """Per-channel fold_in keying: channel 0's errors are identical
    whether the batch holds 1 channel or 8 (sharding-invariance core)."""
    def errs(n_channels):
        cfg = LinkConfig(
            modulation=Modulation.QAM16,
            ofdm=OFDMConfig(64, 16),
            channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=6.0),
            n_symbols=16,
            n_channels=n_channels,
        )
        res = make_simulate_fn(cfg)(jax.random.PRNGKey(5))
        return np.asarray(res.bit_errors)

    np.testing.assert_array_equal(errs(1), errs(8)[:1])
