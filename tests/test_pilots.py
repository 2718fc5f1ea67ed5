"""Comb pilots + LS channel estimation."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdr_tpu.core.config import (
    ChannelConfig,
    ChannelModel,
    Equalizer,
    LinkConfig,
    Modulation,
    OFDMConfig,
)
from sdr_tpu.link.pipeline import make_simulate_fn
from sdr_tpu.ops import channel as chan
from sdr_tpu.ops.pilots import (
    PILOT_VALUE,
    data_indices,
    estimate_ls_comb,
    extract_data,
    insert_pilots,
    n_data_subcarriers,
    pilot_indices,
)


def test_index_partition():
    n_fft, sp = 64, 8
    pil = pilot_indices(n_fft, sp)
    dat = data_indices(n_fft, sp)
    assert pil == tuple(range(0, 64, 8))
    assert sorted(pil + dat) == list(range(64))
    assert n_data_subcarriers(n_fft, sp) == 56


def test_insert_extract_round_trip(rng):
    n_fft, sp = 64, 8
    nd = n_data_subcarriers(n_fft, sp)
    pts = jnp.asarray(
        rng.standard_normal((3, nd)) + 1j * rng.standard_normal((3, nd)),
        jnp.complex64,
    )
    grid = insert_pilots(pts, n_fft, sp)
    assert grid.shape == (3, n_fft)
    np.testing.assert_allclose(np.asarray(extract_data(grid, sp)), np.asarray(pts))
    np.testing.assert_allclose(
        np.asarray(grid[..., ::sp]),
        np.full((3, n_fft // sp), PILOT_VALUE, np.complex64),
    )


def test_ls_estimate_recovers_smooth_channel(rng):
    """Noise-free pilots through a smooth (short-delay) channel: the
    lerped LS estimate must track the true response closely."""
    n_fft, sp, S = 128, 4, 8
    taps = jnp.asarray([0.9 + 0.1j, 0.3 - 0.2j, 0.1j], jnp.complex64)
    h_true = chan.freq_response(taps, n_fft)
    nd = n_data_subcarriers(n_fft, sp)
    pts = jnp.asarray(
        (rng.standard_normal((S, nd)) + 1j * rng.standard_normal((S, nd)))
        / np.sqrt(2),
        jnp.complex64,
    )
    grid = insert_pilots(pts, n_fft, sp)
    y = grid * h_true  # frequency-domain action, no noise
    h_est = estimate_ls_comb(y, sp)
    assert h_est.shape == (1, n_fft)
    err = np.abs(np.asarray(h_est[0]) - np.asarray(h_true))
    assert err.max() < 0.08  # lerp error only (3-tap channel, spacing 4)
    # exact at the pilots
    np.testing.assert_allclose(
        np.asarray(h_est[0, ::sp]), np.asarray(h_true[::sp]), atol=1e-6
    )


def _pilot_cfg(spacing, ebno):
    return LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(n_fft=128, cp_len=16),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH, ebno_db=ebno, pdp=(1.0, 0.4, 0.2)
        ),
        equalizer=Equalizer.MMSE,
        n_symbols=32,
        n_channels=8,
        pilot_spacing=spacing,
    )


def test_pilot_link_decodes_at_high_snr():
    """Estimated CSI at 30 dB: BER limited by per-channel fade outage
    (deep spectral nulls persist at any SNR with one-tap MMSE), so the
    gate is vs the genie-CSI BER of the same realizations, not zero."""
    cfg = _pilot_cfg(4, 30.0)
    assert cfg.bits_per_ofdm_symbol == (128 - 32) * 4
    res = make_simulate_fn(cfg)(jax.random.PRNGKey(0))
    ber = float(np.asarray(res.bit_errors).sum()) / float(
        np.asarray(res.bits_counted).sum()
    )
    genie = dataclasses.replace(cfg, pilot_spacing=0)
    r_gen = make_simulate_fn(genie)(jax.random.PRNGKey(0))
    ber_gen = float(np.asarray(r_gen.bit_errors).sum()) / float(
        np.asarray(r_gen.bits_counted).sum()
    )
    assert ber < 2.0 * max(ber_gen, 1e-4)


def test_pilot_link_near_perfect_csi_at_moderate_snr():
    """Estimated CSI costs little vs genie CSI (dense comb, 32-symbol
    average): BERs must be within 2x."""
    est = _pilot_cfg(4, 14.0)
    genie = dataclasses.replace(est, pilot_spacing=0)
    r_est = make_simulate_fn(est)(jax.random.PRNGKey(1))
    r_gen = make_simulate_fn(genie)(jax.random.PRNGKey(1))
    ber_est = float(np.asarray(r_est.bit_errors).sum()) / float(
        np.asarray(r_est.bits_counted).sum()
    )
    ber_gen = float(np.asarray(r_gen.bit_errors).sum()) / float(
        np.asarray(r_gen.bits_counted).sum()
    )
    assert ber_est < 2.0 * max(ber_gen, 1e-4)


def test_pilot_spacing_validation():
    with pytest.raises(ValueError, match="pilot_spacing"):
        _ = LinkConfig(pilot_spacing=1)


def test_per_symbol_ls_tracks_time_varying_channel():
    """pilot_spacing + RAYLEIGH_TIME: the per-symbol LS estimate must
    hold estimated-CSI BER close to genie-CSI BER at a Doppler where
    frame averaging would decorrelate completely (regression for the
    silent block-fading assumption)."""
    import dataclasses

    from sdr_tpu.core.config import ChannelConfig, ChannelModel, Equalizer
    from sdr_tpu.link.pipeline import simulate

    est_cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(n_fft=64, cp_len=16),
        channel=ChannelConfig(
            model=ChannelModel.RAYLEIGH_TIME, ebno_db=14.0, doppler_norm=0.05
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=4,
        n_symbols=32,
        n_channels=64,
    )
    genie_cfg = dataclasses.replace(est_cfg, pilot_spacing=0)
    key = jax.random.PRNGKey(21)
    r_est = simulate(est_cfg, key)
    r_gen = simulate(genie_cfg, key)
    ber_est = float(np.asarray(r_est.bit_errors).sum()) / float(
        np.asarray(r_est.bits_counted).sum()
    )
    ber_gen = float(np.asarray(r_gen.bit_errors).sum()) / float(
        np.asarray(r_gen.bits_counted).sum()
    )
    # Estimated CSI costs SNR (noisy pilots, interpolation) but must
    # stay the same order as genie CSI; a frame-averaged estimate at
    # fd*T=0.05 over 32 symbols decodes near-randomly (BER ~ 0.2+).
    assert ber_est < 3.0 * ber_gen + 1e-3
    assert ber_est < 0.05
