"""Config-space property test: every constructible LinkConfig runs.

The round-1 advisor found configs that VALIDATED but silently
simulated the wrong thing (RAYLEIGH_TIME falling through to AWGN).
The structural guard: sample the config space broadly; every config
that passes __post_init__ must either run end-to-end producing finite,
sane statistics — or have been rejected at construction. There is no
third state.
"""

import dataclasses
import itertools

import jax
import numpy as np
import pytest

from sdr_tpu.core.config import (
    ChannelConfig,
    ChannelEstimator,
    ChannelModel,
    Equalizer,
    LinkConfig,
    MIMOConfig,
    MIMOScheme,
    Modulation,
    OFDMConfig,
    link_config_from_dict,
    link_config_to_dict,
)
from sdr_tpu.link.pipeline import make_simulate_fn


def _sample_space():
    """A broad, deterministic sample of the config space (every channel
    model x a rotating draw of the other axes, plus MIMO variants)."""
    mods = [Modulation.BPSK, Modulation.QPSK, Modulation.QAM16, Modulation.QAM64]
    eqs = [Equalizer.NONE, Equalizer.ZF, Equalizer.MMSE]
    pilots = [0, 4, 8]
    ests = [ChannelEstimator.LS, ChannelEstimator.DFT]
    chans = [
        ChannelConfig(model=ChannelModel.IDENTITY),
        ChannelConfig(model=ChannelModel.AWGN, ebno_db=8.0),
        ChannelConfig(model=ChannelModel.RAYLEIGH_FLAT, ebno_db=10.0),
        ChannelConfig(model=ChannelModel.RICIAN, ebno_db=8.0, k_factor=5.0),
        ChannelConfig(model=ChannelModel.MULTIPATH, ebno_db=12.0, pdp=(1.0, 0.5)),
        ChannelConfig(model=ChannelModel.RAYLEIGH_TIME, ebno_db=10.0, doppler_norm=0.03),
        ChannelConfig(model=ChannelModel.AWGN, ebno_db=12.0, cfo_subcarriers=0.8, timing_offset=11),
        ChannelConfig(model=ChannelModel.AWGN, ebno_db=12.0, phase_noise_std=2e-3),
        ChannelConfig(model=ChannelModel.MULTIPATH, ebno_db=14.0, pdp=(1.0, 0.3), iq_gain=1.05, iq_phase_rad=0.02),
    ]
    mimos = [
        None,
        MIMOConfig(MIMOScheme.ALAMOUTI, 2, 2),
        MIMOConfig(MIMOScheme.MRC, 1, 2, csi="preamble"),
        MIMOConfig(MIMOScheme.SPATIAL_MUX, 2, 2, detector="ml"),
        MIMOConfig(MIMOScheme.SPATIAL_MUX, 2, 3, detector="sic", csi="preamble"),
        MIMOConfig(MIMOScheme.MRC, 1, 2, csi="preamble", midamble_period=4),
    ]
    cases = []
    for i, (ch, mimo) in enumerate(itertools.product(chans, mimos)):
        cases.append(
            dict(
                modulation=mods[i % len(mods)],
                ofdm=OFDMConfig(n_fft=32, cp_len=8),
                channel=ch,
                equalizer=eqs[i % len(eqs)],
                estimator=ests[i % len(ests)],
                pilot_spacing=pilots[i % len(pilots)],
                n_symbols=8,
                n_channels=2,
                mimo=mimo,
            )
        )
    # A second sweep with validation-friendly secondary axes (MMSE, no
    # comb pilots with MIMO, pilots where impairments demand them) so
    # the RUN side of the property is exercised as heavily as the
    # REJECT side — without weakening either: any combination the
    # validator rejects still just counts as rejected.
    for i, (ch, mimo) in enumerate(itertools.product(chans, mimos)):
        needs_pilots = bool(
            ch.impaired or ch.phase_noise_std or ch.iq_imbalanced
        )
        cases.append(
            dict(
                modulation=mods[(i + 1) % len(mods)],
                ofdm=OFDMConfig(n_fft=32, cp_len=8),
                channel=ch,
                equalizer=Equalizer.MMSE,
                estimator=ests[i % len(ests)],
                pilot_spacing=(
                    0 if mimo is not None else (4 if needs_pilots else [0, 4][i % 2])
                ),
                n_symbols=8,
                n_channels=2,
                mimo=mimo,
            )
        )
    # Third sweep: the SC-FDMA (dft_spread) space opened in round 3 —
    # every channel x MIMO draw with the waveform flag on, alternating
    # block-pilot and genie estimation. The validator's physics gates
    # (coherence bound, >=2 pilot blocks for I/Q, linear detectors
    # only) count as rejections; everything constructible must run.
    for i, (ch, mimo) in enumerate(itertools.product(chans, mimos)):
        needs_pilots = bool(
            ch.impaired or ch.phase_noise_std or ch.iq_imbalanced
        )
        cases.append(
            dict(
                modulation=mods[(i + 2) % len(mods)],
                ofdm=OFDMConfig(n_fft=32, cp_len=8),
                channel=ch,
                equalizer=Equalizer.MMSE,
                estimator=ests[i % len(ests)],
                pilot_spacing=(
                    0 if mimo is not None else (4 if needs_pilots else [0, 4][i % 2])
                ),
                n_symbols=8,
                n_channels=2,
                mimo=mimo,
                dft_spread=True,
            )
        )
    return cases


def test_every_constructible_config_runs():
    built, rejected = [], 0
    for kw in _sample_space():
        try:
            cfg = LinkConfig(**kw)
        except (ValueError, NotImplementedError):
            rejected += 1
            continue
        built.append(cfg)
    # The sample must exercise both outcomes heavily.
    assert len(built) >= 15, len(built)
    assert rejected >= 15, rejected
    for cfg in built:
        r = make_simulate_fn(cfg)(jax.random.PRNGKey(0))
        err = np.asarray(r.bit_errors)
        cnt = np.asarray(r.bits_counted)
        assert np.all(np.isfinite(err)) and np.all(cnt > 0), cfg
        ber = err.sum() / cnt.sum()
        # Equalizer NONE on a fading channel legitimately exceeds 0.5
        # (a pi-rotated flat fade flips every bit); everything with an
        # equalizer (or a phase-preserving channel) must stay sane.
        unequalized_fading = cfg.equalizer == Equalizer.NONE and (
            cfg.channel.model
            not in (ChannelModel.IDENTITY, ChannelModel.AWGN)
        )
        limit = 1.0 if unequalized_fading else 0.55
        assert 0.0 <= ber <= limit, (ber, cfg)
        # Serialization is total on anything constructible.
        assert link_config_from_dict(link_config_to_dict(cfg)) == cfg


def test_noiseless_configs_are_error_free():
    """IDENTITY-channel configs (the reference's loopback regime) must
    decode with zero errors whatever the modulation/equalizer draw."""
    for kw in _sample_space():
        if kw["channel"].model != ChannelModel.IDENTITY:
            continue
        try:
            cfg = LinkConfig(**kw)
        except (ValueError, NotImplementedError):
            continue
        r = make_simulate_fn(cfg)(jax.random.PRNGKey(1))
        assert int(np.asarray(r.bit_errors).sum()) == 0, cfg
