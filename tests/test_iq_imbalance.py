"""RX I/Q imbalance: mixer model, blind properization compensator, link BER.

The reference's loopback has an ideal front end (QFDemoWindow.cpp:
213-218); real I/Q demodulators leak a conjugate image of the mirror
subcarrier into every tone. ops.channel models the mismatch as the
widely-linear y = μx + νx* and cancels it blindly by restoring
circular symmetry (second-order moments only — no pilots, no training;
the pilot LS estimate then absorbs the residual direct gain).
"""

import dataclasses

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
from sdr_tpu.link.pipeline import make_simulate_fn
from sdr_tpu.ops.channel import (
    apply_iq_imbalance,
    cgauss,
    iq_compensate,
    iq_imbalance_coeffs,
)


def _image_power_db(z: np.ndarray) -> float:
    """Pseudo-variance-to-power ratio |E[z²]|/E[|z|²] in dB (impropriety)."""
    c = abs(np.mean(z * z))
    p = np.mean(np.abs(z) ** 2)
    return 10.0 * np.log10(max(c / p, 1e-300))


def test_iq_coeffs_matched_and_irr():
    mu, nu = iq_imbalance_coeffs(1.0, 0.0)
    assert mu == 1.0 and nu == 0.0
    mu, nu = iq_imbalance_coeffs(1.1, 0.1)
    # IRR = |μ/ν|²: ~23 dB for this typical uncalibrated front end.
    irr_db = 20.0 * np.log10(abs(mu) / abs(nu))
    assert 20.0 < irr_db < 26.0, irr_db
    # Energy bookkeeping of the WL pair: |μ|² + |ν|² = (1 + g²)/2.
    assert abs((abs(mu) ** 2 + abs(nu) ** 2) - (1 + 1.1**2) / 2) < 1e-12


def test_iq_compensate_exact_on_gaussian():
    """Proper CN input → imbalance → compensate: impropriety returns to
    the finite-sample floor (≈ −10·log10(n)/2 dB), ≥25 dB below the
    imbalanced level."""
    n = 1 << 16
    s = np.asarray(cgauss(jax.random.PRNGKey(0), (n,)))
    y = np.asarray(apply_iq_imbalance(jnp.asarray(s), 1.1, 0.1))
    z = np.asarray(iq_compensate(jnp.asarray(y)))
    before = _image_power_db(y)
    after = _image_power_db(z)
    assert before > -25.0, before  # the mismatch is visible...
    assert after < before - 25.0, (before, after)  # ...and removed
    # The direct path survives: z ∝ s up to a complex scalar.
    g = np.vdot(s, z) / np.vdot(s, s)
    resid = np.mean(np.abs(z - g * s) ** 2) / np.mean(np.abs(z) ** 2)
    assert resid < 1e-3, resid


def test_iq_compensate_identity_when_matched():
    s = cgauss(jax.random.PRNGKey(1), (4096,))
    z = np.asarray(iq_compensate(s))
    # w is moment-estimated, so matched hardware still sees a tiny
    # finite-sample w — but the energy it moves is O(1/n).
    resid = np.mean(np.abs(z - np.asarray(s)) ** 2)
    assert resid < 1e-3, resid


def test_iq_compensate_diff_axis_ignores_deterministic_part():
    """A frame-periodic deterministic component (the pilot comb's time
    signal) biases whole-frame moments; symbol-difference moments must
    recover w as if it weren't there."""
    n_sym, sym_len = 32, 80
    s = np.asarray(cgauss(jax.random.PRNGKey(2), (n_sym, sym_len)))
    # Deterministic per-symbol component with a strongly improper P².
    det = 2.0 * np.exp(1j * np.pi / 4) * (np.arange(sym_len) % 8 == 0)
    x = jnp.asarray(s + det[None, :])
    y = apply_iq_imbalance(x, 1.1, 0.1)
    z_diff = np.asarray(iq_compensate(y, diff_axis=-2))
    z_flat = np.asarray(iq_compensate(y))
    # Residual image vs the true direct part, per estimator.
    mu, nu = iq_imbalance_coeffs(1.1, 0.1)
    direct = np.asarray(x)

    def resid(z):
        g = np.vdot(direct, z) / np.vdot(direct, direct)
        return float(
            np.mean(np.abs(z - g * direct) ** 2) / np.mean(np.abs(z) ** 2)
        )

    assert resid(z_diff) < 1e-3, resid(z_diff)
    assert resid(z_flat) > 5.0 * resid(z_diff), (resid(z_flat), resid(z_diff))


def test_iq_config_gates():
    ofdm = OFDMConfig(64, 16)
    with pytest.raises(ValueError, match="pilot_spacing"):
        LinkConfig(
            ofdm=ofdm,
            channel=ChannelConfig(model=ChannelModel.AWGN, iq_gain=1.1),
        )
    with pytest.raises(ValueError, match="iq_gain"):
        ChannelConfig(iq_gain=3.0)
    with pytest.raises(ValueError, match="iq_phase_rad"):
        ChannelConfig(iq_phase_rad=1.0)
    # I/Q imbalance + acquisition now composes (raw-stream
    # properization before CFO correction) — constructing is legal.
    LinkConfig(
        ofdm=ofdm,
        channel=ChannelConfig(iq_gain=1.1, cfo_subcarriers=0.1),
        equalizer=Equalizer.MMSE,
        pilot_spacing=4,
    )
    assert not ChannelConfig().iq_imbalanced
    assert ChannelConfig(iq_phase_rad=0.05).iq_imbalanced


def _iq_cfg(gain: float, phase: float, **chan_kw) -> LinkConfig:
    return LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(n_fft=64, cp_len=16),
        channel=ChannelConfig(
            model=ChannelModel.AWGN,
            ebno_db=16.0,
            iq_gain=gain,
            iq_phase_rad=phase,
            **chan_kw,
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=4,
        n_symbols=32,
        n_channels=32,
    )


def _ber(cfg: LinkConfig, seed: int = 5) -> float:
    res = make_simulate_fn(cfg)(jax.random.PRNGKey(seed))
    return float(np.asarray(res.bit_errors).sum()) / float(
        np.asarray(res.bits_counted).sum()
    )


def test_iq_link_compensated_matches_clean():
    """16-QAM at 16 dB with a 23 dB-IRR front end: the image sits at the
    noise level (Es/N0 = 22 dB), so uncompensated BER would degrade
    visibly — the compensated link must stay near the matched-mixer BER."""
    bad = _ber(_iq_cfg(1.1, 0.1))
    clean = _ber(_iq_cfg(1.0, 0.0))
    assert bad < 3.0 * clean + 2e-3, (bad, clean)


def test_iq_link_uncompensated_oracle():
    """The same mismatch demodulated WITHOUT the compensator decodes
    measurably worse — proves the blind stage is load-bearing."""
    from sdr_tpu.core import prng
    from sdr_tpu.link.pipeline import (
        apply_channel,
        generate_bits,
        tx_chain,
    )
    from sdr_tpu.ops.llr import llr_maxlog, llr_to_hard_bits
    from sdr_tpu.ops.ofdm import ofdm_rx
    from sdr_tpu.ops import equalize as eq
    from sdr_tpu.ops.pilots import estimate_ls_comb, extract_data

    cfg = _iq_cfg(1.3, 0.25)  # ~15 dB IRR: image well above the noise

    def one_uncompensated(key):
        bits = generate_bits(cfg, prng.role_key(key, prng.ROLE_PAYLOAD))
        tx = tx_chain(cfg, bits)
        rx, _h, nv = apply_channel(cfg, key, tx)
        y = ofdm_rx(rx, cfg.ofdm.cp_len)  # no iq_compensate
        h_est = estimate_ls_comb(y, cfg.pilot_spacing)
        s, eff = eq.equalize_mmse(y, h_est, jnp.float32(nv))
        s = extract_data(s, cfg.pilot_spacing)
        eff = extract_data(jnp.broadcast_to(eff, y.shape), cfg.pilot_spacing)
        hard = llr_to_hard_bits(llr_maxlog(s, cfg.modulation, eff))
        return jnp.sum((hard != bits).astype(jnp.int32)), jnp.int32(bits.size)

    keys = jax.vmap(lambda c: jax.random.fold_in(jax.random.PRNGKey(5), c))(
        jnp.arange(cfg.n_channels)
    )
    errs, counts = jax.jit(jax.vmap(one_uncompensated))(keys)
    raw = float(np.asarray(errs).sum()) / float(np.asarray(counts).sum())
    comp = _ber(cfg)
    assert raw > 2.0 * comp + 1e-3, (raw, comp)


def test_iq_composes_with_acquisition():
    """CFO + unknown delay + RX I/Q imbalance in one link: raw-stream
    image cancellation before carrier correction keeps the blind
    receiver within a small factor of the acquisition-only BER."""
    base = LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(
            model=ChannelModel.AWGN,
            ebno_db=14.0,
            cfo_subcarriers=1.3,
            timing_offset=37,
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=4,
        n_symbols=16,
        n_channels=96,
    )
    both = dataclasses.replace(
        base,
        channel=dataclasses.replace(
            base.channel, iq_gain=1.05, iq_phase_rad=0.03
        ),
    )
    def run(cfg):
        r = make_simulate_fn(cfg)(jax.random.PRNGKey(4))
        return float(r.bit_errors.sum()) / float(r.bits_counted.sum())

    b_acq, b_both = run(base), run(both)
    assert b_both < max(2.5 * b_acq, 5e-3), (b_both, b_acq)


def test_iq_acquisition_zero_cfo_unbiased():
    """timing offset alone (CFO ~ 0) is the worst case for raw-stream
    properization: the frame-periodic pilot component doesn't rotate
    away, so unlagged moments would bias w (~9x BER measured). The
    lag-differenced moments keep the acquired path within a small
    factor of the aligned link."""
    base = LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(
            model=ChannelModel.AWGN, ebno_db=14.0,
            iq_gain=1.05, iq_phase_rad=0.03,
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=4,
        n_symbols=16,
        n_channels=96,
    )
    acquired = dataclasses.replace(
        base, channel=dataclasses.replace(base.channel, timing_offset=37)
    )
    def run(cfg):
        r = make_simulate_fn(cfg)(jax.random.PRNGKey(6))
        return float(r.bit_errors.sum()) / float(r.bits_counted.sum())

    b_al, b_acq = run(base), run(acquired)
    assert b_acq < max(2.5 * b_al, 2e-4), (b_acq, b_al)


def test_iq_composes_with_phase_noise_and_fading():
    """Mixer stack: Rayleigh fading + LO walk + I/Q mismatch, all
    corrected by blind properization + tracked pilots + MMSE."""
    cfg = dataclasses.replace(
        _iq_cfg(1.1, 0.1, phase_noise_std=0.008),
        channel=dataclasses.replace(
            _iq_cfg(1.1, 0.1).channel,
            model=ChannelModel.MULTIPATH,
            pdp=(1.0, 0.5, 0.25),
            phase_noise_std=0.008,
        ),
    )
    clean = dataclasses.replace(
        cfg,
        channel=dataclasses.replace(
            cfg.channel, iq_gain=1.0, iq_phase_rad=0.0, phase_noise_std=0.0
        ),
    )
    b_imp = _ber(cfg)
    b_cln = _ber(clean)
    assert b_imp < 3.0 * b_cln + 5e-3, (b_imp, b_cln)
