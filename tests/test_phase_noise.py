"""RX-LO Wiener phase noise: op statistics, config gates, link BER.

The reference has no oscillator model (its loopback is ideal,
QFDemoWindow.cpp:213-218); this extends the channel family with the
standard free-running-LO Wiener walk and verifies the per-symbol
tracked pilot estimator (ops.pilots.estimate_ls_comb_tracked) corrects
the drifting common phase — untracked frame-averaged estimation
decodes near-randomly under the same walk.
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
from sdr_tpu.ops.channel import wiener_phase


def test_wiener_phase_statistics():
    """Unit magnitude; θ[n] variance grows linearly at std² per sample."""
    std = 0.02
    n = 512
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)
    ph = jax.vmap(lambda k: wiener_phase(k, n, std))(keys)
    ph = np.asarray(ph)
    assert ph.shape == (4096, n)
    np.testing.assert_allclose(np.abs(ph), 1.0, atol=1e-5)
    theta = np.unwrap(np.angle(ph), axis=-1)
    # Var θ[n] = (n+1)·std² (the walk includes the first increment).
    for idx in (31, 127, 511):
        want = (idx + 1) * std**2
        got = theta[:, idx].var()
        assert abs(got - want) < 0.15 * want, (idx, got, want)


def test_wiener_phase_zero_std_is_identity():
    ph = wiener_phase(jax.random.PRNGKey(1), 64, 0.0)
    np.testing.assert_array_equal(np.asarray(ph), np.ones(64, np.complex64))


def test_phase_noise_config_gates():
    """phase_noise_std needs pilots, bounded std, and no acquisition."""
    ofdm = OFDMConfig(64, 16)
    with pytest.raises(ValueError, match="pilot_spacing"):
        LinkConfig(
            ofdm=ofdm,
            channel=ChannelConfig(model=ChannelModel.AWGN, phase_noise_std=0.01),
        )
    with pytest.raises(ValueError, match="phase_noise_std"):
        ChannelConfig(model=ChannelModel.AWGN, phase_noise_std=0.5)
    with pytest.raises(ValueError, match="phase_noise_std"):
        ChannelConfig(model=ChannelModel.AWGN, phase_noise_std=-0.01)
    # phase noise + acquisition now composes (the acquired path applies
    # the mixer stages to the whole stream) — constructing is legal.
    LinkConfig(
        ofdm=ofdm,
        channel=ChannelConfig(
            model=ChannelModel.AWGN,
            phase_noise_std=0.01,
            cfo_subcarriers=0.1,
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=4,
    )


def test_phase_noise_composes_with_acquisition():
    """CFO + unknown delay + LO phase noise in ONE link: the blind
    receiver (S&C acquisition, then tracked pilots) decodes within a
    small factor of the acquisition-only BER."""
    import dataclasses

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
        channel=dataclasses.replace(base.channel, phase_noise_std=2e-3),
    )
    def run(cfg):
        r = make_simulate_fn(cfg)(jax.random.PRNGKey(3))
        return float(r.bit_errors.sum()) / float(r.bits_counted.sum())

    b_acq, b_both = run(base), run(both)
    assert b_both < max(2.5 * b_acq, 5e-3), (b_both, b_acq)


def _pn_cfg(model: ChannelModel, std: float, **kw) -> LinkConfig:
    return LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(n_fft=64, cp_len=16),
        channel=ChannelConfig(
            model=model, ebno_db=16.0, phase_noise_std=std, **kw
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=4,
        n_symbols=32,
        n_channels=32,
    )


def _ber(cfg: LinkConfig, seed: int = 3) -> float:
    res = make_simulate_fn(cfg)(jax.random.PRNGKey(seed))
    return float(np.asarray(res.bit_errors).sum()) / float(
        np.asarray(res.bits_counted).sum()
    )


def test_phase_noise_tracked_link_decodes_awgn():
    """AWGN + LO walk, tracked pilots: BER stays near the clean-LO BER.

    std=0.01 over 32 symbols × 80 samples drifts θ by ~0.5 rad RMS
    across the frame — a frame-averaged estimate would smear the 16-QAM
    constellation into neighboring decision regions (BER ≳ 0.1); the
    per-symbol tracker must hold it within noise of the clean link.
    """
    noisy = _ber(_pn_cfg(ChannelModel.AWGN, 0.01))
    clean = _ber(_pn_cfg(ChannelModel.AWGN, 0.0))
    assert noisy < 3.0 * clean + 2e-3, (noisy, clean)
    assert noisy < 0.02


def test_phase_noise_tracked_link_decodes_multipath():
    """Frequency selectivity + LO walk: tracking composes with the
    frequency-shaped LS estimate (common phase is separable from H)."""
    pdp = (1.0, 0.5, 0.25)
    noisy = _ber(_pn_cfg(ChannelModel.MULTIPATH, 0.008, pdp=pdp))
    clean = _ber(_pn_cfg(ChannelModel.MULTIPATH, 0.0, pdp=pdp))
    assert noisy < 3.0 * clean + 5e-3, (noisy, clean)


def test_phase_noise_untracked_would_fail():
    """Regression oracle: the same walk WITHOUT per-symbol tracking
    (frame-averaged LS on the rotated grid) decodes near-randomly —
    proves the tracked path is load-bearing, not cosmetic."""
    from sdr_tpu.core import prng
    from sdr_tpu.link.pipeline import generate_bits, tx_chain, apply_channel
    from sdr_tpu.ops.llr import llr_maxlog, llr_to_hard_bits
    from sdr_tpu.ops.ofdm import ofdm_rx
    from sdr_tpu.ops import equalize as eq
    from sdr_tpu.ops.pilots import estimate_ls_comb, extract_data

    cfg = _pn_cfg(ChannelModel.AWGN, 0.01)

    def one(key):
        bits = generate_bits(cfg, prng.role_key(key, prng.ROLE_PAYLOAD))
        tx = tx_chain(cfg, bits)
        rx, _h, nv = apply_channel(cfg, key, tx)
        y = ofdm_rx(rx, cfg.ofdm.cp_len)
        h_est = estimate_ls_comb(y, cfg.pilot_spacing)  # frame-averaged
        s, eff = eq.equalize_mmse(y, h_est, jnp.float32(nv))
        s = extract_data(s, cfg.pilot_spacing)
        eff = extract_data(jnp.broadcast_to(eff, y.shape), cfg.pilot_spacing)
        hard = llr_to_hard_bits(llr_maxlog(s, cfg.modulation, eff))
        return jnp.sum((hard != bits).astype(jnp.int32)), jnp.int32(bits.size)

    keys = jax.vmap(lambda c: jax.random.fold_in(jax.random.PRNGKey(3), c))(
        jnp.arange(cfg.n_channels)
    )
    errs, counts = jax.jit(jax.vmap(one))(keys)
    untracked = float(np.asarray(errs).sum()) / float(np.asarray(counts).sum())
    tracked = _ber(cfg)
    # Measured: untracked ≈ 3.2e-2, tracked ≈ 1e-3 at these settings.
    assert untracked > 0.015, untracked
    assert tracked < untracked / 10.0, (tracked, untracked)
