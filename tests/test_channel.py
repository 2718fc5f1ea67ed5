"""Channel model tests: noise calibration, CP-vs-multipath, halo seams."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdr_tpu.ops import channel as chan
from sdr_tpu.ops.fft import fft
from sdr_tpu.ops.ofdm import ofdm_rx, ofdm_tx
from tests.test_fft import assert_ref_float_close, _random_complex


def test_awgn_calibration_subcarrier_snr(rng):
    """Time-domain noise at var/n_fft yields exactly N0 per subcarrier.

    Validates the non-unitary-FFT bookkeeping documented in
    sdr_tpu/ops/channel.py against a direct measurement.
    """
    n_fft, n_sym = 256, 2000
    nv = 0.05
    key = jax.random.PRNGKey(7)
    x = jnp.zeros((n_sym, n_fft), jnp.complex64)
    noisy = chan.awgn(key, ofdm_tx(x, 0), chan.time_noise_var(nv, n_fft))
    y = ofdm_rx(noisy, 0)
    measured = float(jnp.mean(jnp.abs(y) ** 2))
    assert abs(measured - nv) / nv < 0.01


def test_cgauss_moments():
    key = jax.random.PRNGKey(1)
    z = chan.cgauss(key, (200_000,), var=2.0)
    z = np.asarray(z)
    assert abs(np.mean(np.abs(z) ** 2) - 2.0) < 0.03
    assert abs(np.mean(z)) < 0.02
    # Circular symmetry: E[z^2] ≈ 0.
    assert abs(np.mean(z**2)) < 0.02


def test_multipath_with_cp_is_one_tap_per_subcarrier(rng):
    """With CP >= L-1, FIR channel ⇒ Y = H ∘ X exactly (noiseless).

    This is the property the reference's CP layout (ofdm.hpp:21) exists
    to provide; the reference never tests it because it has no channel.
    """
    n_fft, cp, L = 64, 16, 9
    key = jax.random.PRNGKey(3)
    taps = chan.multipath_taps(key, tuple(np.exp(-0.5 * np.arange(L))))
    x = jnp.asarray(_random_complex(rng, (12, n_fft)))
    tx = ofdm_tx(x, cp)  # (12, 80)
    stream = tx.reshape(-1)
    faded = chan.apply_multipath(stream, taps).reshape(tx.shape)
    y = ofdm_rx(faded, cp)
    h = chan.freq_response(taps, n_fft)
    # First symbol's CP absorbs the zero-history transient; all symbols
    # after the first see a fully-settled channel. Check all symbols:
    # the transient only lives in the first L-1 < cp samples of the
    # stream, which the CP discard removes.
    assert_ref_float_close(np.asarray(y), np.asarray(x * h[None, :]))


def test_multipath_history_halo_seam(rng):
    """Block-wise FIR with neighbor-tail history == unsharded FIR.

    The sequence-parallel contract: splitting the stream into blocks
    and passing each block its left neighbor's last L-1 samples must be
    BIT-exact vs the whole-stream computation (north-star requirement).
    """
    L, n = 9, 4096
    key = jax.random.PRNGKey(9)
    taps = chan.multipath_taps(key, (1.0,) * L)
    x = jnp.asarray(_random_complex(rng, (n,)))
    whole = np.asarray(chan.apply_multipath(x, taps))

    n_blocks = 8
    blk = n // n_blocks
    outs = []
    for b in range(n_blocks):
        seg = x[b * blk : (b + 1) * blk]
        hist = None if b == 0 else x[b * blk - (L - 1) : b * blk]
        outs.append(np.asarray(chan.apply_multipath(seg, taps, history=hist)))
    np.testing.assert_array_equal(np.concatenate(outs), whole)


def test_multipath_unit_energy():
    key = jax.random.PRNGKey(11)
    taps = chan.multipath_taps(key, (1.0, 0.5, 0.25), batch_shape=(50_000,))
    e = float(jnp.mean(jnp.sum(jnp.abs(taps) ** 2, axis=-1)))
    assert abs(e - 1.0) < 0.02


def test_rayleigh_flat_unit_power():
    h = chan.rayleigh_flat(jax.random.PRNGKey(2), (100_000,))
    assert abs(float(jnp.mean(jnp.abs(h) ** 2)) - 1.0) < 0.02


def test_rician_flat_moments():
    """E|h|² = 1 and Var|h|² = (2K+1)/(K+1)² — the Rician power law."""
    for K in (0.0, 4.0, 10.0):
        h = chan.rician_flat(jax.random.PRNGKey(7), (200_000,), K)
        p = np.abs(np.asarray(h)) ** 2
        assert abs(p.mean() - 1.0) < 0.02, K
        want_var = (2 * K + 1) / (K + 1) ** 2
        assert abs(p.var() - want_var) < 0.05 * max(want_var, 0.1), K
    # E[h] = 0: the LOS phase is uniform per draw.
    h = chan.rician_flat(jax.random.PRNGKey(8), (200_000,), 10.0)
    assert abs(complex(np.asarray(h).mean())) < 0.01


def test_rician_theory_limits():
    """K=0 reproduces the Rayleigh closed form; K→∞ approaches AWGN."""
    from sdr_tpu.core.config import Modulation
    from sdr_tpu.link.ber import (
        ber_awgn_exact,
        ber_rayleigh_exact,
        ber_rician_exact,
    )

    for mod in (Modulation.QPSK, Modulation.QAM16, Modulation.QAM64):
        for ebno in (0.0, 8.0, 16.0):
            r0 = ber_rician_exact(mod, ebno, 0.0)
            assert abs(r0 - ber_rayleigh_exact(mod, ebno)) < 1e-9 * max(
                r0, 1e-12
            )
    a = ber_awgn_exact(Modulation.QAM16, 8.0)
    assert abs(ber_rician_exact(Modulation.QAM16, 8.0, 1e4) - a) < 0.01 * a
    # Monotone improvement with K at fixed Eb/N0.
    vals = [
        ber_rician_exact(Modulation.QAM16, 12.0, K) for K in (0, 1, 4, 10)
    ]
    assert all(x > y for x, y in zip(vals, vals[1:]))


def test_freq_response_matches_fft():
    taps = jnp.asarray(np.array([1.0, 0.5j, -0.25], np.complex64))
    h = np.asarray(chan.freq_response(taps, 64))
    want = np.fft.fft(np.pad(np.asarray(taps), (0, 61)))
    assert_ref_float_close(h, want)


def test_jakes_gains_statistics(rng):
    """Unit power; autocorrelation tracks J0(2*pi*fd*dt)."""
    import jax
    import jax.numpy as jnp
    from scipy.special import j0 as _j0  # scipy is available via jax deps?
    from sdr_tpu.ops.channel import jakes_gains

    fd = 0.05
    g = jakes_gains(jax.random.PRNGKey(0), 400, fd, n_paths=64, batch_shape=(256,))
    g = np.asarray(g)
    power = np.mean(np.abs(g) ** 2)
    assert abs(power - 1.0) < 0.05
    # empirical autocorrelation at a few lags vs J0
    for lag in (1, 3, 6):
        num = np.mean(np.conj(g[:, :-lag]) * g[:, lag:])
        rho = np.real(num) / power
        th = float(_j0(2 * np.pi * fd * lag))
        assert abs(rho - th) < 0.08, (lag, rho, th)


def test_rayleigh_time_link_decodes():
    """Per-symbol fading with genie per-symbol CSI + MMSE decodes with a
    sane BER at high SNR (fade outage bounds it away from zero)."""
    import jax
    from sdr_tpu.core.config import (
        ChannelConfig, ChannelModel, Equalizer, LinkConfig, Modulation, OFDMConfig,
    )
    from sdr_tpu.link.pipeline import make_simulate_fn

    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(model=ChannelModel.RAYLEIGH_TIME, ebno_db=20.0,
                              doppler_norm=0.02),
        equalizer=Equalizer.MMSE,
        n_symbols=64,
        n_channels=16,
    )
    res = make_simulate_fn(cfg)(jax.random.PRNGKey(0))
    ber = float(np.asarray(res.bit_errors).sum()) / float(
        np.asarray(res.bits_counted).sum()
    )
    # Theory: flat Rayleigh QPSK at 20 dB -> BER ~ 1/(4*gamma) ~ 2.5e-3.
    assert 5e-4 < ber < 8e-3
