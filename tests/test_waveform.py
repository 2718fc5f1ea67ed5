"""Waveform metrics: PAPR/CCDF, EVM, Welch PSD (obs.waveform).

Validation: closed-form identities (constant-envelope PAPR, Parseval,
EVM^2 = noise_var on an AWGN link) plus the classic OFDM CCDF
approximation as a statistical anchor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdr_tpu.core.config import Modulation
from sdr_tpu.obs.waveform import (
    evm_rms,
    papr_ccdf,
    papr_ccdf_theory,
    papr_db,
    psd_welch,
)
from sdr_tpu.ops.modulation import modulate
from sdr_tpu.ops.ofdm import ofdm_tx


def _cgauss(key, shape):
    kr, ki = jax.random.split(key)
    return jax.lax.complex(
        jax.random.normal(kr, shape), jax.random.normal(ki, shape)
    ) * jnp.float32(2.0 ** -0.5)


def test_papr_constant_envelope_is_zero_db():
    ph = jnp.linspace(0.0, 6.0, 128)
    x = jnp.exp(jax.lax.complex(jnp.zeros_like(ph), ph))
    assert abs(float(papr_db(x))) < 1e-5


def test_papr_known_value():
    # One sample at amplitude 3, seven at 1: peak 9, mean 16/8=2.
    x = jnp.asarray([3.0, 1, 1, 1, 1, 1, 1, 1], jnp.complex64)
    np.testing.assert_allclose(
        float(papr_db(x)), 10 * np.log10(9.0 / 2.0), rtol=1e-6
    )


def test_ofdm_papr_ccdf_matches_gaussian_theory():
    """Random-QPSK OFDM time samples are near-Gaussian: the measured
    CCDF tracks 1-(1-e^-x)^N within a factor ~2 in the 1e-2 region."""
    n_fft, n_sym = 256, 4096
    bits = jax.random.bernoulli(
        jax.random.PRNGKey(0), 0.5, (n_sym, n_fft * 2)
    ).astype(jnp.int8)
    tx = ofdm_tx(modulate(bits, Modulation.QPSK), cp_len=0)  # (n_sym, n_fft)
    p = papr_db(tx)
    grid = jnp.asarray([6.0, 8.0])
    meas = np.asarray(papr_ccdf(p, grid))
    theo = papr_ccdf_theory(n_fft)(np.asarray(grid))
    assert np.all(meas < 1.0) and np.all(meas > 0.0)
    np.testing.assert_allclose(meas, theo, rtol=0.6)
    # CCDF is non-increasing on the grid.
    assert meas[1] <= meas[0]


def test_evm_equals_sqrt_noise_var():
    key = jax.random.PRNGKey(1)
    kx, kn = jax.random.split(key)
    bits = jax.random.bernoulli(kx, 0.5, (1 << 18,)).astype(jnp.int8)
    x = modulate(bits, Modulation.QAM16)
    nv = 0.02
    rx = x + _cgauss(kn, x.shape) * jnp.float32(nv ** 0.5)
    evm_aided = float(evm_rms(rx, Modulation.QAM16, ref_points=x))
    np.testing.assert_allclose(evm_aided, nv ** 0.5, rtol=0.02)
    # Blind EVM matches aided at this SNR (decisions essentially all
    # correct at nv=0.02 for 16-QAM).
    evm_blind = float(evm_rms(rx, Modulation.QAM16))
    np.testing.assert_allclose(evm_blind, evm_aided, rtol=0.05)


def test_psd_parseval():
    x = _cgauss(jax.random.PRNGKey(2), (1 << 14,))
    psd = psd_welch(x, nperseg=256, overlap=128)
    np.testing.assert_allclose(
        float(jnp.mean(psd)),
        float(jnp.mean(jnp.abs(x) ** 2)),
        rtol=0.05,
    )


def test_psd_ofdm_band_shape():
    """Half-band-loaded OFDM: in-band PSD is flat and out-of-band is
    >= 15 dB down (Hann-windowed Welch leakage floor)."""
    n_fft, n_sym = 256, 512
    key = jax.random.PRNGKey(3)
    grid = jnp.zeros((n_sym, n_fft), jnp.complex64)
    loaded = _cgauss(key, (n_sym, n_fft // 2))
    grid = grid.at[:, : n_fft // 2].set(loaded)  # bins 0..127 loaded
    tx = ofdm_tx(grid, cp_len=16).reshape(-1)
    psd = np.asarray(psd_welch(tx, nperseg=n_fft, overlap=n_fft // 2))
    # fftshifted: loaded bins 0..127 sit in the upper half [128:256).
    inband = psd[129:255].mean()
    outband = psd[1:120].mean()
    assert inband / outband > 10 ** 1.5, (inband, outband)
    # Flatness: in-band variation within a few dB.
    assert psd[140:240].max() / psd[140:240].min() < 4.0


def test_psd_rejects_bad_segmenting():
    x = _cgauss(jax.random.PRNGKey(4), (64,))
    with pytest.raises(ValueError):
        psd_welch(x, nperseg=128, overlap=64)
    with pytest.raises(ValueError):
        psd_welch(x, nperseg=32, overlap=32)
