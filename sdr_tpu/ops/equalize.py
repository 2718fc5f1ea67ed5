"""One-tap frequency-domain equalizers.

Absent from the reference (its RX is a pure noiseless loopback inverse,
ofdm.hpp:37-54); required once fading channels exist. Operate on
post-FFT subcarrier observations Y with per-subcarrier response H.

Both return (equalized_symbols, effective_noise_var) so the soft
demapper can scale LLRs correctly per subcarrier:

- ZF:    s_hat = Y/H,              var = noise_var / |H|^2
- MMSE:  s_hat = conj(H) Y / (|H|^2 + noise_var), with the standard
         unbiased post-MMSE effective noise variance.
"""

from __future__ import annotations

import jax.numpy as jnp


def equalize_zf(y: jnp.ndarray, h: jnp.ndarray, noise_var):
    h2 = jnp.real(h) ** 2 + jnp.imag(h) ** 2
    eps = jnp.float32(1e-12)
    s = y * jnp.conj(h) / (h2 + eps)
    eff_var = jnp.asarray(noise_var, jnp.float32) / (h2 + eps)
    return s, eff_var


def equalize_mmse(y: jnp.ndarray, h: jnp.ndarray, noise_var):
    nv = jnp.asarray(noise_var, jnp.float32)
    h2 = jnp.real(h) ** 2 + jnp.imag(h) ** 2
    g = jnp.conj(h) / (h2 + nv)
    s_biased = g * y
    # Unbias: E[s_biased | s] = (h2/(h2+nv)) s ; divide by that gain.
    bias = h2 / (h2 + nv)
    s = s_biased / jnp.maximum(bias, 1e-12)
    # Post-equalization SINR of the unbiased MMSE estimate = h2/nv (same
    # as ZF for one tap); keep the exact effective variance formula.
    eff_var = nv / jnp.maximum(h2, 1e-12)
    return s, eff_var


def equalize_mmse_fde(y: jnp.ndarray, h: jnp.ndarray, noise_var):
    """SC-FDE MMSE receiver: per-tone biased MMSE, unitary despread,
    SYMBOL-level bias correction — the standard LTE-uplink equalizer.

    Per tone the biased MMSE weight w = conj(H)/(|H|²+nv) keeps a deep
    notch from amplifying noise (ZF's 1/|H| blows it across EVERY
    despread symbol). The despread output's useful-signal gain is the
    tone MEAN b = mean(|H|²/(|H|²+nv)) — divide once per symbol — and
    its post-despread SINR is the classic b/(1−b) (self-interference
    from per-tone bias variation plus filtered noise). Measured vs the
    ZF-FDE chain on faded SC-FDMA at 14 dB: 3× fewer bit errors, with
    notch realizations rescued outright (docs/RESULTS.md round 3).

    y, h: (..., n_syms, n_fft) post-FFT grid + response. Returns
    (s_time (..., n_syms, n_fft) complex64 despread symbol estimates,
    eff_var (..., n_syms, 1) per-symbol effective noise)."""
    nv = jnp.asarray(noise_var, jnp.float32)
    h2 = jnp.real(h) ** 2 + jnp.imag(h) ** 2
    s_f = jnp.conj(h) * y / (h2 + nv)
    g = h2 / (h2 + nv)
    bias = jnp.mean(
        jnp.broadcast_to(g, y.shape).astype(jnp.float32),
        axis=-1, keepdims=True,
    )
    bias = jnp.maximum(bias, 1e-9)
    m = y.shape[-1]
    s_t = (
        jnp.fft.ifft(s_f, axis=-1) * jnp.float32(m**0.5) / bias
    ).astype(jnp.complex64)
    sinr = bias / jnp.maximum(1.0 - bias, 1e-9)
    return s_t, 1.0 / sinr
