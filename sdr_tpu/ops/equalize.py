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
