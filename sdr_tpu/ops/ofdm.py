"""OFDM modulation/demodulation with the reference's exact CP layout.

Contract (from /root/reference/lib/inc/ofdm.hpp):

- ``ofdm_tx``: input = frequency-domain loading of one OFDM symbol
  (N subcarriers = last-axis length). Output = cp_len + N time samples
  where samples[cp_len:] = ifft(input) and samples[:cp_len] is a copy
  of the LAST cp_len time-domain samples (ofdm.hpp:14-24: resize, copy
  after a cp gap, in-place ifft2, copy tail to head).
- ``ofdm_rx``: drop the first cp_len samples, forward-FFT the rest
  (ofdm.hpp:37-43). No equalization/sync — those are separate ops
  (sdr_tpu.ops.equalize), since the reference has none.

All ops are batched: arbitrary leading dims, last axis = subcarriers or
samples; a (..., n_symbols, n_fft) array processes whole frames in one
fused program.
"""

from __future__ import annotations

import jax.numpy as jnp

from sdr_tpu.ops.fft import Backend, fft as _fft_op, ifft as _ifft_op


def cp_insert(time_symbols: jnp.ndarray, cp_len: int) -> jnp.ndarray:
    """Prefix each time-domain symbol with its own last cp_len samples.

    (..., n_fft) → (..., cp_len + n_fft); mirrors ofdm.hpp:21.
    """
    if cp_len == 0:
        return time_symbols
    n = time_symbols.shape[-1]
    if not 0 < cp_len <= n:
        raise ValueError(f"cp_len {cp_len} out of range for symbol length {n}")
    return jnp.concatenate([time_symbols[..., n - cp_len :], time_symbols], axis=-1)


def cp_remove(samples: jnp.ndarray, cp_len: int) -> jnp.ndarray:
    """Strip the cyclic prefix: (..., cp+N) → (..., N); ofdm.hpp:41."""
    if cp_len == 0:
        return samples
    return samples[..., cp_len:]


def ofdm_tx(
    freq_symbols: jnp.ndarray, cp_len: int, backend: Backend | None = None
) -> jnp.ndarray:
    """Frequency-domain subcarriers → CP-prefixed time samples.

    Batched ``ofdm::tx`` (ofdm.hpp:13-35): IFFT (1/N-scaled) then CP.
    """
    return cp_insert(_ifft_op(freq_symbols, backend=backend), cp_len)


def ofdm_rx(
    samples: jnp.ndarray, cp_len: int, backend: Backend | None = None
) -> jnp.ndarray:
    """CP-prefixed time samples → frequency-domain subcarriers.

    Batched ``ofdm::rx`` (ofdm.hpp:37-54): strip CP, unscaled FFT.
    """
    return _fft_op(cp_remove(samples, cp_len), backend=backend)
