"""Frame synchronization: Schmidl & Cox timing + carrier frequency offset.

The reference RX assumes perfect alignment — "no equalization, no sync,
no channel estimation — pure noiseless loopback" (SURVEY.md on
ofdm.hpp:37-54). Equalization and channel estimation live in
ops.equalize / ops.pilots; this module completes the receiver triad
with the classic Schmidl & Cox preamble synchronizer:

- the preamble is one OFDM symbol loaded only on EVEN subcarriers
  (PN-QPSK), so its time signal has two identical halves of length
  N/2 — a structure that survives multipath and CFO;
- the timing metric M(d) = |P(d)|² / R(d)² plateaus at the preamble,
  where P is the half-symbol autocorrelation and R the second-half
  energy. Both are sliding sums computed with cumulative sums — fully
  vectorized, no data-dependent loops;
- the fractional CFO is angle(P)/π subcarrier spacings at the timing
  point (the half-symbol delay makes the phase proportional to CFO).

All functions are batched over leading dims and jit-safe (argmax is a
reduction, not control flow).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sdr_tpu.ops.fft import ifft
from sdr_tpu.ops.ofdm import cp_insert


def schmidl_cox_preamble(n_fft: int, cp_len: int, seed: int = 0x5C) -> jnp.ndarray:
    """CP-prefixed preamble symbol with two identical time halves.

    Even subcarriers carry a deterministic PN-QPSK sequence scaled by
    sqrt(2) (unit average power over the full grid); odd subcarriers
    are zero. Returns (n_fft + cp_len,) complex64.
    """
    rng = np.random.default_rng(seed)
    quad = rng.integers(0, 4, n_fft // 2)
    pn = np.exp(1j * (np.pi / 4 + np.pi / 2 * quad)) * np.sqrt(2.0)
    grid = np.zeros(n_fft, np.complex64)
    grid[0::2] = pn.astype(np.complex64)
    time = ifft(jnp.asarray(grid))
    return cp_insert(time, cp_len)


def timing_metric(rx: jnp.ndarray, n_fft: int):
    """Schmidl & Cox (P, R, M) over candidate offsets.

    rx: (..., n) complex. Returns (P, R, M), each (..., n - n_fft):
    P(d) = Σ_{m<L} conj(r[d+m])·r[d+m+L], R(d) = Σ_{m<L} |r[d+L+m]|²,
    M = |P|²/R², with L = n_fft/2.
    """
    L = n_fft // 2
    a = jnp.conj(rx[..., :-L]) * rx[..., L:]  # (..., n-L)
    e = jnp.abs(rx[..., L:]) ** 2

    def slide(x, w):
        c = jnp.cumsum(x, axis=-1)
        lead = c[..., w - 1 :]
        lag = jnp.concatenate(
            [jnp.zeros_like(c[..., :1]), c[..., : -w]], axis=-1
        )
        return lead - lag

    P = slide(a, L)[..., : rx.shape[-1] - n_fft]
    R = slide(e, L)[..., : rx.shape[-1] - n_fft]
    # Floor the energy term against its own max: in silent stretches
    # both P and R tend to 0 and the raw ratio is noise-dominated 0/0,
    # spiking M far from any preamble.
    r_floor = 0.05 * jnp.max(R, axis=-1, keepdims=True)
    M = jnp.abs(P) ** 2 / jnp.maximum(R, r_floor) ** 2
    return P, R, M


def estimate_timing_cfo(rx: jnp.ndarray, n_fft: int):
    """(timing_index, cfo_subcarriers) from the metric peak.

    The S&C metric plateaus over the CP; the raw argmax lands anywhere
    on it, which is harmless for decoding (a CP-region offset is a pure
    per-subcarrier phase slope absorbed by the equalizer). CFO is the
    fractional offset in subcarrier spacings, range ±1.
    """
    P, _, M = timing_metric(rx, n_fft)
    d = jnp.argmax(M, axis=-1)
    p_peak = jnp.take_along_axis(P, d[..., None], axis=-1)[..., 0]
    cfo = jnp.angle(p_peak) / jnp.float32(np.pi)
    return d, cfo


def apply_cfo(samples: jnp.ndarray, cfo_subcarriers, n_fft: int) -> jnp.ndarray:
    """Impose a carrier frequency offset of ``cfo_subcarriers`` Δf."""
    n = jnp.arange(samples.shape[-1], dtype=jnp.float32)
    eps = jnp.asarray(cfo_subcarriers, jnp.float32)[..., None]
    rot = jnp.exp(1j * (2.0 * np.pi * eps * n / n_fft).astype(jnp.float32))
    return samples * rot


def correct_cfo(samples: jnp.ndarray, cfo_subcarriers, n_fft: int) -> jnp.ndarray:
    """Undo an estimated CFO (inverse rotation)."""
    return apply_cfo(samples, -jnp.asarray(cfo_subcarriers), n_fft)


def fine_timing(rx: jnp.ndarray, template: jnp.ndarray) -> jnp.ndarray:
    """Matched-filter fine timing: argmax |⟨template, rx[d:]⟩|².

    The S&C metric plateaus over the CP (coarse, ±CP ambiguity); the
    cross-correlation against the KNOWN preamble waveform peaks at the
    strongest channel tap — run it after coarse sync + CFO correction
    to pin the frame start exactly. rx: (n,), template: (m,) complex.
    Returns the int32 offset of the correlation peak.
    """
    n = rx.shape[-1]
    m = template.shape[-1]
    windows = jnp.arange(n - m + 1)[:, None] + jnp.arange(m)[None, :]
    score = jnp.abs(rx[windows] @ jnp.conj(template)) ** 2
    return jnp.argmax(score, axis=-1).astype(jnp.int32)
