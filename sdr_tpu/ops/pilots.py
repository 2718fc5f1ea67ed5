"""Comb pilots and LS channel estimation.

Neither the reference (pure noiseless loopback, no channel — ofdm.hpp)
nor perfect-CSI simulation needs this; a deployable receiver does. The
scheme is the standard OFDM comb: every ``spacing``-th subcarrier
carries a known pilot point; the receiver least-squares-estimates the
channel at the pilots (averaging over the frame's symbols — block
fading) and linearly interpolates across subcarriers.

All index/weight tables are computed at trace time from the static
(n_fft, spacing), so the estimator is a gather + lerp — fully batched,
jit/vmap/shard-safe.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Unit-power pilot point (45° QPSK corner) — known at both ends.
PILOT_VALUE = complex(2 ** -0.5, 2 ** -0.5)


@functools.lru_cache(maxsize=None)
def pilot_indices(n_fft: int, spacing: int) -> tuple:
    """Static comb indices 0, spacing, 2·spacing, ... (< n_fft)."""
    if spacing < 2:
        raise ValueError(f"pilot spacing must be >= 2, got {spacing}")
    return tuple(range(0, n_fft, spacing))


@functools.lru_cache(maxsize=None)
def data_indices(n_fft: int, spacing: int) -> tuple:
    pil = set(pilot_indices(n_fft, spacing))
    return tuple(k for k in range(n_fft) if k not in pil)


def n_data_subcarriers(n_fft: int, spacing: int) -> int:
    return len(data_indices(n_fft, spacing))


@functools.lru_cache(maxsize=None)
def _interp_tables(n_fft: int, spacing: int):
    """(left_idx, right_idx, weight) per subcarrier for pilot lerp."""
    pil = np.asarray(pilot_indices(n_fft, spacing))
    k = np.arange(n_fft)
    left = np.clip((k // spacing), 0, len(pil) - 1)
    right = np.clip(left + 1, 0, len(pil) - 1)
    denom = np.maximum(pil[right] - pil[left], 1)
    w = np.clip((k - pil[left]) / denom, 0.0, 1.0)
    return left.astype(np.int32), right.astype(np.int32), w.astype(np.float32)


def insert_pilots(
    data_points: jnp.ndarray, n_fft: int, spacing: int
) -> jnp.ndarray:
    """Data points (..., n_data) → full grid (..., n_fft) with pilots."""
    didx = jnp.asarray(data_indices(n_fft, spacing), jnp.int32)
    pidx = jnp.asarray(pilot_indices(n_fft, spacing), jnp.int32)
    grid = jnp.zeros(data_points.shape[:-1] + (n_fft,), data_points.dtype)
    grid = grid.at[..., didx].set(data_points)
    return grid.at[..., pidx].set(jnp.asarray(PILOT_VALUE, data_points.dtype))


def extract_data(grid: jnp.ndarray, spacing: int) -> jnp.ndarray:
    """Full grid (..., n_fft) → data subcarriers (..., n_data)."""
    n_fft = grid.shape[-1]
    return grid[..., jnp.asarray(data_indices(n_fft, spacing), jnp.int32)]


def estimate_ls_comb_tracked(y: jnp.ndarray, spacing: int) -> jnp.ndarray:
    """Frame-averaged LS estimate + per-symbol common-phase tracking.

    The receiver for residual carrier offset: after blind acquisition a
    leftover CFO of ~1e-2 subcarriers rotates every subcarrier by the
    same phase, a little more each symbol. Estimating per symbol
    (``per_symbol=True``) tracks it but forfeits the frame's noise
    averaging; this estimator keeps both:

    1. differential phase between consecutive symbols' pilot vectors
       Δφ_s = angle(Σ_p y_{s+1}[p]·conj(y_s[p])) — the channel cancels
       in the product, so no estimate is needed yet;
    2. cumulative phase track φ_s = Σ_{u<s} Δφ_u; derotate the grid;
    3. frame-averaged LS on the derotated grid (full noise averaging);
    4. re-apply e^{iφ_s} → per-symbol h (..., n_syms, n_fft).

    Assumes the channel is static over the frame up to the common
    rotation (frame-static models + front-end CFO); use
    ``per_symbol=True`` for genuinely time-varying fading.
    """
    pidx = jnp.asarray(pilot_indices(y.shape[-1], spacing), jnp.int32)
    yp = y[..., pidx]  # (..., n_syms, n_pilots)
    d = jnp.sum(yp[..., 1:, :] * jnp.conj(yp[..., :-1, :]), axis=-1)
    dphi = jnp.angle(d)  # (..., n_syms-1)
    phi = jnp.concatenate(
        [jnp.zeros_like(dphi[..., :1]), jnp.cumsum(dphi, axis=-1)], axis=-1
    )  # (..., n_syms)
    rot = jnp.exp(jax.lax.complex(jnp.zeros_like(phi), -phi))[..., None]
    h_avg = estimate_ls_comb(y * rot, spacing)  # (..., 1, n_fft)
    return h_avg * jnp.conj(rot)


def estimate_ls_comb(
    y: jnp.ndarray, spacing: int, per_symbol: bool = False
) -> jnp.ndarray:
    """LS channel estimate from comb pilots with linear interpolation.

    y: post-FFT grid (..., n_syms, n_fft). Pilot observations are
    averaged over the symbol axis (block fading — the frame-static
    channel models) unless ``per_symbol``, in which case each OFDM
    symbol keeps its own estimate (required for time-varying fading:
    averaging a Doppler channel over the frame decorrelates the
    estimate — link.pipeline passes per_symbol for RAYLEIGH_TIME).
    Estimates are divided by the known pilot, then lerped across
    subcarriers. Returns h (..., 1, n_fft) or (..., n_syms, n_fft).
    """
    n_fft = y.shape[-1]
    pidx = jnp.asarray(pilot_indices(n_fft, spacing), jnp.int32)
    if per_symbol:
        y_p = y[..., pidx]  # (..., n_syms, n_pil)
    else:
        y_p = jnp.mean(y[..., pidx], axis=-2, keepdims=True)  # (..., 1, n_pil)
    h_p = y_p / jnp.asarray(PILOT_VALUE, y.dtype)
    left, right, w = _interp_tables(n_fft, spacing)
    wl = jnp.asarray(1.0 - w)
    wr = jnp.asarray(w)
    return h_p[..., jnp.asarray(left)] * wl + h_p[..., jnp.asarray(right)] * wr
