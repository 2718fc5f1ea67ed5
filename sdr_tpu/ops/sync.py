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


def _pn_qpsk(rng, n: int) -> np.ndarray:
    quad = rng.integers(0, 4, n)
    return np.exp(1j * (np.pi / 4 + np.pi / 2 * quad))


def _preamble_grids(n_fft: int, seed: int):
    """Frequency grids of the two S&C preamble symbols.

    Symbol 1: PN-QPSK·√2 on EVEN subcarriers only (two identical time
    halves — the plateau/frac-CFO symbol). Symbol 2: independent
    PN-QPSK on ALL subcarriers (breaks the half symmetry so the plateau
    stays on symbol 1; its even bins differentially encode v[k] =
    X2[2k]/X1[2k], the integer-CFO key)."""
    rng = np.random.default_rng(seed)
    g1 = np.zeros(n_fft, np.complex64)
    g1[0::2] = (_pn_qpsk(rng, n_fft // 2) * np.sqrt(2.0)).astype(np.complex64)
    g2 = _pn_qpsk(rng, n_fft).astype(np.complex64)
    return g1, g2


def schmidl_cox_preamble(n_fft: int, cp_len: int, seed: int = 0x5C) -> jnp.ndarray:
    """CP-prefixed preamble symbol with two identical time halves.

    Even subcarriers carry a deterministic PN-QPSK sequence scaled by
    sqrt(2) (unit average power over the full grid); odd subcarriers
    are zero. Returns (n_fft + cp_len,) complex64.
    """
    g1, _ = _preamble_grids(n_fft, seed)
    time = ifft(jnp.asarray(g1))
    return cp_insert(time, cp_len)


def acquisition_preamble(n_fft: int, cp_len: int, seed: int = 0x5C) -> jnp.ndarray:
    """Two-symbol S&C preamble (2·(n_fft+cp_len) samples).

    Symbol 1 gives coarse timing + fractional CFO (±1 subcarrier);
    symbol 2's differential even-bin PN disambiguates the residual
    EVEN integer offset (estimate_integer_cfo) — together any CFO in
    ±(2·max_shift+1) subcarriers is acquirable.
    """
    g1, g2 = _preamble_grids(n_fft, seed)
    return jnp.concatenate(
        [
            cp_insert(ifft(jnp.asarray(g1)), cp_len),
            cp_insert(ifft(jnp.asarray(g2)), cp_len),
        ]
    )


def timing_metric(rx: jnp.ndarray, n_fft: int):
    """Schmidl & Cox (P, R, M) over candidate offsets, with the
    symmetric energy normalization (Minn's modification).

    rx: (..., n) complex. Returns (P, R, M), each (..., n - n_fft):
    P(d) = Σ_{m<L} conj(r[d+m])·r[d+m+L],
    R(d) = (E1(d) + E2(d))/2 with E_i the two half-window energies,
    M = |P|²/(R+δ)², L = n_fft/2.

    Why this normalization: Cauchy–Schwarz gives |P| ≤ √(E1·E2) ≤ R,
    so M ≤ 1 EVERYWHERE — including burst edges, where the original
    second-half-only R collapses while P still carries half-window
    signal (observed: M = 1.4 spikes one symbol past a burst's end,
    beating the true plateau at M ≈ 1). The small regularizer
    δ = 0.05·mean(R) zeroes pure-silence 0/0 windows without the hard
    max-relative floor that would also zero a preamble sitting in a
    deep time-selective fade (the ratio metric itself is
    gain-invariant, so faded preambles keep M ≈ 1 as long as they
    clear δ).
    """
    L = n_fft // 2
    a = jnp.conj(rx[..., :-L]) * rx[..., L:]  # (..., n-L)
    p2 = jnp.abs(rx) ** 2

    def slide(x, w):
        c = jnp.cumsum(x, axis=-1)
        lead = c[..., w - 1 :]
        lag = jnp.concatenate(
            [jnp.zeros_like(c[..., :1]), c[..., : -w]], axis=-1
        )
        return lead - lag

    n_valid = rx.shape[-1] - n_fft
    P = slide(a, L)[..., :n_valid]
    E = slide(p2, L)  # (..., n-L+1): energy of [d, d+L)
    R = 0.5 * (E[..., :n_valid] + E[..., L : L + n_valid])
    delta = 0.05 * jnp.mean(R, axis=-1, keepdims=True)
    M = jnp.abs(P) ** 2 / (R + delta) ** 2
    return P, R, M


def estimate_timing_cfo(rx: jnp.ndarray, n_fft: int):
    """(timing_index, cfo_subcarriers) from the metric peak.

    The S&C metric plateaus over the CP; the raw argmax lands anywhere
    on it, which is harmless for decoding (a CP-region offset is a pure
    per-subcarrier phase slope absorbed by the equalizer). CFO is the
    fractional offset in subcarrier spacings, range ±1.
    """
    P, _, M = timing_metric(rx, n_fft)
    d0 = jnp.argmax(M, axis=-1)
    # Center on the plateau rather than trusting the raw argmax: the
    # regularized metric can peak at the plateau's low-energy leading
    # edge, which would misalign the integer-CFO FFT windows. Average
    # the indices of near-max positions WITHIN one symbol of the
    # argmax (the local-window guard keeps a second burst's plateau
    # from dragging the centroid between bursts).
    idx = jnp.arange(M.shape[-1])
    near = (M > 0.9 * jnp.max(M, axis=-1, keepdims=True)) & (
        jnp.abs(idx - d0[..., None]) <= n_fft
    )
    # Centroid of OFFSETS from d0 (|offset| <= n_fft), not of absolute
    # indices — absolute-index sums overflow int32 on long captures.
    off = (idx - d0[..., None]) * near
    d = d0 + jnp.round(
        jnp.sum(off, axis=-1) / jnp.maximum(jnp.sum(near, axis=-1), 1)
    ).astype(d0.dtype)
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


def fine_timing(
    rx: jnp.ndarray, template: jnp.ndarray, combine_axis: int | None = None
) -> jnp.ndarray:
    """Matched-filter fine timing: argmax_d |Σ_m conj(t[m])·rx[d+m]|².

    The S&C metric plateaus over the CP (coarse, ±CP ambiguity); the
    cross-correlation against the KNOWN preamble waveform peaks at the
    strongest channel tap — run it after coarse sync + CFO correction
    to pin the frame start exactly. rx: (..., n), template: (m,)
    complex. Returns the int32 offset(s) of the correlation peak.

    Computed as an FFT cross-correlation — O(n log n) time and O(n)
    memory (an explicit (n−m+1, m) window matrix would be O(n·m),
    unusable on long streams): zero-pad both to the next power of two
    ≥ n+m so the circular correlation is linear over the valid range.
    """
    n = rx.shape[-1]
    m = template.shape[-1]
    L = 1 << (n + m - 1).bit_length()
    from sdr_tpu.ops.fft import fft as _fft

    rf = _fft(jnp.pad(rx.astype(jnp.complex64), [(0, 0)] * (rx.ndim - 1) + [(0, L - n)]))
    tf = _fft(jnp.pad(template.astype(jnp.complex64), (0, L - m)))
    corr = ifft(rf * jnp.conj(tf))  # corr[d] = Σ_m rx[d+m]·conj(t[m])
    score = jnp.abs(corr[..., : n - m + 1]) ** 2
    if combine_axis is not None:
        # Non-coherent combining across an antenna axis: per-branch
        # channel phases are unknown, so magnitudes sum.
        score = jnp.sum(score, axis=combine_axis)
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


def estimate_integer_cfo(
    y1: jnp.ndarray,
    y2: jnp.ndarray,
    n_fft: int,
    max_shift: int = 2,
    seed: int = 0x5C,
    noncoherent_axis: int | None = None,
) -> jnp.ndarray:
    """Even integer CFO from the two preamble symbols' FFT grids.

    After fractional correction the residual offset is an EVEN number
    of subcarriers (the half-symbol phase wraps with period 2Δf).
    S&C's differential metric over candidate shifts g:

        B(g) = |Σ_{k even} Y2[k+2g] · conj(Y1[k+2g]) · conj(v[k])|²

    with v[k] = X2[k]/X1[k] on even bins. The Y2·conj(Y1) product
    cancels the unknown channel phase AND any residual timing phase
    slope (same k in both factors), leaving |H|²·v alignment — so the
    metric works from COARSE timing, before fine sync. Returns the
    estimated offset in subcarriers (int32, even, in ±2·max_shift).

    ``noncoherent_axis``: antenna axis of y1/y2 to combine over — each
    antenna's inner sum is coherent (its own |H|²·v alignment), the
    per-antenna magnitudes then add (array diversity for the integer
    decision; one argmax over the combined scores).
    """
    g1, g2 = _preamble_grids(n_fft, seed)
    even = np.arange(0, n_fft, 2)
    v = (g2[even] / g1[even]).astype(np.complex64)
    vj = jnp.asarray(v)
    diff = y2 * jnp.conj(y1)  # (..., n_fft)
    scores = []
    for g in range(-max_shift, max_shift + 1):
        shifted = jnp.roll(diff, -2 * g, axis=-1)
        scores.append(
            jnp.abs(jnp.sum(shifted[..., even] * jnp.conj(vj), axis=-1)) ** 2
        )
    stacked = jnp.stack(scores, axis=-1)
    if noncoherent_axis is not None:
        stacked = jnp.sum(stacked, axis=noncoherent_axis)
    idx = jnp.argmax(stacked, axis=-1)
    return (2 * (idx - max_shift)).astype(jnp.int32)


def acquire_array(
    rx: jnp.ndarray,
    n_fft: int,
    cp_len: int,
    max_int_shift: int = 2,
    seed: int = 0x5C,
):
    """Blind acquisition from an ANTENNA ARRAY (n_rx, n) — the MIMO
    receiver's front end, with RX diversity folded into every stage.

    Combining rules follow what the channel phase does to each
    statistic: the S&C timing metric and the matched-filter correlation
    are combined NON-coherently (|·|² summed across antennas — each
    antenna's channel phase is unknown and would cancel a coherent
    sum), while the half-symbol correlation P and the integer-CFO
    differential both CANCEL the channel phase by construction
    (conj-product at equal frequency), so those sum COHERENTLY across
    antennas for the full array gain. A preamble faded on one antenna
    is caught by the others — array acquisition outage needs ALL
    branches faded at once.

    Returns (payload_start, total_cfo_subcarriers, corrected (n_rx, n)).
    """
    from sdr_tpu.ops.fft import fft as _fft

    sym_len = n_fft + cp_len
    P, _, M = timing_metric(rx, n_fft)  # (n_rx, n - n_fft)
    Mc = jnp.mean(M, axis=0)
    d0 = jnp.argmax(Mc)
    idx = jnp.arange(Mc.shape[-1])
    near = (Mc > 0.9 * jnp.max(Mc)) & (jnp.abs(idx - d0) <= n_fft)
    off = (idx - d0) * near
    d = d0 + jnp.round(
        jnp.sum(off) / jnp.maximum(jnp.sum(near), 1)
    ).astype(d0.dtype)
    # P's phase is constant over the whole plateau (it measures CFO,
    # not timing), so average across the CP-wide plateau AND the
    # antennas coherently — ~sqrt(cp) less phase noise than one sample.
    half = max(cp_len // 2, 1)
    win_p = jax.lax.dynamic_slice_in_dim(
        P, jnp.clip(d - half, 0, P.shape[-1] - cp_len), cp_len, axis=-1
    )
    p_peak = jnp.sum(win_p)
    frac = jnp.angle(p_peak) / jnp.float32(np.pi)
    rx_f = correct_cfo(rx, frac, n_fft)
    w1 = jax.lax.dynamic_slice_in_dim(rx_f, d, n_fft, axis=-1)
    w2 = jax.lax.dynamic_slice_in_dim(rx_f, d + sym_len, n_fft, axis=-1)
    mu = estimate_integer_cfo(
        _fft(w1), _fft(w2), n_fft, max_int_shift, seed,
        noncoherent_axis=0,
    )
    total = frac + mu.astype(jnp.float32)
    rx_c = correct_cfo(rx, total, n_fft)
    n = rx_c.shape[-1]
    W = min(4 * sym_len, n)
    win_start = jnp.clip(d - sym_len, 0, n - W)
    win = jax.lax.dynamic_slice_in_dim(rx_c, win_start, W, axis=-1)
    d_fine = win_start + fine_timing(
        win, acquisition_preamble(n_fft, cp_len, seed), combine_axis=0
    )
    return d_fine + 2 * sym_len, total, rx_c


def acquire(
    rx: jnp.ndarray,
    n_fft: int,
    cp_len: int,
    max_int_shift: int = 2,
    seed: int = 0x5C,
):
    """Full blind acquisition against the two-symbol preamble.

    Stages (each jit-safe, no data-dependent control flow):
    1. S&C plateau → coarse timing d, fractional CFO (±1 subcarrier);
    2. fractional correction; FFT both preamble symbols AT COARSE
       timing (the integer metric tolerates the ±CP ambiguity);
    3. differential integer-CFO estimate (even shifts, ±2·max_int_shift);
    4. full CFO correction; FFT matched-filter fine timing against the
       FULL two-symbol preamble (twice the captured energy — 3 dB of
       detection margin for preambles sitting in a fade; the residual
       CFO after correction costs <1% of the correlation magnitude
       over the doubled template).

    rx: (n,) complex stream containing ``acquisition_preamble`` +
    payload. Returns (payload_start, total_cfo_subcarriers,
    corrected_stream): payload_start indexes the first sample AFTER
    the two preamble symbols in ``corrected_stream``.

    Under TIME-SELECTIVE fading, bursts whose preamble falls in a deep
    fade (preamble SNR near 0 dB) are genuinely lost — acquisition
    outage with probability ≈ P(|g_preamble|² below the detection
    floor), e.g. ~8% at 12 dB Eb/N0. That is physics of single-shot
    burst acquisition, not an estimator defect; systems that must do
    better add preamble repetition/diversity.

    Supersedes the reference's perfect-alignment RX (ofdm.hpp:37-54):
    the reference demo never faces a delay or oscillator offset.
    """
    from sdr_tpu.ops.fft import fft as _fft

    sym_len = n_fft + cp_len
    d, frac = estimate_timing_cfo(rx, n_fft)
    rx_f = correct_cfo(rx, frac, n_fft)
    w1 = jax.lax.dynamic_slice_in_dim(rx_f, d, n_fft)
    w2 = jax.lax.dynamic_slice_in_dim(rx_f, d + sym_len, n_fft)
    mu = estimate_integer_cfo(_fft(w1), _fft(w2), n_fft, max_int_shift, seed)
    total = frac + mu.astype(jnp.float32)
    rx_c = correct_cfo(rx, total, n_fft)
    # Fine timing is WINDOWED around the coarse plateau: the CFO just
    # corrected belongs to THIS burst, and a global correlation over a
    # multi-burst capture could lock onto a stronger burst whose
    # (different) CFO is now mis-corrected — slicing garbage AND, in
    # the continuous receiver, cancelling the wrong burst after the
    # CRC failure. The window spans the coarse ±CP ambiguity plus one
    # symbol of slack on each side.
    n = rx_c.shape[-1]
    W = min(4 * sym_len, n)
    win_start = jnp.clip(d - sym_len, 0, n - W)
    win = jax.lax.dynamic_slice_in_dim(rx_c, win_start, W)
    d_fine = win_start + fine_timing(
        win, acquisition_preamble(n_fft, cp_len, seed)
    )
    return d_fine + 2 * sym_len, total, rx_c


def cp_residual_cfo(payload: jnp.ndarray, n_fft: int, cp_len: int):
    """Residual fractional CFO from cyclic-prefix correlation
    (van de Beek): unambiguous for |eps| < 0.5 subcarrier.

    payload: (..., n_symbols, n_fft + cp_len) aligned OFDM symbols
    (post-acquisition). Each CP sample equals its body copy n_fft
    samples later rotated by e^{i·2π·eps}; correlating over ALL symbols
    × cp samples averages the estimate's noise down by
    1/sqrt(n_symbols·cp_len·SNR) — a far tighter residual than the
    S&C half-symbol estimate, tight enough that downstream per-block
    phase tracking (SC-FDMA pilot symbols every p periods) never hits
    its ±π/p wrap limit. Under multipath the first delay-spread CP
    samples carry ISI; the average dilutes it (refinement, not the
    primary estimate). Returns eps in subcarriers (scalar per batch).
    """
    c = jnp.sum(
        jnp.conj(payload[..., :cp_len]) * payload[..., n_fft:],
        axis=(-2, -1),
    )
    return jnp.angle(c) / (2.0 * jnp.pi)


def correct_residual_cfo(payload: jnp.ndarray, n_fft: int, cp_len: int):
    """Estimate (cp_residual_cfo) and derotate an aligned payload's
    residual carrier offset in one step. payload: (..., n_symbols,
    n_fft + cp_len), contiguous in time. Returns the derotated payload.
    """
    sym_len = n_fft + cp_len
    eps = cp_residual_cfo(payload, n_fft, cp_len)
    n_sym = payload.shape[-2]
    t = jnp.arange(n_sym * sym_len, dtype=jnp.float32).reshape(
        n_sym, sym_len
    )
    ph = (-2.0 * jnp.pi / n_fft) * eps[..., None, None] * t
    return payload * jnp.exp(jax.lax.complex(jnp.zeros_like(ph), ph))
