"""Link adaptation: calibrated MCS thresholds and per-channel selection.

The reference transmits one fixed 16-QAM waveform forever
(modulation.hpp:80 hard-constrains the roster to e16QAM); a deployable
link picks its modulation-and-coding scheme (MCS) from the channel
quality. This module provides the standard machinery:

- an MCS ladder (modulation x convolutional rate, ordered by spectral
  efficiency in info bits / subcarrier use);
- ``calibrate``: measure each rung's coded-BER waterfall on the real
  simulator (the same `link.coded` chain the data uses — no
  hand-tuned magic numbers) and extract the lowest Es/N0 meeting a
  target info-BER;
- ``select_mcs``: the classic greedy rule — the highest-efficiency
  rung whose calibrated threshold clears the reported SNR (with a
  configurable backoff margin);
- ``simulate_adaptive``: per-channel SNR profile -> per-channel MCS ->
  coded links grouped by rung (one jitted program per distinct MCS —
  shapes stay static) -> delivered info bits and measured BER.

SNR convention: Es/N0 per subcarrier use in dB (modulation-independent,
unlike Eb/N0): esno_db = ebno_db + 10·log10(bits_per_symbol · rate).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax

from sdr_tpu.core.config import LinkConfig, Modulation


#: The default ladder: efficiency-ordered (mod, conv rate) rungs.
DEFAULT_LADDER: tuple = (
    (Modulation.BPSK, "1/2"),
    (Modulation.QPSK, "1/2"),
    (Modulation.QPSK, "3/4"),
    (Modulation.QAM16, "1/2"),
    (Modulation.QAM16, "3/4"),
    (Modulation.QAM64, "2/3"),
    (Modulation.QAM64, "3/4"),
)


def efficiency(mod: Modulation, rate: str) -> float:
    """Info bits per subcarrier use."""
    return mod.bits_per_symbol * int(rate[0]) / int(rate[2])


def esno_from_ebno(ebno_db: float, mod: Modulation, rate: str) -> float:
    return ebno_db + 10.0 * math.log10(efficiency(mod, rate))


def ebno_from_esno(esno_db: float, mod: Modulation, rate: str) -> float:
    return esno_db - 10.0 * math.log10(efficiency(mod, rate))


@dataclasses.dataclass(frozen=True)
class MCSThreshold:
    modulation: Modulation
    rate: str
    efficiency: float
    esno_db: float  # lowest calibrated Es/N0 meeting the target
    measured_ber: float  # info-BER measured AT the threshold point


def calibrate(
    base: LinkConfig,
    key: jax.Array,
    target_ber: float = 1e-4,
    esno_grid=None,
    ladder=DEFAULT_LADDER,
) -> list:
    """Measure each rung's waterfall and extract its Es/N0 threshold.

    base: numerology/channel template (its modulation and ebno are
    overridden per point). Rungs that never meet the target on the
    grid are omitted — selection then simply cannot pick them.
    Returns MCSThreshold list in ladder order.
    """
    from sdr_tpu.link.coded import make_coded_fn

    if esno_grid is None:
        esno_grid = np.arange(-2.0, 26.0, 2.0)
    out = []
    for mod, rate in ladder:
        found = None
        for esno in esno_grid:
            cfg = dataclasses.replace(
                base,
                modulation=mod,
                channel=dataclasses.replace(
                    base.channel,
                    ebno_db=float(ebno_from_esno(float(esno), mod, rate)),
                ),
            )
            errors, counted = make_coded_fn(cfg, rate=rate)(key)
            ber = float(errors.sum()) / float(counted.sum())
            if ber <= target_ber:
                found = MCSThreshold(
                    mod, rate, efficiency(mod, rate), float(esno), ber
                )
                break
        if found is not None:
            out.append(found)
    return out


def select_mcs(esno_db: float, table: list, margin_db: float = 0.0):
    """Highest-efficiency rung whose threshold clears esno - margin.

    Returns an MCSThreshold, or None when even the most robust rung
    doesn't fit (the link should stay silent / repeat-request)."""
    best = None
    for t in table:
        if t.esno_db <= esno_db - margin_db:
            if best is None or t.efficiency > best.efficiency:
                best = t
    return best


def simulate_adaptive(
    base: LinkConfig,
    key: jax.Array,
    esno_profile_db,
    table: list,
    margin_db: float = 0.0,
    snr_quantum_db: float = 1.0,
):
    """Adaptive coded link over a per-channel SNR profile.

    esno_profile_db: (n_channels,) per-link SNRs (e.g. a shadowing
    draw), QUANTIZED to ``snr_quantum_db`` before simulation — Eb/N0
    is a jit-static config field, so each distinct (rung, SNR-bin)
    pair compiles once; quantization bounds the compile count for a
    continuous profile (selection itself uses the unquantized values).
    Channels with no feasible rung transmit nothing.

    Returns a dict: per-channel selected efficiency (0 = silent),
    total info bits delivered, total bit errors, and the aggregate
    spectral efficiency actually achieved (delivered-correct info bits
    per subcarrier use, counting silent channels' wasted uses).
    """
    from sdr_tpu.link.coded import make_coded_fn

    esno = np.asarray(esno_profile_db, np.float64)
    n_ch = esno.shape[0]
    picks = [select_mcs(float(e), table, margin_db) for e in esno]
    eff = np.array([0.0 if p is None else p.efficiency for p in picks])
    errors = np.zeros(n_ch, np.int64)
    counted = np.zeros(n_ch, np.int64)
    esno_q = np.round(esno / snr_quantum_db) * snr_quantum_db
    for t in {id(p): p for p in picks if p is not None}.values():
        idxs = np.nonzero(np.array([p is t for p in picks]))[0]
        for e_val in np.unique(esno_q[idxs]):
            sub = idxs[esno_q[idxs] == e_val]
            c = dataclasses.replace(
                base,
                modulation=t.modulation,
                n_channels=int(sub.size),
                channel=dataclasses.replace(
                    base.channel,
                    ebno_db=float(ebno_from_esno(float(e_val), t.modulation, t.rate)),
                ),
            )
            err, cnt = make_coded_fn(c, rate=t.rate)(
                jax.random.fold_in(key, int(sub[0]))
            )
            errors[sub] = np.asarray(err)
            counted[sub] = np.asarray(cnt)
    uses = base.n_symbols * base.ofdm.n_fft  # subcarrier uses per frame
    delivered = counted - errors
    return {
        "efficiency_per_channel": eff,
        "bit_errors": errors,
        "info_bits": counted,
        "achieved_efficiency": float(delivered.sum()) / float(uses * n_ch),
        "silent_channels": int((eff == 0).sum()),
    }
