"""Link-adaptation staircase: calibrated MCS thresholds vs AWGN SNR.

Produces docs/figures/mcs_staircase.png: the achieved spectral
efficiency of the adaptive coded link swept over Es/N0, overlaid with
each rung's calibrated threshold (vertical step positions) and the
per-rung measured info-BER at threshold. The visual signature that
adaptation works is the monotone staircase hugging the ladder's
efficiency ceiling while the aggregate BER stays at/below the
calibration target at every point.

Run on CPU.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    from sdr_tpu.core.config import (
        ChannelConfig,
        ChannelModel,
        Equalizer,
        LinkConfig,
        Modulation,
        OFDMConfig,
    )
    from sdr_tpu.link.adapt import calibrate, simulate_adaptive

    base = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(n_fft=128, cp_len=16),  # 4096-bit QPSK frame:
        # fits one LDPC codeword, so the MIXED-family ladder's block
        # rungs calibrate instead of dropping out.
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=10.0),
        equalizer=Equalizer.NONE,
        n_symbols=16,
        n_channels=16,
    )
    key = jax.random.PRNGKey(0)
    table = calibrate(base, key, target_ber=1e-3)
    for t in table:
        print(f"{t.modulation.value:6s} {t.family:5s} r={t.rate}  "
              f"eff={t.efficiency:.2f}  "
              f"thr={t.esno_db:+.1f} dB  ber@thr={t.measured_ber:.2e}")

    snrs = np.arange(-4.0, 26.0, 1.0)
    effs, bers = [], []
    for s in snrs:
        res = simulate_adaptive(base, key, np.full(16, float(s)), table)
        effs.append(res["achieved_efficiency"])
        e, n = res["bit_errors"].sum(), max(int(res["info_bits"].sum()), 1)
        bers.append(e / n)
        print(f"esno={s:+5.1f}  eff={effs[-1]:.3f}  ber={bers[-1]:.2e}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sdr_tpu.obs.plot import _GRID, _INK, _MUTED, _SERIES

    fig, ax = plt.subplots(figsize=(7, 4.6), dpi=150)
    fig.patch.set_facecolor("white")
    ax.set_facecolor("white")
    # Ladder ceiling: efficiency of the best feasible rung.
    ceil = [
        max([t.efficiency for t in table if t.esno_db <= s], default=0.0)
        for s in snrs
    ]
    ax.step(snrs, ceil, where="post", ls="--", lw=1.6, color=_MUTED,
            label="calibrated ladder ceiling", zorder=2)
    ax.plot(snrs, effs, marker="o", ms=4.5, lw=2.0, color=_SERIES[0],
            label="adaptive link, delivered-correct bits", zorder=3)
    for t in table:
        ax.axvline(t.esno_db, color=_GRID, lw=0.8, zorder=1)
        ax.annotate(
            f"{t.modulation.value} {t.family} {t.rate}",
            (t.esno_db, t.efficiency), fontsize=6.5, color=_MUTED,
            xytext=(2, 4), textcoords="offset points",
        )
    ax.set_xlabel("Es/N0 [dB]", color=_INK)
    ax.set_ylabel("spectral efficiency [info bits / subcarrier use]",
                  color=_INK)
    ax.set_title("Adaptive MCS over AWGN — calibrated staircase",
                 color=_INK, fontsize=11, loc="left")
    ax.grid(True, which="major", color=_GRID, lw=0.8, zorder=0)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(_MUTED)
    ax.tick_params(colors=_MUTED, labelsize=9)
    ax.legend(frameon=False, fontsize=9, labelcolor=_INK, loc="upper left")
    fig.tight_layout()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "figures", "mcs_staircase.png",
    )
    fig.savefig(out, facecolor="white")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
