"""Spatial-mux detector BER curves: ZF vs MMSE vs max-log ML, plus
estimated CSI.

Produces docs/figures/ber_mux.png: 2x2 spatial multiplexing, QPSK/64sc
over flat Rayleigh (genie CSI), comparing the three detectors in
ops.mimo, with the ML + preamble-DFT estimated-CSI curve showing the
estimation penalty. The visual signature that the joint ML detector is
right is its steeper slope: linear ZF/MMSE on a 2x2 channel is
diversity n_rx - n_tx + 1 = 1 (the SISO Rayleigh slope, overlaid as the
dashed theory reference), while ML recovers the full n_rx = 2 receive
diversity.

Run on CPU (fades are the statistical unit: many channels, few
symbols).
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
    import dataclasses

    from sdr_tpu.core.config import (
        ChannelConfig,
        ChannelEstimator,
        ChannelModel,
        Equalizer,
        LinkConfig,
        MIMOConfig,
        MIMOScheme,
        Modulation,
        OFDMConfig,
    )
    from sdr_tpu.link.ber import ber_rayleigh_exact
    from sdr_tpu.link.pipeline import make_simulate_fn

    mod = Modulation.QPSK
    ebnos = np.arange(0.0, 18.0, 2.0)
    cases = [
        ("ZF 2x2", Equalizer.ZF, MIMOConfig(MIMOScheme.SPATIAL_MUX, 2, 2)),
        ("MMSE 2x2", Equalizer.MMSE, MIMOConfig(MIMOScheme.SPATIAL_MUX, 2, 2)),
        (
            "MMSE-SIC 2x2",
            Equalizer.MMSE,
            MIMOConfig(MIMOScheme.SPATIAL_MUX, 2, 2, detector="sic"),
        ),
        (
            "ML 2x2",
            Equalizer.MMSE,
            MIMOConfig(MIMOScheme.SPATIAL_MUX, 2, 2, detector="ml"),
        ),
        (
            "ML 2x2, preamble-DFT CSI",
            Equalizer.MMSE,
            MIMOConfig(
                MIMOScheme.SPATIAL_MUX, 2, 2, csi="preamble", detector="ml"
            ),
        ),
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "figures", "ber_mux.png",
    )

    curves = []
    for name, eq, mimo in cases:
        bers = []
        for e in ebnos:
            cfg = LinkConfig(
                modulation=mod,
                ofdm=OFDMConfig(n_fft=64, cp_len=16),
                channel=ChannelConfig(
                    model=ChannelModel.RAYLEIGH_FLAT, ebno_db=float(e)
                ),
                equalizer=eq,
                estimator=ChannelEstimator.DFT,
                n_symbols=4,
                n_channels=8192,
                mimo=mimo,
            )
            r = make_simulate_fn(cfg)(jax.random.PRNGKey(int(e * 10 + 3)))
            ber = float(np.asarray(r.bit_errors).sum()) / float(
                np.asarray(r.bits_counted).sum()
            )
            bers.append(ber)
            print(f"{name:24s} ebno={e:4.1f}  ber={ber:.3e}")
        curves.append((f"{name} measured", ebnos, np.array(bers)))

    theory = (
        "SISO Rayleigh exact (diversity-1 slope)",
        ebnos,
        np.array([ber_rayleigh_exact(mod, float(e)) for e in ebnos]),
    )
    from sdr_tpu.obs.plot import plot_ber_curves

    plot_ber_curves(
        curves, out,
        title="QPSK/64sc 2x2 spatial mux — ZF / MMSE / SIC / max-log ML",
        theory=theory,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
