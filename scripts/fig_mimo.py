"""MIMO diversity BER curves (measured vs exact MGF theory).

Produces docs/figures/ber_mimo.png: QPSK/64sc over flat Rayleigh for
SISO, receive MRC 1x2, Alamouti 2x1 and Alamouti 2x2 (ops.mimo) swept
over Eb/N0 on the pipeline link, with the exact diversity theory
(link.ber.ber_mrc_exact / ber_alamouti_exact) printed per point and the
Alamouti 2x2 curve overlaid as the dashed reference. The widening gap
per added diversity branch (slope -L per decade) is the visual
signature that the combiners are right.

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
    from sdr_tpu.core.config import (
        ChannelConfig,
        ChannelModel,
        Equalizer,
        LinkConfig,
        MIMOConfig,
        MIMOScheme,
        Modulation,
        OFDMConfig,
    )
    from sdr_tpu.link.ber import (
        ber_alamouti_exact,
        ber_mrc_exact,
        ber_rayleigh_exact,
    )
    from sdr_tpu.link.pipeline import make_simulate_fn

    mod = Modulation.QPSK
    ebnos = np.arange(0.0, 18.0, 2.0)
    cases = [
        ("SISO", None, lambda e: ber_rayleigh_exact(mod, e)),
        (
            "MRC 1x2",
            MIMOConfig(MIMOScheme.MRC, 1, 2),
            lambda e: ber_mrc_exact(mod, e, 2),
        ),
        (
            "Alamouti 2x1",
            MIMOConfig(MIMOScheme.ALAMOUTI, 2, 1),
            lambda e: ber_alamouti_exact(mod, e, 1),
        ),
        (
            "Alamouti 2x2",
            MIMOConfig(MIMOScheme.ALAMOUTI, 2, 2),
            lambda e: ber_alamouti_exact(mod, e, 2),
        ),
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "figures", "ber_mimo.png",
    )

    curves = []
    for name, mimo, th_fn in cases:
        bers = []
        for e in ebnos:
            cfg = LinkConfig(
                modulation=mod,
                ofdm=OFDMConfig(n_fft=64, cp_len=16),
                channel=ChannelConfig(
                    model=ChannelModel.RAYLEIGH_FLAT, ebno_db=float(e)
                ),
                equalizer=Equalizer.MMSE,
                n_symbols=4,
                n_channels=8192,
            )
            if mimo is not None:
                import dataclasses

                cfg = dataclasses.replace(cfg, mimo=mimo)
            r = make_simulate_fn(cfg)(jax.random.PRNGKey(int(e * 10 + 7)))
            ber = float(np.asarray(r.bit_errors).sum()) / float(
                np.asarray(r.bits_counted).sum()
            )
            bers.append(ber)
            print(f"{name:13s} ebno={e:4.1f}  ber={ber:.3e}  "
                  f"theory={th_fn(float(e)):.3e}")
        curves.append((f"{name} measured", ebnos, np.array(bers)))

    theory = (
        "Alamouti 2x2 exact theory",
        ebnos,
        np.array([ber_alamouti_exact(mod, float(e), 2) for e in ebnos]),
    )
    plot_curves(curves, out, theory)
    print(f"wrote {out}")


def plot_curves(curves, out, theory) -> None:
    from sdr_tpu.obs.plot import plot_ber_curves

    plot_ber_curves(
        curves, out,
        title="QPSK/64sc flat Rayleigh — MIMO diversity vs exact theory",
        theory=theory,
    )


if __name__ == "__main__":
    main()
