"""SC-FDMA over frequency-selective fading: receiver comparison.

Produces docs/figures/ber_scfdma.png: QPSK over two-tap multipath with
estimated CSI —

- CP-OFDM with comb pilots (per-tone MMSE),
- SC-FDMA with block ZC pilots and the ZF-FDE receiver (tone-mean
  noise despread),
- SC-FDMA with the MMSE-FDE receiver (biased per-tone weight +
  symbol-level bias correction, ops.equalize.equalize_mmse_fde).

The visual story: ZF-FDE pays a notch's noise enhancement on EVERY
despread symbol and sits above OFDM; MMSE-FDE caps the enhancement and
pulls SC-FDMA under the OFDM curve across the sweep (the round-3
receiver upgrade, docs/RESULTS.md).
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
        ChannelModel,
        Equalizer,
        LinkConfig,
        Modulation,
        OFDMConfig,
    )
    from sdr_tpu.link.pipeline import make_simulate_fn
    from sdr_tpu.obs.plot import plot_ber_curves

    ebnos = np.arange(4.0, 22.0, 2.0)
    base = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(n_fft=128, cp_len=16),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH, ebno_db=10.0, pdp=(1.0, 0.3)
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=8,
        n_symbols=32,
        n_channels=128,
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "figures", "ber_scfdma.png",
    )

    def sweep(cfg0, label):
        bers = []
        for e in ebnos:
            cfg = dataclasses.replace(
                cfg0,
                channel=dataclasses.replace(cfg0.channel, ebno_db=float(e)),
            )
            r = make_simulate_fn(cfg)(jax.random.PRNGKey(int(e)))
            ber = float(np.asarray(r.bit_errors).sum()) / float(
                np.asarray(r.bits_counted).sum()
            )
            bers.append(max(ber, 1e-7))
            print(f"{label:22s} ebno={e:4.1f}  ber={ber:.3e}")
        return np.array(bers)

    ofdm = base
    sc_zf = dataclasses.replace(base, dft_spread=True,
                                equalizer=Equalizer.ZF)
    sc_mmse = dataclasses.replace(base, dft_spread=True)
    curves = [
        ("CP-OFDM, comb pilots (MMSE)", ebnos, sweep(ofdm, "ofdm")),
        ("SC-FDMA, ZF-FDE", ebnos, sweep(sc_zf, "scfdma zf")),
        ("SC-FDMA, MMSE-FDE (bias-corrected)", ebnos,
         sweep(sc_mmse, "scfdma mmse")),
    ]
    plot_ber_curves(
        curves, out,
        title="SC-FDMA receivers over 2-tap multipath, estimated CSI "
        "— QPSK",
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
