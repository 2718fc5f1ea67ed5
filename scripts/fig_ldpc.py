"""LDPC vs convolutional vs uncoded BER curves (QPSK/AWGN).

Produces docs/figures/ber_ldpc.png: information-bit BER of the stock
QC-LDPC family (rates 1/2, 2/3, 3/4, min-sum 25 iters) against the
rate-1/2 convolutional/Viterbi link and the uncoded exact theory, all
at the same CHANNEL-bit Eb/N0 (the chain's operating point).
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
    from sdr_tpu.link.ber import ber_awgn_exact
    from sdr_tpu.link.coded import make_coded_fn, make_ldpc_fn
    from sdr_tpu.obs.plot import plot_ber_curves

    ebnos = np.arange(-2.0, 6.5, 0.5)
    base = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(n_fft=128, cp_len=16),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=0.0),
        equalizer=Equalizer.NONE,
        n_symbols=16,
        n_channels=64,
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "figures", "ber_ldpc.png",
    )

    def sweep(make_fn, label):
        bers = []
        for e in ebnos:
            cfg = dataclasses.replace(
                base, channel=dataclasses.replace(base.channel, ebno_db=float(e))
            )
            err, cnt = make_fn(cfg)(jax.random.PRNGKey(int(e * 10)))
            ber = float(np.asarray(err).sum()) / float(np.asarray(cnt).sum())
            bers.append(ber)
            print(f"{label:14s} ebno={e:4.1f}  ber={ber:.3e}")
        return np.array(bers)

    curves = [
        ("LDPC 1/2", ebnos, sweep(lambda c: make_ldpc_fn(c, rate="1/2"), "ldpc 1/2")),
        ("LDPC 2/3", ebnos, sweep(lambda c: make_ldpc_fn(c, rate="2/3"), "ldpc 2/3")),
        ("LDPC 3/4", ebnos, sweep(lambda c: make_ldpc_fn(c, rate="3/4"), "ldpc 3/4")),
        ("conv 1/2 (Viterbi)", ebnos,
         sweep(lambda c: make_coded_fn(c, rate="1/2"), "conv 1/2")),
    ]
    theory = (
        "uncoded QPSK theory",
        ebnos,
        np.array([ber_awgn_exact(Modulation.QPSK, float(e)) for e in ebnos]),
    )
    plot_ber_curves(
        curves, out,
        title="QPSK/AWGN coded links — info-bit BER vs channel-bit Eb/N0",
        theory=theory,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
