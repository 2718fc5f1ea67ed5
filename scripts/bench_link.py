"""Chained end-to-end link-simulation benchmark: fast engine vs MC kernel.

Times the full Monte-Carlo SIMULATION (bits → TX → channel → noise →
demod → count), not just the receive chain — the number that governs
how fast BER sweeps converge. Two engines:

  SDR_BENCH_ENGINE=fast   link.fast (fused TX/count kernels + XLA
                          channel + threefry noise between them)
  SDR_BENCH_ENGINE=mc     kernels/mc_pallas via link.mc (everything in
                          one kernel, hardware PRNG, zero HBM
                          intermediates)

Same chained-fori_loop methodology as bench.py (docs/PERF.md "Timing
methodology"): iterations run inside one jitted loop with the carry
folded into each iteration's seed/key, final scalar fetched to host.

Accounting: N-only complex samples (n_channels · n_symbols · n_fft per
pass, CP excluded) for BOTH engines, matching docs/PERF.md round 2b.

Knobs: SDR_BENCH_NFFT, SDR_BENCH_CP, SDR_BENCH_CHANNELS,
SDR_BENCH_SYMS, SDR_BENCH_ITERS, SDR_BENCH_REPS, SDR_BENCH_EBNO,
SDR_BENCH_MOD, SDR_BENCH_CHANNEL_MODEL (awgn|rayleigh_flat|...).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def main() -> None:
    n_fft = int(os.environ.get("SDR_BENCH_NFFT", "256"))
    cp = int(os.environ.get("SDR_BENCH_CP", "64"))
    n_channels = int(os.environ.get("SDR_BENCH_CHANNELS", "512"))
    n_syms = int(os.environ.get("SDR_BENCH_SYMS", "64"))
    iters = int(os.environ.get("SDR_BENCH_ITERS", "8"))
    reps = int(os.environ.get("SDR_BENCH_REPS", "3"))
    ebno_db = float(os.environ.get("SDR_BENCH_EBNO", "12.0"))
    mod_name = os.environ.get("SDR_BENCH_MOD", "16qam")
    model_name = os.environ.get("SDR_BENCH_CHANNEL_MODEL", "awgn")
    engine = os.environ.get("SDR_BENCH_ENGINE", "mc")

    from sdr_tpu.core.config import (
        ChannelConfig,
        ChannelModel,
        Equalizer,
        LinkConfig,
        Modulation,
        OFDMConfig,
    )

    cfg = LinkConfig(
        ofdm=OFDMConfig(n_fft=n_fft, cp_len=cp),
        modulation=Modulation(mod_name),
        channel=ChannelConfig(
            model=ChannelModel(model_name),
            ebno_db=ebno_db,
            # Selective models get a 3-tap PDP; time-varying ones a
            # moderate Doppler (both ignored by the flat/AWGN models).
            pdp=(
                (1.0, 0.5, 0.25)
                if model_name in ("multipath", "multipath_time")
                else (1.0,)
            ),
            doppler_norm=0.02,
        ),
        equalizer=Equalizer.MMSE,
        n_channels=n_channels,
        n_symbols=n_syms,
        # SDR_BENCH_DFT=1: full-grid SC-FDMA (SC-FDE receive).
        dft_spread=bool(int(os.environ.get("SDR_BENCH_DFT", "0"))),
    )

    if engine == "mc":
        from sdr_tpu.link.mc import mc_simulate

        @jax.jit
        def run(seed):
            errs, _ = mc_simulate(cfg, seed, iters=iters)
            return jnp.sum(errs)

        args = (jnp.int32(1),)
    elif engine == "fast":
        from sdr_tpu.link.fast import fast_simulate

        # SDR_BENCH_FAST_LAYOUT=rows|cl|auto A/Bs the demod layout
        # (auto resolves to the channels-last kernel where it applies).
        fast_layout = os.environ.get("SDR_BENCH_FAST_LAYOUT", "auto")

        @jax.jit
        def run(seed):
            def body(i, acc):
                # Fold the carry into the key so no iteration is
                # hoistable or dead-code-eliminable.
                key = jax.random.fold_in(
                    jax.random.PRNGKey(seed), i + (acc & 1)
                )
                errs, _ = fast_simulate(cfg, key, layout=fast_layout)
                return acc + jnp.sum(errs)

            return lax.fori_loop(0, iters, body, jnp.int32(0))

        args = (jnp.int32(1),)
    else:
        raise SystemExit(f"unknown SDR_BENCH_ENGINE {engine!r}")

    total = int(run(*args))  # compile + one synced execution

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = int(run(*args))
        best = min(best, time.perf_counter() - t0)

    samples = n_channels * n_syms * n_fft * iters  # N-only accounting
    print(
        json.dumps(
            {
                "engine": engine,
                "config": f"{mod_name}/{n_fft}sc/cp{cp}/{model_name}",
                "channels": n_channels,
                "n_syms": n_syms,
                "gs_per_s_n_only": samples / best / 1e9,
                "ms_per_iter": best / iters * 1e3,
                "bit_errors_sample": total,
            }
        )
    )
    print(
        f"# platform={jax.default_backend()} iters={iters} best={best*1e3:.2f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
