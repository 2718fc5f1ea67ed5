"""Headline benchmark: complex samples/s/chip through OFDM demod + LLR.

The north-star metric (BASELINE.json): throughput of the receive chain
— CP strip → FFT → MMSE equalize → max-log LLR — on BASELINE config 2
(16-QAM, 256 subcarriers, soft output), measured steady-state on one
chip. A "sample" is one complex time-domain sample ENTERING the
demodulator (CP included), the honest accounting the survey calls for
(SURVEY.md §7 risk 5).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": N}
vs_baseline is value / 1e9 (the reference publishes no numbers —
README.md:1 is a title only — so the north-star target 1e9
complex samples/s/chip is the baseline).

Environment knobs: SDR_BENCH_BATCH, SDR_BENCH_SYMS, SDR_BENCH_ITERS,
SDR_TPU_FFT_BACKEND (xla|matmul|auto).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 256
CP = 64
SYM_LEN = N_FFT + CP
EBNO_DB = 12.0


def _build(batch: int, n_syms: int):
    from sdr_tpu.core.config import Modulation
    from sdr_tpu.ops.channel import ebno_db_to_noise_var
    from sdr_tpu.ops.equalize import equalize_mmse
    from sdr_tpu.ops.llr import llr_maxlog
    from sdr_tpu.ops.ofdm import ofdm_rx

    mod = Modulation.QAM16
    nv = float(ebno_db_to_noise_var(EBNO_DB, mod.bits_per_symbol))

    @jax.jit
    def gen(key):
        """Synthesize RX samples + a channel response on device (planar)."""
        kr, ki, kh = jax.random.split(key, 3)
        shape = (batch, n_syms, SYM_LEN)
        re = jax.random.normal(kr, shape, jnp.float32) * np.float32(1.0 / np.sqrt(2 * N_FFT))
        im = jax.random.normal(ki, shape, jnp.float32) * np.float32(1.0 / np.sqrt(2 * N_FFT))
        hr = jax.random.normal(kh, (batch, 1, N_FFT), jnp.float32) * np.float32(np.sqrt(0.5))
        hi = jax.random.normal(jax.random.fold_in(kh, 1), (batch, 1, N_FFT), jnp.float32) * np.float32(np.sqrt(0.5))
        return re, im, hr, hi

    @jax.jit
    def demod_llr(re, im, hr, hi):
        """The benched chain: CP strip → FFT → MMSE → max-log LLR."""
        x = jax.lax.complex(re, im)
        h = jax.lax.complex(hr, hi)
        y = ofdm_rx(x, CP)
        s, eff = equalize_mmse(y, h, nv)
        llr = llr_maxlog(s, mod, eff)
        # Tiny reduction forces full materialization without a big D2H.
        return jnp.sum(llr, dtype=jnp.float32)

    return gen, demod_llr


def main() -> None:
    batch = int(os.environ.get("SDR_BENCH_BATCH", "512"))
    n_syms = int(os.environ.get("SDR_BENCH_SYMS", "64"))
    iters = int(os.environ.get("SDR_BENCH_ITERS", "30"))

    gen, demod_llr = _build(batch, n_syms)
    args = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    # Warmup (compile + cache).
    for _ in range(3):
        jax.block_until_ready(demod_llr(*args))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = demod_llr(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples = batch * n_syms * SYM_LEN * iters
    rate = samples / dt
    print(
        json.dumps(
            {
                "metric": "complex samples/s/chip through 16QAM/256sc OFDM demod+MMSE+max-log LLR",
                "value": rate,
                "unit": "samples/s/chip",
                "vs_baseline": rate / 1e9,
            }
        )
    )
    print(
        f"# batch={batch} syms={n_syms} iters={iters} dt={dt:.3f}s "
        f"bytes/iter~{batch * n_syms * (SYM_LEN * 8 + N_FFT * (8 + 16)) / 1e6:.0f}MB "
        f"backend={jax.default_backend()} fft={os.environ.get('SDR_TPU_FFT_BACKEND', 'auto')}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
