"""Headline benchmark: complex samples/s/chip through OFDM demod + LLR.

The north-star metric (BASELINE.json): throughput of the receive chain
— CP strip → FFT → MMSE equalize → max-log LLR — on BASELINE config 2
(16-QAM, 256 subcarriers, soft output), measured steady-state on one
chip. A "sample" is one complex time-domain sample ENTERING the
demodulator (CP included), the honest accounting the survey calls for
(SURVEY.md §7 risk 5).

Timing methodology (important on this runtime): the axon TPU tunnel has
~1.4 ms fixed dispatch latency per RPC and its ``block_until_ready``
does not reliably synchronize device execution, so per-dispatch wall
timing is meaningless. Instead ALL iterations run inside ONE jitted
``lax.fori_loop`` whose carry feeds each iteration's channel input (so
nothing is loop-invariant-hoistable or dead-code-eliminable), and the
final scalar is fetched to host — the fetch cannot complete until every
iteration has executed. The carry perturbs the small (batch,1,N)
channel planes, not the big sample planes, so the extra pass is
negligible while the kernel still re-reads everything from HBM each
iteration.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": N}
vs_baseline is value / 1e9 (the reference publishes no numbers —
README.md:1 is a title only — so the north-star target 1e9
complex samples/s/chip is the baseline).

Environment knobs: SDR_BENCH_BATCH, SDR_BENCH_SYMS, SDR_BENCH_ITERS,
SDR_BENCH_REPS, SDR_TPU_FFT_BACKEND (xla|matmul|auto),
SDR_TPU_DEMOD_BACKEND (jnp|pallas|auto).

Degraded-window handling: the tunnel alternates healthy windows
(HBM probe 423-429 GB/s) with degraded ones (~100 GB/s, everything
~2-4x slow). A single-shot measurement in a degraded window would
record a number that reflects the tunnel, not the code — so when the
probe reads degraded, the measurement (cheap: the program is already
compiled) retries on a sleep cadence up to SDR_BENCH_RETRY_S seconds
(default 420, 0 disables), keeping the BEST rate seen. An overall
SIGALRM deadline guarantees the JSON line is still printed from
whatever completed if a later attempt wedges mid-run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

N_FFT = 256
CP = 64
SYM_LEN = N_FFT + CP
EBNO_DB = 12.0


def _build(batch: int, n_syms: int, iters: int):
    from sdr_tpu.core.config import Modulation
    from sdr_tpu.ops.channel import ebno_db_to_noise_var
    from sdr_tpu.ops.demod import demod_chain

    mod = Modulation.QAM16
    nv = float(ebno_db_to_noise_var(EBNO_DB, mod.bits_per_symbol))

    in_dtype = (
        jnp.bfloat16
        if os.environ.get("SDR_BENCH_INPUT_DTYPE", "f32") == "bf16"
        else jnp.float32
    )

    # Round-4 default: the channels-last pipelined kernel
    # (kernels/demod_cl_pallas.py) — emit_pipeline double-buffered DMA
    # + DIF radix-2 split, measured ~82-88 GS/s vs the row-major
    # kernel's 62 at identical precision/BER-gate settings
    # (docs/PERF.md round 4). SDR_BENCH_LAYOUT=rows reverts.
    layout = os.environ.get("SDR_BENCH_LAYOUT", "cl")
    if layout == "cl" and jax.default_backend() == "cpu":
        layout = "rows"  # emit_pipeline requires the TPU backend

    if layout == "cl":
        # The library surface (ops.demod.demod_sum_chain_cl) — the SAME
        # code path link.fast's layout="cl" demod terminal uses, so the
        # headline number measures the framework's default path, not a
        # bench-only artifact (round 5; VERDICT round 4 item 1).
        from sdr_tpu.kernels.demod_cl_pallas import dif_perm
        from sdr_tpu.ops.demod import demod_sum_chain_cl

        perm = jnp.asarray(dif_perm(N_FFT))

        @jax.jit
        def gen(key):
            """RX samples + channel, channels-LAST planar layout."""
            kr, ki, kh = jax.random.split(key, 3)
            shape = (n_syms * SYM_LEN, batch)
            re = (jax.random.normal(kr, shape, jnp.float32) * np.float32(1.0 / np.sqrt(2 * N_FFT))).astype(in_dtype)
            im = (jax.random.normal(ki, shape, jnp.float32) * np.float32(1.0 / np.sqrt(2 * N_FFT))).astype(in_dtype)
            hr = jax.random.normal(kh, (N_FFT, batch), jnp.float32) * np.float32(np.sqrt(0.5))
            hi = jax.random.normal(jax.random.fold_in(kh, 1), (N_FFT, batch), jnp.float32) * np.float32(np.sqrt(0.5))
            return re, im, hr, hi

        @jax.jit
        def run(re, im, hr, hi):
            hr_d = hr[perm]
            hi_d = hi[perm]

            def body(_, acc):
                s = demod_sum_chain_cl(
                    re, im, hr_d + acc * jnp.float32(1e-30), hi_d,
                    CP, mod, nv, h_in_dif_order=True,
                )
                return acc + s * jnp.float32(1e-12)

            return lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return gen, run

    @jax.jit
    def gen(key):
        """Synthesize RX samples + a channel response on device (planar)."""
        kr, ki, kh = jax.random.split(key, 3)
        shape = (batch, n_syms, SYM_LEN)
        re = (jax.random.normal(kr, shape, jnp.float32) * np.float32(1.0 / np.sqrt(2 * N_FFT))).astype(in_dtype)
        im = (jax.random.normal(ki, shape, jnp.float32) * np.float32(1.0 / np.sqrt(2 * N_FFT))).astype(in_dtype)
        hr = jax.random.normal(kh, (batch, 1, N_FFT), jnp.float32) * np.float32(np.sqrt(0.5))
        hi = jax.random.normal(jax.random.fold_in(kh, 1), (batch, 1, N_FFT), jnp.float32) * np.float32(np.sqrt(0.5))
        return re, im, hr, hi

    @jax.jit
    def run(re, im, hr, hi):
        """iters chained demod iterations in one device program."""

        def body(_, acc):
            # The carry folds into the CHANNEL input (0.5 MB — a
            # negligible extra pass, unlike perturbing the 84 MB sample
            # planes, which would add a full materialization before the
            # Pallas call). Every iteration still depends on the
            # previous one, every LLR feeds the result, and the kernel
            # re-reads all inputs from HBM each iteration — nothing is
            # hoistable or dead.
            llr_sum = demod_chain(
                re, im, hr + acc * jnp.float32(1e-30), hi, CP, mod, nv,
                reduce_sum=True,
            )
            return acc + llr_sum * jnp.float32(1e-12)

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return gen, run


def _hbm_probe() -> float:
    """Sustained HBM GB/s via the chained methodology (healthy: 423-429)."""
    nprobe = 32 * 1024 * 1024

    @jax.jit
    def _hbm(x):
        def body(_, acc):
            y = x + acc * jnp.float32(1e-30)
            return acc + jnp.sum(y[::65536], dtype=jnp.float32) * jnp.float32(1e-12)

        return lax.fori_loop(0, 12, body, jnp.float32(0.0))

    xp = jax.random.normal(jax.random.PRNGKey(1), (nprobe,), jnp.float32)
    _ = float(_hbm(xp))
    t0 = time.perf_counter()
    _ = float(_hbm(xp))
    return 12 * 2 * nprobe * 4 / (time.perf_counter() - t0) / 1e9


class _Deadline(Exception):
    pass


def main() -> None:
    # Round-3 defaults from the measured precision×input-dtype matrix
    # (docs/PERF.md round 3): single-pass MXU + bfloat16 SAMPLE PLANES
    # reads 55.7 GS/s at batch 32768 vs bf16x2/f32's 40.1. Both knobs
    # are BER-gated on-device for the benched 16-QAM config: error
    # counts move +0.016% at 8 dB and +0.10% at 14 dB vs the
    # bit-exact bf16x3 reference (≈0.002 dB — two decades inside the
    # north star's 0.1 dB bound), and bf16 input is physically honest
    # (front ends deliver 8-14-bit samples; our SC16 captures are
    # 16-bit ints). The gate is MODULATION-dependent: 1024-QAM at
    # 30 dB moves +10%, so dense-constellation work keeps bf16x2/
    # bf16x3 (see the PERF.md gate table). Env-overridable; bf16x3 +
    # f32 remains the LIBRARY default (BER bit-identical to f32).
    os.environ.setdefault("SDR_TPU_MXU_PRECISION", "default")
    os.environ.setdefault("SDR_BENCH_INPUT_DTYPE", "bf16")
    # Larger grid blocks amortize the per-block ramp (measured: 41.4 →
    # 50.3 → 55.2 → 58.5 → 60.6 GS/s at rows 128→2048; 4096 OOMs
    # VMEM). bf16 input halves the block bytes, which is what makes
    # 2048 rows fit — the f32-mode LIBRARY default stays 512.
    os.environ.setdefault("SDR_TPU_TARGET_ROWS", "2048")
    batch = int(os.environ.get("SDR_BENCH_BATCH", "32768"))
    n_syms = int(os.environ.get("SDR_BENCH_SYMS", "64"))
    iters = int(os.environ.get("SDR_BENCH_ITERS", "12"))
    reps = int(os.environ.get("SDR_BENCH_REPS", "3"))
    retry_s = float(os.environ.get("SDR_BENCH_RETRY_S", "300"))
    healthy_bw = float(os.environ.get("SDR_BENCH_HEALTHY_BW", "300"))
    if jax.default_backend() == "cpu":
        retry_s = 0.0  # probe thresholds are TPU-specific

    gen, run = _build(batch, n_syms, iters)
    args = gen(jax.random.PRNGKey(0))

    _ = float(run(*args))  # warmup: compile + one full execution, synced by fetch

    start = time.monotonic()
    best = float("inf")
    bw = 0.0
    attempts = 0
    # The SIGALRM deadline covers the RETRY phase only: if a later
    # attempt lands in a wedged window and hangs, the line below still
    # prints from the best completed attempt.
    import signal

    def _on_alarm(_sig, _frm):
        raise _Deadline()

    try:
        if retry_s > 0 and hasattr(signal, "SIGALRM"):
            signal.signal(signal.SIGALRM, _on_alarm)
            signal.alarm(int(retry_s) + 120)
        while True:
            attempts += 1
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = float(run(*args))  # host fetch forces completion of all iters
                best = min(best, time.perf_counter() - t0)
            try:
                bw = _hbm_probe()
            except Exception as e:  # pragma: no cover - probe is advisory
                print(f"# hbm_probe failed: {e}", file=sys.stderr)
                bw = float("nan")
            print(f"# attempt {attempts}: hbm_probe={bw:.0f} GB/s "
                  f"(healthy 423-429), best so far {best * 1e3:.2f}ms",
                  file=sys.stderr)
            if not bw < healthy_bw:  # healthy window (or probe NaN)
                break
            if time.monotonic() - start + 45 > retry_s:
                break
            time.sleep(45)  # wait out the degraded window, then retry
    except _Deadline:
        print("# retry deadline hit; reporting best completed attempt",
              file=sys.stderr)
    finally:
        if hasattr(signal, "SIGALRM"):
            signal.alarm(0)

    if best == float("inf"):
        # Deadline fired before ANY attempt finished. Fall back to one
        # un-deadlined attempt — identical to the pre-retry behavior
        # (blocks if the tunnel is wedged, which is all it could do).
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = time.perf_counter() - t0

    samples = batch * n_syms * SYM_LEN * iters
    rate = samples / best
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
        f"# batch={batch} syms={n_syms} iters={iters} best={best * 1e3:.2f}ms "
        f"({best / iters * 1e3:.3f}ms/iter) backend={jax.default_backend()} "
        f"fft={os.environ.get('SDR_TPU_FFT_BACKEND', 'auto')} "
        f"demod={os.environ.get('SDR_TPU_DEMOD_BACKEND', 'auto')} "
        f"mxu={os.environ.get('SDR_TPU_MXU_PRECISION', 'bf16x3')} "
        f"input={os.environ.get('SDR_BENCH_INPUT_DTYPE', 'f32')} "
        f"layout={os.environ.get('SDR_BENCH_LAYOUT', 'cl')}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
