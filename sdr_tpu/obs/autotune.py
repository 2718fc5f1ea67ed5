"""FFT backend autotuner — honest on-device A/B timing.

Measures the "xla" (jnp.fft) vs "matmul" (MXU four-step DFT) backends
across transform sizes and reports the per-size winner and the
crossover. Timing methodology matches bench.py: all iterations run
inside one jitted ``lax.fori_loop`` whose carry perturbs the input (so
nothing hoists or dead-codes), and the final scalar is fetched —
required because the axon tunnel's dispatch latency (~1.4 ms) and
non-synchronizing ``block_until_ready`` make per-dispatch wall timing
meaningless (docs/PERF.md).

CLI: ``python -m sdr_tpu autotune``.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass
class TunePoint:
    n: int
    xla_gelems: float
    matmul_gelems: float

    @property
    def winner(self) -> str:
        return "matmul" if self.matmul_gelems > self.xla_gelems else "xla"


def _time_backend(backend: str, n: int, batch_elems: int, iters: int, reps: int) -> float:
    """Returns Gelem/s for batched FFTs of size n."""
    from sdr_tpu.kernels.fft_matmul import matmul_fft

    b = max(batch_elems // n, 8)
    key = jax.random.PRNGKey(0)
    xr = jax.random.normal(key, (b, n), jnp.float32)
    xi = jax.random.normal(jax.random.fold_in(key, 1), (b, n), jnp.float32)

    if backend == "matmul":
        f = matmul_fft
    else:
        f = lambda c: jnp.fft.fft(c, axis=-1)  # noqa: E731

    @jax.jit
    def run(xr, xi):
        def body(_, acc):
            y = f(lax.complex(xr + acc * jnp.float32(1e-30), xi))
            return acc + jnp.real(y[0, 0]) * jnp.float32(1e-12)

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    _ = float(run(xr, xi))  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(xr, xi))
        best = min(best, time.perf_counter() - t0)
    return b * n * iters / best / 1e9


def tune_fft(
    sizes=(128, 256, 512, 1024, 2048, 4096, 8192, 16384),
    batch_elems: int = 1 << 22,
    iters: int = 20,
    reps: int = 3,
) -> list:
    """A/B each size; returns [TunePoint...]."""
    out = []
    for n in sizes:
        out.append(
            TunePoint(
                n=n,
                xla_gelems=_time_backend("xla", n, batch_elems, iters, reps),
                matmul_gelems=_time_backend("matmul", n, batch_elems, iters, reps),
            )
        )
    return out


def recommend_crossover(points) -> int:
    """Smallest n from which matmul wins for all larger measured sizes.

    Feed into ops.fft.set_matmul_min_n (or the SDR_TPU_FFT_BACKEND env).
    """
    cross = 1 << 62
    for p in sorted(points, key=lambda q: -q.n):
        if p.winner == "matmul":
            cross = p.n
        else:
            break
    return cross


@dataclasses.dataclass
class DemodTunePoint:
    backend: str
    gs_per_s: float
    error: str | None = None


def tune_demod(
    n_fft: int = 4096,
    cp_len: int = 512,
    batch: int = 256,
    n_syms: int = 8,
    iters: int = 6,
    reps: int = 2,
    backends=(
        "pallas",
        "fourstep",
        "fourstep2",
        "fourstep2:bf16",
        "hybrid",
        "jnp",
    ),
):
    """A/B the demod backends at one problem shape on THIS device.

    Same chained methodology as ``tune_fft``. Backends whose gates
    reject the shape (or that fail to compile) report an error string
    instead of a rate — the caller picks the fastest survivor. A
    ``backend:bf16`` spec runs that backend with the bf16-staged
    intermediate (``SDR_TPU_FOURSTEP_STAGE=bf16`` — set for tracing
    only; the winner's env recipe is part of the report). The
    production recipe: run once on the deployment chip, export
    ``SDR_TPU_DEMOD_BACKEND=<winner>`` (plus the stage env if the
    bf16 variant won).
    """
    import os

    import numpy as np

    from sdr_tpu.core.config import Modulation
    from sdr_tpu.ops.channel import ebno_db_to_noise_var
    from sdr_tpu.ops.demod import demod_chain

    mod = Modulation.QAM16
    nv = float(ebno_db_to_noise_var(12.0, mod.bits_per_symbol))
    sym_len = n_fft + cp_len
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(key):
        kr, ki, kh = jax.random.split(key, 3)
        scale = jnp.float32(1.0 / (2.0 * n_fft) ** 0.5)
        re = jax.random.normal(kr, (batch, n_syms, sym_len), jnp.float32) * scale
        im = jax.random.normal(ki, (batch, n_syms, sym_len), jnp.float32) * scale
        hr = jax.random.normal(kh, (batch, 1, n_fft), jnp.float32)
        hi = jax.random.normal(jax.random.fold_in(kh, 1), (batch, 1, n_fft), jnp.float32)
        return re, im, hr, hi

    args = gen(key)
    points = []
    for spec in backends:
        be, _, stage = spec.partition(":")
        prev_stage = os.environ.get("SDR_TPU_FOURSTEP_STAGE")
        try:
            if stage:
                os.environ["SDR_TPU_FOURSTEP_STAGE"] = stage

            @jax.jit
            def run(re, im, hr, hi, _b=be):
                def body(_, acc):
                    s = demod_chain(
                        re, im, hr + acc * jnp.float32(1e-30), hi,
                        cp_len, mod, nv, reduce_sum=True, backend=_b,
                    )
                    return acc + s * jnp.float32(1e-12)

                return lax.fori_loop(0, iters, body, jnp.float32(0.0))

            _ = float(run(*args))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = float(run(*args))
                best = min(best, time.perf_counter() - t0)
            rate = batch * n_syms * sym_len * iters / best / 1e9
            points.append(DemodTunePoint(backend=spec, gs_per_s=rate))
        except Exception as e:  # gate rejection or compile failure
            points.append(DemodTunePoint(backend=spec, gs_per_s=0.0,
                                         error=str(e)[:200]))
        finally:
            if stage:
                if prev_stage is None:
                    os.environ.pop("SDR_TPU_FOURSTEP_STAGE", None)
                else:
                    os.environ["SDR_TPU_FOURSTEP_STAGE"] = prev_stage
    return points
