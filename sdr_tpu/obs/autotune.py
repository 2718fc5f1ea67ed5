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
