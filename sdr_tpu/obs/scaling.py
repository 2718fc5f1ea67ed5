"""Weak-scaling benchmark over the device mesh.

North-star requirement: ≥85% weak-scaling efficiency of samples/s on a
2-host slice (BASELINE.json). This driver grows the channel count with
the device count (fixed work per device — weak scaling), runs the
sharded link on each subset, and reports samples/s and efficiency
relative to the single-device rate.

Timing uses the chained in-jit fori_loop methodology (docs/PERF.md):
iterations are dependency-chained through the fold_in key and the final
error count is fetched to host.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sdr_tpu.core.config import LinkConfig
from sdr_tpu.parallel import make_link_mesh
from sdr_tpu.parallel.shard import make_sharded_simulate_fn


@dataclasses.dataclass
class ScalePoint:
    n_devices: int
    n_channels: int
    samples_per_s: float
    efficiency: float  # vs perfect scaling of the first point


def _rate(cfg: LinkConfig, mesh, iters: int, reps: int) -> float:
    fn = make_sharded_simulate_fn(cfg, mesh)

    @jax.jit
    def run(key):
        def body(i, acc):
            # The error count feeds the next iteration's key: a REAL
            # data dependency (a `* 0` chain is algebraically folded and
            # the whole simulate body gets dead-code-eliminated).
            errors, _ = fn(jax.random.fold_in(jax.random.fold_in(key, i), acc))
            return acc + jnp.sum(errors)
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    key = jax.random.PRNGKey(0)
    _ = int(run(key))  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = int(run(key))
        best = min(best, time.perf_counter() - t0)
    samples = cfg.n_channels * cfg.n_symbols * cfg.samples_per_symbol * iters
    return samples / best


def weak_scaling(
    cfg: LinkConfig,
    device_counts=None,
    iters: int = 10,
    reps: int = 3,
) -> list:
    """Run the DP-sharded link at each device count; channels scale with
    devices, keeping cfg.n_channels PER DEVICE constant."""
    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    per_dev = cfg.n_channels
    points = []
    base = None
    for k in device_counts:
        mesh = make_link_mesh(1, k, devices=devices[:k])
        cfg_k = dataclasses.replace(cfg, n_channels=per_dev * k)
        rate = _rate(cfg_k, mesh, iters, reps)
        if base is None:
            base = rate
        points.append(
            ScalePoint(
                n_devices=k,
                n_channels=cfg_k.n_channels,
                samples_per_s=rate,
                efficiency=rate / (base * k / device_counts[0]),
            )
        )
    return points
