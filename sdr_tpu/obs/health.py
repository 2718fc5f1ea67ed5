"""Device health probing — the failure-detection subsystem.

The reference's only failure handling is std::expected propagation
(SURVEY.md §5). A production link simulator on remote accelerators
needs liveness detection: the device runtime this framework was built
against exhibits multi-minute wedged periods where even trivial
dispatches hang (docs/PERF.md). ``probe_device`` runs a tiny dispatch
on a watchdog thread so callers can fail fast and reroute (e.g. fall
back to CPU, checkpoint and retry later — the sweep driver's
checkpoint/resume makes that loss-free).
"""

from __future__ import annotations

import dataclasses
import threading
import time


@dataclasses.dataclass
class HealthReport:
    healthy: bool
    latency_s: float | None
    backend: str | None
    error: str | None = None


def probe_device(timeout_s: float = 30.0) -> HealthReport:
    """Dispatch + fetch a trivial computation under a watchdog.

    Returns healthy=False if the fetch does not complete in time (a
    hung tunnel does not raise — it blocks, hence the thread) or if the
    dispatch raises.
    """
    result: dict = {}

    def work():
        try:
            import jax
            import jax.numpy as jnp

            t0 = time.perf_counter()
            val = float(jnp.sum(jnp.ones((8, 128))))
            result["latency"] = time.perf_counter() - t0
            result["backend"] = jax.default_backend()
            result["ok"] = val == 1024.0
        except Exception as e:  # noqa: BLE001 — report, don't crash the probe
            result["error"] = repr(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return HealthReport(False, None, None, error=f"probe hung > {timeout_s}s")
    if result.get("error"):
        return HealthReport(False, None, None, error=result["error"])
    return HealthReport(
        healthy=bool(result.get("ok")),
        latency_s=result.get("latency"),
        backend=result.get("backend"),
    )


def hbm_bandwidth_gbps(
    n_floats: int = 32 * 1024 * 1024, iters: int = 12
) -> float:
    """Sustained HBM read bandwidth in GB/s via the chained methodology.

    Same probe bench.py gates its measurement windows on (docs/PERF.md
    "Timing methodology"): all iterations inside one jitted fori_loop
    with the carry folded into the input so nothing is hoistable, final
    scalar fetched to host. Healthy axon v5e windows read 423-429;
    degraded ones ~70-130. Counts read+write traffic (2x) like bench.py
    so the numbers are directly comparable.
    """
    import time as _time

    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def probe(x):
        def body(_, acc):
            y = x + acc * jnp.float32(1e-30)
            return acc + jnp.sum(y[::65536], dtype=jnp.float32) * jnp.float32(1e-12)

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    xp = jax.random.normal(jax.random.PRNGKey(1), (n_floats,), jnp.float32)
    _ = float(probe(xp))  # compile + one synced run
    t0 = _time.perf_counter()
    _ = float(probe(xp))
    return iters * 2 * n_floats * 4 / (_time.perf_counter() - t0) / 1e9
