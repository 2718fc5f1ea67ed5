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
