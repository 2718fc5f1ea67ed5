"""Monte-Carlo link driver over the fully-fused MC kernel.

``mc_simulate`` iterates kernels/mc_pallas.py's single-pass kernel
inside one jitted ``lax.fori_loop``, folding the iteration index into
the seed so every pass draws fresh indices, channel realizations and
noise from the on-core hardware PRNG. Per iteration the only HBM
traffic is the seed in and a per-channel count vector out — the
Monte-Carlo simulation runs at MXU/VPU rates instead of being bound
by threefry noise generation and stage buffers (measured ~3x faster
end-to-end than link/fast on the v5e; docs/PERF.md).

This path is statistically validated (BER vs exact theory; the
`rand_inputs` interpret parity in tests/test_mc.py), NOT bit-exact
with link.fast's jax.random stream — use it for BER curves and
Eb/N0 sweeps, use link.fast when sharded/unsharded bit-exactness
against the oracle chain is the contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sdr_tpu.core.config import LinkConfig
from sdr_tpu.kernels.mc_pallas import mc_count_pallas, supported


def mc_simulate(
    cfg: LinkConfig,
    seed: int | jax.Array = 0,
    iters: int = 1,
    interpret: bool | None = None,
    rand_inputs=None,
):
    """Run ``iters`` Monte-Carlo passes; returns per-channel
    (bit_errors, bits_counted), both (n_channels,) int32.

    Bits counted per channel per pass is the static
    n_symbols·n_fft·bits_per_symbol (CP carries no payload)."""
    if not supported(cfg):
        raise ValueError(f"mc_simulate does not support this config: {cfg}")
    bits_per_pass = (
        cfg.n_symbols * cfg.ofdm.n_fft * cfg.modulation.bits_per_symbol
    )
    if bits_per_pass * iters >= 2**31:
        raise ValueError(
            f"iters={iters} overflows the int32 per-channel bit counter "
            f"({bits_per_pass} bits/pass); accumulate across mc_simulate "
            "calls at the caller instead"
        )
    seed = jnp.asarray(seed, jnp.int32)

    if rand_inputs is not None or iters == 1:
        errs = mc_count_pallas(
            cfg, seed, interpret=interpret, rand_inputs=rand_inputs
        )
    else:
        def body(i, acc):
            # Distinct seed per pass; the kernel further folds in the
            # grid block id.
            e = mc_count_pallas(
                cfg, seed + i * jnp.int32(0x9E3779B9 & 0x7FFFFFFF),
                interpret=interpret,
            )
            return acc + e

        errs = lax.fori_loop(
            0, iters, body, jnp.zeros((cfg.n_channels,), jnp.int32)
        )
    counted = jnp.full((cfg.n_channels,), bits_per_pass * iters, jnp.int32)
    return errs, counted


def make_mc_fn(cfg: LinkConfig, iters: int = 1):
    """Jitted MC driver with cfg closed over (seed stays a traced arg)."""
    return jax.jit(functools.partial(mc_simulate, cfg, iters=iters))
