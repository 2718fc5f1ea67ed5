"""Sharded link execution: channel-batch DP and time-block SP.

Everything here is ``shard_map`` over a ("time", "channel") mesh
(sdr_tpu.parallel.mesh). Bit-exactness vs the unsharded oracles is the
design invariant (the north star's seam requirement): both paths key
every random draw by GLOBAL channel/block index (sdr_tpu.core.prng),
so a device that owns channels [8..16) and block 3 draws exactly what
the single-device run draws for those coordinates.

Communication inventory (per invocation):
- halo: one ``ppermute`` shifting each time-block's last L-1 TX
  samples to its right neighbor (multipath seams only) — O(cp) bytes
  per boundary, the SDR analog of ring-attention's neighbor pass;
- reduction: one ``psum`` of per-channel error counts over "time".
XLA inserts nothing else: TX/RX are embarrassingly parallel per
(channel, block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sdr_tpu.core.config import LinkConfig
from sdr_tpu.link import stream as _stream
from sdr_tpu.link.pipeline import _simulate_one


def make_sharded_simulate_fn(cfg: LinkConfig, mesh: Mesh):
    """Channel-batch data parallelism for link.pipeline.simulate.

    Channels are sharded over the "channel" mesh axis (replicated over
    "time"); returns (bit_errors, bits_counted), both (n_channels,),
    identical to the unsharded ``simulate`` for any mesh shape.
    """
    n_shards = mesh.shape["channel"]
    if cfg.n_channels % n_shards != 0:
        raise ValueError(
            f"n_channels={cfg.n_channels} not divisible by "
            f"channel-axis size {n_shards}"
        )
    local = cfg.n_channels // n_shards

    def local_fn(key):
        me = lax.axis_index("channel")
        ch_ids = me * local + jnp.arange(local)
        errors, counted, _ = jax.vmap(
            lambda c: _simulate_one(cfg, jax.random.fold_in(key, c), want_llrs=False)
        )(ch_ids)
        return errors, counted

    f = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(),
        out_specs=(P("channel"), P("channel")),
    )
    return jax.jit(f)


def make_sharded_stream_fn(cfg: LinkConfig, mesh: Mesh):
    """Time-block sequence parallelism (+ channel DP) for the stream link.

    Each device owns one time block (n_symbols / time-axis symbols) of
    its channel shard. The multipath FIR's block-seam history arrives
    by ppermute from the left time-neighbor; device 0 receives zeros
    (ppermute semantics), matching the unsharded stream's cold start.

    Returns (bit_errors, bits_counted) per channel; must equal
    ``link.stream.stream_simulate(cfg, key, n_blocks=time_axis)``
    bit-exactly (tests/test_parallel.py).
    """
    tdev = mesh.shape["time"]
    cdev = mesh.shape["channel"]
    _stream._check_blocking(cfg, tdev)  # divisibility + pilot gate
    if cfg.n_channels % cdev != 0:
        raise ValueError(f"n_channels % channel axis != 0")
    local_ch = cfg.n_channels // cdev
    spb = cfg.n_symbols // tdev
    L_halo = _stream._halo_len(cfg)

    def local_fn(key):
        t = lax.axis_index("time")
        csh = lax.axis_index("channel")
        ch_ids = csh * local_ch + jnp.arange(local_ch)
        b = t  # this device's global block index

        bits, streams = jax.vmap(
            lambda c: _stream._block_tx(cfg, key, c, b, spb)
        )(ch_ids)

        if L_halo:
            tails = streams[:, -L_halo:]
            perm = [(i, i + 1) for i in range(tdev - 1)]  # rightward, no wrap
            halos = lax.ppermute(tails, "time", perm)
        else:
            halos = None

        def rx_one(c, stream, halo_c):
            taps, h_freq = _stream._channel_taps(cfg, key, c)
            return _stream._block_rx(
                cfg, key, c, b, stream, taps, h_freq, spb, halo_c
            )

        if halos is None:
            hard = jax.vmap(lambda c, s: rx_one(c, s, None))(ch_ids, streams)
        else:
            hard = jax.vmap(rx_one)(ch_ids, streams, halos)

        errors = jnp.sum((hard != bits).astype(jnp.int32), axis=(1, 2))
        errors = lax.psum(errors, "time")  # total over all blocks
        counted = jnp.full(
            (local_ch,), cfg.n_symbols * cfg.bits_per_ofdm_symbol, jnp.int32
        )
        return errors, counted

    f = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(),
        out_specs=(P("channel"), P("channel")),
    )
    return jax.jit(f)
