"""PRNG discipline.

All randomness flows from a single ``jax.random`` key, split by role so
every channel / symbol-block / noise draw is independent and
reproducible regardless of sharding layout. (The reference has no
randomness at all — its demo is a deterministic loopback,
QFDemoWindow.cpp:201-266 — but the link simulator is statistical.)

Key-folding layout:
    root ── fold(ROLE_*) ── fold(channel_index) ── fold(block_index)

Folding (rather than splitting in data order) keeps draws identical
between the unsharded and sharded execution paths: a device that owns
channels [8..16) folds the same per-channel constants the single-device
path would, which is what makes sharded BER bit-exact vs unsharded.
"""

from __future__ import annotations

import jax

# Role constants — stable across versions; never renumber.
ROLE_PAYLOAD = 0x0B175  # source bits
ROLE_NOISE = 0x4015E  # AWGN draws
ROLE_FADING = 0xFAD1E  # channel tap draws
ROLE_MISC = 0x3E71A
ROLE_PHASE = 0x9A5E0  # RX-LO Wiener phase-noise walk


def role_key(root: jax.Array, role: int) -> jax.Array:
    return jax.random.fold_in(root, role)


def channel_key(root: jax.Array, role: int, channel: jax.Array | int) -> jax.Array:
    return jax.random.fold_in(role_key(root, role), channel)


def block_key(
    root: jax.Array, role: int, channel: jax.Array | int, block: jax.Array | int
) -> jax.Array:
    return jax.random.fold_in(channel_key(root, role, channel), block)
