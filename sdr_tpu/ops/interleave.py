"""Bit interleaving between the encoder and the mapper.

A convolutional code corrects scattered errors, but a frequency-
selective fade wipes out CONSECUTIVE subcarriers; the interleaver
spreads each code branch across the band so the deinterleaved LLR
stream shows the decoder independent-ish noise. Static seeded
permutation → a single gather, its inverse precomputed at trace time.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _perm(n: int, seed: int):
    rng = np.random.default_rng(seed)
    p = rng.permutation(n).astype(np.int32)
    inv = np.empty_like(p)
    inv[p] = np.arange(n, dtype=np.int32)
    return p, inv


def interleave(x: jnp.ndarray, seed: int = 0x1EAF) -> jnp.ndarray:
    """Permute the last axis with the seeded static permutation."""
    p, _ = _perm(x.shape[-1], seed)
    return x[..., jnp.asarray(p)]


def deinterleave(x: jnp.ndarray, seed: int = 0x1EAF) -> jnp.ndarray:
    """Inverse of ``interleave`` (same seed, same length)."""
    _, inv = _perm(x.shape[-1], seed)
    return x[..., jnp.asarray(inv)]
