"""Polar codes: Arikan construction, butterfly encoder, SC decoder.

The third FEC family (next to the convolutional code + Viterbi in
ops.fec and the QC-LDPC + min-sum in ops.ldpc — together the classic /
5G-data / 5G-control roster). The reference has no channel coding at
all (its loopback decodes exactly, QFDemoWindow.cpp:201-224); this is
north-star capability.

TPU shape discipline:
- the ENCODER is the n-stage butterfly x = u·F^{⊗n} (F = [[1,0],[1,1]],
  natural bit order) — log2(N) vectorized XOR stages, batched over
  codewords; no bit-reversal anywhere (both ends use the same natural-
  order transform, so the permutation cancels by construction).
- the SC DECODER is one ``lax.scan`` over the N leaf bits carrying
  static-shape LLR/partial-sum planes of (n+1, N). The depth pattern
  per bit (how far to climb with a ``g`` update, how many ``f``
  descents follow, how many partial-sum merges close) depends only on
  the bit INDEX — so it is precomputed as static tables and dispatched
  with ``lax.switch`` over n+1 fixed-shape branches. All segment
  widths are static Python ints (N/2^d at depth d).
- min-sum (max-log) f/g updates in float32, the same approximation
  family as the max-log LLR demapper and the min-sum LDPC decoder.

SC is inherently bit-serial (the decision for bit i feeds the partial
sums bit i+1 needs) — the scan IS the algorithm, not a compromise; the
codeword axis provides the data parallelism (vmap/batch), which is
where the TPU lanes go. This decoder is the capability/BER-parity
path, not a throughput kernel.

Construction: Bhattacharyya-parameter recursion (Arikan's heuristic
for the BEC): z -> {2z - z², z²}, deterministic and cached per (N, K).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _require_pow2(n: int) -> int:
    if n < 2 or n & (n - 1):
        raise ValueError(f"polar block length must be a power of 2, got {n}")
    return int(n).bit_length() - 1


@functools.lru_cache(maxsize=None)
def polar_construct(block_len: int, k: int, design_z: float = 0.5):
    """Info-bit positions for a (block_len, k) polar code.

    Bhattacharyya recursion from z = design_z: at each polarization
    level the parameter splits into the worse channel 2z − z² and the
    better channel z². The k positions with the SMALLEST final z carry
    information; the rest are frozen to 0. Returns (info_idx, frozen
    mask) as numpy (static tables).
    """
    n = _require_pow2(block_len)
    if not 1 <= k <= block_len:
        raise ValueError(f"k must be in [1, {block_len}], got {k}")
    z = np.array([design_z], dtype=np.float64)
    for _ in range(n):
        z = np.concatenate([2.0 * z - z * z, z * z])
    # z[i] is the Bhattacharyya parameter of synthetic channel i in
    # natural (encoder-input) order. Stable argsort keeps ties
    # deterministic.
    order = np.argsort(z, kind="stable")
    info_idx = np.sort(order[:k]).astype(np.int32)
    frozen = np.ones(block_len, dtype=bool)
    frozen[info_idx] = False
    return info_idx, frozen


def polar_encode(u: jnp.ndarray) -> jnp.ndarray:
    """x = u · F^{⊗n} over GF(2), natural order. u: int8 (..., N)."""
    N = u.shape[-1]
    n = _require_pow2(N)
    x = u
    for s in range(n):
        step = 1 << s
        shp = x.shape[:-1] + (N // (2 * step), 2, step)
        xb = x.reshape(shp)
        top = jnp.bitwise_xor(xb[..., 0, :], xb[..., 1, :])
        x = jnp.stack([top, xb[..., 1, :]], axis=-2).reshape(u.shape)
    return x


def polar_encode_info(info: jnp.ndarray, block_len: int) -> jnp.ndarray:
    """Info bits (..., k) → codeword (..., block_len) with frozen 0s."""
    k = info.shape[-1]
    info_idx, _ = polar_construct(block_len, k)
    u = jnp.zeros(info.shape[:-1] + (block_len,), jnp.int8)
    u = u.at[..., jnp.asarray(info_idx)].set(info.astype(jnp.int8))
    return polar_encode(u)


def _f_minsum(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Check-node (left-child) update: sgn(a)sgn(b)·min(|a|,|b|)."""
    return jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a), jnp.abs(b))


def _g(a: jnp.ndarray, b: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Variable-node (right-child) update: b + (1−2s)·a, s the left-
    subtree partial sum."""
    return b + (1.0 - 2.0 * s.astype(jnp.float32)) * a


@functools.lru_cache(maxsize=None)
def _sc_tables(block_len: int):
    """Static per-bit dispatch tables: trailing zeros (g-depth) and
    trailing ones (partial-sum merge count) of each leaf index."""
    idx = np.arange(block_len)
    tz = np.zeros(block_len, np.int32)
    to = np.zeros(block_len, np.int32)
    for i in range(1, block_len):
        v = i
        while v % 2 == 0:
            tz[i] += 1
            v //= 2
        v = i
        while v % 2 == 1:
            to[i] += 1
            v //= 2
    return idx, tz, to


def polar_decode_sc(
    llr: jnp.ndarray, block_len: int, k: int
) -> jnp.ndarray:
    """Successive-cancellation decode. llr: float32 (..., block_len)
    channel LLRs (positive ⇒ bit 0, the framework's demapper
    convention). Returns the decoded INFO bits int8 (..., k)."""
    if llr.shape[-1] != block_len:
        raise ValueError(
            f"llr last axis {llr.shape[-1]} != block_len {block_len}"
        )
    n = _require_pow2(block_len)
    info_idx, frozen = polar_construct(block_len, k)
    frozen_j = jnp.asarray(frozen)

    batch = llr.shape[:-1]
    flat = llr.reshape((-1, block_len)).astype(jnp.float32)

    N = block_len
    _, tz_tab, to_tab = _sc_tables(N)
    tz_tab = jnp.asarray(np.minimum(tz_tab, n))
    to_tab = jnp.asarray(to_tab)

    def f_descend(L, d_from):
        """f-updates from depth d_from..n (static unroll)."""
        for d in range(d_from, n + 1):
            w = N >> d
            seg = L[d - 1, : 2 * w]
            L = L.at[d, :w].set(_f_minsum(seg[:w], seg[w : 2 * w]))
        return L

    def decode_one(ch_llr):
        # L[d, :N>>d] — the CURRENT path's LLRs at depth d (each depth
        # is revisited strictly left-to-right, so one segment per depth
        # suffices). B[d] — partial sums (each node's ENCODED bits) at
        # their NATURAL positions: node j at depth d owns
        # B[d, j·w:(j+1)·w], w = N>>d — left siblings leave the current
        # path, so they need a home addressed by node index.
        L = jnp.zeros((n + 1, N), jnp.float32).at[0].set(ch_llr)
        B = jnp.zeros((n + 1, N), jnp.int8)
        u = jnp.zeros((N,), jnp.int8)

        # Bit 0: full left descent.
        L = f_descend(L, 1)

        def make_g_branch(t):
            # t = trailing zeros of i: the path from bit i-1 to bit i
            # turns right at depth a = n - t (one g update against the
            # left sibling's stored sums), then f-descends to the leaf.
            a = n - t

            def branch(i, L, B):
                w = N >> a
                j = lax.shift_right_logical(i, n - a)  # odd node index
                left = lax.dynamic_slice(B[a], ((j - 1) * w,), (w,))
                seg = L[a - 1, : 2 * w]
                L = L.at[a, :w].set(_g(seg[:w], seg[w : 2 * w], left))
                return f_descend(L, a + 1)

            return branch

        # t = n only occurs at i = 0 (handled before the scan); a no-op
        # stand-in keeps every lax.switch branch traceable.
        g_branches = [make_g_branch(t) for t in range(n)] + [
            lambda i, L, B: L
        ]

        def make_merge_branch(t):
            # t = trailing ones of i: bit i closes t right children;
            # merge each with its stored left sibling into the parent's
            # slot: parent = [left ⊕ right, right] (the node's own
            # encoded bits, per x = (p ⊕ q, q)).
            def branch(i, B):
                for d in range(n, n - t, -1):
                    w = N >> d
                    j = lax.shift_right_logical(i, n - d)  # odd
                    start = (j - 1) * w
                    pair = lax.dynamic_slice(B[d], (start,), (2 * w,))
                    merged = jnp.concatenate(
                        [jnp.bitwise_xor(pair[:w], pair[w:]), pair[w:]]
                    )
                    B = B.at[d - 1].set(
                        lax.dynamic_update_slice(B[d - 1], merged, (start,))
                    )
                return B

            return branch

        merge_branches = [make_merge_branch(t) for t in range(n + 1)]

        def leaf(i, L, B, u):
            dec = jnp.where(
                frozen_j[i], jnp.int8(0), (L[n, 0] < 0).astype(jnp.int8)
            )
            u = u.at[i].set(dec)
            B = B.at[n, i].set(dec)
            B = lax.switch(to_tab[i], merge_branches, i, B)
            return B, u

        B, u = leaf(jnp.int32(0), L, B, u)

        def step(carry, i):
            L, B, u = carry
            L = lax.switch(tz_tab[i], g_branches, i, L, B)
            B, u = leaf(i, L, B, u)
            return (L, B, u), ()

        (L, B, u), _ = lax.scan(
            step, (L, B, u), jnp.arange(1, N, dtype=jnp.int32)
        )
        return u

    u_all = jax.vmap(decode_one)(flat)
    info = u_all[:, jnp.asarray(info_idx)]
    return info.reshape(batch + (k,))
