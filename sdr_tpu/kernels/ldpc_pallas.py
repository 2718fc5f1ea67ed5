"""Fused Pallas LDPC min-sum decoder: all iterations in one kernel.

The jnp decoder (ops/ldpc.py) carries the per-edge message array
through a ``lax.fori_loop`` — on TPU that carry (E·batch·Z floats)
round-trips HBM every min-sum iteration. This kernel keeps the entire
message state in VMEM for the whole decode: per batch tile the only
HBM traffic is the channel-LLR read and one hard-bit write, and each
iteration is pure VPU work on (tile, Z) lane registers.

Shapes are QC-native: Z = 128 is exactly one lane register, the cyclic
shifts are lane rotates (slice + concat), and the base-matrix loops
unroll at trace time exactly as in the jnp twin — same op order, so
interpret-mode output is bit-identical to ``ops.ldpc.ldpc_decode``.

VMEM budget per tile: (E + nb) · tb · Z · 4 B for messages + channel
LLRs (E=59, nb=24 rate-1/2: ~83 · tb · 512 B ≈ 2.7 MB at tb=64), well
inside the 16 MB VMEM with Mosaic's ~2.5× allocation factor
(docs/PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.ops.ldpc import QcLdpcCode, _rot


def supported(code: QcLdpcCode, batch: int) -> bool:
    """Lane-width lifting + a sublane-aligned batch tile."""
    return code.z % 128 == 0 and batch % 8 == 0 and _pick_tile(code, batch) > 0


def _pick_tile(code: QcLdpcCode, batch: int) -> int:
    """Largest divisor tile with (E + 2·nb)·tb·Z·4 B within ~3 MB."""
    e = sum(1 for row in code.base for s in row if s >= 0)
    per_row = (e + 2 * code.nb) * code.z * 4
    best = 0
    for tb in range(8, batch + 1, 8):
        if batch % tb == 0 and tb * per_row <= (3 << 20):
            best = tb
    return best


def ldpc_decode_pallas(
    code: QcLdpcCode,
    llr: jnp.ndarray,
    iters: int = 25,
    offset: float = 0.5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(batch, n) channel LLRs → (batch, n) hard bits (int8).

    Same math and op order as ops.ldpc.ldpc_decode — bit-identical in
    interpret mode (tests/test_ldpc.py) — but the message state lives
    in VMEM across all ``iters`` min-sum iterations.
    """
    if llr.ndim != 2 or llr.shape[-1] != code.n:
        raise ValueError(f"expected (batch, {code.n}) LLRs, got {llr.shape}")
    batch = llr.shape[0]
    if not supported(code, batch):
        raise ValueError(f"unsupported batch {batch} for the fused decoder")
    z, nb, mb = code.z, code.nb, code.mb
    edges = [(i, j, s) for i in range(mb) for j, s in code.row_edges(i)]
    e_by_row = [
        [e for e, (i, _, _) in enumerate(edges) if i == r] for r in range(mb)
    ]
    e_by_col = [
        [e for e, (_, j, _) in enumerate(edges) if j == c] for c in range(nb)
    ]
    n_e = len(edges)
    tb = _pick_tile(code, batch)
    off = float(offset)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def kernel(llr_ref, out_ref):
        beta = jnp.float32(off)
        ch = [llr_ref[:, j, :] for j in range(nb)]  # (tb, Z) tiles

        def totals(c2v):
            out = []
            for j in range(nb):
                t = ch[j]
                for e in e_by_col[j]:
                    t = t + c2v[e]
                out.append(t)
            return out

        def body(_, carry):
            c2v = [carry[e] for e in range(n_e)]
            tot = totals(c2v)
            new = [None] * n_e
            for r in range(mb):
                ms = []
                for e in e_by_row[r]:
                    _, j, s = edges[e]
                    ms.append(_rot(tot[j] - c2v[e], s, z))
                sign = None
                min1 = min2 = None
                for m in ms:
                    a = jnp.abs(m)
                    sg = jnp.where(m < 0, jnp.float32(-1.0), jnp.float32(1.0))
                    sign = sg if sign is None else sign * sg
                    if min1 is None:
                        min1, min2 = a, jnp.full_like(a, 3.4e38)
                    else:
                        min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                        min1 = jnp.minimum(min1, a)
                for m, e in zip(ms, e_by_row[r]):
                    a = jnp.abs(m)
                    sg = jnp.where(m < 0, jnp.float32(-1.0), jnp.float32(1.0))
                    excl = jnp.where(a == min1, min2, min1)
                    mag = jnp.maximum(excl - beta, 0.0)
                    _, j, s = edges[e]
                    new[e] = _rot(sign * sg * mag, -s, z)
            return jnp.stack(new)

        c2v0 = jnp.zeros((n_e, tb, z), jnp.float32)
        final = lax.fori_loop(0, iters, body, c2v0)
        tot = totals([final[e] for e in range(n_e)])
        for j in range(nb):
            out_ref[:, j, :] = jnp.where(
                tot[j] < 0, jnp.float32(1.0), jnp.float32(0.0)
            )

    out = pl.pallas_call(
        kernel,
        grid=(batch // tb,),
        in_specs=[
            pl.BlockSpec((tb, nb, z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, nb, z), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, nb, z), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(llr.reshape(batch, nb, z).astype(jnp.float32))
    return out.reshape(batch, code.n).astype(jnp.int8)
