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

import numpy as np
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


# ---------------------------------------------------------------------------
# Round 5: the sublane-major kernel — the default TPU decode path.
#
# The round-2c kernel above lays (codewords, Z) tiles with Z on LANES,
# so every cyclic shift is a lane rotate (slice+slice+concat ≈ 3 VPU
# ops on (tb, 128)). Measured on hardware, that formulation is
# VPU-issue-bound at 12.6-13.5 ms per 2048-codeword decode (245 Mb/s)
# with rotations ~35% of the instruction stream.
#
# This kernel transposes the tile: Z on SUBLANES, codewords on lanes
# ((Z, 128) arrays). A cyclic shift becomes a SUBLANE concat — far
# cheaper in Mosaic's lowering — and the sign/magnitude bookkeeping
# runs on bitcast int32 planes (sign-product = XOR of sign bits, |m| =
# AND with 0x7FFFFFFF, final message = OR of sign into magnitude):
# measured 7.87 ms / 400 Mb/s at the same shape, DECISION-IDENTICAL to
# ops.ldpc.ldpc_decode (the min/offset arithmetic is unchanged; only
# sign transport changes representation).
#
# Where the remaining time goes (hardware ablations, docs/PERF.md
# round 5): the dataflow is VPU-issue-bound at ~72% of its ~6 ms
# issue-count SOL; the two levers past it both measured out:
# 16-bit message planes (Mosaic v5e rejects packed bf16/16-bit vector
# compares — "Target does not support this comparison") and
# sublane-ALIGNED shift codes (rotations become free VREG reindexing,
# but every girth-8 aligned candidate found costs 0.04-0.06 dB of
# waterfall — rejected). A layered schedule (schedule="layered",
# iters≈13) trades the flooding schedule's row-level ILP for half the
# iterations: ~5% faster, waterfall statistically matched but not
# decision-identical — opt-in.
# ---------------------------------------------------------------------------

_SIGNBIT = np.int32(np.uint32(0x80000000).view(np.int32))
_MAGMASK = np.int32(0x7FFFFFFF)


def _rot_sub(v: jnp.ndarray, s: int, z: int) -> jnp.ndarray:
    """Sublane-axis cyclic shift: out[r] = v[(r+s) mod Z]."""
    s = s % z
    if s == 0:
        return v
    return jnp.concatenate([v[s:], v[:s]], axis=0)


def supported_sublane(code: QcLdpcCode, batch: int) -> bool:
    """Lane-width codeword tiles; Z on sublanes (any multiple of 8)."""
    return code.z % 8 == 0 and batch % 128 == 0


def ldpc_decode_pallas_sublane(
    code: QcLdpcCode,
    llr: jnp.ndarray,
    iters: int = 25,
    offset: float = 0.5,
    schedule: str = "flooding",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(batch, n) channel LLRs → (batch, n) hard bits (int8).

    Rows-major public API; the sublane-major relayout happens in XLA
    around the kernel (a ~n·batch·4 B pass, <2% of decode time at the
    bench shape). ``schedule="flooding"`` is decision-identical to
    ``ops.ldpc.ldpc_decode``; ``"layered"`` halves the iteration count
    for the same waterfall (use iters ≈ half the flooding count —
    gated statistically in tests/test_ldpc.py).
    """
    if llr.ndim != 2 or llr.shape[-1] != code.n:
        raise ValueError(f"expected (batch, {code.n}) LLRs, got {llr.shape}")
    batch = llr.shape[0]
    if not supported_sublane(code, batch):
        raise ValueError(f"unsupported batch {batch} for the sublane decoder")
    llr_t = jnp.transpose(
        llr.reshape(batch, code.nb, code.z).astype(jnp.float32), (1, 2, 0)
    )
    out = _sublane_call(code, llr_t, iters, offset, schedule, interpret)
    return (
        jnp.transpose(out, (2, 0, 1)).reshape(batch, code.n).astype(jnp.int8)
    )


def _sublane_call(
    code: QcLdpcCode,
    llr_t: jnp.ndarray,
    iters: int,
    offset: float,
    schedule: str,
    interpret: bool | None,
) -> jnp.ndarray:
    """Shared sublane-major min-sum body: (nb, Z, batch) f32 LLR planes
    → (nb, Z, batch) f32 hard bits."""
    batch = llr_t.shape[2]
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    z, nb, mb = code.z, code.nb, code.mb
    edges = [(i, j, s) for i in range(mb) for j, s in code.row_edges(i)]
    e_by_row = [
        [e for e, (i, _, _) in enumerate(edges) if i == r] for r in range(mb)
    ]
    e_by_col = [
        [e for e, (_, j, _) in enumerate(edges) if j == c] for c in range(nb)
    ]
    n_e = len(edges)
    lt = 128
    off = float(offset)
    layered = schedule == "layered"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def _row_update(ms):
        """Min-sum row core on bitcast planes: returns the new
        check-to-variable values for a row's check-aligned inputs."""
        beta = jnp.float32(off)
        bits = [lax.bitcast_convert_type(m, jnp.int32) for m in ms]
        sgs = [b & _SIGNBIT for b in bits]
        abss = [
            lax.bitcast_convert_type(b & _MAGMASK, jnp.float32) for b in bits
        ]
        rsign = None
        for sg in sgs:
            rsign = sg if rsign is None else rsign ^ sg
        min1 = min2 = None
        for a in abss:
            if min1 is None:
                min1, min2 = a, jnp.full_like(a, 3.4e38)
            else:
                min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                min1 = jnp.minimum(min1, a)
        out = []
        for a, sg in zip(abss, sgs):
            excl = jnp.where(a == min1, min2, min1)
            mag = jnp.maximum(excl - beta, 0.0)
            out.append(
                lax.bitcast_convert_type(
                    lax.bitcast_convert_type(mag, jnp.int32)
                    | (rsign ^ sg),
                    jnp.float32,
                )
            )
        return out

    def kernel(llr_ref, out_ref):
        ch = [llr_ref[j] for j in range(nb)]  # (Z, lt) tiles

        def totals(c2v):
            out = []
            for j in range(nb):
                t = ch[j]
                for e in e_by_col[j]:
                    t = t + c2v[e]
                out.append(t)
            return out

        if layered:
            def body(_, carry):
                c2v = list(carry[0])
                tot = list(carry[1])
                for r in range(mb):
                    ms = []
                    for e in e_by_row[r]:
                        _, j, s = edges[e]
                        # c2v held CHECK-aligned in the layered form:
                        # only the totals rotate.
                        ms.append(_rot_sub(tot[j], s, z) - c2v[e])
                    nv = _row_update(ms)
                    for v, e in zip(nv, e_by_row[r]):
                        _, j, s = edges[e]
                        tot[j] = tot[j] + _rot_sub(v - c2v[e], -s, z)
                        c2v[e] = v
                return (tuple(c2v), tuple(tot))

            c0 = (
                tuple(jnp.zeros((z, lt), jnp.float32) for _ in range(n_e)),
                tuple(ch),
            )
            fin = lax.fori_loop(0, iters, body, c0)
            tot = list(fin[1])
        else:
            def body(_, carry):
                c2v = list(carry)
                tot = totals(c2v)
                new = [None] * n_e
                for r in range(mb):
                    ms = []
                    for e in e_by_row[r]:
                        _, j, s = edges[e]
                        ms.append(_rot_sub(tot[j] - c2v[e], s, z))
                    nv = _row_update(ms)
                    for v, e in zip(nv, e_by_row[r]):
                        _, j, s = edges[e]
                        new[e] = _rot_sub(v, -s, z)
                return tuple(new)

            c0 = tuple(jnp.zeros((z, lt), jnp.float32) for _ in range(n_e))
            fin = lax.fori_loop(0, iters, body, c0)
            tot = totals(list(fin))
        for j in range(nb):
            out_ref[j] = jnp.where(
                tot[j] < 0, jnp.float32(1.0), jnp.float32(0.0)
            )

    out = pl.pallas_call(
        kernel,
        grid=(batch // lt,),
        in_specs=[
            pl.BlockSpec((nb, z, lt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, z, lt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, z, batch), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # The per-tile message state (E+2·nb planes of (Z, 128) f32
            # plus loop temporaries) legitimately exceeds the 16 MB
            # default scoped-vmem cap; v5e VMEM is 128 MB.
            vmem_limit_bytes=64 << 20,
        ),
        interpret=interpret,
    )(llr_t)
    return out


def ldpc_decode_sublane_t(
    code: QcLdpcCode,
    llr_t: jnp.ndarray,
    iters: int = 25,
    offset: float = 0.5,
    schedule: str = "flooding",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Transposed-input form: (n, batch) LLRs → (n, batch) hard bits.

    The fused-seam entry for the coded fast engine: the CL demod's
    kernel-order LLR plane is bit-major × channel-lanes, so after the
    composed deinterleave gather the codeword axis is ALREADY on
    lanes — (n, batch) reshapes to the kernel's (nb, Z, batch) blocks
    for free, skipping the rows-major round trip
    ``ldpc_decode_pallas_sublane`` pays on both sides.
    """
    if llr_t.ndim != 2 or llr_t.shape[0] != code.n:
        raise ValueError(f"expected ({code.n}, batch) LLRs, got {llr_t.shape}")
    batch = llr_t.shape[1]
    if not supported_sublane(code, batch):
        raise ValueError(f"unsupported batch {batch} for the sublane decoder")
    # Same kernel body as ldpc_decode_pallas_sublane, minus the
    # relayout: route through a private helper to keep one source of
    # truth for the min-sum dataflow.
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _sublane_call(
        code, llr_t.reshape(code.nb, code.z, batch).astype(jnp.float32),
        iters, offset, schedule, interpret,
    ).reshape(code.n, batch).astype(jnp.int8)
