"""Two-phase four-step wideband modulator (HBM-staged variant).

TX twin of kernels/fourstep_split_pallas.py. The single-kernel
four-step TX (fourstep_tx_pallas.py) keeps all N1 transform chunks
live in VMEM, which caps its row tile at ~32 rows — so its stage-1
matmuls run on quarter-filled MXU sublanes, the same granularity
problem the demod side had. This variant stages the twiddled stage-1
output through HBM so each phase gets its natural tile:

- Phase A (MXU): per (k1, batch-tile) block — Gray decode, ONE
  (rows, N2)·(N2, N2) Gauss matmul with rows up to 512 (raw PAM
  integers against the norm-folded inverse matrix — bf16-exact x, 6
  MXU passes), twiddle, written to HBM digit-major (N1, B, S, N2).
- Phase B (VPU): per batch-tile block — trace-time-unrolled radix-2
  chunk IFFT over the N1 axis, then the chunk-granular CP layout
  (the last cp/N2 time chunks written first, ofdm.hpp:21 exactly).

HBM per output sample: ~3.6 B (int32 indices, N/sym_len) +
2·(N/sym_len)·8 B (intermediate write+read, f32) + 8 B (output)
≈ 26 B → staging SOL ≈ 16 GS/s at healthy bandwidth; with
``SDR_TPU_FOURSTEP_STAGE=bf16`` the hop halves (≈ 19 B, SOL ≈ 22).
Same numerics contract as tx_chain_fourstep (tests/test_fourstep.py);
the reference chain this supersedes is to_constl + ofdm::tx
(modulation.hpp:79-94, ofdm.hpp:13-35).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels import _matmul
from sdr_tpu.kernels.fourstep_pallas import _fft_chunks, _pick_n2
from sdr_tpu.kernels.fourstep_split_pallas import stage_dtype
from sdr_tpu.kernels.fourstep_tx_pallas import _stage1_mats, _tx_twiddles
from sdr_tpu.kernels.tx_pallas import _gray_to_binary_vec


def _pick_tile_a(batch: int, n_syms: int, n2: int) -> int:
    """Phase-A batch tile: up to 512 rows (the proven MXU shape),
    bounded by a ~4 MB estimate (Mosaic allocates ~2.5x)."""
    best = 0
    for tb in range(1, batch + 1):
        if batch % tb:
            continue
        rows = tb * n_syms
        if rows % 8:
            continue
        if rows <= 512 and rows * n2 * 28 <= (4 << 20):
            best = tb
    return best


def _pick_tile_b(batch: int, n_syms: int, n_fft: int, n2: int) -> int:
    """Phase-B batch tile: the live chunk set is rows·N·16 B during the
    radix-2 recursion; keep the estimate within ~2 MB."""
    best = 0
    for tb in range(1, batch + 1):
        if batch % tb == 0 and tb * n_syms * n_fft * 16 <= (2 << 20):
            best = tb
    return best


def supported(shape, cp_len: int, mod: Modulation) -> bool:
    """Same numerology gate as the single-kernel four-step TX, plus
    feasible tiles for both phases."""
    if len(shape) != 3:
        return False
    batch, n_syms, n_fft = shape
    if (batch * n_syms) % 8 != 0:
        return False
    if n_fft < 1024 or n_fft & (n_fft - 1):
        return False
    n2 = _pick_n2(n_fft, cp_len)
    if n2 is None:
        return False
    return (
        _pick_tile_a(batch, n_syms, n2) > 0
        and _pick_tile_b(batch, n_syms, n_fft, n2) > 0
    )


def tx_chain_fourstep2(
    idx: jnp.ndarray,
    cp_len: int,
    mod: Modulation,
    interpret: bool | None = None,
):
    """(batch, n_syms, n_fft) int32 symbol indices → planar (re, im)
    (batch, n_syms, n_fft + cp_len); contract of tx_chain_fourstep."""
    if not supported(idx.shape, cp_len, mod):
        raise ValueError(f"unsupported shape {idx.shape} for split four-step TX")
    batch, n_syms, n_fft = idx.shape
    n2 = _pick_n2(n_fft, cp_len)
    n1 = n_fft // n2
    sym_len = n_fft + cp_len
    cps = sym_len // n2
    cp_chunks = cp_len // n2
    tba = _pick_tile_a(batch, n_syms, n2)
    tbb = _pick_tile_b(batch, n_syms, n_fft, n2)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    sdt = stage_dtype()

    # Digit permutation on the index grid, chunk axis leading so phase
    # A's (1, tb, S, n2) blocks keep full trailing dims (Mosaic's
    # block-shape rule — fourstep_split_pallas.py layout note).
    idx4 = idx.reshape(batch, n_syms, n2, n1).transpose(3, 0, 1, 2)
    twr, twi = _tx_twiddles(n1, n2)
    twr4 = jnp.asarray(twr).reshape(n1, 1, 1, n2)
    twi4 = jnp.asarray(twi).reshape(n1, 1, 1, n2)
    mode = _matmul.mxu_mode()
    n_w = _matmul.n_w_operands(mode)
    w_ops = _matmul.prepare_w(
        *_stage1_mats(n2, n_fft, mod.unit_energy_scale), mode
    )

    m = mod.bits_per_axis
    L = mod.levels_per_axis
    rows_a = tba * n_syms

    def kernel_a(idx_ref, twr_ref, twi_ref, *rest):
        w_refs = rest[:n_w]
        tr_ref, ti_ref = rest[n_w], rest[n_w + 1]
        g = idx_ref[0].reshape(rows_a, n2)
        if mod is Modulation.BPSK:
            gi, gq = g, None
        else:
            gi = g >> m
            gq = g & jnp.int32(L - 1)
        bi = _gray_to_binary_vec(gi, m)
        # Raw PAM integers (norm folded into W): bf16-exact x.
        xr = (2 * bi - (L - 1)).astype(jnp.float32)
        if gq is None:
            xi = jnp.zeros_like(xr)
        else:
            bq = _gray_to_binary_vec(gq, m)
            xi = (2 * bq - (L - 1)).astype(jnp.float32)
        yr, yi = _matmul.complex_dot_xbf16(
            xr.astype(jnp.bfloat16), xi.astype(jnp.bfloat16), w_refs, mode
        )
        wr = twr_ref[0, 0]
        wi = twi_ref[0, 0]
        tr_ref[0] = (yr * wr - yi * wi).reshape(tba, n_syms, n2).astype(sdt)
        ti_ref[0] = (yr * wi + yi * wr).reshape(tba, n_syms, n2).astype(sdt)

    stage_spec = pl.BlockSpec(
        (1, tba, n_syms, n2), lambda k, j: (k, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tw_spec = pl.BlockSpec(
        (1, 1, 1, n2), lambda k, j: (k, 0, 0, 0), memory_space=pltpu.VMEM
    )
    tr, ti = pl.pallas_call(
        kernel_a,
        grid=(n1, batch // tba),
        in_specs=[
            pl.BlockSpec((1, tba, n_syms, n2), lambda k, j: (k, j, 0, 0),
                         memory_space=pltpu.VMEM),
            tw_spec,
            tw_spec,
        ] + [
            pl.BlockSpec((n2, n2), lambda k, j: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in w_ops
        ],
        out_specs=(stage_spec, stage_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n1, batch, n_syms, n2), sdt),
            jax.ShapeDtypeStruct((n1, batch, n_syms, n2), sdt),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(idx4, twr4, twi4, *w_ops)

    rows_b = tbb * n_syms

    def kernel_b(tr_ref, ti_ref, re_ref, im_ref):
        chunks = [
            (
                tr_ref[c].reshape(rows_b, n2).astype(jnp.float32),
                ti_ref[c].reshape(rows_b, n2).astype(jnp.float32),
            )
            for c in range(n1)
        ]
        x = _fft_chunks(chunks, inverse=True)  # time chunks n1 = 0..N1
        # Chunk-granular CP: the LAST cp_chunks time chunks first.
        for j in range(cp_chunks):
            xr_c, xi_c = x[n1 - cp_chunks + j]
            re_ref[:, :, j, :] = xr_c.reshape(tbb, n_syms, n2)
            im_ref[:, :, j, :] = xi_c.reshape(tbb, n_syms, n2)
        for c in range(n1):
            xr_c, xi_c = x[c]
            re_ref[:, :, cp_chunks + c, :] = xr_c.reshape(tbb, n_syms, n2)
            im_ref[:, :, cp_chunks + c, :] = xi_c.reshape(tbb, n_syms, n2)

    out_spec = pl.BlockSpec(
        (tbb, n_syms, cps, n2), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    re4, im4 = pl.pallas_call(
        kernel_b,
        grid=(batch // tbb,),
        in_specs=[
            pl.BlockSpec((n1, tbb, n_syms, n2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, tbb, n_syms, n2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, n_syms, cps, n2), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_syms, cps, n2), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(tr, ti)
    return (
        re4.reshape(batch, n_syms, sym_len),
        im4.reshape(batch, n_syms, sym_len),
    )
