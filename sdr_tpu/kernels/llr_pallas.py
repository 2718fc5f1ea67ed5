"""Fused Pallas equalize + max-log LLR kernel (post-FFT).

The per-subcarrier LLR inner loop the north star names — standalone, no
DFT: it consumes the frequency-domain grid, so it composes with ANY
transform backend. Used by ops.demod's hybrid path for n_fft beyond the
full-fused kernel's VMEM gate (demod_pallas._MAX_N_FFT): XLA's FFT does
the transform, this kernel fuses everything after it (one-tap unbiased
MMSE + per-axis max-log metric) so no equalized grid or distance
tensor ever touches HBM.

Same math and bit order as demod_pallas (bit-major lane output, caller
transposes); works for any n_fft that is a multiple of 128 — the only
VMEM occupant is the row tile itself, sized by _pick_tile.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels.demod_pallas import equalize_llr_bits

# VMEM budget for one block's resident tiles (y, h, out, temps).
_VMEM_BUDGET = 8 << 20


def _pick_tile(batch: int, n_syms: int, n_fft: int, bps: int) -> int:
    """Largest batch-tile divisor whose block fits the VMEM budget."""
    bytes_per_row = n_fft * (8 + 4 * bps + 16)  # y + out + working temps
    best = 1
    for tb in range(1, batch + 1):
        if batch % tb == 0 and tb * n_syms * bytes_per_row <= _VMEM_BUDGET:
            best = tb
    return best


def supported(shape, mod: Modulation) -> bool:
    """(batch, n_syms, n_fft) planar frequency-domain input. The grid
    only tiles the batch axis, so n_syms alone must fit the VMEM budget
    (a batch-tile of 1 is the smallest block)."""
    if len(shape) != 3:
        return False
    batch, n_syms, n_fft = shape
    if n_fft < 128 or n_fft % 128 != 0 or (batch * n_syms) % 8 != 0:
        return False
    bytes_per_row = n_fft * (8 + 4 * mod.bits_per_symbol + 16)
    return n_syms * bytes_per_row <= _VMEM_BUDGET


def llr_chain_pallas(
    yr: jnp.ndarray,
    yi: jnp.ndarray,
    hr: jnp.ndarray,
    hi: jnp.ndarray,
    mod: Modulation,
    noise_var: float,
    reduce_sum: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Equalize+LLR over (batch, n_syms, n_fft) planar post-FFT grids.

    hr/hi: (batch, 1, n_fft). Returns LLRs (batch, n_syms, n_fft·bps)
    in the public subcarrier-major bit order, or their scalar sum.
    """
    if not supported(yr.shape, mod):
        raise ValueError(f"unsupported shape {yr.shape} for fused LLR kernel")
    batch, n_syms, n_fft = yr.shape
    h_syms = hr.shape[1]  # 1 (per-link) or n_syms (per-symbol fading)
    if hr.shape != (batch, h_syms, n_fft) or h_syms not in (1, n_syms):
        raise ValueError(f"unsupported channel shape {hr.shape}")
    bps = mod.bits_per_symbol
    tb = _pick_tile(batch, n_syms, n_fft, bps)
    grid = (batch // tb,)
    rows = tb * n_syms
    inv_nv = np.float32(1.0 / max(float(noise_var), 1e-12))
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def kernel(yr_ref, yi_ref, hr_ref, hi_ref, out_ref):
        vr = yr_ref[:].reshape(rows, n_fft)
        vi = yi_ref[:].reshape(rows, n_fft)
        hr_b = jnp.broadcast_to(hr_ref[:], (tb, n_syms, n_fft)).reshape(rows, n_fft)
        hi_b = jnp.broadcast_to(hi_ref[:], (tb, n_syms, n_fft)).reshape(rows, n_fft)
        llr_bits = equalize_llr_bits(vr, vi, hr_b, hi_b, inv_nv, mod)

        if reduce_sum:
            total = jnp.float32(0.0)
            for b_llr in llr_bits:
                total = total + jnp.sum(b_llr, dtype=jnp.float32)
            out_ref[0] = jnp.broadcast_to(total, (8, 128))
        else:
            out_ref[:] = jnp.concatenate(llr_bits, axis=-1)

    in_specs = [
        pl.BlockSpec((tb, n_syms, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n_syms, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h_syms, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h_syms, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=batch * n_syms * n_fft * (12 + 6 * mod.levels_per_axis),
        bytes_accessed=(2 * batch * n_syms * n_fft + 2 * batch * h_syms * n_fft) * 4
        + (0 if reduce_sum else batch * n_syms * n_fft * bps * 4),
        transcendentals=0,
    )

    if reduce_sum:
        partial = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
            interpret=interpret,
        )(yr, yi, hr, hi)
        return jnp.sum(partial[:, 0, 0], dtype=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, n_fft * bps), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch * n_syms, n_fft * bps), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(yr, yi, hr, hi)
    out = out.reshape(batch * n_syms, bps, n_fft).transpose(0, 2, 1)
    return out.reshape(batch, n_syms, n_fft * bps)
