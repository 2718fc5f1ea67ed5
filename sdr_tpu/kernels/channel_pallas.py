"""Fused fading + AWGN channel kernel: the fast engine's noise stage.

The reference library has no channel at all (its loopback feeds TX
straight into RX, QFDemoWindow.cpp:210-224); the AWGN/fading impairment
chain is a north-star addition (BASELINE.json configs). Round-4's fast
engine applied it as XLA elementwise work between the TX and demod
Pallas kernels — measured on hardware, that stage costs HALF the
engine (12.6 of 24.8 ms/iter at the 8192×64 headline config): the
threefry normal draws are ~30 VPU ops per f32 and the
complex-materialize → multiply → add → re/im-split chain pays several
HBM round trips.

This kernel replaces the whole stage with ONE read-modify-write pass:

  out = x · h  +  σ · n,   n ~ CN(0, 1) from the on-core PRNG

- **On-core PRNG** (``pltpu.prng_seed`` / ``prng_random_bits`` +
  Box–Muller, the mc_pallas recipe): near-free vs threefry.
- **Determinism contract** (what keeps the sharded fast path bit-exact
  vs the unsharded one): the PRNG is seeded per (channel-block,
  symbol-chunk) as ``seed ⊕ f(global_channel_id_of_block_row_0,
  chunk_index)`` — a pure function of GLOBAL channel ids, never of
  the device grid. Any 128-aligned slice of consecutive global
  channels therefore draws identical noise wherever it executes
  (tests/test_channel_kernel.py asserts this on the virtual mesh).
  The stream differs from the threefry stream the jnp path draws —
  the engines' BER is validated statistically, not bit-wise, against
  theory (same policy as kernels/mc_pallas.py).
- **Fading fusion**: per-link (flat Rayleigh/Rician) or per-symbol
  (Jakes block fading) complex scalar gains ride along as (B, h_syms)
  planes and multiply in-register. Frequency-selective models apply
  their tap convolution outside (XLA) and use the noise-only mode.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.kernels.mc_pallas import _gauss_pair

_TB = 128  # channel rows per block: one lane tile, and the alignment
#            quantum of the determinism contract (block seeds are a
#            function of global channel ids in steps of 128)


def _pick_syms(n_syms: int, sym_len: int) -> int:
    """Symbols per block: rank-3 Pallas blocks need the sublane dim
    divisible by 8 (or the full axis), so k ∈ {8m divisors of S} ∪ {S};
    largest whose four double-buffered (TB, k, L) f32 windows fit
    ~12 MB (the call raises the scoped-vmem cap to 48 MB), 0 if none."""
    budget = 12 << 20
    per_sym = 4 * 2 * _TB * sym_len * 4
    cands = [c for c in range(8, n_syms + 1, 8) if n_syms % c == 0]
    if n_syms * per_sym <= budget:
        cands.append(n_syms)
    k = 0
    for cand in cands:
        if cand * per_sym <= budget and cand > k:
            k = cand
    return k


def supported(shape, h_syms: int) -> bool:
    """(B, S, L) planar rows with a 128-tiling batch, a blockable
    symbol axis, and per-link or per-symbol scalar gains."""
    if len(shape) != 3 or shape[0] % _TB:
        return False
    if _pick_syms(shape[1], shape[2]) == 0:
        return False
    return h_syms in (1, shape[1])


def fade_awgn_pallas(
    re: jnp.ndarray,
    im: jnp.ndarray,
    hr_s: jnp.ndarray | None,
    hi_s: jnp.ndarray | None,
    seed: jnp.ndarray,
    noise_var: float,
    ch_ids: jnp.ndarray | None = None,
    interpret: bool | None = None,
    noise: tuple[jnp.ndarray, jnp.ndarray] | None = None,
):
    """(B, S, L) planar samples → faded + noise-injected planes.

    hr_s/hi_s: (B, h_syms) complex scalar gain planes (h_syms ∈
    {1, S}), or None for the noise-only mode. ``seed`` is a traced
    int32; ``ch_ids`` the (B,) GLOBAL channel ids (arange default).
    ``noise_var`` is the complex noise variance per sample (host
    float, cfg-static like every trace-time constant in link.fast).

    ``noise``: optional pre-drawn N(0,1) planes ((B,S,L) each for the
    re/im components) — the injection mode (mc_pallas policy): the
    on-core PRNG has no CPU lowering, so off-TPU validation injects
    threefry noise and exercises the identical kernel dataflow.
    """
    B, S, L = re.shape
    if not supported(re.shape, 1 if hr_s is None else hr_s.shape[1]):
        raise ValueError(f"unsupported channel-kernel shape {re.shape}")
    k = _pick_syms(S, L)
    inject = noise is not None
    fade = hr_s is not None
    h_syms = hr_s.shape[1] if fade else 1
    per_sym_h = h_syms == S
    sigma = np.float32(np.sqrt(max(float(noise_var), 0.0) / 2.0))
    if ch_ids is None:
        chb = jnp.arange(0, B, _TB, dtype=jnp.int32)
    else:
        chb = ch_ids[::_TB].astype(jnp.int32)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def kernel(seed_ref, chb_ref, *rest):
        if inject:
            nr_ref, ni_ref = rest[:2]
            rest = rest[2:]
        if fade:
            re_ref, im_ref, hr_ref, hi_ref, or_ref, oi_ref = rest
        else:
            re_ref, im_ref, or_ref, oi_ref = rest
        if inject:
            g1 = nr_ref[:]
            g2 = ni_ref[:]
        else:
            c = pl.program_id(0)
            t = pl.program_id(1)
            # Seed = f(seed, global channel block, symbol chunk): grid-
            # and shard-layout-independent by construction. Mosaic
            # accepts at most two seed words, so the block id folds
            # into the first via a Weyl multiply (wrapping int32).
            pltpu.prng_seed(
                seed_ref[0] ^ (chb_ref[c] * jnp.int32(-1640531527)), t
            )
            g1, g2 = _gauss_pair(
                pltpu.prng_random_bits((_TB, k, L)),
                pltpu.prng_random_bits((_TB, k, L)),
            )
        # Blocks are RANK-3 (TB, k, L) windows of the engine's native
        # (B, S, L) planes: a flat (B, S*L) view would tile the lane
        # axis differently and force XLA to RELAYOUT-copy both planes
        # around the kernel (measured +8 ms/iter at the headline
        # config — more than the kernel itself).
        xr = re_ref[:]
        xi = im_ref[:]
        if fade:
            hr1 = hr_ref[:]  # (TB, k or 1, 1) broadcasts over symbols
            hi1 = hi_ref[:]
            yr = xr * hr1 - xi * hi1
            yi = xr * hi1 + xi * hr1
        else:
            yr = xr
            yi = xi
        or_ref[:] = yr + jnp.float32(sigma) * g1
        oi_ref[:] = yi + jnp.float32(sigma) * g2

    grid = (B // _TB, S // k)
    x_spec = pl.BlockSpec((_TB, k, L), lambda c, t: (c, t, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        x_spec,
        x_spec,
    ]
    operands = [
        jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
        chb,
    ]
    if inject:
        in_specs.insert(2, x_spec)
        in_specs.insert(3, x_spec)
        operands += [
            noise[0].astype(jnp.float32),
            noise[1].astype(jnp.float32),
        ]
    operands += [
        re.astype(jnp.float32),
        im.astype(jnp.float32),
    ]
    if fade:
        if per_sym_h:
            h_spec = pl.BlockSpec((_TB, k, 1), lambda c, t: (c, t, 0))
        else:
            h_spec = pl.BlockSpec((_TB, 1, 1), lambda c, t: (c, 0, 0))
        in_specs += [h_spec, h_spec]
        operands += [
            hr_s[:, :, None].astype(jnp.float32),
            hi_s[:, :, None].astype(jnp.float32),
        ]
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[x_spec, x_spec],
        out_shape=[jax.ShapeDtypeStruct((B, S, L), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Rank-3 (TB, 8m, L) windows can exceed the 16 MB DEFAULT
            # scoped-vmem cap (a compiler default, not the hardware).
            vmem_limit_bytes=48 << 20,
        ),
        interpret=interpret,
    )(*operands)
    return out_r, out_i


def channel_backend() -> str:
    return os.environ.get("SDR_TPU_CHANNEL_BACKEND", "auto")


def seed32(key: jax.Array) -> jnp.ndarray:
    """Fold a JAX PRNG key to the kernel's int32 seed (pure function
    of the key, so the sharded/unsharded paths agree)."""
    data = jax.random.key_data(key) if jnp.issubdtype(
        key.dtype, jax.dtypes.prng_key
    ) else key
    x = data.reshape(-1)
    return lax.bitcast_convert_type(
        x[0] ^ x[-1], jnp.int32
    )


def payload_supported(B: int, S: int, N: int) -> bool:
    return B % _TB == 0 and (S * N) % 128 == 0


def payload_idx_pallas(
    B: int,
    S: int,
    N: int,
    bps: int,
    seed: jnp.ndarray,
    ch_ids: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, S, N) random symbol indices from the on-core PRNG — the fast
    engine's payload draw without the threefry pass.

    Determinism contract (same as ``fade_awgn_pallas``): the stream is
    a pure function of (seed, global channel id) with a FIXED 128-
    channel block rule — so the TX side, the RX side's recompute, and
    any shard of consecutive 128-aligned channels draw IDENTICAL
    indices regardless of where they execute. Output dtype is int8
    (bps ≤ 8) or int16 — the narrow form every consumer kernel widens
    in-register (round-5 idx-plane narrowing).

    No CPU lowering for the PRNG: off-TPU callers keep the threefry
    path (link.fast gates on the backend).
    """
    if not payload_supported(B, S, N):
        raise ValueError(f"unsupported payload shape ({B},{S},{N})")
    out_dt = jnp.int8 if bps <= 7 else jnp.int16
    if ch_ids is None:
        chb = jnp.arange(0, B, _TB, dtype=jnp.int32)
    else:
        chb = ch_ids[::_TB].astype(jnp.int32)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cols = S * N

    def kernel(seed_ref, chb_ref, out_ref):
        c = pl.program_id(0)
        pltpu.prng_seed(
            seed_ref[0] ^ (chb_ref[c] * jnp.int32(-1640531527)),
            jnp.int32(0x5DEECE66),
        )
        bits = pltpu.prng_random_bits((_TB, cols))
        idx = jax.lax.bitcast_convert_type(bits, jnp.int32) & jnp.int32(
            (1 << bps) - 1
        )
        out_ref[:] = idx.astype(out_dt)

    out = pl.pallas_call(
        kernel,
        grid=(B // _TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TB, cols), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, cols), out_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(jnp.atleast_1d(jnp.asarray(seed, jnp.int32)), chb)
    return out.reshape(B, S, N)
