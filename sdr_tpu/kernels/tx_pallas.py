"""Fused Pallas TPU modulator: Gray QAM map → IFFT → CP insert.

TX twin of kernels/demod_pallas.py — the transmit chain the reference
runs as to_constl + ofdm::tx (modulation.hpp:79-94, ofdm.hpp:13-35),
fused into one VMEM-resident kernel:

- input: per-subcarrier SYMBOL INDICES (int32) — the bits→index pack is
  a cheap fused XLA op at the caller (ops.modulation._bits_to_ints);
- Gray→binary→PAM level is computed ARITHMETICALLY on the VPU
  (prefix-XOR Gray decode, level = 2·b − (L−1), unit-Es scale) — no
  table gather, which Pallas TPU has no efficient primitive for;
- the IFFT runs as an MXU matmul against the inverse DFT matrix with
  the reference's 1/N scaling folded into the matrix (fft.hpp:197-204);
- the cyclic prefix is two static slice writes: out[:, :cp] = y[:, N−cp:],
  out[:, cp:] = y (the last-cp-samples-first layout of ofdm.hpp:21).

Output is planar float32 (re, im), shape (batch, n_syms, n_fft+cp).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels import _matmul

# VMEM bound on the W operands — see demod_pallas._MAX_N_FFT.
_MAX_N_FFT = 512


def supported(shape, mod: Modulation) -> bool:
    """(batch, n_syms, n_fft) int32 indices; n_fft fills 128 lanes and
    fits the VMEM budget; n_syms must fit a batch-tile-of-1 block."""
    if len(shape) != 3:
        return False
    batch, n_syms, n_fft = shape
    return (
        128 <= n_fft <= _MAX_N_FFT
        and n_fft % 128 == 0
        and (batch * n_syms) % 8 == 0
        and n_syms <= _matmul.row_target(n_fft)
    )


@functools.lru_cache(maxsize=None)
def _idft_mats(n: int, scale: float = 1.0):
    """(Wr, Wi) float32 (n, n): inverse kernel e^{+2πi jk/n} · scale / n.

    The constellation's unit-energy norm is folded in as ``scale`` so
    the kernel can matmul RAW PAM integers (odd ints ≤ L−1) — which are
    exact in bfloat16, collapsing the x-side hi/lo split
    (``_matmul.complex_dot_xbf16``): 6 MXU passes instead of 9 with
    strictly better accuracy (no f32-rounded x·norm to re-split)."""
    jk = np.outer(np.arange(n), np.arange(n)).astype(np.float64)
    w = np.exp(2j * np.pi * jk / n) * (float(scale) / n)
    return np.real(w).astype(np.float32), np.imag(w).astype(np.float32)


def _gray_to_binary_vec(g, m: int):
    """Prefix-XOR Gray decode, unrolled for m-bit values."""
    b = g
    shift = 1
    while shift < m:
        b = b ^ (b >> shift)
        shift <<= 1
    return b


def _make_kernel(tb: int, n_syms: int, n_fft: int, cp_len: int,
                 mod: Modulation, channel=None):
    """TX kernel body; ``channel`` (round 5) fuses the flat-fading
    multiply and the AWGN draw into the epilogue — the waveform leaves
    the kernel already impaired, eliminating the separate channel-
    kernel HBM round trip. ``channel``: dict(sigma=<per-component noise
    std>, h_syms=<0 | 1 | n_syms>). Noise is seeded PER CHANNEL ROW
    from the row's GLOBAL channel id, so the stream is independent of
    the batch tiling — the same split==full contract as
    kernels/channel_pallas.py, held here even though ``tb`` varies
    with shape."""
    rows = tb * n_syms
    m = mod.bits_per_axis
    L = mod.levels_per_axis
    sym_len = n_fft + cp_len

    mode = _matmul.mxu_mode()
    n_w = _matmul.n_w_operands(mode)
    ch = channel

    def kernel(idx_ref, *rest):
        if ch is not None:
            seed_ref, chid_ref = rest[:2]
            rest = rest[2:]
            if ch["h_syms"]:
                hr_ref, hi_ref = rest[:2]
                rest = rest[2:]
            if ch.get("n_taps"):
                tr_ref, ti_ref = rest[:2]
                rest = rest[2:]
        w_refs = rest[:n_w]
        re_ref, im_ref = rest[n_w], rest[n_w + 1]
        # idx may ride narrow (int8/int16, round 5) — widen in-register.
        idx = idx_ref[:].reshape(rows, n_fft).astype(jnp.int32)
        if mod is Modulation.BPSK:
            gi = idx
            gq = None
        else:
            gi = idx >> m
            gq = idx & jnp.int32(L - 1)
        bi = _gray_to_binary_vec(gi, m)
        # Raw PAM integers (norm folded into W): exact in bfloat16, so
        # the Gauss product needs 6 MXU passes, not 9 (_matmul docs).
        xr = (2 * bi - (L - 1)).astype(jnp.float32)
        if gq is None:
            xi = jnp.zeros_like(xr)
        else:
            bq = _gray_to_binary_vec(gq, m)
            xi = (2 * bq - (L - 1)).astype(jnp.float32)

        yr, yi = _matmul.complex_dot_xbf16(
            xr.astype(jnp.bfloat16), xi.astype(jnp.bfloat16), w_refs, mode
        )

        if ch is not None:
            n_taps = ch.get("n_taps", 0)
            if n_taps:
                # Build the full CP'd waveform, then run the causal FIR
                # on the 3-D (tb, n_syms, sym_len) view: tap l's input
                # is the stream delayed by l — same-row samples plus
                # the PREVIOUS row's tail, with the s=0 head zeroed —
                # which reproduces apply_multipath's zero-history
                # stream conv (static taps) and the per-symbol-taps TDL
                # form (each output symbol uses its OWN taps, history
                # from the previous symbol: ops.channel.symbol_history).
                if cp_len:
                    fr = jnp.concatenate(
                        [yr[:, n_fft - cp_len:], yr], axis=1
                    )
                    fi = jnp.concatenate(
                        [yi[:, n_fft - cp_len:], yi], axis=1
                    )
                else:
                    fr, fi = yr, yi
                x3r = fr.reshape(tb, n_syms, sym_len)
                x3i = fi.reshape(tb, n_syms, sym_len)
                # Row-shifted planes (previous symbol per row, zeros at
                # s=0), built ONCE at full lane extent — Mosaic rejects
                # sublane concats of lane-offset slices, so the tap
                # loop only lane-concats below.
                z1 = jnp.zeros((tb, 1, sym_len), jnp.float32)
                prev_r = jnp.concatenate([z1, x3r[:, :-1, :]], axis=1)
                prev_i = jnp.concatenate([z1, x3i[:, :-1, :]], axis=1)
                acc_r = None
                acc_i = None
                for l in range(n_taps):
                    if l == 0:
                        sr, si = x3r, x3i
                    else:
                        sr = jnp.concatenate(
                            [prev_r[:, :, sym_len - l:], x3r[:, :, :-l]],
                            axis=2,
                        )
                        si = jnp.concatenate(
                            [prev_i[:, :, sym_len - l:], x3i[:, :, :-l]],
                            axis=2,
                        )
                    if ch["taps_per_sym"]:
                        t_r = tr_ref[:][:, :, l : l + 1]  # (tb, S, 1)
                        t_i = ti_ref[:][:, :, l : l + 1]
                    else:
                        # (tb, 1) → (tb, 1, 1): trailing-axis reshape
                        # (None-indexing lowers as an unsupported
                        # gather in Mosaic).
                        t_r = tr_ref[:][:, l : l + 1].reshape(tb, 1, 1)
                        t_i = ti_ref[:][:, l : l + 1].reshape(tb, 1, 1)
                    cr = t_r * sr - t_i * si
                    ci = t_r * si + t_i * sr
                    acc_r = cr if acc_r is None else acc_r + cr
                    acc_i = ci if acc_i is None else acc_i + ci
                from sdr_tpu.kernels.mc_pallas import _gauss_pair

                sigma = jnp.float32(ch["sigma"])
                row0 = pl.program_id(0) * tb
                g1s = []
                g2s = []
                for i in range(tb):
                    pltpu.prng_seed(
                        seed_ref[0]
                        ^ (chid_ref[row0 + i] * jnp.int32(-1640531527)),
                        jnp.int32(0x2545F491),
                    )
                    a, b = _gauss_pair(
                        pltpu.prng_random_bits((n_syms, sym_len)),
                        pltpu.prng_random_bits((n_syms, sym_len)),
                    )
                    g1s.append(a)
                    g2s.append(b)
                g1 = jnp.concatenate(g1s, axis=0) if tb > 1 else g1s[0]
                g2 = jnp.concatenate(g2s, axis=0) if tb > 1 else g2s[0]
                re_ref[:] = (
                    acc_r.reshape(rows, sym_len) + sigma * g1
                )
                im_ref[:] = (
                    acc_i.reshape(rows, sym_len) + sigma * g2
                )
                return
            if ch["h_syms"]:
                # (tb, h_syms) complex scalar gains, applied on the
                # 3-D (tb, n_syms, n_fft) view — a (rows, 1) gain
                # column would need a lane→sublane relayout Mosaic
                # rejects ("unsupported shape cast").
                fr = hr_ref[:][:, :, None]  # (tb, h_syms, 1)
                fi = hi_ref[:][:, :, None]
                y3r = yr.reshape(tb, n_syms, n_fft)
                y3i = yi.reshape(tb, n_syms, n_fft)
                yr = (y3r * fr - y3i * fi).reshape(rows, n_fft)
                yi = (y3r * fi + y3i * fr).reshape(rows, n_fft)
            from sdr_tpu.kernels.mc_pallas import _gauss_pair

            sigma = jnp.float32(ch["sigma"])
            g1s = []
            g2s = []
            row0 = pl.program_id(0) * tb
            for i in range(tb):
                # One seed per GLOBAL channel id; fixed (n_syms,
                # sym_len) draw shape → tiling-independent stream.
                pltpu.prng_seed(
                    seed_ref[0]
                    ^ (chid_ref[row0 + i] * jnp.int32(-1640531527)),
                    jnp.int32(0x2545F491),
                )
                a, b = _gauss_pair(
                    pltpu.prng_random_bits((n_syms, sym_len)),
                    pltpu.prng_random_bits((n_syms, sym_len)),
                )
                g1s.append(a)
                g2s.append(b)
            g1 = jnp.concatenate(g1s, axis=0) if tb > 1 else g1s[0]
            g2 = jnp.concatenate(g2s, axis=0) if tb > 1 else g2s[0]
            if cp_len:
                re_ref[:, :cp_len] = (
                    yr[:, n_fft - cp_len:] + sigma * g1[:, :cp_len]
                )
                im_ref[:, :cp_len] = (
                    yi[:, n_fft - cp_len:] + sigma * g2[:, :cp_len]
                )
            re_ref[:, cp_len:] = yr + sigma * g1[:, cp_len:]
            im_ref[:, cp_len:] = yi + sigma * g2[:, cp_len:]
            return

        if cp_len:
            re_ref[:, :cp_len] = yr[:, n_fft - cp_len :]
            im_ref[:, :cp_len] = yi[:, n_fft - cp_len :]
        re_ref[:, cp_len:] = yr
        im_ref[:, cp_len:] = yi

    return kernel, sym_len


def tx_chain_pallas(
    indices: jnp.ndarray,
    cp_len: int,
    mod: Modulation,
    interpret: bool | None = None,
):
    """Symbol indices (batch, n_syms, n_fft) int32 → planar (re, im)
    time samples (batch, n_syms, n_fft + cp_len) float32.

    Matches ops.modulation.modulate ∘ ops.ofdm.ofdm_tx exactly up to
    f32 matmul-DFT rounding (tests/test_tx_pallas.py).
    """
    if not supported(indices.shape, mod):
        raise ValueError(f"unsupported shape {indices.shape} for fused TX kernel")
    batch, n_syms, n_fft = indices.shape
    if not 0 <= cp_len <= n_fft:
        raise ValueError(f"cp_len {cp_len} out of range for n_fft {n_fft}")
    tb = _matmul.pick_batch_tile(batch, n_syms, n_fft)
    grid = (batch // tb,)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    w_ops = _matmul.prepare_w(
        *_idft_mats(n_fft, mod.unit_energy_scale), _matmul.mxu_mode()
    )
    kernel, sym_len = _make_kernel(tb, n_syms, n_fft, cp_len, mod)
    rows_per_block = tb * n_syms

    re, im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n_syms, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((n_fft, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in w_ops
        ],
        out_specs=(
            pl.BlockSpec((rows_per_block, sym_len), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, sym_len), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch * n_syms, sym_len), jnp.float32),
            jax.ShapeDtypeStruct((batch * n_syms, sym_len), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * batch * n_syms * n_fft * n_fft,
            bytes_accessed=(batch * n_syms * (n_fft + 2 * sym_len)) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(
        indices
        if jnp.issubdtype(indices.dtype, jnp.integer)
        else indices.astype(jnp.int32),
        *w_ops,
    )
    return (
        re.reshape(batch, n_syms, sym_len),
        im.reshape(batch, n_syms, sym_len),
    )


def tx_channel_chain_pallas(
    indices: jnp.ndarray,
    cp_len: int,
    mod: Modulation,
    seed: jnp.ndarray,
    ch_ids: jnp.ndarray,
    noise_var: float,
    hs_r: jnp.ndarray | None = None,
    hs_i: jnp.ndarray | None = None,
    taps_r: jnp.ndarray | None = None,
    taps_i: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """Fused TX + flat channel: indices → IMPAIRED planar time samples.

    The round-5 composition of ``tx_chain_pallas`` and the channel
    kernel in ONE pass: Gray map → IDFT matmul → CP insert → per-row
    complex scalar fading (``hs_r/hs_i`` (batch, h_syms), h_syms ∈
    {1, n_syms}; None = AWGN-only) → on-core-PRNG AWGN — so the clean
    waveform never round-trips HBM. Noise is a pure function of
    (seed, global channel id) with a FIXED per-row draw shape,
    preserving the split==full / sharded bit-exactness contract for
    any batch tiling. TPU only (no interpret lowering for the PRNG).

    ``noise_var`` is the per-complex-sample time-domain variance
    (link.fast's ``tvar``); per-component std = sqrt(noise_var/2).
    """
    if not supported(indices.shape, mod):
        raise ValueError(f"unsupported shape {indices.shape} for fused TX kernel")
    batch, n_syms, n_fft = indices.shape
    if not 0 <= cp_len <= n_fft:
        raise ValueError(f"cp_len {cp_len} out of range for n_fft {n_fft}")
    h_syms = 0 if hs_r is None else hs_r.shape[1]
    if h_syms not in (0, 1, n_syms):
        raise ValueError(f"unsupported gain plane shape {hs_r.shape}")
    n_taps = 0 if taps_r is None else taps_r.shape[-1]
    taps_per_sym = taps_r is not None and taps_r.ndim == 3
    if taps_r is not None and h_syms:
        raise ValueError("taps and scalar gains are mutually exclusive")
    if n_taps > 16:
        raise ValueError(f"n_taps {n_taps} beyond the fused FIR budget")
    tb = _matmul.pick_batch_tile(batch, n_syms, n_fft)
    grid = (batch // tb,)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    sigma = float(np.sqrt(max(float(noise_var), 0.0) / 2.0))

    w_ops = _matmul.prepare_w(
        *_idft_mats(n_fft, mod.unit_energy_scale), _matmul.mxu_mode()
    )
    kernel, sym_len = _make_kernel(
        tb, n_syms, n_fft, cp_len, mod,
        channel={
            "sigma": sigma,
            "h_syms": h_syms,
            "n_taps": n_taps,
            "taps_per_sym": taps_per_sym,
        },
    )
    rows_per_block = tb * n_syms

    in_specs = [
        pl.BlockSpec((tb, n_syms, n_fft), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # full ch_ids array
    ]
    operands = [
        indices
        if jnp.issubdtype(indices.dtype, jnp.integer)
        else indices.astype(jnp.int32),
        jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
        ch_ids.astype(jnp.int32),
    ]
    if h_syms:
        in_specs += [
            pl.BlockSpec((tb, h_syms), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, h_syms), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [hs_r.astype(jnp.float32), hs_i.astype(jnp.float32)]
    if n_taps:
        if taps_per_sym:
            t_spec = pl.BlockSpec((tb, n_syms, n_taps),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            t_spec = pl.BlockSpec((tb, n_taps), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        in_specs += [t_spec, t_spec]
        operands += [taps_r.astype(jnp.float32), taps_i.astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec((n_fft, n_fft), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for _ in w_ops
    ]
    operands += list(w_ops)
    re, im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((rows_per_block, sym_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_block, sym_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch * n_syms, sym_len), jnp.float32),
            jax.ShapeDtypeStruct((batch * n_syms, sym_len), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(*operands)
    return (
        re.reshape(batch, n_syms, sym_len),
        im.reshape(batch, n_syms, sym_len),
    )
