"""Shared MXU helpers for the fused kernels.

Complex matmul Y = X @ W via Gauss's 3-multiplication identity:
with A = Wr, B = Wr + Wi, C = Wi − Wr (precomputed host-side),

    M1 = (Xr + Xi) @ A
    M2 = Xi @ B
    M3 = Xr @ C
    Yr = M1 − M2        (= Xr·Wr − Xi·Wi)
    Yi = M1 + M3        (= Xr·Wi + Xi·Wr)

— 3 real matmuls instead of 4 (25% of the kernel's FLOPs, which are
what bound the fused demod at OFDM sizes; docs/PERF.md).

MXU precision modes (SDR_TPU_MXU_PRECISION):

  bf16x3 (default)  — manual 3-pass split: x ≈ hi + lo in bfloat16,
                      x@w ≈ hi@wh + hi@wl + lo@wh (dropping lo@wl);
                      W splits precomputed host-side. 9 MXU passes with
                      Gauss. Measured on v5e: LLR max abs err 0.135 on
                      values spanning 2e4, BIT-IDENTICAL error counts
                      vs the f32 jnp path at 8 dB — and 21% more
                      throughput than highest. Mosaic has no native
                      Precision.HIGH, hence the manual decomposition.
  bf16x2            — 2-pass: x@w ≈ hi@wh + hi@wl (x truncated to
                      bf16, W exact to ~2e-8). 6 MXU passes with
                      Gauss — 1.5x fewer than bf16x3; x truncation
                      costs ~4e-3 relative on the transform, an order
                      tighter than single-pass bf16's joint x·w error.
                      Candidate default pending the 0.1 dB BER gate on
                      hardware.
  highest           — lax HIGHEST = bf16x6 ≈ f32 (18 passes). LLR err
                      ~2e-2 abs; use when LLRs feed a sensitive
                      downstream decoder.
  default           — single-pass bf16 (benchmarking only: ~4% LLR
                      drift, fails the 0.1 dB BER bound).
  bf16x1            — single-pass bf16 with W PRE-TRUNCATED to bf16
                      host-side and x fed as bf16. Same arithmetic
                      class as ``default`` (one bf16 MXU pass), but
                      the operand FEED is half-width: ``default``
                      keeps f32 operands in VMEM and truncates at the
                      MXU port, which costs f32-rate feed bandwidth
                      and (for bf16 inputs) an upcast VPU pass.
                      Measured round 4: MXU leg 6.71 → 4.5 ms class
                      at the headline shape. Same BER-gate status as
                      ``default`` (per-modulation table, PERF.md).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp


# Target rows (= OFDM symbols) per grid block for the matmul-DFT
# kernels; halved at n_fft >= 512 to stay inside VMEM with the W tiles.
# Env-overridable for on-hardware tuning (fewer, larger grid blocks
# amortize per-block ramp; bounded by VMEM).
TARGET_ROWS = int(os.environ.get("SDR_TPU_TARGET_ROWS", "512"))


def row_target(n_fft: int) -> int:
    return TARGET_ROWS if n_fft <= 256 else TARGET_ROWS // 2


def pick_batch_tile(batch: int, n_syms: int, n_fft: int) -> int:
    """Largest divisor of ``batch`` with tile·n_syms within the row
    target. Shared by the TX and demod kernels so their tiling cannot
    desynchronize."""
    target = row_target(n_fft)
    best = 1
    for tb in range(1, batch + 1):
        if batch % tb == 0 and tb * n_syms <= target:
            best = tb
    return best


def mxu_mode() -> str:
    mode = os.environ.get("SDR_TPU_MXU_PRECISION", "bf16x3").lower()
    if mode in ("high", "bf16x3"):
        return "bf16x3"
    if mode not in ("bf16x2", "bf16x1", "highest", "default"):
        raise ValueError(f"unknown SDR_TPU_MXU_PRECISION {mode!r}")
    return mode


def _split_bf16_host(w: np.ndarray):
    hi = w.astype(np.float32).astype(jnp.bfloat16)
    lo = (w.astype(np.float32) - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def prepare_w(wr: np.ndarray, wi: np.ndarray, mode: str):
    """Host-side W operands for ``complex_dot``: the Gauss triple
    (A, B, C) = (Wr, Wr+Wi, Wi−Wr), split hi/lo for bf16x3/bf16x2."""
    a, b, c = wr, wr + wi, wi - wr
    if mode in ("bf16x3", "bf16x2"):
        out = []
        for w in (a, b, c):
            out.extend(_split_bf16_host(w))
        return tuple(out)  # (a_hi, a_lo, b_hi, b_lo, c_hi, c_lo)
    if mode == "bf16x1":
        return tuple(
            np.asarray(w.astype(np.float32).astype(jnp.bfloat16)) for w in (a, b, c)
        )
    return (a, b, c)


def n_w_operands(mode: str) -> int:
    return 6 if mode in ("bf16x3", "bf16x2") else 3


def _dot3(x, wh_ref, wl_ref):
    """bf16x3 real matmul: f32 x against pre-split bf16 W."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(xh, wh_ref[:]) + d(xh, wl_ref[:]) + d(xl, wh_ref[:])


def _dot2(x, wh_ref, wl_ref):
    """bf16x2 real matmul: x truncated to bf16, W exact (hi+lo)."""
    xh = x.astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(xh, wh_ref[:]) + d(xh, wl_ref[:])


def complex_dot_xbf16(xr, xi, w_refs, mode: str):
    """``complex_dot`` for x ALREADY truncated to bfloat16 (e.g. the
    bf16-staged HBM intermediate of the split four-step kernel). The
    x-side hi/lo split collapses (lo ≡ 0), so the bf16-prepped modes
    need only 2 MXU passes per real matmul (6 with Gauss) while W stays
    exact to ~2e-8 — identical numerics to bf16x2 given bf16 x. Modes
    with f32 W operands fall back to ``complex_dot`` on upcast inputs."""
    if mode in ("bf16x3", "bf16x2"):
        a_hi, a_lo, b_hi, b_lo, c_hi, c_lo = w_refs
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        s = (xr.astype(jnp.float32) + xi.astype(jnp.float32)).astype(jnp.bfloat16)
        m1 = d(s, a_hi[:]) + d(s, a_lo[:])
        m2 = d(xi, b_hi[:]) + d(xi, b_lo[:])
        m3 = d(xr, c_hi[:]) + d(xr, c_lo[:])
        return m1 - m2, m1 + m3
    if mode == "bf16x1":
        # All-bf16 feed: no upcast pass, half the operand bandwidth
        # into the MXU. The Gauss sum runs in bf16 (same single-pass
        # error class as the port-side truncation ``default`` does).
        a_ref, b_ref, c_ref = w_refs
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        m1 = d(xr + xi, a_ref[:])
        m2 = d(xi, b_ref[:])
        m3 = d(xr, c_ref[:])
        return m1 - m2, m1 + m3
    return complex_dot(
        xr.astype(jnp.float32), xi.astype(jnp.float32), w_refs, mode
    )


def _dot3_lhs(wh_ref, wl_ref, x):
    """bf16x3 real matmul, W on the LEFT: pre-split bf16 W against f32 x."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(wh_ref[:], xh) + d(wl_ref[:], xh) + d(wh_ref[:], xl)


def _dot2_lhs(wh_ref, wl_ref, x):
    """bf16x2 real matmul, W on the LEFT: x truncated, W exact (hi+lo)."""
    xh = x.astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(wh_ref[:], xh) + d(wl_ref[:], xh)


def complex_dot_lhs(xr, xi, w_refs, mode: str):
    """(Yr, Yi) = W @ (Xr + i·Xi) — the channels-LAST orientation.

    Gauss's identity is orientation-symmetric with the SAME precomputed
    triple (A, B, C) = (Wr, Wr+Wi, Wi−Wr): M1 = A@(Xr+Xi),
    M2 = B@Xi, M3 = C@Xr, Yr = M1−M2, Yi = M1+M3. Used by the
    channels-last pipelined demod kernel (kernels/demod_cl_pallas.py)
    where the data block is (time, channel-lanes) and the DFT matrix
    multiplies from the left. Mode semantics identical to
    ``complex_dot``; accepts f32 or bf16 x (bf16 x collapses the
    x-side hi/lo split exactly as in ``complex_dot_xbf16``)."""
    x_is_bf16 = xr.dtype == jnp.bfloat16
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if mode in ("bf16x3", "bf16x2"):
        a_hi, a_lo, b_hi, b_lo, c_hi, c_lo = w_refs
        if x_is_bf16:
            s = (xr.astype(jnp.float32) + xi.astype(jnp.float32)).astype(
                jnp.bfloat16
            )
            m1 = d(a_hi[:], s) + d(a_lo[:], s)
            m2 = d(b_hi[:], xi) + d(b_lo[:], xi)
            m3 = d(c_hi[:], xr) + d(c_lo[:], xr)
        else:
            dot = _dot3_lhs if mode == "bf16x3" else _dot2_lhs
            m1 = dot(a_hi, a_lo, xr + xi)
            m2 = dot(b_hi, b_lo, xi)
            m3 = dot(c_hi, c_lo, xr)
        return m1 - m2, m1 + m3
    if mode == "bf16x1":
        a_ref, b_ref, c_ref = w_refs
        if not x_is_bf16:
            xr = xr.astype(jnp.bfloat16)
            xi = xi.astype(jnp.bfloat16)
        m1 = d(a_ref[:], xr + xi)
        m2 = d(b_ref[:], xi)
        m3 = d(c_ref[:], xr)
        return m1 - m2, m1 + m3
    precision = (
        jax.lax.Precision.HIGHEST if mode == "highest" else jax.lax.Precision.DEFAULT
    )
    dp = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision
    )
    a_ref, b_ref, c_ref = w_refs
    if x_is_bf16 and mode == "highest":
        xr = xr.astype(jnp.float32)
        xi = xi.astype(jnp.float32)
    m1 = dp(a_ref[:], xr + xi)
    m2 = dp(b_ref[:], xi)
    m3 = dp(c_ref[:], xr)
    return m1 - m2, m1 + m3


def complex_dot(xr, xi, w_refs, mode: str):
    """(Yr, Yi) = (Xr + i·Xi) @ W with the Gauss identity, per mode."""
    if mode in ("bf16x3", "bf16x2"):
        dot = _dot3 if mode == "bf16x3" else _dot2
        a_hi, a_lo, b_hi, b_lo, c_hi, c_lo = w_refs
        m1 = dot(xr + xi, a_hi, a_lo)
        m2 = dot(xi, b_hi, b_lo)
        m3 = dot(xr, c_hi, c_lo)
    elif mode == "bf16x1":
        return complex_dot_xbf16(
            xr.astype(jnp.bfloat16), xi.astype(jnp.bfloat16), w_refs, mode
        )
    else:
        precision = (
            jax.lax.Precision.HIGHEST if mode == "highest" else jax.lax.Precision.DEFAULT
        )
        a_ref, b_ref, c_ref = w_refs
        dot = functools.partial(
            jnp.dot, preferred_element_type=jnp.float32, precision=precision
        )
        m1 = dot(xr + xi, a_ref[:])
        m2 = dot(xi, b_ref[:])
        m3 = dot(xr, c_ref[:])
    return m1 - m2, m1 + m3


