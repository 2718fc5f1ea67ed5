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

MXU precision is selectable via SDR_TPU_MXU_PRECISION:
  highest (default) — bf16x6 ≈ f32; LLR err ~2.5e-2 abs on O(100)
  high              — bf16x3; ~2x faster matmuls, more LLR noise
  default           — single-pass bf16 (benchmarking only: ~4% LLR drift)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def mxu_precision() -> jax.lax.Precision:
    name = os.environ.get("SDR_TPU_MXU_PRECISION", "highest").lower()
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[name]


def gauss_w_mats(wr, wi):
    """Host-side: (A, B, C) = (Wr, Wr+Wi, Wi−Wr) as float32."""
    return wr, wr + wi, wi - wr


def complex_dot_gauss(xr, xi, wa_ref, wb_ref, wc_ref, precision):
    """(Yr, Yi) = (Xr + i·Xi) @ W with the 3-matmul identity."""
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=precision
    )
    m1 = dot(xr + xi, wa_ref[:])
    m2 = dot(xi, wb_ref[:])
    m3 = dot(xr, wc_ref[:])
    return m1 - m2, m1 + m3
