"""FFT/IFFT with the reference's conventions and pluggable TPU backends.

Contract (from /root/reference/lib/inc/fft.hpp):

- forward transform is UNSCALED with kernel e^{-2*pi*i*n*k/N}
  (theta = -2*pi/N, fft.hpp:114 with inverse=false);
- inverse uses theta = +2*pi/N then scales by 1/N (fft.hpp:197-204);
- sizes must be powers of two (fft.hpp:90-92) — enforced here at trace
  time (the JAX analog of the reference's runtime std::expected guard).

These are exactly the numpy/XLA conventions, so the "xla" backend is a
direct ``jnp.fft`` call. The reference's bit-reverse permutation
(fft.hpp:35-51) and twiddle recurrence with periodic renormalization
(fft.hpp:113-150) are scalar-CPU artifacts with no TPU analog: backends
here use either XLA's native FFT or a Cooley–Tukey *four-step* matmul
factorization that runs the butterflies as dense DFT-matrix products on
the MXU (see sdr_tpu/kernels/fft_matmul.py).

Backends:
- "xla":    jnp.fft — XLA's built-in FFT.
- "matmul": MXU matmul-DFT (four-step decomposition), batched.
- "auto":   per-size choice (xla for small/medium transforms, matmul
            from the measured crossover up). Tuned by benchmarks.

All functions operate on the last axis and accept arbitrary leading
batch dims.
"""

from __future__ import annotations

import os
from typing import Literal

import jax.numpy as jnp

Backend = Literal["auto", "xla", "matmul"]

_DEFAULT_BACKEND: Backend = os.environ.get("SDR_TPU_FFT_BACKEND", "auto")  # type: ignore[assignment]
if _DEFAULT_BACKEND not in ("auto", "xla", "matmul"):
    # Fail fast: a typo'd env value would otherwise silently behave as
    # "xla" for every size (the == "matmul" comparison never matches).
    raise ValueError(
        f"SDR_TPU_FFT_BACKEND={_DEFAULT_BACKEND!r} invalid; "
        "expected auto|xla|matmul"
    )

# Crossover where the matmul-DFT backend starts beating XLA's FFT on
# TPU (batched transforms, measured on v5e — see docs/PERF.md): XLA
# wins for N <= 4096 (e.g. 343 vs 256 Gelem/s at N=256), matmul wins
# from N = 8192 up (404 vs 302 at 8192, 329 vs 185 at 16384).
# Refined by sdr_tpu.obs.autotune.
_MATMUL_MIN_N = 8192


def set_matmul_min_n(n: int) -> None:
    """Set the auto-backend crossover (from obs.autotune measurements)."""
    global _MATMUL_MIN_N
    _MATMUL_MIN_N = int(n)


def set_default_backend(backend: Backend) -> None:
    global _DEFAULT_BACKEND
    if backend not in ("auto", "xla", "matmul"):
        raise ValueError(f"unknown FFT backend {backend!r}")
    _DEFAULT_BACKEND = backend


def get_default_backend() -> Backend:
    return _DEFAULT_BACKEND


def _validate(n: int) -> None:
    if n <= 0 or (n & (n - 1)) != 0:
        # Trace-time twin of fft.hpp:91-92 ("must be of powers of 2").
        raise ValueError(f"The sequence size must be a power of 2, got {n}")


def _resolve(n: int, backend: Backend | None) -> str:
    b = backend or _DEFAULT_BACKEND
    if b == "auto":
        return "matmul" if n >= _MATMUL_MIN_N else "xla"
    return b


def fft(x: jnp.ndarray, backend: Backend | None = None) -> jnp.ndarray:
    """Unscaled forward DFT over the last axis (fft::fft2 semantics)."""
    n = x.shape[-1]
    _validate(n)
    x = x.astype(jnp.complex64)
    if _resolve(n, backend) == "matmul":
        from sdr_tpu.kernels.fft_matmul import matmul_fft

        return matmul_fft(x, inverse=False)
    return jnp.fft.fft(x, axis=-1)


def ifft(x: jnp.ndarray, backend: Backend | None = None) -> jnp.ndarray:
    """Inverse DFT with 1/N scaling (fft::ifft2 semantics, fft.hpp:194-205)."""
    n = x.shape[-1]
    _validate(n)
    x = x.astype(jnp.complex64)
    if _resolve(n, backend) == "matmul":
        from sdr_tpu.kernels.fft_matmul import matmul_fft

        return matmul_fft(x, inverse=True)
    return jnp.fft.ifft(x, axis=-1)
