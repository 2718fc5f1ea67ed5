"""Fused Pallas demod kernel vs the jnp op composition.

The fused kernel (kernels/demod_pallas.py) must reproduce the public
ops path (ofdm_rx → equalize_mmse → llr_maxlog) — same contract the
reference's RX + nearest-scan implements (ofdm.hpp:37-54,
modulation.hpp:50-67), with soft output. On CPU the kernel runs in
Pallas interpret mode; the numerics differ only by f32 matmul-DFT vs
XLA FFT rounding.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdr_tpu.core.config import Modulation
from sdr_tpu.ops.channel import ebno_db_to_noise_var
from sdr_tpu.ops.demod import demod_chain_jnp
from sdr_tpu.kernels.demod_pallas import demod_chain_pallas, supported


def _inputs(rng, batch, n_syms, sym_len, n_fft):
    re = rng.standard_normal((batch, n_syms, sym_len)).astype(np.float32) * 0.1
    im = rng.standard_normal((batch, n_syms, sym_len)).astype(np.float32) * 0.1
    hr = rng.standard_normal((batch, 1, n_fft)).astype(np.float32)
    hi = rng.standard_normal((batch, 1, n_fft)).astype(np.float32)
    return map(jnp.asarray, (re, im, hr, hi))


@pytest.mark.parametrize(
    "mod,n_fft,cp",
    [
        (Modulation.QAM16, 256, 64),
        (Modulation.QPSK, 128, 32),
        (Modulation.QAM64, 256, 16),
        (Modulation.BPSK, 128, 16),
        (Modulation.QAM1024, 128, 32),
    ],
)
def test_pallas_matches_jnp(rng, mod, n_fft, cp):
    batch, n_syms = 4, 8
    nv = float(ebno_db_to_noise_var(10.0, mod.bits_per_symbol))
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft)
    ref = demod_chain_jnp(re, im, hr, hi, cp, mod, nv)
    got = demod_chain_pallas(re, im, hr, hi, cp, mod, nv, interpret=True)
    assert got.shape == ref.shape == (batch, n_syms, n_fft * mod.bits_per_symbol)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_pallas_reduce_sum_matches_full(rng):
    mod, n_fft, cp = Modulation.QAM16, 256, 64
    nv = float(ebno_db_to_noise_var(12.0, mod.bits_per_symbol))
    re, im, hr, hi = _inputs(rng, 4, 8, n_fft + cp, n_fft)
    full = demod_chain_pallas(re, im, hr, hi, cp, mod, nv, interpret=True)
    red = demod_chain_pallas(
        re, im, hr, hi, cp, mod, nv, reduce_sum=True, interpret=True
    )
    np.testing.assert_allclose(
        float(red), float(jnp.sum(full, dtype=jnp.float32)), rtol=1e-3
    )


def test_supported_gate():
    assert supported((4, 8, 320), 64, Modulation.QAM16)
    assert not supported((4, 8, 80), 16, Modulation.QAM16)  # n_fft=64 < 128
    assert not supported((1, 3, 320), 64, Modulation.QAM16)  # rows % 8
    assert not supported((4, 320), 64, Modulation.QAM16)  # not 3-D


def test_demod_chain_auto_dispatch(rng):
    """ops.demod.demod_chain auto path runs and matches jnp on CPU."""
    from sdr_tpu.ops.demod import demod_chain

    mod, n_fft, cp = Modulation.QAM16, 256, 64
    nv = float(ebno_db_to_noise_var(12.0, mod.bits_per_symbol))
    re, im, hr, hi = _inputs(rng, 2, 8, n_fft + cp, n_fft)
    auto = demod_chain(re, im, hr, hi, cp, mod, nv, backend="auto")
    ref = demod_chain(re, im, hr, hi, cp, mod, nv, backend="jnp")
    # Default MXU mode is bf16x3 — scale-relative tolerance (see
    # kernels/_matmul.py; hard decisions are bit-identical on hardware).
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(
        np.asarray(auto), np.asarray(ref), rtol=2e-2, atol=2e-3 * max(scale, 1.0)
    )


@pytest.mark.parametrize(
    "mod,n_fft,cp",
    [
        (Modulation.QAM16, 1024, 128),
        (Modulation.QAM64, 256, 64),
    ],
)
def test_hybrid_matches_jnp(rng, mod, n_fft, cp):
    """XLA FFT + fused LLR kernel parity (the large-n_fft path)."""
    from sdr_tpu.ops.demod import demod_chain_hybrid

    batch, n_syms = 2, 8
    nv = float(ebno_db_to_noise_var(10.0, mod.bits_per_symbol))
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft)
    ref = demod_chain_jnp(re, im, hr, hi, cp, mod, nv)
    got = demod_chain_hybrid(re, im, hr, hi, cp, mod, nv)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_auto_uses_hybrid_for_large_n(monkeypatch, rng):
    """auto picks the hybrid path when n_fft exceeds the full-fused gate."""
    from sdr_tpu.kernels.demod_pallas import supported as full_ok
    from sdr_tpu.ops.demod import demod_chain

    n_fft, cp = 1024, 128
    assert not full_ok((2, 8, n_fft + cp), cp, Modulation.QAM16)
    nv = float(ebno_db_to_noise_var(10.0, 4))
    re, im, hr, hi = _inputs(rng, 2, 8, n_fft + cp, n_fft)
    auto = demod_chain(re, im, hr, hi, cp, Modulation.QAM16, nv, backend="auto")
    ref = demod_chain(re, im, hr, hi, cp, Modulation.QAM16, nv, backend="jnp")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(ref), rtol=1e-3, atol=1e-3)
