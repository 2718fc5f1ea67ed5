"""Max-log LLR soft demapper tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdr_tpu.core.config import Modulation
from sdr_tpu.ops.llr import llr_maxlog, llr_to_hard_bits
from sdr_tpu.ops.modulation import constellation, demodulate_hard, modulate

ALL_MODS = list(Modulation)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_hard_decisions_match_hard_demapper(rng, mod):
    """sign(LLR) must reproduce the nearest-point hard demap."""
    c = np.asarray(constellation(mod))
    sym = rng.integers(0, len(c), size=2048)
    noise = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)) * 0.05
    y = jnp.asarray((c[sym] + noise).astype(np.complex64))
    llr = llr_maxlog(y, mod, noise_var=0.1)
    hard_from_llr = np.asarray(llr_to_hard_bits(llr))
    hard_direct = np.asarray(demodulate_hard(y, mod))
    np.testing.assert_array_equal(hard_from_llr, hard_direct)


def test_qpsk_llr_closed_form(rng):
    """QPSK max-log LLR is exactly 2*sqrt(2)*Re/Im / sigma^2.

    Per axis: levels ±1/sqrt(2); d1 - d0 = -(y-l)^2 diff = ±4*l*y →
    LLR = -2*sqrt(2)*y/nv for bit=1 at +1... sign convention: bit 0 at
    level -1/sqrt(2) (Gray g=0 → level -1). LLR = ((y-l1)^2-(y-l0)^2)/nv
    = (4*y*l0... compute: l0=-a, l1=+a, a=1/sqrt(2):
    (y-a)^2 - (y+a)^2 = -4ay → LLR = -4ay/nv = -2*sqrt(2)*y/nv.
    """
    y = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(np.complex64)
    nv = 0.37
    llr = np.asarray(llr_maxlog(jnp.asarray(y), Modulation.QPSK, nv))
    a = 1.0 / np.sqrt(2.0)
    want_i = -4.0 * a * np.real(y) / nv
    want_q = -4.0 * a * np.imag(y) / nv
    np.testing.assert_allclose(llr[0::2], want_i, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(llr[1::2], want_q, rtol=1e-4, atol=1e-5)


def test_bpsk_llr_sign_and_scale(rng):
    y = jnp.asarray(np.array([0.5 + 0j, -0.5 + 0j], np.complex64))
    llr = np.asarray(llr_maxlog(y, Modulation.BPSK, 1.0))
    # bit 0 ↔ level -1: positive sample → bit 1 more likely → LLR < 0.
    assert llr[0] < 0 < llr[1]
    np.testing.assert_allclose(llr, [-2.0, 2.0], rtol=1e-5)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_llr_scales_inverse_with_noise_var(rng, mod):
    c = np.asarray(constellation(mod))
    y = jnp.asarray(c[: min(8, len(c))] * 1.1)
    l1 = np.asarray(llr_maxlog(y, mod, 0.1))
    l2 = np.asarray(llr_maxlog(y, mod, 0.2))
    np.testing.assert_allclose(l1, 2.0 * l2, rtol=1e-4)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_llr_bit_order_matches_modulate(rng, mod):
    """Noiseless LLRs decode back to the exact transmitted bit stream."""
    bits = rng.integers(0, 2, size=(5, 8 * mod.bits_per_symbol)).astype(np.int8)
    pts = modulate(jnp.asarray(bits), mod)
    llr = llr_maxlog(pts, mod, noise_var=0.01)
    np.testing.assert_array_equal(np.asarray(llr_to_hard_bits(llr)), bits)


def test_per_point_noise_var_broadcast(rng):
    """Per-subcarrier effective variance (from equalizers) broadcasts."""
    mod = Modulation.QAM16
    c = np.asarray(constellation(mod))
    y = jnp.asarray(c[:8])
    nv = jnp.linspace(0.05, 0.4, 8)
    llr = llr_maxlog(y, mod, nv)
    assert llr.shape == (8 * 4,)
    ref0 = np.asarray(llr_maxlog(y[:1], mod, nv[0]))
    np.testing.assert_allclose(np.asarray(llr[:4]), ref0, rtol=1e-5)


def test_llr_exact_agrees_with_maxlog_at_low_noise(rng):
    """As noise_var → 0 the log-sum-exp is dominated by the min term,
    so exact and max-log LLRs coincide."""
    import jax.numpy as jnp
    from sdr_tpu.core.config import Modulation
    from sdr_tpu.ops.llr import llr_exact, llr_maxlog

    pts = jnp.asarray(
        (rng.standard_normal(64) + 1j * rng.standard_normal(64)) * 0.4,
        jnp.complex64,
    )
    for mod in (Modulation.QPSK, Modulation.QAM16, Modulation.QAM64):
        a = np.asarray(llr_exact(pts, mod, 1e-4))
        b = np.asarray(llr_maxlog(pts, mod, 1e-4))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2.0)  # |llr|~1e3+


def test_llr_exact_shrinks_toward_maxlog_magnitude(rng):
    """At finite noise the exact LLR magnitude never exceeds max-log's
    by more than log(L) (the level-set size bound), and hard decisions
    agree."""
    import jax.numpy as jnp
    from sdr_tpu.core.config import Modulation
    from sdr_tpu.ops.llr import llr_exact, llr_maxlog, llr_to_hard_bits

    mod = Modulation.QAM16
    pts = jnp.asarray(
        (rng.standard_normal(256) + 1j * rng.standard_normal(256)) * 0.4,
        jnp.complex64,
    )
    ex = llr_exact(pts, mod, 0.1)
    ml = llr_maxlog(pts, mod, 0.1)
    np.testing.assert_array_equal(
        np.asarray(llr_to_hard_bits(ex)), np.asarray(llr_to_hard_bits(ml))
    )
    assert np.all(np.abs(np.asarray(ex)) <= np.abs(np.asarray(ml)) + np.log(4) + 1e-4)
