"""Fused Pallas TX kernel vs the jnp op composition (modulate ∘ ofdm_tx)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels.tx_pallas import supported, tx_chain_pallas
from sdr_tpu.ops.modulation import _ints_to_bits, modulate
from sdr_tpu.ops.ofdm import ofdm_tx


@pytest.mark.parametrize(
    "mod,n_fft,cp",
    [
        (Modulation.QAM16, 256, 64),
        (Modulation.QPSK, 128, 32),
        (Modulation.QAM64, 128, 0),
        (Modulation.BPSK, 128, 16),
        (Modulation.QAM1024, 128, 32),
    ],
)
def test_tx_pallas_matches_jnp(rng, mod, n_fft, cp):
    batch, n_syms = 4, 8
    M = 1 << mod.bits_per_symbol
    idx = jnp.asarray(
        rng.integers(0, M, (batch, n_syms, n_fft)), jnp.int32
    )
    re, im = tx_chain_pallas(idx, cp, mod, interpret=True)
    assert re.shape == (batch, n_syms, n_fft + cp)

    bits = _ints_to_bits(idx, mod.bits_per_symbol)
    ref = ofdm_tx(modulate(bits, mod), cp)
    np.testing.assert_allclose(np.asarray(re), np.real(np.asarray(ref)), atol=2e-5)
    np.testing.assert_allclose(np.asarray(im), np.imag(np.asarray(ref)), atol=2e-5)


def test_tx_supported_gate():
    assert supported((4, 8, 256), Modulation.QAM16)
    assert not supported((4, 8, 64), Modulation.QAM16)
    assert not supported((1, 3, 256), Modulation.QAM16)


def test_tx_cp_is_tail_copy(rng):
    """CP layout contract: out[..., :cp] == out[..., -cp:] (ofdm.hpp:21)."""
    idx = jnp.asarray(rng.integers(0, 16, (2, 8, 128)), jnp.int32)
    re, im = tx_chain_pallas(idx, 32, Modulation.QAM16, interpret=True)
    np.testing.assert_array_equal(np.asarray(re[..., :32]), np.asarray(re[..., -32:]))
    np.testing.assert_array_equal(np.asarray(im[..., :32]), np.asarray(im[..., -32:]))
