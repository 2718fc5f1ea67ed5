"""OFDM contract tests — CP layout and loopback (ofdm.hpp, ofdm_test.cpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sdr_tpu.ops.ofdm import cp_insert, cp_remove, ofdm_rx, ofdm_tx
from tests.test_fft import assert_ref_float_close, _random_complex


def test_loopback_reference_case(rng):
    """rx(tx(x, cp=8), 8) ≈ x on 8 symbols — ofdm_test.cpp:11-26.

    The reference uses double with tol 1e-9; complex64 here, so the
    float tolerance (fft_test.cpp:48-64) applies.
    """
    x = _random_complex(rng, (8,))
    tx = ofdm_tx(jnp.asarray(x), cp_len=8)
    assert tx.shape == (16,)
    back = ofdm_rx(tx, cp_len=8)
    assert_ref_float_close(np.asarray(back), x)


def test_cp_is_copy_of_tail(rng):
    """samples[:cp] == samples[-cp:] — the exact layout of ofdm.hpp:21."""
    x = _random_complex(rng, (64,))
    tx = np.asarray(ofdm_tx(jnp.asarray(x), cp_len=16))
    np.testing.assert_array_equal(tx[:16], tx[-16:])


def test_tx_body_is_ifft(rng):
    """samples[cp:] == ifft(input) (1/N-scaled) — ofdm.hpp:17-18."""
    x = _random_complex(rng, (64,))
    tx = np.asarray(ofdm_tx(jnp.asarray(x), cp_len=16))
    assert_ref_float_close(tx[16:], np.fft.ifft(x))


@pytest.mark.parametrize("n,cp", [(64, 16), (256, 32), (1024, 0)])
def test_loopback_batched(rng, n, cp):
    x = _random_complex(rng, (4, 7, n))
    back = ofdm_rx(ofdm_tx(jnp.asarray(x), cp), cp)
    assert_ref_float_close(np.asarray(back), x)


def test_cp_insert_remove_inverse(rng):
    x = jnp.asarray(_random_complex(rng, (3, 64)))
    np.testing.assert_array_equal(
        np.asarray(cp_remove(cp_insert(x, 16), 16)), np.asarray(x)
    )


def test_cp_insert_validates():
    with pytest.raises(ValueError):
        cp_insert(jnp.zeros((8,), jnp.complex64), 9)
