"""Channels-last fast-engine layout + the public CL demod entries.

The CL Pallas kernel itself has no CPU lowering (emit_pipeline), so the
CPU suite drives the SAME library entries (ops.demod.demod_*_chain_cl)
through their jnp twin — identical math, identical dispatch — and pins
layout equivalence, sharding bit-exactness and the auto rules. The
kernel-backed side of the same entries is exercised on hardware by
bench.py and scripts/gate_cl.py.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdr_tpu.core.config import (
    ChannelConfig,
    ChannelModel,
    Equalizer,
    LinkConfig,
    Modulation,
    OFDMConfig,
)
from sdr_tpu.link.fast import fast_simulate, layout_supported_cl, select_layout
from sdr_tpu.ops.demod import (
    demod_count_chain_cl,
    demod_sum_chain_cl,
    select_backend_cl,
)


def _cfg(model=ChannelModel.RAYLEIGH_FLAT, n_ch=128, n_syms=4, **kw):
    return LinkConfig(
        ofdm=OFDMConfig(n_fft=128, cp_len=32),
        modulation=Modulation.QAM16,
        channel=ChannelConfig(model=model, ebno_db=10.0, **kw),
        equalizer=Equalizer.MMSE,
        n_channels=n_ch,
        n_symbols=n_syms,
    )


def test_select_backend_cl_cpu_is_jnp():
    assert select_backend_cl(256, 256, 4, Modulation.QAM16, "cpu") == "jnp"
    assert select_backend_cl(256, 256, 4, Modulation.QAM16, "tpu") == "cl"
    # Unsupported shapes fall back even on TPU.
    assert select_backend_cl(192, 256, 4, Modulation.QAM16, "tpu") == "jnp"
    assert select_backend_cl(256, 100, 4, Modulation.QAM16, "tpu") == "jnp"


def test_auto_layout_is_rows():
    cfg = _cfg()
    assert select_layout(cfg, 128, "tpu") == "rows"
    assert select_layout(cfg, 128, "cpu") == "rows"


def test_layout_supported_cl_rules():
    assert layout_supported_cl(_cfg(), 128)
    assert not layout_supported_cl(_cfg(), 100)
    assert not layout_supported_cl(
        _cfg(model=ChannelModel.RAYLEIGH_TIME, doppler_norm=0.02), 128
    )


def test_cl_layout_counts_match_rows():
    """Rows vs CL engine layouts: same keyed randomness, the CL demod's
    DIF/division-free math differs only in fp rounding — error counts
    agree to a handful of borderline decisions."""
    cfg = _cfg(n_ch=128, n_syms=4)
    key = jax.random.PRNGKey(7)
    e_rows, c = jax.jit(lambda k: fast_simulate(cfg, k, layout="rows"))(key)
    e_cl, _ = jax.jit(lambda k: fast_simulate(cfg, k, layout="cl"))(key)
    total = int(np.asarray(c).sum())
    diff = int(np.abs(np.asarray(e_rows) - np.asarray(e_cl)).sum())
    assert diff <= max(4, total // 100_000)


def test_cl_entries_match_rows_composition():
    """demod_{sum,count}_chain_cl on transposed data == the rows-path
    reference composition on the same data (jnp twin, CPU)."""
    from sdr_tpu.ops.demod import demod_chain_jnp

    B, S, NF, CP = 128, 2, 128, 32
    L = NF + CP
    mod = Modulation.QAM16
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    re = jax.random.normal(ks[0], (B, S, L), jnp.float32) * 0.1
    im = jax.random.normal(ks[1], (B, S, L), jnp.float32) * 0.1
    hr = jax.random.normal(ks[2], (B, 1, NF), jnp.float32)
    hi = jax.random.normal(ks[3], (B, 1, NF), jnp.float32)
    idx = jax.random.randint(ks[4], (B, S, NF), 0, 16, jnp.int32)
    nv = 0.05

    re_t = jnp.moveaxis(re, 0, -1).reshape(S * L, B)
    im_t = jnp.moveaxis(im, 0, -1).reshape(S * L, B)
    hr_t = hr[:, 0, :].T
    hi_t = hi[:, 0, :].T
    idx_t = jnp.moveaxis(idx, 0, -1).reshape(S * NF, B)

    llr_rows = demod_chain_jnp(re, im, hr, hi, CP, mod, nv)
    s_cl = demod_sum_chain_cl(re_t, im_t, hr_t, hi_t, CP, mod, nv)
    np.testing.assert_allclose(
        float(s_cl), float(jnp.sum(llr_rows, dtype=jnp.float32)),
        rtol=2e-4,
    )

    from sdr_tpu.ops.modulation import _ints_to_bits

    hard = (np.asarray(llr_rows) < 0).astype(np.int8)
    bits = np.asarray(_ints_to_bits(idx, mod.bits_per_symbol))
    want = (hard != bits).sum(axis=(1, 2))
    got = np.asarray(
        demod_count_chain_cl(re_t, im_t, hr_t, hi_t, idx_t, CP, mod, nv)
    )
    assert np.abs(got - want).sum() <= 2  # borderline-decision class


def test_cl_entries_h_dif_order_fallback():
    """h_in_dif_order inputs give identical results through the jnp
    fallback (the entry un-permutes before the twin)."""
    from sdr_tpu.kernels.demod_cl_pallas import dif_perm

    B, S, NF, CP = 128, 2, 128, 32
    L = NF + CP
    mod = Modulation.QAM16
    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 4)
    re_t = jax.random.normal(ks[0], (S * L, B), jnp.float32) * 0.1
    im_t = jax.random.normal(ks[1], (S * L, B), jnp.float32) * 0.1
    hr_t = jax.random.normal(ks[2], (NF, B), jnp.float32)
    hi_t = jax.random.normal(ks[3], (NF, B), jnp.float32)
    perm = dif_perm(NF)
    a = demod_sum_chain_cl(re_t, im_t, hr_t, hi_t, CP, mod, 0.05)
    b = demod_sum_chain_cl(
        re_t, im_t, hr_t[perm], hi_t[perm], CP, mod, 0.05,
        h_in_dif_order=True,
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_sharded_cl_layout_bit_exact():
    from sdr_tpu.parallel import make_link_mesh, make_sharded_fast_fn

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = _cfg(n_ch=8 * 128, n_syms=4)
    mesh = make_link_mesh(2, 4)
    key = jax.random.PRNGKey(3)
    e_sh, _ = make_sharded_fast_fn(cfg, mesh, layout="cl")(key)
    e_un, _ = jax.jit(lambda k: fast_simulate(cfg, k, layout="cl"))(key)
    np.testing.assert_array_equal(np.asarray(e_sh), np.asarray(e_un))
