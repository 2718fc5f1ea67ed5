"""Coded fast engine (link/fast_coded.py).

The throughput LDPC link: batched encode → fused TX/channel kernels →
LLR demod → (de)interleave → sublane min-sum decode. The fused seam's
composed permutation is validated EXACTLY against the staged
deinterleave-of-public-order form (a pure layout identity); e2e counts
between the seams differ only by the rows-vs-CL demod fp class.
Hardware numbers in docs/PERF.md round 5 (old composition 96 Mb/s →
fused 658-1010 Mb/s info).
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
from sdr_tpu.kernels.demod_cl_pallas import inv_dif_perm
from sdr_tpu.link.fast_coded import _fused_rowperm, ldpc_fast_simulate
from sdr_tpu.ops.interleave import deinterleave


def _cfg(n_ch=128, n_syms=6, ebno=9.0, n_fft=128):
    return LinkConfig(
        ofdm=OFDMConfig(n_fft=n_fft, cp_len=n_fft // 4),
        modulation=Modulation.QAM16,
        channel=ChannelConfig(
            model=ChannelModel.RAYLEIGH_FLAT, ebno_db=ebno
        ),
        equalizer=Equalizer.MMSE,
        n_channels=n_ch,
        n_symbols=n_syms,
    )


def test_fused_rowperm_is_deinterleave_of_public():
    """The composed permutation == deinterleave ∘ public-order restore
    (exact, by construction — the seam-fusion correctness proof)."""
    N, S, bps, sent = 128, 4, 4, 3072
    rp = np.asarray(_fused_rowperm(N, S, bps, sent, 0x1EAF))
    rng = np.random.default_rng(0)
    plane = rng.standard_normal((S * bps * N, 8)).astype(np.float32)
    pub = (
        plane.reshape(S, bps, N, 8)[:, :, inv_dif_perm(N), :]
        .transpose(0, 2, 1, 3)
        .reshape(S * N * bps, 8)
    )
    want = np.asarray(deinterleave(jnp.asarray(pub.T)))[:, :sent].T
    np.testing.assert_array_equal(plane[rp], want)


def test_seams_agree():
    """Both seams decode the same link to near-identical counts (the
    only difference is the rows-vs-CL demod's fp class)."""
    cfg = _cfg()
    key = jax.random.PRNGKey(1)
    e_s, c = jax.jit(lambda k: ldpc_fast_simulate(cfg, k, seam="staged"))(key)
    e_f, _ = jax.jit(lambda k: ldpc_fast_simulate(cfg, k, seam="fused"))(key)
    tot = int(np.asarray(c).sum())
    ds, df = int(np.asarray(e_s).sum()), int(np.asarray(e_f).sum())
    assert 0 < ds < tot // 10
    assert abs(ds - df) <= max(8, ds // 100)


def test_coded_beats_uncoded():
    """At the same Eb/N0 the coded link's info-bit BER is far below
    the uncoded fast link's. AWGN (not per-link flat fading, where a
    deep fade erases whole codewords regardless of the code)."""
    from sdr_tpu.link.fast import fast_simulate

    cfg = LinkConfig(
        ofdm=OFDMConfig(n_fft=128, cp_len=32),
        modulation=Modulation.QAM16,
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=6.0),
        equalizer=Equalizer.MMSE,
        n_channels=128,
        n_symbols=6,
    )
    key = jax.random.PRNGKey(2)
    e_c, c_c = jax.jit(lambda k: ldpc_fast_simulate(cfg, k))(key)
    ber_c = float(np.asarray(e_c).sum()) / float(np.asarray(c_c).sum())
    e_u, c_u = jax.jit(lambda k: fast_simulate(cfg, k))(key)
    ber_u = float(np.asarray(e_u).sum()) / float(np.asarray(c_u).sum())
    assert ber_c < ber_u / 3


def test_split_equals_full():
    """Global-channel-id keying: computing the batch in two halves is
    bit-exact vs one call (the sharding contract)."""
    cfg = _cfg()
    key = jax.random.PRNGKey(3)
    e, _ = jax.jit(lambda k: ldpc_fast_simulate(cfg, k, seam="staged"))(key)
    e_lo, _ = jax.jit(
        lambda k: ldpc_fast_simulate(
            cfg, k, seam="staged", ch_ids=jnp.arange(0, 64)
        )
    )(key)
    e_hi, _ = jax.jit(
        lambda k: ldpc_fast_simulate(
            cfg, k, seam="staged", ch_ids=jnp.arange(64, 128)
        )
    )(key)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(e_lo), np.asarray(e_hi)]), np.asarray(e)
    )


def test_layered_schedule_runs():
    cfg = _cfg()
    e, c = jax.jit(
        lambda k: ldpc_fast_simulate(cfg, k, iters=13, schedule="layered")
    )(jax.random.PRNGKey(4))
    assert 0 < int(np.asarray(e).sum()) < int(np.asarray(c).sum()) // 8


def test_unsupported_configs_raise():
    cfg = _cfg()
    bad = LinkConfig(
        ofdm=cfg.ofdm, modulation=cfg.modulation, channel=cfg.channel,
        equalizer=cfg.equalizer, n_channels=cfg.n_channels,
        n_symbols=cfg.n_symbols, dft_spread=True,
    )
    with pytest.raises(NotImplementedError):
        ldpc_fast_simulate(bad, jax.random.PRNGKey(0))


def test_sharded_coded_fast_bit_exact():
    """Sharded coded fast engine == unsharded, bit-exact (channel-DP
    over the batched coded chain; the round-5 coded analog of the
    fast-path sharding contract)."""
    from sdr_tpu.parallel import make_link_mesh, make_sharded_coded_fast_fn

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = _cfg(n_ch=8 * 16, n_syms=6)
    mesh = make_link_mesh(2, 4)
    key = jax.random.PRNGKey(5)
    e_sh, c_sh = make_sharded_coded_fast_fn(cfg, mesh, seam="staged")(key)
    e_un, _ = jax.jit(
        lambda k: ldpc_fast_simulate(cfg, k, seam="staged")
    )(key)
    np.testing.assert_array_equal(np.asarray(e_sh), np.asarray(e_un))
    assert int(np.asarray(c_sh).sum()) > 0
