"""Fused fading+AWGN channel kernel (kernels/channel_pallas.py).

The on-core PRNG (pltpu.prng_*) has no CPU lowering, so the CPU suite
exercises the kernel through the INJECTION mode (pre-drawn threefry
noise — identical dataflow, mc_pallas policy) and validates:
statistics against exact theory, the determinism/sharding contract,
and every channel model's integration in link.fast. The on-core-PRNG
moments and TPU determinism are hardware checks (docs/PERF.md round 5:
mean/var/P>2..4 all within ~1σ of exact over 168M draws; split-batch
== full-batch bit-exact).
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
from sdr_tpu.kernels.channel_pallas import (
    _pick_syms,
    fade_awgn_pallas,
    seed32,
    supported,
)
from sdr_tpu.link.ber import ber_awgn_exact
from sdr_tpu.link.fast import fast_simulate


def _cfg(model, mod=Modulation.QAM16, ebno=10.0, n_ch=128, n_syms=8, **kw):
    return LinkConfig(
        ofdm=OFDMConfig(n_fft=64, cp_len=16),
        modulation=mod,
        channel=ChannelConfig(model=model, ebno_db=ebno, **kw),
        equalizer=Equalizer.MMSE,
        n_channels=n_ch,
        n_symbols=n_syms,
    )


def test_supported_rules():
    assert supported((128, 8, 80), 1)
    assert supported((128, 8, 80), 8)
    assert not supported((100, 8, 80), 1)  # batch not 128-tiling
    assert not supported((128, 8, 80), 4)  # bad h_syms
    assert not supported((128, 8), 1)  # rank


def test_pick_syms_blockable():
    # k must be a multiple of 8 (rank-3 sublane rule) or the full axis.
    assert _pick_syms(64, 320) % 8 == 0
    assert _pick_syms(4, 80) == 4  # small axis: full-dim block
    # Huge sym_len with a non-8 axis: nothing fits → unsupported.
    assert _pick_syms(3, 3_000_000) == 0


def test_inject_mode_noise_statistics():
    """x=0, h=None → output IS σ·n; moments match N(0, nv/2)."""
    B, S, L = 128, 8, 80
    z = jnp.zeros((B, S, L), jnp.float32)
    key = jax.random.PRNGKey(0)
    nz = jax.random.normal(key, (2, B, S, L), jnp.float32)
    r, i = fade_awgn_pallas(
        z, z, None, None, jnp.int32(1), 0.5, noise=(nz[0], nz[1])
    )
    g = np.asarray(r) / np.sqrt(0.25)
    assert abs(g.mean()) < 4 / np.sqrt(g.size)
    assert abs(g.var() - 1.0) < 4 * np.sqrt(2 / g.size)


def test_fade_apply_exact():
    """Injected zero noise → output is exactly x·h (per-link and
    per-symbol gain planes)."""
    B, S, L = 128, 8, 40
    key = jax.random.PRNGKey(1)
    kx, kh = jax.random.split(key)
    re = jax.random.normal(kx, (B, S, L), jnp.float32)
    im = jax.random.normal(jax.random.fold_in(kx, 1), (B, S, L), jnp.float32)
    z = jnp.zeros((B, S, L), jnp.float32)
    for h_syms in (1, S):
        hr = jax.random.normal(kh, (B, h_syms), jnp.float32)
        hi = jax.random.normal(jax.random.fold_in(kh, 1), (B, h_syms), jnp.float32)
        r, i = fade_awgn_pallas(
            re, im, hr, hi, jnp.int32(0), 0.0, noise=(z, z)
        )
        want_r = re * hr[:, :, None] - im * hi[:, :, None]
        want_i = re * hi[:, :, None] + im * hr[:, :, None]
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(want_r), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(i), np.asarray(want_i), rtol=1e-5, atol=1e-6
        )


def test_fast_engine_kernel_channel_ber(monkeypatch):
    """QPSK AWGN @ 4 dB through the kernel-channel fast engine matches
    exact theory (statistical gate, ~1M bits)."""
    monkeypatch.setenv("SDR_TPU_CHANNEL_BACKEND", "pallas")
    cfg = _cfg(ChannelModel.AWGN, mod=Modulation.QPSK, ebno=4.0,
               n_ch=128, n_syms=64)
    e, c = jax.jit(lambda k: fast_simulate(cfg, k))(jax.random.PRNGKey(0))
    ber = float(np.asarray(e).sum()) / float(np.asarray(c).sum())
    ref = float(ber_awgn_exact(Modulation.QPSK, 4.0))
    assert abs(ber / ref - 1.0) < 0.08


@pytest.mark.parametrize(
    "model,kw",
    [
        (ChannelModel.RAYLEIGH_FLAT, {}),
        (ChannelModel.RAYLEIGH_TIME, {"doppler_norm": 0.02}),
        (ChannelModel.RICIAN, {"k_factor": 4.0}),
        (ChannelModel.MULTIPATH, {"pdp": (1.0, 0.5)}),
        (ChannelModel.MULTIPATH_TIME, {"pdp": (1.0, 0.5), "doppler_norm": 0.02}),
    ],
)
def test_fast_engine_kernel_channel_models(monkeypatch, model, kw):
    """Every channel model runs through the kernel route (fading gains
    in-kernel for flat models, conv-outside + noise-only for selective
    ones) and produces a sane error count."""
    monkeypatch.setenv("SDR_TPU_CHANNEL_BACKEND", "pallas")
    cfg = _cfg(model, ebno=12.0, **kw)
    e, c = jax.jit(lambda k: fast_simulate(cfg, k))(jax.random.PRNGKey(2))
    errs, bits = int(np.asarray(e).sum()), int(np.asarray(c).sum())
    assert 0 < errs < bits // 4


def test_sharded_kernel_channel_bit_exact(monkeypatch):
    """Sharded fast path with the kernel channel equals the unsharded
    one bit-exactly (the determinism contract: noise keyed by global
    channel id, never by device grid)."""
    monkeypatch.setenv("SDR_TPU_CHANNEL_BACKEND", "pallas")
    from sdr_tpu.parallel import make_link_mesh, make_sharded_fast_fn

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = _cfg(ChannelModel.RAYLEIGH_FLAT, n_ch=1024, n_syms=4)
    mesh = make_link_mesh(2, 4)
    key = jax.random.PRNGKey(3)
    e_sh, _ = make_sharded_fast_fn(cfg, mesh, layout="rows")(key)
    e_un, _ = jax.jit(lambda k: fast_simulate(cfg, k, layout="rows"))(key)
    np.testing.assert_array_equal(np.asarray(e_sh), np.asarray(e_un))


def test_seed32_stable():
    k = jax.random.PRNGKey(7)
    a = int(seed32(k))
    b = int(seed32(k))
    assert a == b
    assert int(seed32(jax.random.fold_in(k, 1))) != a


def test_payload_kernel_gating():
    """The on-core payload draw is TPU-only (no interpret lowering, no
    injection form): off-TPU the engine keeps the threefry draw."""
    from sdr_tpu.kernels.channel_pallas import payload_supported
    from sdr_tpu.link.fast import _draw_idx

    assert payload_supported(128, 8, 64)
    assert not payload_supported(100, 8, 64)
    assert not payload_supported(128, 3, 3)  # S*N % 128
    cfg = _cfg(ChannelModel.AWGN)
    idx = _draw_idx(cfg, jax.random.PRNGKey(0), jnp.arange(128))
    assert idx.dtype == jnp.int32  # CPU: threefry path
    assert idx.shape == (128, cfg.n_symbols, cfg.ofdm.n_fft)
    assert int(jnp.max(idx)) < 1 << cfg.modulation.bits_per_symbol
