"""MULTIPATH_TIME: the per-tap-Jakes time-varying selective channel.

Round-4 channel family (VERDICT item 2): the composition of MULTIPATH
(delay spread) and RAYLEIGH_TIME (Doppler) — the ITU/3GPP TDL mobile
radio channel. The reference's RX (ofdm.hpp:37-54) equalizes nothing;
this family is the full stress case for the per-symbol estimators.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdr_tpu.core.config import (
    ChannelConfig,
    ChannelModel,
    Equalizer,
    LinkConfig,
    Modulation,
    OFDMConfig,
)
from sdr_tpu.link import simulate
from sdr_tpu.ops import channel as chan

PDP = (1.0, 0.5, 0.25)


def _cfg(model, doppler, pilots=0, ebno=16.0, nch=128, dft_spread=False,
         n_symbols=16, estimator=None):
    kw = {}
    if estimator is not None:
        kw["estimator"] = estimator
    return LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(n_fft=64, cp_len=16),
        channel=ChannelConfig(
            model=model, ebno_db=ebno, pdp=PDP, doppler_norm=doppler
        ),
        equalizer=Equalizer.MMSE,
        n_symbols=n_symbols,
        n_channels=nch,
        pilot_spacing=pilots,
        dft_spread=dft_spread,
        **kw,
    )


def test_taps_statistics(rng):
    """Per-tap power follows the (normalized) PDP; total energy 1."""
    taps = chan.multipath_time_taps(
        jax.random.PRNGKey(0), PDP, 64, 0.05, n_paths=32, batch_shape=(256,)
    )
    assert taps.shape == (256, 64, 3)
    p = np.mean(np.abs(np.asarray(taps)) ** 2, axis=(0, 1))
    want = np.asarray(PDP) / np.sum(PDP)
    np.testing.assert_allclose(p, want, rtol=0.1)


def test_taps_autocorrelation_is_jakes(rng):
    from scipy.special import j0 as _j0

    fd = 0.05
    taps = chan.multipath_time_taps(
        jax.random.PRNGKey(1), (1.0,), 400, fd, n_paths=64, batch_shape=(256,)
    )[..., 0]
    g = np.asarray(taps)
    power = np.mean(np.abs(g) ** 2)
    for lag in (1, 3, 6):
        rho = np.real(np.mean(np.conj(g[:, :-lag]) * g[:, lag:])) / power
        th = float(_j0(2 * np.pi * fd * lag))
        assert abs(rho - th) < 0.08, (lag, rho, th)


def test_zero_doppler_per_symbol_conv_equals_stream_conv(rng):
    """With constant taps the per-symbol FIR + symbol_history machinery
    is EXACTLY the serialized stream convolution (the static MULTIPATH
    path) — the identity that pins the inter-symbol memory handling."""
    S, sym_len, L = 6, 80, 3
    x = jnp.asarray(
        (rng.standard_normal((S, sym_len)) + 1j * rng.standard_normal((S, sym_len)))
        .astype(np.complex64)
    )
    taps1 = chan.multipath_taps(jax.random.PRNGKey(2), PDP)
    taps_t = jnp.broadcast_to(taps1, (S, L))
    got = chan.apply_multipath(
        x, taps_t, history=chan.symbol_history(x, L)
    )
    want = chan.apply_multipath(x.reshape(-1), taps1).reshape(S, sym_len)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_slow_fade_limit_reproduces_static_multipath():
    """doppler → 0 reproduces static-multipath BER (ratio ≈ 1; the
    fading BER band is 15% as in test_link — the 16-path sum-of-
    sinusoids amplitude has slightly lighter tails than exact
    Rayleigh, so compare at a tail-insensitive operating point)."""
    b_slow = float(jnp.mean(simulate(
        _cfg(ChannelModel.MULTIPATH_TIME, 1e-5, ebno=10.0, nch=512),
        jax.random.PRNGKey(1)).ber))
    b_stat = float(jnp.mean(simulate(
        _cfg(ChannelModel.MULTIPATH, 0.0, ebno=10.0, nch=512),
        jax.random.PRNGKey(2)).ber))
    assert abs(b_slow / b_stat - 1.0) < 0.15, (b_slow, b_stat)


def test_genie_link_decodes():
    """Per-symbol genie CSI under fast selective fading: block fading
    has no intra-symbol ICI by construction, so genie BER stays at the
    selective-fading outage level at any in-range Doppler."""
    b = float(jnp.mean(simulate(
        _cfg(ChannelModel.MULTIPATH_TIME, 0.1, ebno=16.0),
        jax.random.PRNGKey(3)).ber))
    assert 1e-3 < b < 5e-2, b


def test_comb_pilots_track_selective_fading():
    """Per-symbol comb estimation stays within a small factor of genie
    under simultaneous Doppler and delay spread."""
    key = jax.random.PRNGKey(4)
    b_genie = float(jnp.mean(simulate(
        _cfg(ChannelModel.MULTIPATH_TIME, 0.02, nch=256), key).ber))
    b_est = float(jnp.mean(simulate(
        _cfg(ChannelModel.MULTIPATH_TIME, 0.02, pilots=4, nch=256), key).ber))
    assert b_est < 3.5 * b_genie, (b_est, b_genie)


def test_scfdma_block_pilots_interp_full():
    """SC-FDMA composes within the pilot-period coherence gate: the
    per-tone chord interpolation tracks slow selective fading, and the
    estimation-lag floor appears as Doppler approaches the gate."""
    slow = float(jnp.mean(simulate(
        _cfg(ChannelModel.MULTIPATH_TIME, 0.002, pilots=4, ebno=18.0,
             nch=256, dft_spread=True), jax.random.PRNGKey(5)).ber))
    fast = float(jnp.mean(simulate(
        _cfg(ChannelModel.MULTIPATH_TIME, 0.06, pilots=4, ebno=18.0,
             nch=256, dft_spread=True), jax.random.PRNGKey(5)).ber))
    assert fast > 1.5 * slow, (slow, fast)  # the lag floor
    assert slow < 5e-2, slow  # and the slow case actually works


def test_interp_full_exact_for_linear_evolution():
    """Noise-free per-tone LINEAR evolution is recovered exactly by the
    chord interpolation (the property the coherence gate relies on)."""
    from sdr_tpu.ops.pilots import estimate_block_pilots_interp_full, zadoff_chu

    B, p, n = 4, 4, 32
    zc = np.asarray(zadoff_chu(n))
    rng = np.random.default_rng(0)
    h0 = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    dh = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    # h at symbol s (global index) = h0 + s*dh; pilots at s = 0, p, 2p...
    y_pil = np.stack([(h0 + (b * p) * dh) * zc for b in range(B)])
    est = np.asarray(
        estimate_block_pilots_interp_full(jnp.asarray(y_pil), p)
    )  # (B, p-1, n) for data symbols at s = b*p + o, o=1..p-1
    for b in range(B - 1):  # last block extrapolates (also exact here)
        for o in range(1, p):
            want = h0 + (b * p + o) * dh
            np.testing.assert_allclose(est[b, o - 1], want, rtol=1e-5, atol=1e-5)


def test_config_gates():
    with pytest.raises(ValueError, match="delay spread exceeds"):
        LinkConfig(
            modulation=Modulation.QAM16,
            ofdm=OFDMConfig(n_fft=64, cp_len=2),
            channel=ChannelConfig(
                model=ChannelModel.MULTIPATH_TIME, pdp=(1.0,) * 8,
                doppler_norm=0.01,
            ),
            equalizer=Equalizer.MMSE,
        )
    with pytest.raises(ValueError, match="doppler_norm"):
        ChannelConfig(
            model=ChannelModel.MULTIPATH_TIME, pdp=PDP, doppler_norm=0.7
        )
    with pytest.raises(ValueError, match="cannot track fading"):
        _cfg(ChannelModel.MULTIPATH_TIME, 0.1, pilots=8, dft_spread=True)


def test_fast_engine_multipath_time():
    """The fast engine carries the model: BER in the same band as the
    pipeline engine, and the fused-kernel backend is decision-identical
    to the jnp backend (per-symbol selective h planes through the
    h_syms = n_symbols kernel path)."""
    from sdr_tpu.link import fast_simulate

    cfg = _cfg(ChannelModel.MULTIPATH_TIME, 0.02, ebno=12.0, nch=256)
    e_j, c_j = fast_simulate(cfg, jax.random.PRNGKey(7), backend="jnp")
    b_fast = float(jnp.sum(e_j)) / float(jnp.sum(c_j))
    b_pipe = float(jnp.mean(simulate(cfg, jax.random.PRNGKey(8)).ber))
    assert abs(b_fast / b_pipe - 1.0) < 0.2, (b_fast, b_pipe)

    # Fused-kernel parity needs a kernel-supported numerology (>= 128).
    small = LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(n_fft=128, cp_len=32),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH_TIME, ebno_db=12.0, pdp=PDP,
            doppler_norm=0.02,
        ),
        equalizer=Equalizer.MMSE,
        n_symbols=8,
        n_channels=2,
    )
    e_p, c_p = fast_simulate(small, jax.random.PRNGKey(9), backend="pallas")
    e_j2, c_j2 = fast_simulate(small, jax.random.PRNGKey(9), backend="jnp")
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_j2))
    np.testing.assert_array_equal(np.asarray(e_p), np.asarray(e_j2))


def test_sharded_stream_multipath_time_bit_exact():
    """Time-sharded per-tap-Jakes TDL stream == the sequential blocked
    oracle bit-for-bit: taps evaluate at ABSOLUTE symbol indices on any
    shard, and the ppermute halo carries the L−1-sample FIR seam."""
    from sdr_tpu.link.stream import stream_simulate
    from sdr_tpu.parallel.mesh import make_link_mesh
    from sdr_tpu.parallel.shard import make_sharded_stream_fn

    mesh = make_link_mesh(4, 2)
    cfg = LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(n_fft=64, cp_len=16),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH_TIME, ebno_db=12.0, pdp=PDP,
            doppler_norm=0.03,
        ),
        equalizer=Equalizer.MMSE,
        n_symbols=8,
        n_channels=8,
    )
    key = jax.random.PRNGKey(7)
    ref_err, ref_cnt = jax.jit(
        lambda k: stream_simulate(cfg, k, n_blocks=4)
    )(key)
    got_err, got_cnt = make_sharded_stream_fn(cfg, mesh)(key)
    np.testing.assert_array_equal(np.asarray(got_err), np.asarray(ref_err))
    np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(ref_cnt))


def test_mimo_multipath_time_diversity():
    """MIMO composes with the per-tap-Jakes TDL: combining schemes
    collect diversity over the selective time-varying channel (genie
    per-symbol per-tone CSI), and the midamble-tracked estimate stays
    within an order of genie at slow Doppler."""
    from sdr_tpu.core.config import MIMOConfig, MIMOScheme

    def mk(scheme, ntx, nrx, mid=0, ebno=16.0):
        return LinkConfig(
            modulation=Modulation.QAM16,
            ofdm=OFDMConfig(n_fft=64, cp_len=16),
            channel=ChannelConfig(
                model=ChannelModel.MULTIPATH_TIME, ebno_db=ebno,
                pdp=PDP, doppler_norm=0.02,
            ),
            equalizer=Equalizer.MMSE,
            mimo=MIMOConfig(
                scheme=scheme, n_tx=ntx, n_rx=nrx,
                csi="preamble" if mid else "genie", midamble_period=mid,
            ),
            n_symbols=16, n_channels=64,
        )

    b_siso = float(jnp.mean(simulate(
        _cfg(ChannelModel.MULTIPATH_TIME, 0.02, nch=64), jax.random.PRNGKey(0)
    ).ber))
    b_alam = float(jnp.mean(simulate(
        mk(MIMOScheme.ALAMOUTI, 2, 2), jax.random.PRNGKey(0)).ber))
    b_mrc = float(jnp.mean(simulate(
        mk(MIMOScheme.MRC, 1, 2), jax.random.PRNGKey(1)).ber))
    # Diversity orders: 2x2 Alamouti (4) < 1x2 MRC (2) < SISO (1).
    assert b_alam < b_mrc < b_siso, (b_alam, b_mrc, b_siso)

    # Midamble-tracked estimation: raw per-tone LS noise floors the
    # BER orders above the (diversity-4) genie level — the meaningful
    # assertions are that the tracked link DECODES and that the DFT
    # subspace projection (denoising onto the CP-bounded response)
    # beats raw LS, as it must for any in-CP channel.
    from sdr_tpu.core.config import ChannelEstimator
    import dataclasses

    cfg_mid = mk(MIMOScheme.ALAMOUTI, 2, 2, mid=4)
    b_mid = float(jnp.mean(simulate(cfg_mid, jax.random.PRNGKey(2)).ber))
    assert b_mid < 0.05, b_mid
    b_dft = float(jnp.mean(simulate(
        dataclasses.replace(cfg_mid, estimator=ChannelEstimator.DFT),
        jax.random.PRNGKey(2)).ber))
    assert b_dft < b_mid, (b_dft, b_mid)


def test_acquired_multipath_time_decodes():
    """Blind acquisition (CFO + unknown delay) under the per-tap-Jakes
    TDL: S&C locks through the time-varying selective channel and the
    per-symbol comb estimate absorbs the residual."""
    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(n_fft=64, cp_len=16),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH_TIME, ebno_db=14.0, pdp=PDP,
            doppler_norm=0.01, cfo_subcarriers=1.3, timing_offset=37,
        ),
        equalizer=Equalizer.MMSE,
        n_symbols=16, n_channels=64, pilot_spacing=4,
    )
    b = float(jnp.mean(simulate(cfg, jax.random.PRNGKey(4)).ber))
    # QPSK at 14 dB over this selective fading channel: well below 10%
    # (acquisition failure would read ~50%).
    assert b < 0.05, b
