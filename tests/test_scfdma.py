"""SC-FDMA (DFT-spread) + blind acquisition: the LTE-uplink composition.

Round-3 capability (VERDICT #5): the S&C preamble is waveform-agnostic,
the van de Beek CP correlation refines the residual CFO below the
block-pilot tracker's wrap limit, and the tracked Zadoff-Chu block
pilots interpolate the remaining linear common phase between pilot
symbols. Validation: estimator accuracy on synthetic inputs, the
acquired link within 0.5 dB of the aligned SC-FDMA link on AWGN and
multipath, and the config gate narrowed to exactly the nonlinear
time-variations the interpolation cannot represent.
"""

import dataclasses

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
from sdr_tpu.link.pipeline import make_simulate_fn
from sdr_tpu.ops.pilots import estimate_block_pilots_tracked, zadoff_chu
from sdr_tpu.ops.sync import cp_residual_cfo, correct_residual_cfo


def _ber(cfg, key=6):
    r = make_simulate_fn(cfg)(jax.random.PRNGKey(key))
    e = np.asarray(r.bit_errors)
    return float(e.sum()) / float(np.asarray(r.bits_counted).sum()), e


def test_cp_residual_cfo_recovers_offset():
    """Synthetic OFDM symbols with a known small CFO: the CP
    correlation estimate lands within 1e-3 subcarrier (noiseless) and
    the corrector leaves < 1e-4 residual."""
    n_fft, cp, n_sym = 64, 16, 16
    rng = np.random.default_rng(0)
    body = (
        rng.standard_normal((n_sym, n_fft)) + 1j * rng.standard_normal((n_sym, n_fft))
    ).astype(np.complex64) / np.sqrt(2 * n_fft)
    sym = np.concatenate([body[:, -cp:], body], axis=1)  # CP insert
    for eps_true in (-0.11, 0.004, 0.057):
        t = np.arange(n_sym * (n_fft + cp)).reshape(n_sym, n_fft + cp)
        rot = np.exp(2j * np.pi * eps_true * t / n_fft)
        rx = jnp.asarray(sym * rot)
        eps = float(cp_residual_cfo(rx, n_fft, cp))
        assert abs(eps - eps_true) < 1e-3, (eps, eps_true)
        fixed = np.asarray(correct_residual_cfo(rx, n_fft, cp))
        eps2 = float(cp_residual_cfo(jnp.asarray(fixed), n_fft, cp))
        assert abs(eps2) < 1e-4


def test_block_pilot_tracker_recovers_linear_phase():
    """ZC pilot symbols through a static channel with a linear
    per-symbol common phase (residual CFO model): the tracked estimate
    at every data symbol matches h·e^{iφ(t)} closely."""
    n_fft, p, B = 64, 8, 4
    rng = np.random.default_rng(1)
    h = (rng.standard_normal(n_fft) + 1j * rng.standard_normal(n_fft)).astype(
        np.complex64
    )
    slope = 0.05  # rad per symbol
    zc = zadoff_chu(n_fft)
    y_pil = np.stack(
        [h * zc * np.exp(1j * slope * (b * p)) for b in range(B)]
    )
    got = np.asarray(estimate_block_pilots_tracked(jnp.asarray(y_pil), p))
    # got: (B, p-1, n_fft); truth at block b, offset o: h·e^{iφ}·e^{iφ0}
    # up to the common reference phase of block 0 (φ_0 := 0).
    for b in range(B):
        for o in range(1, p):
            want = h * np.exp(1j * slope * (b * p + o))
            err = np.abs(got[b, o - 1] - want).max() / np.abs(h).max()
            assert err < 1e-3, (b, o, err)


_AWGN = dict(
    modulation=Modulation.QPSK,
    ofdm=OFDMConfig(64, 16),
    equalizer=Equalizer.MMSE,
    pilot_spacing=8,
    n_symbols=32,
    n_channels=64,
    dft_spread=True,
)


def test_scfdma_acquired_within_half_db_awgn():
    """SC-FDMA + CFO 2.3 + unknown delay at 6 dB decodes better than
    the ALIGNED SC-FDMA link at 5.5 dB — the acquisition costs less
    than 0.5 dB. Also: no per-channel outages (the round-3 CP
    refinement removed the block-phase wrap failures)."""
    aligned_low = LinkConfig(
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=5.5), **_AWGN
    )
    acq = LinkConfig(
        channel=ChannelConfig(
            model=ChannelModel.AWGN, ebno_db=6.0,
            cfo_subcarriers=2.3, timing_offset=33,
        ),
        **_AWGN,
    )
    b_low, _ = _ber(aligned_low)
    b_acq, e = _ber(acq)
    assert b_acq < b_low, (b_acq, b_low)
    counted_per_ch = 32 * 7 // 8 * 64 * 2  # data syms × n_fft × bits
    assert e.max() < 0.1 * counted_per_ch  # no acquisition outages


def test_scfdma_acquired_within_half_db_multipath():
    base = dict(_AWGN, modulation=Modulation.QAM16)
    mk = lambda ebno, cfo, to: LinkConfig(
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH, ebno_db=ebno, pdp=(1.0, 0.3),
            cfo_subcarriers=cfo, timing_offset=to,
        ),
        **base,
    )
    b_low, _ = _ber(mk(11.5, 0.0, 0), key=5)
    b_acq, _ = _ber(mk(12.0, 2.3, 33), key=5)
    assert b_acq < b_low, (b_acq, b_low)


def test_scfdma_phase_noise_tracked():
    """LO phase noise composes with SC-FDMA: the Wiener walk is
    locally linear between pilot symbols, so the tracked block-pilot
    interpolation follows it — alone and on top of full blind
    acquisition (the triple composition)."""
    def run(pn, cfo=0.0, to=0):
        cfg = LinkConfig(
            channel=ChannelConfig(
                model=ChannelModel.AWGN, ebno_db=6.0,
                phase_noise_std=pn, cfo_subcarriers=cfo,
                timing_offset=to,
            ),
            **_AWGN,
        )
        return _ber(cfg)[0]

    clean = run(0.0)
    assert run(5e-3) < 1.5 * clean
    assert run(5e-3, 2.3, 33) < 1.5 * clean  # + acquisition on top


def test_scfdma_jakes_tracked_by_block_interpolation():
    """Flat Jakes fading composes with SC-FDMA: the block pilots
    estimate a frame-averaged per-tone SHAPE (absorbing any residual
    timing phase — a naive across-tone mean collapses ~50x under the
    acquired path's 2-sample backoff) and a per-block complex scalar,
    interpolated per data symbol. At the same Doppler the SC-FDMA link
    must not be worse than the comb-pilot OFDM link (same fades, same
    key), and the fade outliers are the SAME channels in both (physics,
    not estimator: measured corr 0.98)."""
    def errs(dop, dft, cfo=0.0, to=0):
        cfg = LinkConfig(
            modulation=Modulation.QPSK,
            ofdm=OFDMConfig(64, 16),
            channel=ChannelConfig(
                model=ChannelModel.RAYLEIGH_TIME, ebno_db=10.0,
                doppler_norm=dop, cfo_subcarriers=cfo, timing_offset=to,
            ),
            equalizer=Equalizer.MMSE,
            pilot_spacing=8,
            n_symbols=32,
            n_channels=256,
            dft_spread=dft,
        )
        r = make_simulate_fn(cfg)(jax.random.PRNGKey(4))
        return np.asarray(r.bit_errors), np.asarray(r.bits_counted)

    for dop in (0.005, 0.02):
        e_s, t_s = errs(dop, True)
        e_c, t_c = errs(dop, False)
        assert e_s.sum() / t_s.sum() <= 1.1 * e_c.sum() / t_c.sum(), dop


def test_scfdma_jakes_composes_with_acquisition():
    """The full LTE-uplink stack: SC-FDMA + Jakes + unknown delay +
    CFO. In-lock channels within 2x of the aligned SC-FDMA Jakes link;
    outages bounded (deep-faded preambles, the blind-acquisition
    physics floor)."""
    def run(cfo, to):
        cfg = LinkConfig(
            modulation=Modulation.QPSK,
            ofdm=OFDMConfig(64, 16),
            channel=ChannelConfig(
                model=ChannelModel.RAYLEIGH_TIME, ebno_db=10.0,
                doppler_norm=0.02, cfo_subcarriers=cfo,
                timing_offset=to,
            ),
            equalizer=Equalizer.MMSE,
            pilot_spacing=8,
            n_symbols=32,
            n_channels=256,
            dft_spread=True,
        )
        r = make_simulate_fn(cfg)(jax.random.PRNGKey(4))
        return np.asarray(r.bit_errors), float(np.asarray(r.bits_counted)[0])

    e_al, t = run(0.0, 0)
    e_acq, _ = run(2.3, 33)
    in_lock = e_acq[e_acq / t <= 0.25]
    outage = (e_acq / t > 0.25).mean()
    assert outage <= 0.10, outage
    assert in_lock.mean() <= 2.0 * e_al.mean(), (in_lock.mean(), e_al.mean())


def test_scfdma_iq_imbalance_compensated():
    """I/Q imbalance composes with SC-FDMA: the properization moments
    difference at the BLOCK period (pilot symbols repeat every p
    symbols), cancelling the deterministic Zadoff-Chu component. The
    compensated link matches the matched-mixer link — alone, under
    Jakes fading, and under the full acquisition stack."""
    base = dict(_AWGN, modulation=Modulation.QAM16)

    def run(iq, cfo=0.0, to=0, model=ChannelModel.AWGN, dop=0.0):
        kw = dict(model=model, ebno_db=14.0, cfo_subcarriers=cfo,
                  timing_offset=to)
        if iq:
            kw.update(iq_gain=1.05, iq_phase_rad=0.03)
        if dop:
            kw["doppler_norm"] = dop
        return _ber(LinkConfig(channel=ChannelConfig(**kw), **base),
                    key=7)[0]

    assert run(True) < 3.0 * max(run(False), 2e-5)
    assert run(True, cfo=2.3, to=33) < 3.0 * max(run(False), 2e-5)
    j_clean = run(False, model=ChannelModel.RAYLEIGH_TIME, dop=0.02)
    j_iq = run(True, model=ChannelModel.RAYLEIGH_TIME, dop=0.02)
    assert j_iq < 1.2 * j_clean, (j_iq, j_clean)


def test_scfdma_mimo_all_schemes():
    """SC-FDMA MIMO (the last composition gate, removed round 3):
    streams are DFT-precoded before the space-time encoding and
    despread after LINEAR per-tone detection. All three schemes run
    within a small factor of their OFDM twins on flat fading, and
    under MULTIPATH the constant-modulus waveform's tone-averaging
    WINS; the PA story carries over (deep backoff hurts SC-FDMA MIMO
    less than OFDM MIMO). ML/SIC are rejected with physics."""
    from sdr_tpu.core.config import MIMOConfig, MIMOScheme

    def mk(dft, scheme=MIMOScheme.ALAMOUTI, ntx=2, nrx=2,
           model=ChannelModel.RAYLEIGH_FLAT, ibo=None, **ch):
        return LinkConfig(
            modulation=Modulation.QPSK,
            ofdm=OFDMConfig(64, 16),
            channel=ChannelConfig(model=model, ebno_db=10.0,
                                  pa_ibo_db=ibo, **ch),
            mimo=MIMOConfig(scheme=scheme, n_tx=ntx, n_rx=nrx,
                            csi="preamble"),
            equalizer=Equalizer.MMSE,
            n_symbols=16,
            n_channels=512,
            dft_spread=dft,
        )

    def ber(cfg):
        return _ber(cfg, key=2)[0]

    for scheme, ntx, nrx in (
        (MIMOScheme.ALAMOUTI, 2, 2),
        (MIMOScheme.MRC, 1, 2),
        (MIMOScheme.SPATIAL_MUX, 2, 2),
    ):
        o = ber(mk(False, scheme, ntx, nrx))
        s = ber(mk(True, scheme, ntx, nrx))
        assert s < 2.0 * o, (scheme, s, o)
    # Multipath: SC-FDMA's tone averaging wins outright.
    o = ber(mk(False, model=ChannelModel.MULTIPATH, pdp=(1.0, 0.3)))
    s = ber(mk(True, model=ChannelModel.MULTIPATH, pdp=(1.0, 0.3)))
    assert s < o, (s, o)
    # PA at deep backoff: the CM waveform tolerates compression better.
    o = ber(mk(False, ibo=3.0))
    s = ber(mk(True, ibo=3.0))
    assert s < o, (s, o)
    mk(True, MIMOScheme.SPATIAL_MUX)  # default linear detector: OK
    with pytest.raises(ValueError, match="LINEAR"):
        LinkConfig(
            modulation=Modulation.QPSK,
            ofdm=OFDMConfig(64, 16),
            channel=ChannelConfig(model=ChannelModel.RAYLEIGH_FLAT,
                                  ebno_db=10.0),
            mimo=MIMOConfig(MIMOScheme.SPATIAL_MUX, 2, 2, csi="preamble",
                            detector="ml"),
            n_symbols=16,
            dft_spread=True,
        )


def test_scfdma_mimo_acquisition():
    """The full stack: SC-FDMA + MIMO + unknown delay + CFO (midamble
    tracking) — in range of the OFDM-MIMO acquired link, bounded
    outages."""
    from sdr_tpu.core.config import MIMOConfig, MIMOScheme

    def mk(cfo, to):
        return LinkConfig(
            modulation=Modulation.QPSK,
            ofdm=OFDMConfig(64, 16),
            channel=ChannelConfig(
                model=ChannelModel.RAYLEIGH_FLAT, ebno_db=8.0,
                cfo_subcarriers=cfo, timing_offset=to,
            ),
            mimo=MIMOConfig(MIMOScheme.ALAMOUTI, 2, 2, csi="preamble",
                            midamble_period=4 if cfo else 0),
            equalizer=Equalizer.MMSE,
            n_symbols=32,
            n_channels=256,
            dft_spread=True,
        )

    b_al, e_al = _ber(mk(0.0, 0), key=1)
    b_acq, e_acq = _ber(mk(1.3, 37), key=1)
    t = 32 * 64 * 2
    assert (e_acq / t > 0.25).mean() < 0.05
    in_lock = e_acq[e_acq / t <= 0.25]
    assert in_lock.mean() < 2.5 * max(e_al.mean(), 1.0)


def test_scfdma_coded_families():
    """FEC composes with SC-FDMA (all three families through the
    block-pilot receiver). Fading-outage structure: SC-FDMA's despread
    spreads a deep notch's ZF noise enhancement over EVERY symbol, so
    a bad realization is wholesale beyond capacity while good ones
    decode clean — assert per-channel: most channels error-free
    (including ones with hundreds of raw errors), outages bounded."""
    from sdr_tpu.link.coded import make_family_fn

    base = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(128, 16),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH, ebno_db=14.0, pdp=(1.0, 0.3)
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=8,
        n_symbols=32,
        n_channels=8,
        dft_spread=True,
    )
    for fam in ("conv", "ldpc", "polar"):
        e, t = make_family_fn(base, fam)(jax.random.PRNGKey(2))
        e = np.asarray(e)
        clean = int((e == 0).sum())
        # Measured with the MMSE-FDE receiver: 7/8 for every family
        # (only the 26%-raw-BER catastrophic-notch realization keeps
        # residual errors).
        assert clean >= 6, (fam, e.tolist())


def test_polar_composes_with_mimo():
    """The polar CA-SCL chain rides mimo_llr_link like conv/LDPC do:
    (256,128) over Alamouti 2x2 with preamble CSI decodes error-free
    at 10 dB (measured 0/14976)."""
    from sdr_tpu.core.config import MIMOConfig, MIMOScheme
    from sdr_tpu.link.coded import make_polar_fn

    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(128, 16),
        channel=ChannelConfig(model=ChannelModel.RAYLEIGH_FLAT,
                              ebno_db=10.0),
        mimo=MIMOConfig(MIMOScheme.ALAMOUTI, 2, 2, csi="preamble"),
        equalizer=Equalizer.MMSE,
        n_symbols=16,
        n_channels=8,
    )
    e, t = make_polar_fn(cfg, list_size=4)(jax.random.PRNGKey(1))
    assert int(np.asarray(t).sum()) > 0
    assert int(np.asarray(e).sum()) <= 10  # measured 0


def test_scfdma_gate_narrowed():
    """CFO/timing acquisition, LO phase noise, I/Q imbalance and
    (coherence-bounded) Jakes fading now all compose with SC-FDMA;
    fading faster than the pilot period is rejected with physics, and
    I/Q needs at least two pilot blocks to difference."""
    ok = LinkConfig(
        channel=ChannelConfig(
            model=ChannelModel.AWGN, ebno_db=8.0, cfo_subcarriers=1.2
        ),
        **_AWGN,
    )
    assert ok.channel.impaired
    LinkConfig(  # phase noise constructs too
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=8.0,
                              phase_noise_std=0.005),
        **_AWGN,
    )
    LinkConfig(  # coherence-bounded Jakes constructs too
        channel=ChannelConfig(model=ChannelModel.RAYLEIGH_TIME,
                              ebno_db=8.0, doppler_norm=0.01),
        **_AWGN,
    )
    with pytest.raises(ValueError, match="coherence|track fading"):
        LinkConfig(  # pilot period outside the coherence time
            channel=ChannelConfig(model=ChannelModel.RAYLEIGH_TIME,
                                  ebno_db=8.0, doppler_norm=0.1),
            **_AWGN,
        )
    LinkConfig(  # I/Q with >= 2 pilot blocks constructs
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=8.0,
                              iq_gain=1.05),
        **_AWGN,
    )
    with pytest.raises(ValueError, match="pilot "):
        LinkConfig(  # one block only: nothing to difference against
            channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=8.0,
                                  iq_gain=1.05),
            **{**_AWGN, "n_symbols": 8},
        )
