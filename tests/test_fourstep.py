"""Fused four-step wideband demod kernel vs the jnp op composition.

Parity contract: kernels/fourstep_pallas.py must reproduce
ofdm_rx → equalize_mmse → llr_maxlog (the reference semantics chain,
ofdm.hpp:37-54 + soft demap) at n_fft >= 1024, including the internal
digit-permutation round trip. Runs in Pallas interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdr_tpu.core.config import Modulation
from sdr_tpu.ops.channel import ebno_db_to_noise_var
from sdr_tpu.ops.demod import demod_chain_jnp
from sdr_tpu.kernels.fourstep_pallas import (
    _pick_n2,
    demod_chain_fourstep,
    permute_h,
    supported,
)


def _inputs(rng, batch, n_syms, sym_len, n_fft, h_syms=1):
    re = rng.standard_normal((batch, n_syms, sym_len)).astype(np.float32) * 0.1
    im = rng.standard_normal((batch, n_syms, sym_len)).astype(np.float32) * 0.1
    hr = rng.standard_normal((batch, h_syms, n_fft)).astype(np.float32)
    hi = rng.standard_normal((batch, h_syms, n_fft)).astype(np.float32)
    return map(jnp.asarray, (re, im, hr, hi))


def test_permute_h_round_trip():
    n_fft, n2 = 1024, 256
    h = jnp.arange(n_fft, dtype=jnp.float32)[None, None, :]
    p = permute_h(h, n_fft, n2)
    n1 = n_fft // n2
    # κ = k1·N2 + k2 must carry natural subcarrier k1 + N1·k2.
    for kappa in (0, 1, 255, 256, 700, 1023):
        k1, k2 = kappa // n2, kappa % n2
        assert int(p[0, 0, kappa]) == k1 + n1 * k2


@pytest.mark.parametrize(
    "mod,n_fft,cp",
    [
        (Modulation.QAM16, 1024, 256),
        (Modulation.QPSK, 2048, 256),
        (Modulation.QAM64, 1024, 512),
    ],
)
def test_fourstep_matches_jnp(rng, mod, n_fft, cp):
    batch, n_syms = 2, 4
    nv = float(ebno_db_to_noise_var(10.0, mod.bits_per_symbol))
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft)
    assert supported(re.shape, cp, mod)
    ref = demod_chain_jnp(re, im, hr, hi, cp, mod, nv)
    got = demod_chain_fourstep(re, im, hr, hi, cp, mod, nv, interpret=True)
    assert got.shape == ref.shape == (batch, n_syms, n_fft * mod.bits_per_symbol)
    # atol covers f32 accumulation across the two-stage transform on
    # LLRs spanning ~1e3 (relative ~1e-5; hardware bf16x3 allows 0.135).
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=5e-2
    )


def test_fourstep_per_symbol_h(rng):
    mod, n_fft, cp = Modulation.QAM16, 1024, 256
    batch, n_syms = 2, 4
    nv = float(ebno_db_to_noise_var(12.0, mod.bits_per_symbol))
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft, h_syms=n_syms)
    ref = demod_chain_jnp(re, im, hr, hi, cp, mod, nv)
    got = demod_chain_fourstep(re, im, hr, hi, cp, mod, nv, interpret=True)
    # atol covers f32 accumulation across the two-stage transform on
    # LLRs spanning ~1e3 (relative ~1e-5; hardware bf16x3 allows 0.135).
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=5e-2
    )


def test_fourstep_reduce_sum_matches_full(rng):
    mod, n_fft, cp = Modulation.QAM16, 1024, 256
    nv = float(ebno_db_to_noise_var(12.0, mod.bits_per_symbol))
    re, im, hr, hi = _inputs(rng, 2, 4, n_fft + cp, n_fft)
    full = demod_chain_fourstep(re, im, hr, hi, cp, mod, nv, interpret=True)
    red = demod_chain_fourstep(
        re, im, hr, hi, cp, mod, nv, reduce_sum=True, interpret=True
    )
    np.testing.assert_allclose(
        float(red), float(jnp.sum(full, dtype=jnp.float32)), rtol=1e-4
    )


def test_supported_gate():
    mod = Modulation.QAM16
    assert supported((2, 4, 4608), 512, mod)        # 4096sc/CP512
    assert not supported((2, 4, 1024 + 100), 100, mod)  # cp % N2 != 0
    assert not supported((2, 4, 512 + 128), 128, mod)   # small N → full-fused
    assert not supported((3, 3, 4608), 512, mod)        # rows % 8 != 0
    assert _pick_n2(4096, 512) == 256
    assert _pick_n2(1024, 512) == 256  # N1 = 4
    assert _pick_n2(4096, 128) == 128  # cp forces narrower lanes


def test_fourstep_tx_matches_jnp(rng):
    """Four-step TX kernel vs modulate + ofdm_tx (reference chain
    semantics at n_fft >= 1024, incl. the exact CP layout)."""
    from sdr_tpu.kernels.fourstep_tx_pallas import supported as tx4_ok, tx_chain_fourstep
    from sdr_tpu.ops.modulation import _ints_to_bits, modulate
    from sdr_tpu.ops.ofdm import ofdm_tx

    for mod, n_fft, cp in [
        (Modulation.QAM16, 1024, 256),
        (Modulation.QAM64, 2048, 512),
        (Modulation.BPSK, 1024, 512),
    ]:
        bps = mod.bits_per_symbol
        idx = jnp.asarray(
            rng.integers(0, 1 << bps, (2, 4, n_fft)), jnp.int32
        )
        assert tx4_ok(idx.shape, cp, mod)
        re, im = tx_chain_fourstep(idx, cp, mod, interpret=True)
        ref = ofdm_tx(modulate(_ints_to_bits(idx, bps), mod), cp)
        assert re.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(re), np.real(np.asarray(ref)), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(im), np.imag(np.asarray(ref)), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("stage", ["f32", "bf16"])
def test_fourstep_tx_split_matches_jnp(rng, monkeypatch, stage):
    """Two-phase four-step TX (HBM-staged) vs modulate + ofdm_tx, both
    staging dtypes."""
    from sdr_tpu.kernels.fourstep_tx_split_pallas import (
        supported as tx2_ok,
        tx_chain_fourstep2,
    )
    from sdr_tpu.ops.modulation import _ints_to_bits, modulate
    from sdr_tpu.ops.ofdm import ofdm_tx

    monkeypatch.setenv("SDR_TPU_FOURSTEP_STAGE", stage)
    tol = dict(rtol=1e-4, atol=1e-5) if stage == "f32" else dict(
        rtol=0.05, atol=8e-3 * 0.05
    )
    for mod, n_fft, cp in [
        (Modulation.QAM16, 1024, 256),
        (Modulation.QAM64, 4096, 512),
    ]:
        bps = mod.bits_per_symbol
        idx = jnp.asarray(rng.integers(0, 1 << bps, (2, 4, n_fft)), jnp.int32)
        assert tx2_ok(idx.shape, cp, mod)
        re, im = tx_chain_fourstep2(idx, cp, mod, interpret=True)
        ref = ofdm_tx(modulate(_ints_to_bits(idx, bps), mod), cp)
        assert re.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(re), np.real(np.asarray(ref)), **tol
        )
        np.testing.assert_allclose(
            np.asarray(im), np.imag(np.asarray(ref)), **tol
        )


def test_fast_wideband_pallas_matches_jnp():
    """Full fast link at config-5 numerology through both fused
    four-step kernels (TX + demod), vs the jnp composition."""
    import jax as _jax

    from sdr_tpu.core.config import (
        ChannelConfig,
        ChannelModel,
        Equalizer,
        LinkConfig,
        OFDMConfig,
    )
    from sdr_tpu.link.fast import fast_simulate

    cfg = LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(n_fft=1024, cp_len=256),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=10.0),
        n_symbols=4,
        n_channels=2,
    )
    e_j, c_j = fast_simulate(cfg, _jax.random.PRNGKey(9), backend="jnp")
    e_p, c_p = fast_simulate(cfg, _jax.random.PRNGKey(9), backend="pallas")
    np.testing.assert_array_equal(np.asarray(c_j), np.asarray(c_p))
    np.testing.assert_array_equal(np.asarray(e_j), np.asarray(e_p))


def test_auto_dispatch_never_claims_infeasible_shapes():
    """Regression: supported() used to check the reduce-mode VMEM tile
    only, so auto-dispatch could claim a shape whose non-reduce call
    then raised. The gate now uses the worst case: this shape (QAM64,
    n_fft=1024, cp=256, 80 symbols/row-block) fits reduced but not with
    the LLR output block — it must route to hybrid, not crash."""
    from sdr_tpu.ops.demod import select_backend

    shape, h, cp = (1, 80, 1280), (1, 1, 1024), 256
    b = select_backend(shape, h, cp, Modulation.QAM64, "tpu")
    assert b in ("fourstep2", "hybrid", "jnp")
    if b == "fourstep2":
        # The split kernel's gate admits it — the non-reduce call must
        # actually run (the original regression: claimed-but-raising).
        from sdr_tpu.kernels.fourstep_split_pallas import (
            demod_chain_fourstep2,
        )

        rng = np.random.default_rng(0)
        re, im, hr, hi = _inputs(rng, 1, 80, 1280, 1024)
        demod_chain_fourstep2(
            re, im, hr, hi, cp, Modulation.QAM64, 0.1, interpret=True
        )
    if supported(shape, cp, Modulation.QAM64):
        # If the single-kernel gate ever admits it again, the
        # non-reduce path must work.
        rng = np.random.default_rng(0)
        re, im, hr, hi = _inputs(rng, 1, 80, 1280, 1024)
        demod_chain_fourstep(
            re, im, hr, hi, cp, Modulation.QAM64, 0.1, interpret=True
        )


def test_fourstep_split_4096_parity(rng):
    """Config-5 numerology (4096sc/CP512) through the split kernel:
    the exact shape the wideband bench runs, in interpret mode."""
    from sdr_tpu.kernels.fourstep_split_pallas import (
        demod_chain_fourstep2,
        supported as fs2_ok,
    )

    mod, n_fft, cp = Modulation.QAM16, 4096, 512
    nv = float(ebno_db_to_noise_var(10.0, mod.bits_per_symbol))
    re, im, hr, hi = _inputs(rng, 2, 4, n_fft + cp, n_fft)
    assert fs2_ok(re.shape, cp, mod)
    ref = np.asarray(demod_chain_jnp(re, im, hr, hi, cp, mod, nv))
    got = np.asarray(
        demod_chain_fourstep2(re, im, hr, hi, cp, mod, nv, interpret=True)
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3 * scale)


def test_fourstep_split_bf16_stage(rng, monkeypatch):
    """bf16-staged intermediate (SDR_TPU_FOURSTEP_STAGE=bf16): halves the
    HBM hop; accuracy must stay bf16-class relative to the jnp chain."""
    from sdr_tpu.kernels.fourstep_split_pallas import demod_chain_fourstep2

    mod, n_fft, cp = Modulation.QAM16, 1024, 256
    nv = float(ebno_db_to_noise_var(10.0, mod.bits_per_symbol))
    re, im, hr, hi = _inputs(rng, 2, 4, n_fft + cp, n_fft)
    ref = np.asarray(demod_chain_jnp(re, im, hr, hi, cp, mod, nv))
    monkeypatch.setenv("SDR_TPU_FOURSTEP_STAGE", "bf16")
    got = np.asarray(
        demod_chain_fourstep2(re, im, hr, hi, cp, mod, nv, interpret=True)
    )
    scale = np.abs(ref).max()
    # bf16 mantissa (~8e-3 relative) through the staged hop; LLR-sign
    # agreement is the decision-relevant contract.
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05 * scale)
    confident = np.abs(ref) > 0.05 * scale
    assert np.all(np.sign(got[confident]) == np.sign(ref[confident]))


@pytest.mark.parametrize("h_syms_is_S", [False, True])
def test_fourstep_split_matches_jnp(rng, h_syms_is_S, monkeypatch):
    """Two-phase four-step (HBM-staged) parity vs jnp, both h layouts.
    Pinned to the f32 stage — the bf16 default's looser tolerance has
    its own test (test_fourstep_split_bf16_stage)."""
    from sdr_tpu.kernels.fourstep_split_pallas import demod_chain_fourstep2

    monkeypatch.setenv("SDR_TPU_FOURSTEP_STAGE", "f32")
    mod, n_fft, cp = Modulation.QAM16, 1024, 256
    batch, n_syms = 2, 4
    nv = float(ebno_db_to_noise_var(10.0, mod.bits_per_symbol))
    hs = n_syms if h_syms_is_S else 1
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft, h_syms=hs)
    ref = demod_chain_jnp(re, im, hr, hi, cp, mod, nv)
    got = demod_chain_fourstep2(re, im, hr, hi, cp, mod, nv, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=5e-2
    )
    red = demod_chain_fourstep2(
        re, im, hr, hi, cp, mod, nv, reduce_sum=True, interpret=True
    )
    np.testing.assert_allclose(
        float(red), float(jnp.sum(ref, dtype=jnp.float32)), rtol=1e-4
    )


def test_fourstep_split_count_matches_llr_counting(rng):
    """Wideband fused count (count_idx) == hard decisions on the split
    kernel's own public-order LLRs (decision-exact)."""
    from sdr_tpu.kernels.fourstep_split_pallas import demod_chain_fourstep2
    from sdr_tpu.ops.modulation import _ints_to_bits

    mod, n_fft, cp = Modulation.QAM16, 1024, 256
    batch, n_syms = 2, 4
    bps = mod.bits_per_symbol
    nv = float(ebno_db_to_noise_var(8.0, bps))
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft)
    idx = jnp.asarray(
        rng.integers(0, 1 << bps, (batch, n_syms, n_fft)), jnp.int32
    )
    llr = demod_chain_fourstep2(re, im, hr, hi, cp, mod, nv, interpret=True)
    hard = (np.asarray(llr) < 0).astype(np.int8)
    bits = np.asarray(_ints_to_bits(idx, bps))
    want = (hard != bits).sum(axis=(1, 2))
    got = np.asarray(
        demod_chain_fourstep2(
            re, im, hr, hi, cp, mod, nv, interpret=True, count_idx=idx
        )
    )
    assert got.dtype == np.int32 and got.shape == (batch,)
    np.testing.assert_array_equal(got, want)


def test_wideband_scfde_matches_jnp_oracle(rng, monkeypatch):
    """Round-4 fused wideband SC-FDE (A → B′ → C): counts are
    decision-exact and the LLR sum matches the jnp SC-FDE composition
    (equalize_mmse_fde + llr) on a REAL full-grid SC-FDMA signal, for
    per-link AND per-symbol channel planes."""
    monkeypatch.setenv("SDR_TPU_MXU_PRECISION", "highest")
    monkeypatch.setenv("SDR_TPU_FOURSTEP_STAGE", "f32")
    from sdr_tpu.kernels.fourstep_split_pallas import (
        demod_chain_fourstep2_fde,
        supported_fde,
    )
    from sdr_tpu.ops.demod import demod_chain_jnp
    from sdr_tpu.ops.modulation import _ints_to_bits, _tables

    mod = Modulation.QAM16
    n_fft, cp, batch, n_syms = 1024, 256, 2, 4
    nv = 0.05
    table, _, _, _ = _tables(mod)
    for h_syms in (1, n_syms):
        idx = rng.integers(0, 16, (batch, n_syms, n_fft)).astype(np.int32)
        xt = np.asarray(table)[idx]  # time-domain constellation
        h = (
            rng.standard_normal((batch, h_syms, n_fft))
            + 1j * rng.standard_normal((batch, h_syms, n_fft))
        ).astype(np.complex64) * np.sqrt(0.5)
        X = np.fft.fft(xt, axis=-1) / np.sqrt(n_fft)  # unitary precode
        noise = (
            rng.standard_normal((batch, n_syms, n_fft))
            + 1j * rng.standard_normal((batch, n_syms, n_fft))
        ) * np.sqrt(nv / 2)
        Y = h * X + noise
        t = np.fft.ifft(Y, axis=-1)
        t = np.concatenate([t[..., n_fft - cp:], t], axis=-1).astype(
            np.complex64
        )
        re = jnp.asarray(np.real(t))
        im = jnp.asarray(np.imag(t))
        hr = jnp.asarray(np.real(h))
        hi = jnp.asarray(np.imag(h))
        idx_j = jnp.asarray(idx)
        assert supported_fde(re.shape, cp, mod, h_syms)

        llr = demod_chain_jnp(re, im, hr, hi, cp, mod, nv, despread=True)
        hard = (np.asarray(llr) < 0).astype(np.int8)
        bits = np.asarray(_ints_to_bits(idx_j, 4))
        ref_cnt = (hard != bits).sum(axis=(1, 2))
        got_cnt = np.asarray(
            demod_chain_fourstep2_fde(
                re, im, hr, hi, cp, mod, nv, count_idx=idx_j
            )
        )
        np.testing.assert_array_equal(got_cnt, ref_cnt)
        got_sum = float(
            demod_chain_fourstep2_fde(re, im, hr, hi, cp, mod, nv,
                                      reduce_sum=True)
        )
        ref_sum = float(jnp.sum(llr))
        assert abs(got_sum - ref_sum) <= 1e-4 * abs(ref_sum), (
            got_sum, ref_sum,
        )


def test_wideband_scfde_count_via_dispatch(rng):
    """demod_count_chain routes wideband despread counts to the fused
    kernel; results match the jnp-LLR counting fallback decisions
    within the bf16-stage tolerance."""
    from sdr_tpu.ops.demod import demod_count_chain

    mod = Modulation.QAM16
    n_fft, cp, batch, n_syms = 1024, 256, 2, 4
    re = jnp.asarray(rng.standard_normal((batch, n_syms, n_fft + cp)), jnp.float32) * 0.05
    im = jnp.asarray(rng.standard_normal((batch, n_syms, n_fft + cp)), jnp.float32) * 0.05
    hr = jnp.asarray(rng.standard_normal((batch, 1, n_fft)), jnp.float32)
    hi = jnp.asarray(rng.standard_normal((batch, 1, n_fft)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 16, (batch, n_syms, n_fft)), jnp.int32)
    a = demod_count_chain(re, im, hr, hi, idx, cp, mod, 0.05,
                          backend="fourstep2", despread=True)
    b = demod_count_chain(re, im, hr, hi, idx, cp, mod, 0.05,
                          backend="jnp", despread=True)
    tot = batch * n_syms * n_fft * 4
    assert int(jnp.sum(jnp.abs(a - b))) <= max(4, int(0.02 * tot))
