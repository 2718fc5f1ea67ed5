"""Channels-last pipelined demod kernel (kernels/demod_cl_pallas.py).

The emit_pipeline kernel itself requires the TPU backend (Mosaic's
pipeline emitter has no interpret lowering), so the CPU suite pins the
kernel's exact MATH through ``demod_cl_jnp`` — the pure-jnp twin built
from the same DIF-cascade / LHS-Gauss / division-free-tail functions
the kernel traces — against the reference composition
(ops.demod.demod_chain_jnp). On hardware the kernel was verified
bit-exact against this twin at HIGHEST precision and BER-gated at the
bench precision (scripts/gate_cl.py, docs/PERF.md round 4).

Reference contract: the receive chain these paths implement is
ofdm.hpp:37-54 + modulation.hpp:50-67 (soft-output form).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdr_tpu.core.config import Modulation
from sdr_tpu.kernels.demod_cl_pallas import (
    demod_cl_jnp,
    dif_blocks,
    dif_perm,
    inv_dif_perm,
    supported_cl,
    _twiddle_levels,
)
from sdr_tpu.ops.demod import demod_chain_jnp, demod_count_chain


def _cl_views(re, im, hr, hi):
    """Rows-layout (batch, syms, sym_len) → channels-last views."""
    batch, n_syms, sym_len = re.shape
    re_t = jnp.asarray(re.reshape(batch, n_syms * sym_len).T.copy())
    im_t = jnp.asarray(im.reshape(batch, n_syms * sym_len).T.copy())
    hr_t = jnp.asarray(hr[:, 0, :].T.copy())
    hi_t = jnp.asarray(hi[:, 0, :].T.copy())
    return re_t, im_t, hr_t, hi_t


def _inputs(rng, batch, n_syms, sym_len, n_fft):
    re = rng.standard_normal((batch, n_syms, sym_len)).astype(np.float32) * 0.1
    im = rng.standard_normal((batch, n_syms, sym_len)).astype(np.float32) * 0.1
    hr = rng.standard_normal((batch, 1, n_fft)).astype(np.float32)
    hi = rng.standard_normal((batch, 1, n_fft)).astype(np.float32)
    return re, im, hr, hi


@pytest.mark.parametrize("n_fft", [128, 256, 512])
def test_dif_perm_is_even_odd_recursion(n_fft):
    p = dif_perm(n_fft)
    assert sorted(p) == list(range(n_fft))
    if n_fft > 128:
        h = n_fft // 2
        assert all(v % 2 == 0 for v in p[:h])
        assert all(v % 2 == 1 for v in p[h:])
    inv = inv_dif_perm(n_fft)
    np.testing.assert_array_equal(p[inv], np.arange(n_fft))


@pytest.mark.parametrize("n_fft", [256, 512])
def test_dif_cascade_matches_fft(rng, n_fft):
    """DIF butterfly cascade + per-block 128-pt DFT == numpy FFT in
    dif_perm row order (the identity the kernel's matmul relies on)."""
    x = (
        rng.standard_normal((n_fft, 8)) + 1j * rng.standard_normal((n_fft, 8))
    ).astype(np.complex64)
    blocks, _leaf_dt = dif_blocks(
        jnp.asarray(np.real(x)), jnp.asarray(np.imag(x)),
        [(jnp.asarray(a), jnp.asarray(b)) for a, b in _twiddle_levels(n_fft)],
    )
    outs = []
    for br, bi in blocks:
        sub = np.fft.fft(np.asarray(br) + 1j * np.asarray(bi), axis=0)
        outs.append(sub)
    got = np.concatenate(outs, axis=0)
    ref = np.fft.fft(x, axis=0)[dif_perm(n_fft)]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "mod,n_fft,cp",
    [
        (Modulation.QPSK, 128, 32),
        (Modulation.QAM16, 256, 64),
        (Modulation.QAM64, 256, 16),
        (Modulation.QAM256, 512, 128),
        (Modulation.BPSK, 256, 64),
        (Modulation.QAM1024, 256, 64),
    ],
)
def test_cl_twin_matches_reference_llr(rng, mod, n_fft, cp, monkeypatch):
    """The CL math (DIF + LHS Gauss + division-free tail) reproduces the
    reference composition's public-order LLRs."""
    monkeypatch.setenv("SDR_TPU_MXU_PRECISION", "highest")
    batch, n_syms = 8, 4
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft)
    ref = demod_chain_jnp(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(hr), jnp.asarray(hi),
        cp, mod, 0.05,
    )
    got = demod_cl_jnp(*_cl_views(re, im, hr, hi), cp, mod, 0.05)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(ref) / scale, atol=2e-5
    )


@pytest.mark.parametrize(
    "mod,n_fft", [(Modulation.QAM16, 256), (Modulation.QAM64, 512)]
)
def test_cl_twin_count_decision_exact(rng, mod, n_fft, monkeypatch):
    monkeypatch.setenv("SDR_TPU_MXU_PRECISION", "highest")
    batch, n_syms, cp = 8, 4, n_fft // 4
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft)
    idx = rng.integers(0, 1 << mod.bits_per_symbol, (batch, n_syms, n_fft))
    ref = demod_count_chain(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(hr), jnp.asarray(hi),
        jnp.asarray(idx), cp, mod, 0.05, backend="jnp",
    )
    idx_t = jnp.asarray(
        idx.transpose(1, 2, 0).reshape(n_syms * n_fft, batch), jnp.int32
    )
    got = demod_cl_jnp(
        *_cl_views(re, im, hr, hi), cp, mod, 0.05,
        out_mode="count", idx_t=idx_t,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_cl_twin_sum_matches_llr_sum(rng, monkeypatch):
    monkeypatch.setenv("SDR_TPU_MXU_PRECISION", "highest")
    mod, n_fft, cp = Modulation.QAM16, 256, 64
    re, im, hr, hi = _inputs(rng, 8, 4, n_fft + cp, n_fft)
    views = _cl_views(re, im, hr, hi)
    llr = demod_cl_jnp(*views, cp, mod, 0.05)
    s = demod_cl_jnp(*views, cp, mod, 0.05, out_mode="sum")
    np.testing.assert_allclose(
        float(s), float(jnp.sum(llr, dtype=jnp.float32)), rtol=1e-5
    )


def test_supported_cl_shapes():
    assert supported_cl(256, 32768, 64, Modulation.QAM16)
    assert supported_cl(128, 128, 4, Modulation.QPSK)
    assert supported_cl(512, 256, 8, Modulation.QAM64)
    assert supported_cl(1024, 32768, 64, Modulation.QAM16)  # wideband (round 4)
    assert supported_cl(4096, 4096, 8, Modulation.QAM16)
    assert not supported_cl(8192, 4096, 8, Modulation.QAM16)  # VMEM
    assert not supported_cl(64, 32768, 64, Modulation.QAM16)
    assert not supported_cl(256, 100, 64, Modulation.QAM16)  # lanes


def test_vmem_budget_shrinks_blocks():
    from sdr_tpu.kernels.demod_cl_pallas import _block_bytes, _pick_blocks, _VMEM_BUDGET

    # f32 count mode at the headline shape must shrink below the budget
    lb, s_blk = _pick_blocks(256, 64, 32768, 64, "count", Modulation.QAM16, 4)
    assert (
        _block_bytes(256, 64, lb, s_blk, "count", Modulation.QAM16, 4)
        <= _VMEM_BUDGET
    )
    assert 64 % s_blk == 0 and 32768 % lb == 0


@pytest.mark.parametrize("n_fft", [1024, 4096])
def test_cl_twin_wideband_matches_reference(rng, n_fft, monkeypatch):
    """The CL math extends to wideband sizes (3–5 DIF levels): the twin
    reproduces the reference composition's LLRs and exact counts."""
    monkeypatch.setenv("SDR_TPU_MXU_PRECISION", "highest")
    mod, cp = Modulation.QAM16, n_fft // 8
    batch, n_syms = 4, 2
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft)
    ref = demod_chain_jnp(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(hr), jnp.asarray(hi),
        cp, mod, 0.05,
    )
    got = demod_cl_jnp(*_cl_views(re, im, hr, hi), cp, mod, 0.05)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(ref) / scale, atol=3e-5
    )


def test_cl_llr_mode_wideband_supported(rng):
    """Round 4 hard-gated full-LLR output to n_fft ≤ 512; round 5's
    leafwise per-bit-plane writes lifted it (measured 13.4 GS/s bf16 at
    4096sc, docs/PERF.md round 5). The twin covers the wideband llr
    math on CPU; the block picker resolves a valid window."""
    from sdr_tpu.kernels.demod_cl_pallas import _pick_blocks

    lb, sb = _pick_blocks(
        1024, 128, 128, 8, "llr", Modulation.QAM16, 4, 4
    )
    assert lb >= 128 and sb >= 1
    n_fft, cp, batch, n_syms = 1024, 128, 8, 2
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft)
    ref = demod_chain_jnp(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(hr), jnp.asarray(hi),
        cp, Modulation.QAM16, 0.05,
    )
    got = demod_cl_jnp(*_cl_views(re, im, hr, hi), cp, Modulation.QAM16, 0.05)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(ref) / scale, atol=2e-4
    )


def test_llr_multi_symbol_block_matches_single(rng, monkeypatch):
    """Round 5 lifted the llr mode's s_blk=1 restriction: the twin's
    multi-symbol math is symbol-independent by construction, and the
    block picker now assigns s_blk > 1 under the raised budget."""
    from sdr_tpu.kernels.demod_cl_pallas import _pick_blocks

    monkeypatch.delenv("SDR_TPU_CL_LB", raising=False)
    monkeypatch.delenv("SDR_TPU_CL_SBLK", raising=False)
    lb, sb = _pick_blocks(256, 64, 8192, 64, "llr", Modulation.QAM16, 2, 4)
    assert sb > 1
    # bf16 output halves the window → at least as many symbols/block.
    lb2, sb2 = _pick_blocks(256, 64, 8192, 64, "llr", Modulation.QAM16, 2, 2)
    assert sb2 >= sb


def test_llr_kernel_order_and_bf16(rng):
    """kernel_order plane un-permutes to the public layout; bf16 output
    is sign-identical with ~3-digit magnitudes (the decoder-facing
    contract of the halved-write llr mode)."""
    from sdr_tpu.ops.demod import demod_llr_chain_cl

    mod = Modulation.QAM16
    n_fft, cp, batch, n_syms = 128, 32, 128, 4
    bps = mod.bits_per_symbol
    re, im, hr, hi = _inputs(rng, batch, n_syms, n_fft + cp, n_fft)
    views = _cl_views(re, im, hr, hi)
    pub = demod_llr_chain_cl(*views, cp, mod, 0.05)
    kern = demod_llr_chain_cl(*views, cp, mod, 0.05, kernel_order=True)
    unk = (
        np.asarray(kern)
        .reshape(n_syms, bps, n_fft, batch)[:, :, inv_dif_perm(n_fft), :]
        .transpose(3, 0, 2, 1)
        .reshape(batch, n_syms, n_fft * bps)
    )
    np.testing.assert_allclose(unk, np.asarray(pub), rtol=1e-6)

    bf = np.asarray(
        demod_llr_chain_cl(*views, cp, mod, 0.05, out_dtype=jnp.bfloat16)
        .astype(jnp.float32)
    )
    f = np.asarray(pub)
    assert ((bf < 0) != (f < 0)).mean() < 1e-4
    rel = np.abs(bf - f) / (np.abs(f) + 1e-3)
    assert np.median(rel) < 1e-2


def test_llr_bf16_through_ldpc_decoder(rng):
    """bf16 LLR planes decode identically to f32 through the LDPC
    min-sum at operating SNR (the coded-consumer gate for the
    halved-write llr mode)."""
    from sdr_tpu.ops.ldpc import ldpc_decode, ldpc_encode, make_qc_ldpc

    code = make_qc_ldpc(8, 4, 128)
    rng2 = np.random.default_rng(7)
    info = jnp.asarray(
        rng2.integers(0, 2, (16, code.k)).astype(np.int8)
    )
    cw = ldpc_encode(code, info)
    snr = 2.5
    sigma = float(np.sqrt(1.0 / (2 * 10 ** (snr / 10))))
    llr = (1 - 2 * np.asarray(cw, np.float32)) + sigma * rng2.standard_normal(
        (16, code.n)
    ).astype(np.float32)
    llr = llr * 2 / sigma**2
    hard_f32 = np.asarray(ldpc_decode(code, jnp.asarray(llr), iters=12))
    hard_bf16 = np.asarray(
        ldpc_decode(
            code,
            jnp.asarray(llr).astype(jnp.bfloat16).astype(jnp.float32),
            iters=12,
        )
    )
    assert (hard_f32 != hard_bf16).mean() < 1e-3
