"""Polar code tests: transform algebra, construction (including the
interleaved-recursion regression), SC and CA-SCL decoding (each
validated decision-for-decision against an independent numpy
reference), CRC linear algebra, and the coded-link integration."""

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
from sdr_tpu.ops.polar import (
    crc_matrices,
    make_polar_code,
    polar_construct,
    polar_construct_ga,
    polar_decode_sc,
    polar_decode_scl,
    polar_decode_scl_fast,
    polar_encode,
    polar_encode_info,
    polar_encode_payload,
)


def test_encoder_is_natural_order_kronecker_f():
    """x = u·F^{⊗2}: the canonical N=4 generator, row for row."""
    G = np.asarray(polar_encode(jnp.eye(4, dtype=jnp.int8)))
    expect = np.array(
        [[1, 0, 0, 0], [1, 1, 0, 0], [1, 0, 1, 0], [1, 1, 1, 1]], np.int8
    )
    assert np.array_equal(G, expect)


def test_encoder_linearity():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 2, (64,)), jnp.int8)
    b = jnp.asarray(rng.integers(0, 2, (64,)), jnp.int8)
    xa, xb = polar_encode(a), polar_encode(b)
    assert np.array_equal(
        np.asarray(polar_encode(jnp.bitwise_xor(a, b))),
        np.asarray(jnp.bitwise_xor(xa, xb)),
    )


def test_construction_orders_by_reliability():
    info_idx, frozen = polar_construct(256, 128)
    assert len(info_idx) == 128 and int(frozen.sum()) == 128
    # The fully-polarized extremes: channel N-1 (best) is always
    # information, channel 0 (worst) always frozen.
    assert 255 in info_idx and 0 not in info_idx
    # More ones in the index -> more 'good' polarization steps; the
    # all-but-one-ones channels must all be info at rate 1/2.
    for i in (127, 191, 223, 239, 247, 251, 253, 254):
        assert i in info_idx


def test_noiseless_round_trip_exact():
    N, K = 128, 64
    rng = np.random.default_rng(0)
    info = jnp.asarray(rng.integers(0, 2, (8, K)), jnp.int8)
    cw = polar_encode_info(info, N)
    llr = (1.0 - 2.0 * np.asarray(cw, np.float32)) * 5.0
    dec = polar_decode_sc(jnp.asarray(llr), N, K)
    assert np.array_equal(np.asarray(dec), np.asarray(info))


def _sc_reference(llr, frozen):
    """Independent recursive SC (same min-sum f/g), natural order
    x = (p ⊕ q, q). Returns the full u vector."""

    def rec(L, fr):
        n = len(L)
        if n == 1:
            u = 0 if fr[0] else int(L[0] < 0)
            return np.array([u]), np.array([u])
        a, b = L[: n // 2], L[n // 2 :]
        Lf = np.sign(a) * np.sign(b) * np.minimum(np.abs(a), np.abs(b))
        u1, p = rec(Lf, fr[: n // 2])
        u2, q = rec(b + (1 - 2 * p) * a, fr[n // 2 :])
        return np.concatenate([u1, u2]), np.concatenate([p ^ q, q])

    return rec(np.asarray(llr, np.float64), frozen)[0]


@pytest.mark.parametrize("N,K", [(64, 32), (128, 96)])
def test_sc_scan_matches_recursive_reference(N, K):
    """The lax.scan decoder's DECISIONS equal the recursive oracle's on
    noisy inputs — a much stronger statement than BER agreement."""
    info_idx, frozen = polar_construct(N, K)
    rng = np.random.default_rng(7)
    for _ in range(20):
        info = rng.integers(0, 2, (K,)).astype(np.int8)
        cw = np.asarray(polar_encode_info(jnp.asarray(info[None]), N))[0]
        y = (1.0 - 2.0 * cw.astype(np.float32)) + rng.normal(0, 0.9, (N,))
        llr = 2.0 * y / 0.81
        mine = np.asarray(
            polar_decode_sc(jnp.asarray(llr[None], jnp.float32), N, K)
        )[0]
        ref = _sc_reference(llr, frozen)[info_idx]
        assert np.array_equal(mine, ref)


def test_polar_coded_link_beats_uncoded():
    """(256, 128 incl. CRC-11) CA-SCL-8 over the QPSK/AWGN link:
    orders of magnitude under the uncoded BER at 4 dB (where uncoded
    QPSK reads ~1.25e-2). GA predicts effectively error-free here;
    measured zero errors in 29952 bits — the 2e-3 assert leaves slack
    for noise-realization variance only."""
    from sdr_tpu.link.coded import make_polar_fn

    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(128, 16),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=4.0),
        n_symbols=32,
        n_channels=8,
    )
    errors, counted = make_polar_fn(cfg, rate="1/2")(jax.random.PRNGKey(0))
    e, t = int(np.sum(np.asarray(errors))), int(np.sum(np.asarray(counted)))
    # counted = PAYLOAD bits: 128 info positions minus the 11 CRC bits.
    assert t == 8 * 32 * (128 * 2 // 256) * (128 - 11)
    assert e / t < 2e-3  # uncoded theory is 1.25e-2 at this Eb/N0


@pytest.mark.parametrize("rate", ["2/3", "3/4"])
def test_polar_rates_run_and_decode(rate):
    from sdr_tpu.link.coded import make_polar_fn

    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(128, 16),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=7.0),
        n_symbols=16,
        n_channels=4,
    )
    errors, counted = make_polar_fn(cfg, rate=rate)(jax.random.PRNGKey(1))
    e, t = int(np.sum(np.asarray(errors))), int(np.sum(np.asarray(counted)))
    assert t > 0
    assert e / t < 2e-3


def test_polar_composes_with_fading_and_pilots():
    """The LLR chain feeding SC is the same one Viterbi/min-sum consume:
    multipath + MMSE + estimated CSI decodes cleanly at high SNR."""
    from sdr_tpu.link.coded import make_polar_fn

    cfg = LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(128, 16),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH, ebno_db=16.0, pdp=(1.0, 0.4)
        ),
        equalizer=Equalizer.MMSE,
        pilot_spacing=8,
        n_symbols=16,
        n_channels=8,
    )
    errors, counted = make_polar_fn(cfg, rate="1/2")(jax.random.PRNGKey(2))
    e, t = int(np.sum(np.asarray(errors))), int(np.sum(np.asarray(counted)))
    assert e / t < 5e-3


def test_polar_guards():
    with pytest.raises(ValueError, match="power of 2"):
        polar_encode(jnp.zeros((6,), jnp.int8))
    with pytest.raises(ValueError, match="k must be"):
        polar_construct(64, 0)
    with pytest.raises(ValueError, match="last axis"):
        polar_decode_sc(jnp.zeros((32,), jnp.float32), 64, 32)
    with pytest.raises(ValueError, match="payload"):
        make_polar_code(64, 8, crc="crc11")
    with pytest.raises(ValueError, match="list_size"):
        polar_decode_scl(
            jnp.zeros((64,), jnp.float32), make_polar_code(64, 32), 0
        )


# ---------------------------------------------------------------------------
# Construction order: the interleaved recursion regression.


def test_construction_is_interleaved_classic_8_4():
    """The classic (8,4) polar code freezes {0,1,2,4}: the recursion
    must interleave (W_{2N}^{(2j)} = worse, W_{2N}^{(2j+1)} = better).
    The concatenated order — the natural-looking bug — yields
    {1,3,5,7} instead, validated wrong by genie-aided per-position
    error measurement (several dB of loss at N >= 512)."""
    for idx in (
        polar_construct(8, 4)[0],
        polar_construct_ga(8, 4)[0],
    ):
        assert set(int(i) for i in idx) == {3, 5, 6, 7}


def test_ga_matches_genie_error_order():
    """GA-predicted per-position reliabilities at N=16 must rank the
    positions in the same order as exact Bhattacharyya-on-BEC — both
    now use the interleaved recursion, and the fully-polarized ends
    must agree exactly."""
    ga_idx, _ = polar_construct_ga(16, 8)
    bh_idx, _ = polar_construct(16, 8)
    # At N=16 rate 1/2 the two heuristics agree on the whole set.
    assert set(map(int, ga_idx)) == set(map(int, bh_idx))


# ---------------------------------------------------------------------------
# CRC linear algebra.


def test_crc_matrices_match_lfsr():
    """crc = payload @ gen must equal a direct bit-serial LFSR run,
    and appending it must zero the checker syndrome."""
    gen, chk = crc_matrices(40, "crc11")
    taps = np.array(
        [(0x621 >> (11 - 1 - j)) & 1 for j in range(11)], np.int8
    )
    rng = np.random.default_rng(3)
    for _ in range(5):
        p = rng.integers(0, 2, (40,)).astype(np.int8)
        reg = np.zeros(11, np.int8)
        for b in p:
            fb = reg[0] ^ b
            reg = np.concatenate([reg[1:], np.zeros(1, np.int8)])
            if fb:
                reg ^= taps
        assert np.array_equal((p @ gen) % 2, reg)
        assert not ((np.concatenate([p, reg]) @ chk) % 2).any()


def test_crc_detects_flips():
    gen, chk = crc_matrices(40, "crc11")
    rng = np.random.default_rng(4)
    p = rng.integers(0, 2, (40,)).astype(np.int8)
    word = np.concatenate([p, (p @ gen) % 2])
    for pos in (0, 17, 50):
        bad = word.copy()
        bad[pos] ^= 1
        assert ((bad @ chk) % 2).any()


# ---------------------------------------------------------------------------
# SCL decoder.


def test_scl_list1_equals_sc():
    """SCL at list_size=1 with no CRC IS SC — decision for decision on
    noisy inputs (same construction)."""
    N, K = 128, 64
    code = make_polar_code(N, K, crc=None, construction="bhattacharyya")
    rng = np.random.default_rng(12)
    info = rng.integers(0, 2, (16, K)).astype(np.int8)
    cw = np.asarray(polar_encode_info(jnp.asarray(info), N))
    y = (1.0 - 2.0 * cw.astype(np.float64)) + rng.normal(0, 0.8, cw.shape)
    llr = jnp.asarray(2.0 * y / 0.64, jnp.float32)
    assert np.array_equal(
        np.asarray(polar_decode_sc(llr, N, K)),
        np.asarray(polar_decode_scl(llr, code, list_size=1)),
    )


def test_scl_noiseless_round_trip_with_crc():
    code = make_polar_code(128, 64, crc="crc11")
    rng = np.random.default_rng(0)
    pay = jnp.asarray(
        rng.integers(0, 2, (8, code.payload_len)), jnp.int8
    )
    cw = polar_encode_payload(pay, code)
    llr = (1.0 - 2.0 * np.asarray(cw, np.float32)) * 5.0
    dec = polar_decode_scl(jnp.asarray(llr), code, list_size=4)
    assert np.array_equal(np.asarray(dec), np.asarray(pay))


def _scl_reference(llr, code, list_size):
    """Independent numpy CA-SCL: paths as explicit (u-prefix, metric)
    tuples, each bit's leaf LLR recomputed FROM SCRATCH by the
    recursive formula (no shared planes, no incremental state — a
    completely different organization from the lax.scan decoder)."""

    def leaf_llr(L, decided):
        n = len(L)
        if n == 1:
            return L[0]
        half = n // 2
        a, b = L[:half], L[half:]
        if len(decided) < half:
            f = np.sign(a) * np.sign(b) * np.minimum(np.abs(a), np.abs(b))
            return leaf_llr(f, decided)
        left = decided[:half]
        # re-encode the left half to its partial sums
        if half == 1:
            s = left.astype(np.float64)
        else:
            s = np.asarray(
                polar_encode(jnp.asarray(left[None], jnp.int8))
            )[0]
        return leaf_llr(b + (1.0 - 2.0 * s) * a, decided[half:])

    N = code.block_len
    frozen = code.frozen
    paths = [(np.zeros(0, np.int8), 0.0)]
    for i in range(N):
        cands = []
        for u, pm in paths:
            l_i = leaf_llr(np.asarray(llr, np.float64), u)
            pen0, pen1 = max(-l_i, 0.0), max(l_i, 0.0)
            if frozen[i]:
                cands.append((np.append(u, 0), pm + pen0))
            else:
                cands.append((np.append(u, 0), pm + pen0))
                cands.append((np.append(u, 1), pm + pen1))
        cands.sort(key=lambda t: t[1])
        paths = cands[:list_size]
    # CRC-aided selection
    _, chk = crc_matrices(code.payload_len, code.crc)
    best = None
    for u, pm in paths:
        info = u[code.info_idx]
        ok = not ((info @ chk) % 2).any()
        key = (not ok, pm)
        if best is None or key < best[0]:
            best = (key, info[: code.payload_len])
    return best[1]


def test_scl_matches_independent_reference():
    """The lax.scan list decoder's PAYLOAD equals an independent numpy
    CA-SCL's (recompute-from-scratch organization) on noisy inputs —
    decision for decision."""
    code = make_polar_code(64, 32, crc="crc11")
    rng = np.random.default_rng(21)
    for trial in range(10):
        pay = rng.integers(0, 2, (code.payload_len,)).astype(np.int8)
        cw = np.asarray(
            polar_encode_payload(jnp.asarray(pay[None], jnp.int8), code)
        )[0]
        y = (1.0 - 2.0 * cw.astype(np.float64)) + rng.normal(0, 0.7, (64,))
        llr = 2.0 * y / 0.49
        mine = np.asarray(
            polar_decode_scl(
                jnp.asarray(llr[None], jnp.float32), code, list_size=4
            )
        )[0]
        ref = _scl_reference(llr.astype(np.float32), code, 4)
        assert np.array_equal(mine, ref), f"trial {trial}"


def test_scl_beats_sc_at_low_snr():
    """CA-SCL-8 + GA must decode clean where plain SC + Bhattacharyya
    measurably errs: (256,128) at channel-bit Eb/N0 = 4 dB (round-2
    measured SC at ~7e-3 BER here)."""
    N, K = 256, 128
    rng = np.random.default_rng(33)
    sigma2 = 1.0 / (2.0 * 10 ** 0.4)
    code = make_polar_code(N, K, crc="crc11")
    pay = rng.integers(0, 2, (64, code.payload_len)).astype(np.int8)
    cw = np.asarray(polar_encode_payload(jnp.asarray(pay), code))
    y = (1 - 2 * cw.astype(np.float64)) + rng.normal(
        0, np.sqrt(sigma2), cw.shape
    )
    llr = jnp.asarray(2 * y / sigma2, jnp.float32)
    dec = np.asarray(polar_decode_scl(llr, code, list_size=8))
    assert (dec != pay).mean() < 1e-3


@pytest.mark.parametrize(
    "N,K,L,crc",
    [
        (64, 32, 8, "crc11"),
        (256, 128, 8, "crc11"),
        (256, 128, 1, "crc11"),
        (128, 96, 4, None),
        (256, 64, 2, None),
        (1024, 512, 8, "crc11"),
    ],
)
def test_fast_sscl_decision_parity(N, K, L, crc):
    """The fast-SSCL tree decoder (round 4) is decision-identical to
    the bit-serial scan decoder: rate-0 penalties are the exact
    parallel-descent metric, rate-1 forks follow the Hashemi τ = L−1
    sorted-fork theorem, and the one-hot survivor selection composes
    exactly — on noisy LLRs across sizes, lists, and CRC modes
    (N = 1024 covers 5G-control scale at depth)."""
    code = make_polar_code(N, K, crc=crc)
    rng = np.random.default_rng(N + K + L)
    pay = rng.integers(0, 2, (16, code.payload_len)).astype(np.int8)
    cw = np.asarray(polar_encode_payload(jnp.asarray(pay), code))
    sigma2 = 1.0 / (2.0 * code.rate * 10 ** 0.2)
    y = (1 - 2 * cw.astype(np.float64)) + rng.normal(
        0, np.sqrt(sigma2), cw.shape
    )
    llr = jnp.asarray(2 * y / sigma2, jnp.float32)
    ref = np.asarray(polar_decode_scl(llr, code, list_size=L))
    got = np.asarray(polar_decode_scl_fast(llr, code, list_size=L))
    np.testing.assert_array_equal(got, ref)


def test_fast_sscl_rate0_penalty_matches_bitwise():
    """_rate0_penalty equals the bit-serial metric of an all-frozen
    subtree: decode a code with a large frozen prefix both ways and
    compare final metrics indirectly via decisions on many trials."""
    from sdr_tpu.ops.polar import _rate0_penalty, _f_minsum

    rng = np.random.default_rng(5)
    # Direct check on the identity: leaf LLRs of the zero-path subtree.
    for W in (2, 4, 8, 16):
        alpha = jnp.asarray(rng.standard_normal((3, W)), jnp.float32)
        # bitwise reference: recursive descent with all-zero decisions
        def leaves(a):
            if a.shape[-1] == 1:
                return [a[..., 0]]
            w = a.shape[-1] // 2
            f = _f_minsum(a[..., :w], a[..., w:])
            g = a[..., :w] + a[..., w:]
            return leaves(f) + leaves(g)
        ref = sum(
            np.maximum(-np.asarray(x), 0.0) for x in leaves(alpha)
        )
        got = np.asarray(_rate0_penalty(alpha))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fast_sscl_noiseless_round_trip():
    code = make_polar_code(256, 139, crc="crc11")
    rng = np.random.default_rng(9)
    pay = jnp.asarray(rng.integers(0, 2, (8, code.payload_len)), jnp.int8)
    cw = polar_encode_payload(pay, code)
    llr = jnp.asarray(10.0 * (1 - 2 * np.asarray(cw, np.float32)))
    dec = polar_decode_scl_fast(llr, code, list_size=8)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(pay))
