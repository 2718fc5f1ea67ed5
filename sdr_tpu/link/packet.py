"""Packet PHY: bytes → waveform → blind receiver → bytes + CRC.

The reference's headline use-case is a byte loopback
(QFDemoWindow.cpp:201-224: bytes → to_constl → ofdm::tx → ofdm::rx →
from_constl → bytes) over a perfect wire. This module is that loop as a
deployable packet modem: a CRC-32-framed, convolutionally-coded,
interleaved, pilot-bearing OFDM burst with a Schmidl & Cox acquisition
preamble, received BLIND — unknown timing, carrier offset, and fading —
through the framework's full receiver (ops.sync acquisition → comb-pilot
estimation → MMSE → max-log LLRs → depuncture → soft Viterbi → CRC).

Everything is shape-static for one ``PacketConfig`` (payload length,
code rate, numerology fixed at trace time), so encode and decode are
single jitted XLA programs; packets batch with ``vmap`` and shard like
any other link. The CRC runs as a 32-bit LFSR under ``lax.scan`` —
compile-time-bounded, no dynamic control flow.

Burst layout (time domain):
    [S&C preamble: 2 OFDM symbols] [n_symbols coded+pilot payload]

Byte/bit conventions match ops.modulation (MSB-first — the reference's
packing, modulation.hpp:87-91); CRC-32 is the non-reflected
0x04C11DB7 / init 0xFFFFFFFF / final-xor 0xFFFFFFFF variant
(CRC-32/MPEG-2 with the final xor added), computed over the payload
bits in transmission order.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from sdr_tpu.core import prng
from sdr_tpu.core.config import (
    ChannelConfig,
    ChannelModel,
    Equalizer,
    LinkConfig,
    Modulation,
    OFDMConfig,
)
from sdr_tpu.link.pipeline import rx_chain, tx_chain
from sdr_tpu.ops import channel as chan
from sdr_tpu.ops.fec import (
    DEFAULT_K,
    DEFAULT_POLYS,
    conv_encode,
    depuncture,
    puncture,
    punctured_len,
    viterbi_decode,
)
from sdr_tpu.ops.interleave import deinterleave, interleave
from sdr_tpu.ops.modulation import bits_to_bytes, bytes_to_bits

_CRC_POLY = 0x04C11DB7
_CRC_BITS = 32


def crc32_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """CRC-32 over a bit vector (int8 0/1, MSB-first order).

    Bit-serial LFSR under lax.scan: state <<1, tap when the shifted-out
    bit xor the input bit is 1. Returns (32,) int8 checksum bits,
    MSB first. Static length → one compiled loop, no retracing.
    """
    poly = jnp.uint32(_CRC_POLY)

    def step(state, b):
        msb = (state >> jnp.uint32(31)) & jnp.uint32(1)
        fb = msb ^ b.astype(jnp.uint32)
        state = (state << jnp.uint32(1)) ^ jnp.where(
            fb == 1, poly, jnp.uint32(0)
        )
        return state, None

    state, _ = jax.lax.scan(step, jnp.uint32(0xFFFFFFFF), bits)
    state = state ^ jnp.uint32(0xFFFFFFFF)
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    return ((state >> shifts) & jnp.uint32(1)).astype(jnp.int8)


@dataclasses.dataclass(frozen=True)
class PacketConfig:
    """Static packet-modem parameters (hashable; jit-static)."""

    payload_bytes: int = 64
    modulation: Modulation = Modulation.QPSK
    ofdm: OFDMConfig = OFDMConfig(n_fft=64, cp_len=16)
    rate: str = "1/2"  # FEC rate: "1/2", "2/3", "3/4"
    pilot_spacing: int = 8
    #: FEC family: "conv" (K=7 + Viterbi), "ldpc" (QC min-sum; note
    #: the 3072-bit codeword — bursts quantize up to it), or "polar"
    #: (CA-SCL-8 over (256, k) codewords). The packet CRC-32 arbitrates
    #: either way; info bits beyond the payload+CRC pad the last
    #: codeword with zeros the receiver strips.
    fec: str = "conv"

    def __post_init__(self) -> None:
        if self.payload_bytes < 1:
            raise ValueError("payload_bytes must be >= 1")
        if self.rate not in ("1/2", "2/3", "3/4"):
            raise ValueError(f"rate must be 1/2, 2/3 or 3/4, got {self.rate!r}")
        if self.fec not in ("conv", "ldpc", "polar"):
            raise ValueError(
                f"fec must be 'conv', 'ldpc' or 'polar', got {self.fec!r}"
            )
        if self.pilot_spacing < 2:
            # The blind receiver estimates the channel from the comb;
            # without pilots decode_packet would silently run
            # unequalized (rx_chain's h_freq is None here).
            raise ValueError(
                "the packet receiver needs comb pilots: pilot_spacing "
                f">= 2 required, got {self.pilot_spacing}"
            )

    @property
    def n_info_bits(self) -> int:
        return 8 * self.payload_bytes + _CRC_BITS

    def _block_code(self):
        """The LDPC/polar code object for block-FEC packets."""
        from sdr_tpu.link.coded import ldpc_code_for, polar_code_for

        if self.fec == "ldpc":
            return ldpc_code_for(self.rate)
        return polar_code_for(self.rate, 256)

    @property
    def _n_codewords(self) -> int:
        code = self._block_code()
        k = code.k if self.fec == "ldpc" else code.payload_len
        return -(-self.n_info_bits // k)  # ceil

    @property
    def n_coded_bits(self) -> int:
        if self.fec == "conv":
            return punctured_len(
                self.n_info_bits, self.rate, DEFAULT_POLYS, DEFAULT_K
            )
        code = self._block_code()
        n = code.n if self.fec == "ldpc" else code.block_len
        return self._n_codewords * n

    def _link_cfg(self, ebno_db: float = 10.0) -> LinkConfig:
        """Internal LinkConfig carrying the numerology/pilot settings
        for tx_chain/rx_chain (channel model unused by those stages)."""
        probe = LinkConfig(
            modulation=self.modulation,
            ofdm=self.ofdm,
            channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=ebno_db),
            equalizer=Equalizer.MMSE,
            n_symbols=2,  # placeholder; replaced below
            n_channels=1,
            pilot_spacing=self.pilot_spacing,
        )
        n_sym = max(
            2, math.ceil(self.n_coded_bits / probe.bits_per_ofdm_symbol)
        )
        return dataclasses.replace(probe, n_symbols=n_sym)

    @property
    def n_symbols(self) -> int:
        return self._link_cfg().n_symbols

    @property
    def frame_bits(self) -> int:
        cfg = self._link_cfg()
        return cfg.n_symbols * cfg.bits_per_ofdm_symbol

    @property
    def burst_len(self) -> int:
        """Time samples in one burst (S&C preamble + payload symbols)."""
        return (2 + self.n_symbols) * self.ofdm.symbol_len


def _fec_encode(pcfg: PacketConfig, info: jnp.ndarray) -> jnp.ndarray:
    """info bits (n_info_bits,) → coded bits (n_coded_bits,).

    Block families segment into codewords, zero-padding the last
    (known bits the receiver strips — a small rate concession for a
    family-agnostic framing layer)."""
    if pcfg.fec == "conv":
        return puncture(conv_encode(info, DEFAULT_POLYS, DEFAULT_K),
                        pcfg.rate)
    code = pcfg._block_code()
    n_cw = pcfg._n_codewords
    if pcfg.fec == "ldpc":
        from sdr_tpu.ops.ldpc import ldpc_encode

        k = code.k
        padded = jnp.zeros((n_cw * k,), jnp.int8).at[: info.shape[0]].set(info)
        return ldpc_encode(code, padded.reshape(n_cw, k)).reshape(-1)
    from sdr_tpu.ops.polar import polar_encode_payload

    k = code.payload_len
    padded = jnp.zeros((n_cw * k,), jnp.int8).at[: info.shape[0]].set(info)
    return polar_encode_payload(padded.reshape(n_cw, k), code).reshape(-1)


def _fec_decode(pcfg: PacketConfig, llr_sent: jnp.ndarray) -> jnp.ndarray:
    """Coded-bit LLRs (n_coded_bits,) → decoded info (n_info_bits,)."""
    if pcfg.fec == "conv":
        llr_cw = depuncture(
            llr_sent, pcfg.rate, pcfg.n_info_bits + DEFAULT_K - 1
        )
        return viterbi_decode(
            llr_cw, pcfg.n_info_bits, DEFAULT_POLYS, DEFAULT_K
        )
    code = pcfg._block_code()
    n_cw = pcfg._n_codewords
    if pcfg.fec == "ldpc":
        from sdr_tpu.ops.ldpc import ldpc_decode

        dec = ldpc_decode(code, llr_sent.reshape(n_cw, code.n))
        return dec[:, : code.k].reshape(-1)[: pcfg.n_info_bits]
    from sdr_tpu.ops.polar import polar_decode_scl

    dec = polar_decode_scl(
        llr_sent.reshape(n_cw, code.block_len), code, list_size=8
    )
    return dec.reshape(-1)[: pcfg.n_info_bits]


def encode_packet(pcfg: PacketConfig, payload: jnp.ndarray) -> jnp.ndarray:
    """payload uint8 (payload_bytes,) → burst complex64 (burst_len,).

    CRC-append → FEC encode (conv/LDPC/polar per pcfg.fec) →
    whole-frame interleave → pilot-bearing OFDM symbols → S&C preamble
    prepended.
    """
    from sdr_tpu.ops.sync import acquisition_preamble

    cfg = pcfg._link_cfg()
    bits = bytes_to_bits(payload.astype(jnp.uint8))
    info = jnp.concatenate([bits, crc32_bits(bits)])
    cw = _fec_encode(pcfg, info)
    frame_bits = pcfg.frame_bits
    frame = interleave(
        jnp.zeros((frame_bits,), jnp.int8).at[: cw.shape[0]].set(cw)
    )
    body = tx_chain(
        cfg, frame.reshape(cfg.n_symbols, cfg.bits_per_ofdm_symbol)
    ).reshape(-1)
    pre = acquisition_preamble(pcfg.ofdm.n_fft, pcfg.ofdm.cp_len)
    return jnp.concatenate([pre, body])


def _decode_aligned(pcfg: PacketConfig, payload_t: jnp.ndarray, noise_var):
    """Aligned payload symbols (n_symbols, sym_len) → (bytes, crc_ok)."""
    cfg = pcfg._link_cfg()
    # track_phase: the burst was blind-acquired, so a residual CFO
    # rotates it a little more each symbol — the tracked comb
    # estimator follows it (load-bearing for long bursts: LDPC's
    # 28-symbol frames accumulate ±1.9 rad that frame averaging
    # cannot absorb).
    llrs, _ = rx_chain(cfg, payload_t, None, noise_var, track_phase=True)
    frame_bits = pcfg.frame_bits
    llr_sent = deinterleave(llrs.reshape(-1)[:frame_bits])[: pcfg.n_coded_bits]
    decoded = _fec_decode(pcfg, llr_sent)
    bits, crc_rx = decoded[: 8 * pcfg.payload_bytes], decoded[8 * pcfg.payload_bytes:]
    crc_ok = jnp.all(crc32_bits(bits) == crc_rx)
    return bits_to_bytes(bits), crc_ok


def decode_packet(
    pcfg: PacketConfig, stream: jnp.ndarray, noise_var
):
    """Blind receive: stream (>= burst_len + slack samples) →
    (payload uint8 (payload_bytes,), crc_ok bool).

    The stream may start anywhere before the burst (unknown delay) and
    carry CFO/fading — ops.sync.acquire recovers timing and carrier,
    the comb pilots recover the channel. ``noise_var`` is the
    per-subcarrier noise power the LLRs are scaled by (an estimate is
    fine; Viterbi is scale-invariant, the CRC arbitrates).
    """
    from sdr_tpu.ops.sync import acquire

    cfg = pcfg._link_cfg()
    sym_len = pcfg.ofdm.symbol_len
    start, _cfo_hat, rx_c = acquire(stream, pcfg.ofdm.n_fft, pcfg.ofdm.cp_len)
    payload_t = jax.lax.dynamic_slice_in_dim(
        rx_c, start, cfg.n_symbols * sym_len
    ).reshape(cfg.n_symbols, sym_len)
    return _decode_aligned(pcfg, payload_t, noise_var)


def receive_stream(
    pcfg: PacketConfig, stream: jnp.ndarray, noise_var, max_bursts: int
):
    """Continuous receiver: find and decode up to ``max_bursts`` bursts
    anywhere in one capture (each with its own delay and CFO).

    Successive cancellation on the DETECTION metric: per round, run the
    full blind acquisition (the S&C plateau finds the strongest
    remaining preamble), decode that burst, then zero its samples out
    of the working stream so the next round locks to the next-strongest
    burst. ``max_bursts`` is static, so the whole receiver is one
    ``lax.scan`` — no data-dependent control flow; rounds that land on
    noise after the real bursts are exhausted decode garbage that the
    CRC rejects (that is the stop condition, reported per burst rather
    than branched on).

    Returns (payloads (max_bursts, payload_bytes) uint8,
    crc_ok (max_bursts,) bool, starts (max_bursts,) int32 — burst-start
    sample indices, valid where crc_ok).
    """
    from sdr_tpu.ops.sync import acquire

    cfg = pcfg._link_cfg()
    n_fft, cp = pcfg.ofdm.n_fft, pcfg.ofdm.cp_len
    sym_len = pcfg.ofdm.symbol_len
    n_payload = cfg.n_symbols * sym_len
    idx = jnp.arange(stream.shape[0])

    def round_(work, _):
        start, _cfo, rx_c = acquire(work, n_fft, cp)
        payload_t = jax.lax.dynamic_slice_in_dim(
            rx_c, start, n_payload
        ).reshape(cfg.n_symbols, sym_len)
        payload, ok = _decode_aligned(pcfg, payload_t, noise_var)
        # Cancel the whole burst (preamble + payload) from the WORKING
        # stream — uncorrected, so the masking is index-only and the
        # next round re-estimates its own CFO from scratch.
        b0 = start - 2 * sym_len
        b1 = start + n_payload
        work = jnp.where((idx >= b0) & (idx < b1), 0.0 + 0.0j, work)
        return work, (payload, ok, b0.astype(jnp.int32))

    _, (payloads, oks, starts) = jax.lax.scan(
        round_, stream.astype(jnp.complex64), None, length=max_bursts
    )
    return payloads, oks, starts


def make_packet_codec(pcfg: PacketConfig):
    """(jitted encode, jitted decode) for one static packet shape."""
    enc = jax.jit(functools.partial(encode_packet, pcfg))
    dec = jax.jit(functools.partial(decode_packet, pcfg))
    return enc, dec


def transmit_over_channel(
    pcfg: PacketConfig,
    ch: ChannelConfig,
    key: jax.Array,
    burst: jnp.ndarray,
):
    """Impair one burst: unknown delay (ch.timing_offset), fading,
    CFO, AWGN — the over-the-air leg of ``simulate_packets``. Returns
    (stream, noise_var) sized for decode_packet's slice margins."""
    from sdr_tpu.ops.sync import apply_cfo

    n_fft = pcfg.ofdm.n_fft
    nv = chan.ebno_db_to_noise_var(
        ch.ebno_db, pcfg.modulation.bits_per_symbol
    )
    stream = jnp.concatenate(
        [
            jnp.zeros((ch.timing_offset,), jnp.complex64),
            burst,
            jnp.zeros((pcfg.ofdm.symbol_len,), jnp.complex64),
        ]
    )
    k_noise = prng.role_key(key, prng.ROLE_NOISE)
    k_fade = prng.role_key(key, prng.ROLE_FADING)
    if ch.model == ChannelModel.MULTIPATH:
        stream = chan.apply_multipath(
            stream, chan.multipath_taps(k_fade, ch.pdp)
        )
    elif ch.model == ChannelModel.MULTIPATH_TIME:
        # Per-tap-Jakes TDL over the burst's symbol grid (block fading
        # per symbol, previous symbol's tail as FIR history — the
        # pipeline acquired-path convention). The receiver's tracked
        # comb estimator follows the common phase per symbol; per-tone
        # relative evolution across a SHORT burst is what bounds PER.
        sym_len = pcfg.ofdm.symbol_len
        off = ch.timing_offset
        n_syms_b = burst.shape[0] // sym_len
        taps_t = chan.multipath_time_taps(
            k_fade, ch.pdp, n_syms_b, ch.doppler_norm
        )
        L = taps_t.shape[-1]
        grid = stream[off : off + n_syms_b * sym_len].reshape(-1, sym_len)
        faded = chan.apply_multipath(
            grid, taps_t, history=chan.symbol_history(grid, L)
        )
        tail = stream[off + n_syms_b * sym_len :]
        tail_faded = chan.apply_multipath(
            tail, taps_t[-1],
            history=grid[-1, -(L - 1):] if L > 1 else None,
        )
        stream = jnp.concatenate(
            [stream[:off], faded.reshape(-1), tail_faded]
        )
    elif ch.model == ChannelModel.RAYLEIGH_FLAT:
        stream = stream * chan.rayleigh_flat(k_fade, ())
    elif ch.model == ChannelModel.RICIAN:
        stream = stream * chan.rician_flat(k_fade, (), ch.k_factor)
    stream = apply_cfo(stream, ch.cfo_subcarriers, n_fft)
    if ch.model != ChannelModel.IDENTITY:
        stream = chan.awgn(k_noise, stream, chan.time_noise_var(nv, n_fft))
    return stream, nv


def simulate_packets(
    pcfg: PacketConfig, ch: ChannelConfig, key: jax.Array, n_packets: int
):
    """End-to-end packet campaign: random payloads, blind receive.

    Returns (byte_errors (n_packets,), crc_ok (n_packets,)) — the
    packet error rate is mean(byte_errors > 0); CRC false-accepts
    would show as crc_ok & byte_errors > 0 (probability ~2^-32).
    One jitted vmap over packets.
    """

    def one(k):
        payload = jax.random.randint(
            prng.role_key(k, prng.ROLE_PAYLOAD),
            (pcfg.payload_bytes,), 0, 256, jnp.int32,
        ).astype(jnp.uint8)
        burst = encode_packet(pcfg, payload)
        stream, nv = transmit_over_channel(pcfg, ch, k, burst)
        rx_payload, crc_ok = decode_packet(pcfg, stream, nv)
        return jnp.sum((rx_payload != payload).astype(jnp.int32)), crc_ok

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(n_packets)
    )
    return jax.jit(jax.vmap(one))(keys)
