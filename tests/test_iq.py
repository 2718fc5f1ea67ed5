"""Native IQ capture/replay (native/iq_file.cpp via sdr_tpu.native.iq).

Validation: SC16 round trips within the quantization quantum, the
threaded prefetch reader streams frames in order (loop and EOF
semantics), and the full replay path — packet bursts recorded to an
SC16 file and decoded back through the blind receiver — round-trips
every payload byte.
"""

import numpy as np
import pytest

from sdr_tpu.native.host import available

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable"
)


def _tone(n, f=0.01, amp=0.7):
    t = np.arange(n)
    return (amp * np.exp(2j * np.pi * f * t)).astype(np.complex64)


def test_iq_roundtrip_quantization_bound(tmp_path):
    from sdr_tpu.native.iq import DEFAULT_SCALE, iq_info, read_iq, write_iq

    path = str(tmp_path / "a.sc16")
    x = _tone(4096)
    assert write_iq(path, x) == 4096
    assert iq_info(path) == 4096
    y = read_iq(path)
    assert y.shape == x.shape
    # int16 quantization: |err| <= 0.5 LSB per component.
    lsb = 1.0 / DEFAULT_SCALE
    assert np.max(np.abs(y.real - x.real)) <= 0.5 * lsb + 1e-7
    assert np.max(np.abs(y.imag - x.imag)) <= 0.5 * lsb + 1e-7


def test_iq_write_saturates(tmp_path):
    from sdr_tpu.native.iq import read_iq, write_iq

    path = str(tmp_path / "sat.sc16")
    x = np.asarray([100.0 + 0j, -100.0 + 0j], np.complex64)
    write_iq(path, x, scale=8192.0)
    y = read_iq(path, scale=8192.0)
    np.testing.assert_allclose(y.real, [32767 / 8192.0, -32768 / 8192.0])


def test_iq_partial_read(tmp_path):
    from sdr_tpu.native.iq import read_iq, write_iq

    path = str(tmp_path / "b.sc16")
    x = _tone(1000)
    write_iq(path, x)
    y = read_iq(path, offset=100, count=50)
    np.testing.assert_allclose(np.abs(y - x[100:150]), 0, atol=2e-4)


def test_iq_reader_streams_in_order(tmp_path):
    from sdr_tpu.native.iq import IQReader, write_iq

    path = str(tmp_path / "c.sc16")
    n_frames, frame = 7, 256
    x = _tone(n_frames * frame + 13)  # ragged tail must be dropped
    write_iq(path, x)
    got = []
    with IQReader(path, frame=frame) as r:
        for fr in r:
            got.append(fr)
    assert len(got) == n_frames
    for i, fr in enumerate(got):
        np.testing.assert_allclose(
            np.abs(fr - x[i * frame:(i + 1) * frame]), 0, atol=2e-4
        )


def test_iq_reader_loop_wraps(tmp_path):
    from sdr_tpu.native.iq import IQReader, write_iq

    path = str(tmp_path / "d.sc16")
    frame = 128
    x = _tone(2 * frame)
    write_iq(path, x)
    with IQReader(path, frame=frame, loop=True) as r:
        frames = [r.next_real() for _ in range(5)]  # > file length
    assert all(f is not None for f in frames)
    re0, im0 = frames[0]
    re4, im4 = frames[4]  # frame 4 wraps back to file frame 0
    np.testing.assert_allclose(re4, re0, atol=1e-7)
    np.testing.assert_allclose(im4, im0, atol=1e-7)


def test_packet_replay_from_iq_file(tmp_path):
    """Record impaired packet bursts to SC16, stream them back through
    the native reader, decode blind: every payload byte round-trips
    (the int16 quantization noise is ~55 dB under the channel noise)."""
    import jax
    import jax.numpy as jnp

    from sdr_tpu.core.config import (
        ChannelConfig,
        ChannelModel,
        Modulation,
        OFDMConfig,
    )
    from sdr_tpu.link.packet import (
        PacketConfig,
        decode_packet,
        encode_packet,
        transmit_over_channel,
    )
    from sdr_tpu.native.iq import IQReader, write_iq

    pcfg = PacketConfig(
        payload_bytes=24,
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(n_fft=64, cp_len=16),
        rate="1/2",
    )
    ch = ChannelConfig(
        model=ChannelModel.MULTIPATH, ebno_db=18.0, pdp=(1.0, 0.5),
        cfo_subcarriers=0.7, timing_offset=37,
    )
    key = jax.random.PRNGKey(7)
    n_pkt = 4
    payloads, streams = [], []
    nv = None
    for i in range(n_pkt):
        k = jax.random.fold_in(key, i)
        payload = np.asarray(
            jax.random.randint(k, (pcfg.payload_bytes,), 0, 256, jnp.int32),
            np.int32,
        ).astype(np.uint8)
        burst = encode_packet(pcfg, jnp.asarray(payload))
        stream, nv = transmit_over_channel(pcfg, ch, k, burst)
        payloads.append(payload)
        streams.append(np.asarray(stream))
    frame = len(streams[0])
    path = str(tmp_path / "capture.sc16")
    write_iq(path, np.concatenate(streams))

    dec = jax.jit(
        lambda re, im: decode_packet(
            pcfg, jax.lax.complex(re, im), float(nv)
        )
    )
    n_ok = 0
    with IQReader(path, frame=frame) as r:
        for i in range(n_pkt):
            re, im = r.next_real()
            rx, ok = dec(jnp.asarray(re), jnp.asarray(im))
            assert bool(ok), f"packet {i} CRC failed"
            np.testing.assert_array_equal(np.asarray(rx), payloads[i])
            n_ok += 1
        assert r.next_real() is None  # file exactly drained
    assert n_ok == n_pkt
