from sdr_tpu.native.host import (  # noqa: F401
    NativeRing,
    available,
    crc32,
    fft as native_fft,
    ifft as native_ifft,
    ofdm_rx as native_ofdm_rx,
    ofdm_tx as native_ofdm_tx,
    pack_bits,
    qam_demap_hard,
    qam_map,
    unpack_bits,
)
