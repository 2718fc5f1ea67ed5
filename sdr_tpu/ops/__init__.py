from sdr_tpu.ops.fft import fft, ifft  # noqa: F401
from sdr_tpu.ops.ofdm import cp_insert, cp_remove, ofdm_tx, ofdm_rx  # noqa: F401
from sdr_tpu.ops.modulation import (  # noqa: F401
    constellation,
    modulate,
    demodulate_hard,
    nearest_symbol,
    bits_to_bytes,
    bytes_to_bits,
    to_constl,
    from_constl,
)
from sdr_tpu.ops.channel import awgn, rayleigh_flat, multipath_taps, apply_multipath  # noqa: F401
from sdr_tpu.ops.equalize import equalize_zf, equalize_mmse  # noqa: F401
from sdr_tpu.ops.llr import llr_maxlog, llr_to_hard_bits  # noqa: F401
