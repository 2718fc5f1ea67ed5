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
from sdr_tpu.ops.llr import llr_maxlog, llr_exact, llr_to_hard_bits  # noqa: F401
from sdr_tpu.ops.fec import conv_encode, viterbi_decode, coded_len  # noqa: F401
from sdr_tpu.ops.interleave import interleave, deinterleave  # noqa: F401
from sdr_tpu.ops.pilots import (  # noqa: F401
    estimate_ls_comb,
    insert_pilots,
    extract_data,
)
from sdr_tpu.ops.demod import demod_chain  # noqa: F401
from sdr_tpu.ops.sync import (  # noqa: F401
    apply_cfo,
    correct_cfo,
    estimate_timing_cfo,
    schmidl_cox_preamble,
    timing_metric,
)
