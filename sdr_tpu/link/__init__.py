from sdr_tpu.link.pipeline import (  # noqa: F401
    LinkResult,
    generate_bits,
    tx_chain,
    apply_channel,
    rx_chain,
    simulate,
    make_simulate_fn,
)
from sdr_tpu.link.ber import qfunc, ber_awgn_exact, count_bit_errors  # noqa: F401
from sdr_tpu.link.coded import (  # noqa: F401
    info_bits_per_channel,
    make_coded_fn,
    simulate_coded,
)
from sdr_tpu.link.fast import fast_simulate, make_fast_fn  # noqa: F401
from sdr_tpu.link.stream import stream_simulate  # noqa: F401
