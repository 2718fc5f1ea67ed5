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
