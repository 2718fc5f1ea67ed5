from sdr_tpu.core.config import (  # noqa: F401
    Modulation,
    OFDMConfig,
    ChannelConfig,
    LinkConfig,
)
from sdr_tpu.core.precision import Precision, default_precision  # noqa: F401
from sdr_tpu.core import prng  # noqa: F401
