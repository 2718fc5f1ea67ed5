from sdr_tpu.utils.sliding_buffer import (  # noqa: F401
    RingState,
    SlidingBuffer,
    ring_new,
    ring_push,
    ring_read,
    ring_window,
)
