"""Sliding-buffer tests — the reference's nine scenarios plus the
functional-ring twin.

Host ``SlidingBuffer`` scenarios mirror
/root/reference/lib/tests/sliding_buffer_test.cpp:11-154 one-for-one;
the functional ``RingState`` is additionally checked for parity against
the host buffer under jit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdr_tpu.utils import (
    RingState,
    SlidingBuffer,
    ring_new,
    ring_push,
    ring_read,
    ring_window,
)


# --- reference scenario mirrors (sliding_buffer_test.cpp) -----------------


def test_construct_with_size():
    cb = SlidingBuffer(5)
    assert cb.size() == 5


def test_index_out_of_bounds():
    cb = SlidingBuffer(3)
    with pytest.raises(IndexError, match="exceeds size"):
        cb.at(3)


def test_push_single_element():
    cb = SlidingBuffer(4)
    cb.push_back(42)
    assert cb.at(3) == 42


def test_push_range_no_wrap():
    cb = SlidingBuffer(5)
    cb.push_back([1, 2, 3])
    assert cb[5 - 3] == 1
    assert cb[5 - 2] == 2
    assert cb[5 - 1] == 3


def test_push_range_exact_fit():
    cb = SlidingBuffer(4)
    cb.push_back([10, 20, 30, 40])
    assert [cb[i] for i in range(4)] == [10, 20, 30, 40]


def test_push_range_with_wrap():
    cb = SlidingBuffer(5)
    cb.push_back([1, 2, 3, 4])
    cb.push_back([5, 6, 7])
    assert [cb[i] for i in range(5)] == [3, 4, 5, 6, 7]


def test_overwrite_oldest_data():
    cb = SlidingBuffer(3)
    cb.push_back([1, 2, 3, 4, 5])
    assert [cb[i] for i in range(3)] == [3, 4, 5]


def test_multiple_small_pushes():
    cb = SlidingBuffer(4)
    for v in (1, 2, 3, 4, 5):
        cb.push_back(v)
    assert [cb[i] for i in range(4)] == [2, 3, 4, 5]


def test_index_is_relative_to_current_head():
    cb = SlidingBuffer(3)
    for v in (10, 20, 30, 40):
        cb.push_back(v)
    assert [cb[i] for i in range(3)] == [20, 30, 40]


# --- extensions beyond the reference --------------------------------------


def test_iteration_matches_indexing():
    cb = SlidingBuffer(4)
    cb.push_back([1, 2, 3, 4, 5, 6])
    assert cb.tolist() == [cb[i] for i in range(4)]


def test_overflow_push_rejected():
    cb = SlidingBuffer(3)
    with pytest.raises(ValueError, match="overflows"):
        cb.push_back(list(range(7)))  # len - free > size: UB in the reference


# --- functional ring -------------------------------------------------------


def test_ring_parity_with_host_buffer(rng):
    cap = 7
    host = SlidingBuffer(cap)
    ring = ring_new(cap, jnp.int32)
    push = jax.jit(ring_push)
    for _ in range(20):
        n = int(rng.integers(1, cap + 1))
        vals = rng.integers(0, 1000, n)
        host.push_back(list(vals))
        ring = push(ring, jnp.asarray(vals, jnp.int32))
        np.testing.assert_array_equal(
            np.asarray(ring_window(ring)), np.array(host.tolist())
        )


def test_ring_read_relative_to_head():
    ring = ring_new(3, jnp.int32)
    for v in (10, 20, 30, 40):
        ring = ring_push(ring, jnp.asarray([v], jnp.int32))
    assert [int(ring_read(ring, i)) for i in range(3)] == [20, 30, 40]


def test_ring_push_too_large_rejected():
    ring = ring_new(3)
    with pytest.raises(ValueError, match="exceeds capacity"):
        ring_push(ring, jnp.zeros((4,)))


def test_ring_works_under_scan():
    """Ring state threads through lax.scan (streaming usage)."""
    ring = ring_new(4, jnp.float32)

    def step(state, x):
        state = ring_push(state, x[None])
        return state, ring_window(state)

    xs = jnp.arange(6, dtype=jnp.float32)
    final, windows = jax.lax.scan(step, ring, xs)
    np.testing.assert_array_equal(
        np.asarray(ring_window(final)), np.array([2.0, 3.0, 4.0, 5.0])
    )
    assert windows.shape == (6, 4)
