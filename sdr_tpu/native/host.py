"""ctypes bindings for the native host runtime (native/sdr_host.cpp).

Lazy-builds ``libsdr_host.so`` with the repo Makefile on first use
(g++ is part of the toolchain; there is no pybind11 in this image, so
bindings are plain ctypes over a C ABI). All entry points raise
RuntimeError if the native library cannot be built — callers that can
fall back to pure Python should check ``available()`` first.

Roles:
- NativeRing: the C++ ring buffer (reference sliding_buffer semantics)
  for high-rate host-side streaming.
- pack/unpack bits, crc32: the host framing data path.
- native_fft/ifft, qam_map/demap, ofdm_tx/rx: an INDEPENDENT C++
  golden oracle of the reference PHY contract — the parity target the
  JAX ops are tested against (tests/test_native.py), playing the role
  the reference C++ lib itself plays for the north star's "matches the
  C++ simulator" bound.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "libsdr_host.so")

_lock = threading.Lock()
_lib = None
_err: str | None = None


def _load():
    global _lib, _err
    with _lock:
        if _lib is not None or _err is not None:
            return _lib
        try:
            srcs = [
                os.path.join(_NATIVE_DIR, "sdr_host.cpp"),
                os.path.join(_NATIVE_DIR, "iq_file.cpp"),
            ]
            newest = max(os.path.getmtime(s) for s in srcs)
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    text=True,
                )
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError) as e:
            _err = f"native build failed: {e}"
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        f4p = ctypes.POINTER(ctypes.c_float)
        f8p = ctypes.POINTER(ctypes.c_double)
        sz = ctypes.c_size_t

        lib.sdr_ring_create.restype = ctypes.c_void_p
        lib.sdr_ring_create.argtypes = [sz]
        lib.sdr_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.sdr_ring_size.restype = sz
        lib.sdr_ring_size.argtypes = [ctypes.c_void_p]
        lib.sdr_ring_push.restype = ctypes.c_int
        lib.sdr_ring_push.argtypes = [ctypes.c_void_p, f4p, sz]
        lib.sdr_ring_window.argtypes = [ctypes.c_void_p, f4p]
        lib.sdr_unpack_bits.argtypes = [u8p, sz, u8p]
        lib.sdr_pack_bits.argtypes = [u8p, sz, u8p]
        lib.sdr_crc32.restype = ctypes.c_uint32
        lib.sdr_crc32.argtypes = [u8p, sz]
        lib.sdr_fft.restype = ctypes.c_int
        lib.sdr_fft.argtypes = [f8p, f8p, sz, ctypes.c_int]
        lib.sdr_qam_map.restype = ctypes.c_int
        lib.sdr_qam_map.argtypes = [u8p, sz, ctypes.c_int, f8p, f8p]
        lib.sdr_qam_demap_hard.restype = ctypes.c_int
        lib.sdr_qam_demap_hard.argtypes = [f8p, f8p, sz, ctypes.c_int, u8p]
        lib.sdr_ofdm_tx.restype = ctypes.c_int
        lib.sdr_ofdm_tx.argtypes = [f8p, f8p, sz, sz, f8p, f8p]
        lib.sdr_ofdm_rx.restype = ctypes.c_int
        lib.sdr_ofdm_rx.argtypes = [f8p, f8p, sz, sz, f8p, f8p]
        lib.sdr_iq_write.restype = ctypes.c_longlong
        lib.sdr_iq_write.argtypes = [ctypes.c_char_p, f4p, sz, ctypes.c_float]
        lib.sdr_iq_info.restype = ctypes.c_longlong
        lib.sdr_iq_info.argtypes = [ctypes.c_char_p]
        lib.sdr_iq_read.restype = ctypes.c_longlong
        lib.sdr_iq_read.argtypes = [ctypes.c_char_p, sz, sz, f4p, ctypes.c_float]
        lib.sdr_iq_reader_open.restype = ctypes.c_void_p
        lib.sdr_iq_reader_open.argtypes = [
            ctypes.c_char_p, sz, ctypes.c_float, ctypes.c_int, sz,
        ]
        lib.sdr_iq_reader_next.restype = ctypes.c_int
        lib.sdr_iq_reader_next.argtypes = [ctypes.c_void_p, f4p]
        lib.sdr_iq_reader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _lib_or_raise():
    lib = _load()
    if lib is None:
        raise RuntimeError(_err or "native library unavailable")
    return lib


def _f8(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class NativeRing:
    """C++ ring buffer with reference sliding_buffer semantics."""

    def __init__(self, size: int):
        self._lib = _lib_or_raise()
        self._h = self._lib.sdr_ring_create(size)
        self._size = size

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sdr_ring_destroy(self._h)
            self._h = None

    def size(self) -> int:
        return self._size

    def push(self, values) -> None:
        v = np.ascontiguousarray(values, dtype=np.float32).ravel()
        rc = self._lib.sdr_ring_push(self._h, _ptr(v, ctypes.c_float), v.size)
        if rc != 0:
            raise ValueError(f"push of {v.size} overflows capacity {self._size}")

    def window(self) -> np.ndarray:
        out = np.empty(self._size, np.float32)
        self._lib.sdr_ring_window(self._h, _ptr(out, ctypes.c_float))
        return out


def unpack_bits(data) -> np.ndarray:
    lib = _lib_or_raise()
    b = np.ascontiguousarray(data, dtype=np.uint8).ravel()
    out = np.empty(b.size * 8, np.uint8)
    lib.sdr_unpack_bits(_ptr(b, ctypes.c_uint8), b.size, _ptr(out, ctypes.c_uint8))
    return out


def pack_bits(bits) -> np.ndarray:
    lib = _lib_or_raise()
    b = np.ascontiguousarray(bits, dtype=np.uint8).ravel()
    out = np.empty(b.size // 8, np.uint8)
    lib.sdr_pack_bits(_ptr(b, ctypes.c_uint8), b.size, _ptr(out, ctypes.c_uint8))
    return out


def crc32(data) -> int:
    lib = _lib_or_raise()
    b = np.ascontiguousarray(data, dtype=np.uint8).ravel()
    return int(lib.sdr_crc32(_ptr(b, ctypes.c_uint8), b.size))


def _fft_impl(x, inverse: bool) -> np.ndarray:
    lib = _lib_or_raise()
    x = np.asarray(x, dtype=np.complex128)
    re = _f8(x.real.copy())
    im = _f8(x.imag.copy())
    rc = lib.sdr_fft(
        _ptr(re, ctypes.c_double), _ptr(im, ctypes.c_double), re.size, int(inverse)
    )
    if rc != 0:
        raise ValueError(f"The sequence size must be a power of 2, got {re.size}")
    return re + 1j * im


def fft(x) -> np.ndarray:
    """Forward unscaled DFT (reference fft::fft2 conventions)."""
    return _fft_impl(x, inverse=False)


def ifft(x) -> np.ndarray:
    """Inverse DFT with 1/N scaling (reference fft::ifft2)."""
    return _fft_impl(x, inverse=True)


def qam_map(bits, bits_per_symbol: int) -> np.ndarray:
    lib = _lib_or_raise()
    b = np.ascontiguousarray(bits, dtype=np.uint8).ravel()
    n_sym = b.size // bits_per_symbol
    re = np.empty(n_sym, np.float64)
    im = np.empty(n_sym, np.float64)
    rc = lib.sdr_qam_map(
        _ptr(b, ctypes.c_uint8), b.size, bits_per_symbol,
        _ptr(re, ctypes.c_double), _ptr(im, ctypes.c_double),
    )
    if rc != 0:
        raise ValueError(f"bad map: n_bits={b.size}, bps={bits_per_symbol}")
    return re + 1j * im


def qam_demap_hard(points, bits_per_symbol: int) -> np.ndarray:
    lib = _lib_or_raise()
    p = np.asarray(points, np.complex128).ravel()
    re = _f8(p.real.copy())
    im = _f8(p.imag.copy())
    out = np.empty(p.size * bits_per_symbol, np.uint8)
    rc = lib.sdr_qam_demap_hard(
        _ptr(re, ctypes.c_double), _ptr(im, ctypes.c_double), p.size,
        bits_per_symbol, _ptr(out, ctypes.c_uint8),
    )
    if rc != 0:
        raise ValueError(f"bad demap: bps={bits_per_symbol}")
    return out


def ofdm_tx(points, cp_len: int) -> np.ndarray:
    lib = _lib_or_raise()
    p = np.asarray(points, np.complex128).ravel()
    re_in, im_in = _f8(p.real.copy()), _f8(p.imag.copy())
    n = p.size
    re = np.empty(n + cp_len, np.float64)
    im = np.empty(n + cp_len, np.float64)
    rc = lib.sdr_ofdm_tx(
        _ptr(re_in, ctypes.c_double), _ptr(im_in, ctypes.c_double), n, cp_len,
        _ptr(re, ctypes.c_double), _ptr(im, ctypes.c_double),
    )
    if rc != 0:
        raise ValueError(f"ofdm_tx failed: n={n}, cp={cp_len}")
    return re + 1j * im


def ofdm_rx(samples, cp_len: int) -> np.ndarray:
    lib = _lib_or_raise()
    s = np.asarray(samples, np.complex128).ravel()
    re_in, im_in = _f8(s.real.copy()), _f8(s.imag.copy())
    n = s.size - cp_len
    re = np.empty(n, np.float64)
    im = np.empty(n, np.float64)
    rc = lib.sdr_ofdm_rx(
        _ptr(re_in, ctypes.c_double), _ptr(im_in, ctypes.c_double), s.size, cp_len,
        _ptr(re, ctypes.c_double), _ptr(im, ctypes.c_double),
    )
    if rc != 0:
        raise ValueError(f"ofdm_rx failed: n_total={s.size}, cp={cp_len}")
    return re + 1j * im
