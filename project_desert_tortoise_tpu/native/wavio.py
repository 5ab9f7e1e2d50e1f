"""ctypes bindings for the native IO runtime (libpdtwavio.so).

Auto-builds are not attempted; if the shared library is absent the pure-
Python/numpy reader in utils/wav.py is used instead (same semantics, tested
equivalent in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpdtwavio.so")
_lib = None


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_uint32),
        ("channels", ctypes.c_uint16),
        ("bits_per_sample", ctypes.c_uint16),
        ("format_type", ctypes.c_uint16),
        ("data_size", ctypes.c_uint32),
        ("n_frames", ctypes.c_uint64),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pdt_parse_wav_header.restype = ctypes.c_int
    lib.pdt_pcm_to_iq_f32.restype = ctypes.c_int
    lib.pdt_pcm_to_iq_f64.restype = ctypes.c_int
    lib.pdt_raw_to_iq_f32.restype = ctypes.c_int
    lib.pdt_ring_create.restype = ctypes.c_void_p
    lib.pdt_ring_push.restype = ctypes.c_uint64
    lib.pdt_ring_pop.restype = ctypes.c_uint64
    lib.pdt_ring_available.restype = ctypes.c_uint64
    lib.pdt_ring_capacity.restype = ctypes.c_uint64
    lib.pdt_ring_overruns.restype = ctypes.c_uint64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_u8(buf) -> np.ndarray:
    return np.frombuffer(buf, np.uint8)


def load_iq_wav_native(path: str, dtype=np.float32):
    """Native-path equivalent of utils.wav.load_iq_wav; returns
    (re, im, fs, bits) planar arrays or None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()
    data = _as_u8(raw)
    info = _WavInfo()
    rc = lib.pdt_parse_wav_header(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(info))
    if rc != 0 or info.channels != 2 or info.format_type != 1:
        raise ValueError("unsupported wav for native reader")
    n = int(info.n_frames)
    dt = np.dtype(dtype)
    re = np.empty(n, dt)
    im = np.empty(n, dt)
    body = data[44:]
    fn = lib.pdt_pcm_to_iq_f32 if dt == np.float32 else lib.pdt_pcm_to_iq_f64
    ptr_t = ctypes.POINTER(ctypes.c_float if dt == np.float32
                           else ctypes.c_double)
    rc = fn(body.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
            int(info.bits_per_sample),
            re.ctypes.data_as(ptr_t), im.ctypes.data_as(ptr_t))
    if rc != 0:
        raise ValueError(f"unsupported bits: {info.bits_per_sample}")
    return re, im, float(info.sample_rate), int(info.bits_per_sample)


class IQRing:
    """Lock-free SPSC IQ ring buffer (streaming transport)."""

    def __init__(self, capacity_frames: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("libpdtwavio.so not built "
                               "(make -C project_desert_tortoise_tpu/native)")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.pdt_ring_create(capacity_frames))
        if not self._h:
            raise MemoryError("ring allocation failed")

    @property
    def capacity(self) -> int:
        return int(self._lib.pdt_ring_capacity(self._h))

    @property
    def available(self) -> int:
        return int(self._lib.pdt_ring_available(self._h))

    @property
    def overruns(self) -> int:
        return int(self._lib.pdt_ring_overruns(self._h))

    def push(self, re: np.ndarray, im: np.ndarray) -> int:
        re = np.ascontiguousarray(re, np.float32)
        im = np.ascontiguousarray(im, np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        return int(self._lib.pdt_ring_push(
            self._h, re.ctypes.data_as(fp), im.ctypes.data_as(fp), len(re)))

    def pop(self, n: int):
        re = np.empty(n, np.float32)
        im = np.empty(n, np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        got = int(self._lib.pdt_ring_pop(
            self._h, re.ctypes.data_as(fp), im.ctypes.data_as(fp), n))
        return re[:got], im[:got]

    def close(self):
        if self._h:
            self._lib.pdt_ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
