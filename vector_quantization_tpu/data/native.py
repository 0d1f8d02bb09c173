"""ctypes binding for the native data plane (native/dataplane.cpp).

The reference rides torch's C++ DataLoader worker pool for host-side image
decode (SURVEY §2.1: todd dataloader + PIL access layers); here the
equivalent is an in-repo C++ library: one ``decode_batch`` call JPEG-decodes
and transforms a whole batch on a persistent native thread pool, GIL-free,
writing uint8 NHWC straight into a numpy buffer.

The library is built lazily (``make -C native``) the first time a decoder is
requested; if the toolchain or libjpeg is unavailable the loader silently
falls back to the Python/PIL path, so nothing here is load-bearing for
correctness — only for throughput.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["NativeDecoder", "get_decoder", "native_available"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvqtdata.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _load_lib():
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.vqt_create.restype = ctypes.c_void_p
        lib.vqt_create.argtypes = [ctypes.c_int]
        lib.vqt_destroy.restype = None
        lib.vqt_destroy.argtypes = [ctypes.c_void_p]
        lib.vqt_version.restype = ctypes.c_int
        lib.vqt_decode_batch.restype = ctypes.c_int64
        lib.vqt_decode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


AUGMENT_CODES = {"none": 0, "default": 1}


class NativeDecoder:
    """Persistent native thread pool decoding batches of JPEG paths."""

    def __init__(self, num_threads: int | None = None) -> None:
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native data plane unavailable")
        self._lib = lib
        if num_threads is None:
            num_threads = min(os.cpu_count() or 8, 16)
        self._handle = lib.vqt_create(int(num_threads))
        self.num_threads = num_threads

    def __del__(self):  # pragma: no cover - interpreter teardown order
        lib, handle = getattr(self, "_lib", None), getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.vqt_destroy(handle)
            self._handle = None

    def decode_batch(
        self,
        paths: list[str],
        image_size: int,
        augmentation: str,
        seeds: np.ndarray | list[int],
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode+transform ``paths`` → (uint8 (n,S,S,3), ok bool (n,)).

        Items with ``ok=False`` (non-JPEG, CMYK, truncated) are left zeroed
        for the caller's fallback path.
        """
        n = len(paths)
        s = int(image_size)
        augment = AUGMENT_CODES[augmentation]
        out = np.empty((n, s, s, 3), np.uint8)
        ok = np.empty((n,), np.uint8)
        seeds_arr = np.ascontiguousarray(seeds, dtype=np.uint64)
        assert seeds_arr.shape == (n,)
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode("utf-8") for p in paths]
        )
        self._lib.vqt_decode_batch(
            self._handle,
            c_paths,
            n,
            s,
            augment,
            seeds_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out, ok.astype(bool)


_decoder: NativeDecoder | None = None
_decoder_lock = threading.Lock()


def get_decoder(num_threads: int | None = None) -> NativeDecoder | None:
    """Process-wide shared decoder (or None if the native path is out)."""
    global _decoder
    if _decoder is not None:
        return _decoder
    with _decoder_lock:
        if _decoder is None and native_available():
            _decoder = NativeDecoder(num_threads)
        return _decoder
