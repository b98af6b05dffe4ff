"""ctypes bindings for the C++ threaded file prefetcher (native/prefetcher.cpp).

Builds the shared library on demand with g++ (cached next to the source);
falls back to a pure-python ThreadPoolExecutor implementation when no
compiler is available, so the data layer never hard-depends on the native
build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

__all__ = ["Prefetcher", "build_native", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libprefetcher.so")
_BUILD_LOCK = threading.Lock()


def build_native(force: bool = False) -> Optional[str]:
    """Compile native/prefetcher.cpp -> libprefetcher.so; None on failure."""
    src = os.path.join(_NATIVE_DIR, "prefetcher.cpp")
    if not os.path.exists(src):
        return None
    with _BUILD_LOCK:
        if not force and os.path.exists(_SO_PATH) and \
                os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
            return _SO_PATH
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 src, "-o", _SO_PATH],
                check=True, capture_output=True, timeout=120)
            return _SO_PATH
        except (subprocess.SubprocessError, FileNotFoundError):
            return None


def native_available() -> bool:
    return build_native() is not None


class _NativePrefetcher:
    def __init__(self, paths: Sequence[str], window: int, workers: int):
        lib = ctypes.CDLL(build_native())
        lib.prefetcher_create.restype = ctypes.c_void_p
        lib.prefetcher_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                          ctypes.c_int64, ctypes.c_int64,
                                          ctypes.c_int64]
        lib.prefetcher_get.restype = ctypes.c_int
        lib.prefetcher_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                                       ctypes.POINTER(ctypes.c_int64)]
        lib.prefetcher_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.prefetcher_create(arr, len(paths), window, workers)
        self._n = len(paths)

    def get(self, i: int) -> bytes:
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        length = ctypes.c_int64()
        rc = self._lib.prefetcher_get(self._handle, i, ctypes.byref(ptr),
                                      ctypes.byref(length))
        if rc != 0:
            raise IndexError(f"prefetcher_get({i}) rc={rc}")
        if length.value == 0:
            raise IOError(f"prefetch item {i}: empty or unreadable file")
        return ctypes.string_at(ptr, length.value)

    def release(self, i: int):
        self._lib.prefetcher_release(self._handle, i)

    def close(self):
        if self._handle:
            self._lib.prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class _PythonPrefetcher:
    def __init__(self, paths: Sequence[str], window: int, workers: int):
        self._paths = list(paths)
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._futures = {}
        self._window = window
        for i in range(min(window, len(paths))):
            self._submit(i)

    def _submit(self, i: int):
        if 0 <= i < len(self._paths) and i not in self._futures:
            self._futures[i] = self._pool.submit(self._read, self._paths[i])

    @staticmethod
    def _read(path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def get(self, i: int) -> bytes:
        self._submit(i)
        for j in range(i + 1, i + self._window):
            self._submit(j)
        data = self._futures[i].result()
        if not data:
            raise IOError(f"prefetch item {i}: empty file")
        return data

    def release(self, i: int):
        self._futures.pop(i, None)

    def close(self):
        self._pool.shutdown(wait=False)


class Prefetcher:
    """Ordered read-ahead over a file list: get(i) -> bytes, then release(i)."""

    def __init__(self, paths: Sequence[str], window: int = 8, workers: int = 4,
                 prefer_native: bool = True):
        if prefer_native and native_available():
            self._impl = _NativePrefetcher(paths, window, workers)
            self.backend = "native"
        else:
            self._impl = _PythonPrefetcher(paths, window, workers)
            self.backend = "python"

    def get(self, i: int) -> bytes:
        return self._impl.get(i)

    def release(self, i: int):
        self._impl.release(i)

    def close(self):
        self._impl.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
