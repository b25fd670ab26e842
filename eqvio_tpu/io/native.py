"""ctypes binding for the native async writer (native/aofstream.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, so the binding is a plain C API via ctypes).  Falls back cleanly when
the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaofstream.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.aof_open.restype = ctypes.c_void_p
        lib.aof_open.argtypes = [ctypes.c_char_p]
        lib.aof_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.aof_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


class AsyncFile:
    """File-like append-only handle backed by the native flush thread."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native aofstream unavailable")
        self._lib = lib
        self._handle = lib.aof_open(path.encode())

    def write(self, text: str):
        data = text.encode()
        self._lib.aof_write(self._handle, data, len(data))

    # list-like alias so VIOWriter can treat buffers and streams uniformly
    append = write

    def close(self):
        if self._handle is not None:
            self._lib.aof_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def flush_all():
    lib = _load()
    if lib is not None:
        lib.aof_flush_all()
