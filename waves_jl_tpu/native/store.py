"""ctypes bindings for the native episode store (native/episode_store.cpp).

Build-on-first-use with g++ (-O3 -shared -fPIC); if no toolchain is
available the callers fall back to npz (`waves_jl_tpu.data` handles that).
The format is a packed float32 tensor bundle read back via mmap.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "episode_store.cpp")
_LIB_DIR = os.path.join(_REPO, "native", "build")
_LIB = os.path.join(_LIB_DIR, "libepisode_store.so")

_lock = threading.Lock()
_lib = None
NATIVE_AVAILABLE = None  # resolved lazily


def _load():
    global _lib, NATIVE_AVAILABLE
    with _lock:
        if NATIVE_AVAILABLE is not None:
            return _lib
        try:
            stale = (
                os.path.exists(_SRC)
                and os.path.exists(_LIB)
                and os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            )
            if not os.path.exists(_LIB) or stale:
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.ws_write.restype = ctypes.c_int
            lib.ws_open.restype = ctypes.c_void_p
            lib.ws_count.restype = ctypes.c_uint64
            lib.ws_count.argtypes = [ctypes.c_void_p]
            lib.ws_name.restype = ctypes.c_char_p
            lib.ws_name.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            lib.ws_ndim.restype = ctypes.c_uint32
            lib.ws_ndim.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            lib.ws_dims.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                    ctypes.POINTER(ctypes.c_uint64)]
            lib.ws_numel.restype = ctypes.c_uint64
            lib.ws_numel.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            lib.ws_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                    ctypes.POINTER(ctypes.c_float)]
            lib.ws_close.argtypes = [ctypes.c_void_p]
            _lib = lib
            NATIVE_AVAILABLE = True
        except Exception:
            _lib = None
            NATIVE_AVAILABLE = False
        return _lib


def save_bundle(path: str, tensors: dict) -> bool:
    """Write {name: float32 ndarray}; returns False if native IO unavailable."""
    lib = _load()
    if lib is None:
        return False
    names = list(tensors.keys())
    originals = [np.asarray(tensors[n], dtype=np.float32) for n in names]
    # ascontiguousarray promotes 0-d to 1-d; keep the true shapes separately
    shapes = [a.shape for a in originals]
    arrays = [np.ascontiguousarray(a) for a in originals]
    name_blob = b"".join(n.encode() + b"\0" for n in names)
    ndims = (ctypes.c_uint32 * len(names))(*[len(s) for s in shapes])
    dims_flat_list = [d for s in shapes for d in s]
    dims_flat = (ctypes.c_uint64 * len(dims_flat_list))(*dims_flat_list)
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(names))(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrays]
    )
    rc = lib.ws_write(path.encode(), len(names), name_blob, ndims, dims_flat, ptrs)
    return rc == 0


def load_bundle(path: str) -> dict | None:
    """Read back {name: float32 ndarray}; None if native IO unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.ws_open(path.encode())
    if not h:
        raise IOError(f"cannot open bundle {path}")
    try:
        out = {}
        for i in range(lib.ws_count(h)):
            name = lib.ws_name(h, i).decode()
            nd = lib.ws_ndim(h, i)
            dims = (ctypes.c_uint64 * nd)()
            lib.ws_dims(h, i, dims)
            arr = np.empty(tuple(dims), dtype=np.float32)
            lib.ws_read(h, i, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            out[name] = arr
        return out
    finally:
        lib.ws_close(h)
