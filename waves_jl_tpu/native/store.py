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


# ---------------------------------------------------------------------------
# Shard store (native/dataset_shard.cpp): streaming multi-episode packing
# ---------------------------------------------------------------------------

_SHARD_SRC = os.path.join(_REPO, "native", "dataset_shard.cpp")
_SHARD_LIB = os.path.join(_LIB_DIR, "libdataset_shard.so")

_shard_lib = None
SHARD_AVAILABLE = None


def _load_shard():
    global _shard_lib, SHARD_AVAILABLE
    with _lock:
        if SHARD_AVAILABLE is not None:
            return _shard_lib
        try:
            stale = (
                os.path.exists(_SHARD_SRC)
                and os.path.exists(_SHARD_LIB)
                and os.path.getmtime(_SHARD_LIB) < os.path.getmtime(_SHARD_SRC)
            )
            if not os.path.exists(_SHARD_LIB) or stale:
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SHARD_SRC, "-o", _SHARD_LIB],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SHARD_LIB)
            lib.ds_create.restype = ctypes.c_void_p
            lib.ds_create.argtypes = [ctypes.c_char_p]
            lib.ds_append.restype = ctypes.c_int64
            lib.ds_append.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.ds_finish.restype = ctypes.c_int
            lib.ds_finish.argtypes = [ctypes.c_void_p]
            lib.dss_open.restype = ctypes.c_void_p
            lib.dss_open.argtypes = [ctypes.c_char_p]
            for name, res, args in [
                ("dss_episodes", ctypes.c_uint64, [ctypes.c_void_p]),
                ("dss_count", ctypes.c_uint64, [ctypes.c_void_p, ctypes.c_uint64]),
                ("dss_name", ctypes.c_char_p,
                 [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]),
                ("dss_ndim", ctypes.c_uint32,
                 [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]),
                ("dss_numel", ctypes.c_uint64,
                 [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]),
            ]:
                fn = getattr(lib, name)
                fn.restype = res
                fn.argtypes = args
            lib.dss_dims.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                     ctypes.c_uint64,
                                     ctypes.POINTER(ctypes.c_uint64)]
            lib.dss_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                     ctypes.c_uint64,
                                     ctypes.POINTER(ctypes.c_float)]
            lib.dss_close.argtypes = [ctypes.c_void_p]
            _shard_lib = lib
            SHARD_AVAILABLE = True
        except Exception:
            _shard_lib = None
            SHARD_AVAILABLE = False
        return _shard_lib


class ShardWriter:
    """Streaming shard writer: append episode bundles one at a time — the
    dataset never has to fit in RAM. None if the native toolchain is
    unavailable (callers fall back to per-episode files)."""

    def __init__(self, path: str):
        lib = _load_shard()
        if lib is None:
            raise IOError("native shard store unavailable (no g++?)")
        self._lib = lib
        self._h = lib.ds_create(path.encode())
        if not self._h:
            raise IOError(f"cannot create shard {path}")

    def append(self, tensors: dict) -> int:
        if self._h is None:
            raise IOError("shard already finished")
        names = list(tensors.keys())
        originals = [np.asarray(tensors[n], dtype=np.float32) for n in names]
        shapes = [a.shape for a in originals]
        arrays = [np.ascontiguousarray(a) for a in originals]
        name_blob = b"".join(n.encode() + b"\0" for n in names)
        ndims = (ctypes.c_uint32 * len(names))(*[len(s) for s in shapes])
        dims_flat_list = [d for s in shapes for d in s]
        dims_flat = (ctypes.c_uint64 * len(dims_flat_list))(*dims_flat_list)
        ptrs = (ctypes.POINTER(ctypes.c_float) * len(names))(
            *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrays]
        )
        idx = self._lib.ds_append(self._h, len(names), name_blob, ndims,
                                  dims_flat, ptrs)
        if idx < 0:
            raise IOError("shard append failed")
        return int(idx)

    def finish(self):
        if self._h is None:
            raise IOError("shard already finished")
        rc = self._lib.ds_finish(self._h)
        self._h = None
        if rc != 0:
            raise IOError(f"shard finish failed rc={rc}")


def load_shard(path: str, limit: int | None = None) -> list[dict] | None:
    """Read back a shard as a list of {name: float32 ndarray}; None if the
    native store is unavailable. `limit` copies only the first N episodes
    out of the map (the reader is random-access)."""
    lib = _load_shard()
    if lib is None:
        return None
    h = lib.dss_open(path.encode())
    if not h:
        raise IOError(f"cannot open shard {path}")
    try:
        out = []
        n_eps = lib.dss_episodes(h)
        if limit is not None:
            n_eps = min(n_eps, limit)
        for ep in range(n_eps):
            d = {}
            for i in range(lib.dss_count(h, ep)):
                name = lib.dss_name(h, ep, i).decode()
                nd = lib.dss_ndim(h, ep, i)
                dims = (ctypes.c_uint64 * nd)()
                lib.dss_dims(h, ep, i, dims)
                arr = np.empty(tuple(dims), dtype=np.float32)
                lib.dss_read(h, ep, i,
                             arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
                d[name] = arr
            out.append(d)
        return out
    finally:
        lib.dss_close(h)


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
