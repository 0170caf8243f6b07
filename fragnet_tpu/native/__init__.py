"""Native (C++) host runtime for graph construction.

Builds ``graphops.cc`` into a shared library on first use (g++, cached by
source hash under $FRAGNET_NATIVE_CACHE or /tmp) and exposes it through
ctypes. Every entry point has a pure-numpy fallback, so the framework works
without a toolchain — the native path exists because dataset creation runs
these loops millions of times (the reference pays the same costs inside
torch_geometric's C++ ops and an O(E²) Python scan, data.py:116-128).

Public API:
  available()                      — True when the .so loaded
  line_graph(src, dst, n_nodes)    — directed share-one-atom line graph
  tile_meta_arrays(...)            — TCSR windows (see ops/tcsr.py)
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "graphops.cc")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        cache_dir = os.environ.get(
            "FRAGNET_NATIVE_CACHE",
            os.path.join(os.environ.get("TMPDIR", "/tmp"), "fragnet_native"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"graphops_{tag}.so")
        if not os.path.exists(so_path):
            tmp = so_path + f".{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.lg_build.restype = ctypes.c_int64
        lib.lg_build.argtypes = [ctypes.c_int64, i32p, i32p, ctypes.c_int64,
                                 ctypes.c_int64, i32p, i32p]
        lib.tile_meta.restype = ctypes.c_int32
        lib.tile_meta.argtypes = [ctypes.c_int64, i32p, i32p, f32p,
                                  ctypes.c_int64, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32, i32p, i32p, i32p, i32p, i32p]
        return lib
    except Exception:
        return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                _lib = _build_and_load()
                _tried = True
    return _lib


def available() -> bool:
    return _get() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def line_graph(src: np.ndarray, dst: np.ndarray,
               n_nodes: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Directed line graph over edges (share exactly ONE node, set semantics,
    i-major / j-ascending — reference data.py:116-128 ordering). Returns
    (res0, res1) int32 arrays, or None when the native lib is unavailable."""
    lib = _get()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    E = len(src)
    if E == 0:
        z = np.zeros(0, np.int32)
        return z, z.copy()
    deg = np.bincount(np.concatenate([src, dst]).astype(np.int64),
                      minlength=n_nodes)
    cap = int((deg[src.astype(np.int64)] + deg[dst.astype(np.int64)]).sum())
    out0 = np.empty(cap, np.int32)
    out1 = np.empty(cap, np.int32)
    n = lib.lg_build(E, _i32p(src), _i32p(dst), n_nodes, cap,
                     _i32p(out0), _i32p(out1))
    if n < 0:  # pragma: no cover — cap is a proven upper bound
        return None
    return out0[:n].copy(), out1[:n].copy()


def tile_meta_arrays(src: np.ndarray, dst: np.ndarray, mask: np.ndarray,
                     n_nodes: int, tn: int, te: int,
                     n_chunks: Optional[int], k_src: Optional[int]):
    """Native TCSR window computation (contract in ops/tcsr.py). Returns
    (ew_blk, sw_tile, flat, n_chunks, k_src) or None (unavailable / window
    overflow — the caller falls back or disables the Pallas path)."""
    lib = _get()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    mask = np.ascontiguousarray(mask, np.float32)
    E = len(src)
    n_tiles = n_nodes // tn
    ew = np.zeros(n_tiles, np.int32)
    sw = np.zeros(n_tiles, np.int32)
    flat = np.zeros(E, np.int32)
    mc = np.zeros(1, np.int32)
    mk = np.zeros(1, np.int32)
    rc = lib.tile_meta(E, _i32p(src), _i32p(dst), _f32p(mask), n_nodes,
                       tn, te, n_chunks or 0, k_src or 0,
                       _i32p(ew), _i32p(sw), _i32p(flat), _i32p(mc),
                       _i32p(mk))
    if rc != 0:
        return "overflow"
    return ew, sw, flat, int(mc[0]) if n_chunks is None else n_chunks, \
        int(mk[0]) if k_src is None else k_src
