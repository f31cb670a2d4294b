"""ctypes bindings for the native C++ host library (native/libvgl_native.so).

Builds on demand with `make -C native` when the .so is missing; every entry point
has a NumPy fallback so the framework works without a toolchain (fallbacks are slow
for the Beneš router — fine for tests, not for scale-24 imports).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvgl_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.benes_route.restype = ctypes.c_int
        lib.build_csr.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def _cptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def benes_route(perm: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compute Beneš stage masks + lane indices for y = x[perm], |perm| = 2^k ≥ 128.

    Returns (in_masks uint8[levels, n], out_masks uint8[levels, n],
             lane_idx int32[n]) with levels = log2(n) - 7."""
    n = len(perm)
    assert n >= 128 and (n & (n - 1)) == 0, n
    k = n.bit_length() - 1
    levels = k - 7
    perm64 = np.ascontiguousarray(perm, dtype=np.int64)
    in_masks = np.empty((levels, n), np.uint8)
    out_masks = np.empty((levels, n), np.uint8)
    lane_idx = np.empty(n, np.int32)
    lib = _load()
    if lib is not None:
        rc = lib.benes_route(ctypes.c_int64(n), _cptr(perm64), _cptr(in_masks),
                             _cptr(out_masks), _cptr(lane_idx))
        if rc != 0:
            raise ValueError(f"benes_route failed rc={rc}")
        return in_masks, out_masks, lane_idx
    return _benes_route_numpy(perm64, in_masks, out_masks, lane_idx)


def _benes_route_numpy(perm, in_masks, out_masks, lane_idx):
    """Pure-Python router (slow: loop-following is sequential). Small n only."""
    n = len(perm)
    k = n.bit_length() - 1
    q = np.empty(n, np.int64)
    q[perm] = np.arange(n)
    for lev in range(k - 7):
        m = 1 << (k - lev)
        h = m // 2
        for lo in range(0, n, m):
            blk = q[lo:lo + m]
            qinv = np.empty(m, np.int64)
            qinv[blk] = np.arange(m)
            side = np.full(m, -1, np.int8)
            for a0 in range(h):
                if side[a0] != -1:
                    continue
                a, s = a0, 0
                while side[a] == -1:
                    side[a] = s
                    p = a ^ h
                    side[p] = 1 - s
                    a = int(qinv[int(blk[p]) ^ h])
            swap = side[:h] == 1
            in_masks[lev, lo:lo + h] = swap
            in_masks[lev, lo + h:lo + m] = swap
            upper = blk[:h].copy()
            lower = blk[h:].copy()
            blk[:h] = np.where(swap, lower, upper)
            blk[h:] = np.where(swap, upper, lower)
            oswap = (blk[:h] & h) != 0
            oslots = blk[:h] & (h - 1)
            om = np.zeros(h, np.uint8)
            om[oslots] = oswap
            out_masks[lev, lo:lo + h] = om
            out_masks[lev, lo + h:lo + m] = om
            blk &= (h - 1)
            q[lo:lo + m] = blk
    for lo in range(0, n, 128):
        blk = q[lo:lo + 128]
        inv = np.empty(128, np.int32)
        inv[blk] = np.arange(128, dtype=np.int32)
        lane_idx[lo:lo + 128] = inv
    return in_masks, out_masks, lane_idx


def build_csr_native(src: np.ndarray, dst: np.ndarray, v: int):
    """Native degree-sorted CSR build; returns None if the library is missing
    (caller falls back to the NumPy pipeline in graph/build.py)."""
    lib = _load()
    if lib is None:
        return None
    e = len(src)
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    row_ptr = np.empty(v + 1, np.int64)
    col_idx = np.empty(e, np.int32)
    edge_perm = np.empty(e, np.int64)
    s2o = np.empty(v, np.int32)
    o2s = np.empty(v, np.int32)
    rc = lib.build_csr(ctypes.c_int64(v), ctypes.c_int64(e), _cptr(src),
                       _cptr(dst), _cptr(row_ptr), _cptr(col_idx),
                       _cptr(edge_perm), _cptr(s2o), _cptr(o2s))
    if rc != 0:
        raise ValueError(f"build_csr failed rc={rc}")
    return row_ptr, col_idx, edge_perm, s2o, o2s
