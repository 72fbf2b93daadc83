"""ctypes binding for the native neighbor-search runtime (neighbors.cpp).

Auto-builds the shared library on first import when a toolchain is present;
importing this module raises on any failure, and magnet_tpu/ops/graph.py
falls back to numpy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libneighbors.so")

if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
    os.path.join(_DIR, "neighbors.cpp")
):
    subprocess.run(
        ["make", "-C", _DIR, "-s"], check=True, capture_output=True
    )

_lib = ctypes.CDLL(_SO)
_lib.mt_radius_graph.restype = ctypes.c_int64
_lib.mt_radius_graph.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
    ctypes.c_double, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.c_int64,
]
_lib.mt_knn.restype = None
_lib.mt_knn.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
]


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def radius_graph(pos: np.ndarray, r: float, loop: bool, max_num_neighbors: int):
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    n, d = pos.shape
    cap = n * max_num_neighbors
    senders = np.empty(cap, np.int32)
    receivers = np.empty(cap, np.int32)
    e = _lib.mt_radius_graph(
        _dptr(pos), n, d, float(r), int(loop), int(max_num_neighbors),
        _iptr(senders), _iptr(receivers), cap,
    )
    assert e <= cap, "radius_graph capacity overflow"
    return senders[:e].copy(), receivers[:e].copy()


def knn(x: np.ndarray, y: np.ndarray, k: int) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    k = min(k, x.shape[0])
    out = np.empty((y.shape[0], k), np.int32)
    _lib.mt_knn(_dptr(x), x.shape[0], _dptr(y), y.shape[0], x.shape[1], k,
                _iptr(out))
    return out
