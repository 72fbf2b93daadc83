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
_lib.mt_block_graph.restype = None
_lib.mt_block_graph.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ctypes.c_int32, ctypes.c_int32, ctypes.c_int,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
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


def block_pack(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_node: int,
    tile_n: int,
    n_tiles: int,
    e_tile: int,
    e_tile_s: int,
    build_snd: bool,
):
    """One-pass counting-sort edge packing (see neighbors.cpp:mt_block_graph).

    Returns (S, RL, M, RG_flat, degree, SID, SL) with the exact layout of
    ops/graph.py:block_graph's numpy path; SID/SL are None if not build_snd.
    """
    s = np.ascontiguousarray(senders, np.int32)
    r = np.ascontiguousarray(receivers, np.int32)
    S = np.zeros((n_tiles, e_tile), np.int32)
    RL = np.zeros((n_tiles, e_tile), np.int32)
    M = np.zeros((n_tiles, e_tile), np.float32)
    RG = np.zeros((n_tiles, e_tile), np.int32)
    degree = np.zeros(n_node, np.float32)
    if build_snd:
        SID = np.full((n_tiles, e_tile_s), n_tiles * e_tile, np.int32)
        SL = np.zeros((n_tiles, e_tile_s), np.int32)
    else:  # dummy 1-element buffers (C++ never touches them)
        SID = np.zeros(1, np.int32)
        SL = np.zeros(1, np.int32)
    _lib.mt_block_graph(
        _iptr(s), _iptr(r), len(s), n_node, tile_n, n_tiles,
        e_tile, e_tile_s if build_snd else 1, int(build_snd),
        _iptr(S), _iptr(RL),
        M.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _iptr(RG),
        degree.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _iptr(SID), _iptr(SL),
    )
    if not build_snd:
        SID = SL = None
    return S, RL, M, RG.reshape(-1), degree[:, None], SID, SL


def knn(x: np.ndarray, y: np.ndarray, k: int) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    k = min(k, x.shape[0])
    out = np.empty((y.shape[0], k), np.int32)
    _lib.mt_knn(_dptr(x), x.shape[0], _dptr(y), y.shape[0], x.shape[1], k,
                _iptr(out))
    return out
