"""Native graph preprocessing runtime (C++ via ctypes).

The reference's host-side graph work runs on compiled extensions
(torch_sparse.coalesce, torch_cluster random walks); this package is the
framework's native equivalent: ``graphcore.cpp`` built to libgraphcore.so by
``build.sh`` (auto-built on first import if g++ is available). Every entry
point has a pure-numpy fallback, so the framework works without the library —
the native path is a preprocessing speedup, not a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgraphcore.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["sh", os.path.join(_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i64, i32, u64 = ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64

    lib.gc_coalesce.restype = i64
    lib.gc_coalesce.argtypes = [i32p, i32p, f32p, i64, i64, i32p, i32p, f32p]
    lib.gc_lcc.restype = i64
    lib.gc_lcc.argtypes = [i32p, i32p, i64, i64, u8p]
    lib.gc_random_walks.restype = None
    lib.gc_random_walks.argtypes = [i32p, i32p, i64, i64, i32, i32, u64, i32p]
    lib.gc_plan_count.restype = i64
    lib.gc_plan_count.argtypes = [i32p, i32p, i64, i64, i32, i32]
    lib.gc_stripe_count.restype = i64
    lib.gc_stripe_count.argtypes = [i32p, i64, i64, i32, i32]
    lib.gc_stripe_fill.restype = None
    lib.gc_stripe_fill.argtypes = [i32p, i64, i64, i32, i32,
                                   i32p, u8p, i32p, i32p, i32p]
    lib.gc_plan_fill.restype = None
    lib.gc_plan_fill.argtypes = [i32p, i32p, f32p, i64, i64, i32, i32,
                                 i32p, i32p, f32p, u8p, i32p, i32p, i64p,
                                 i32p, i32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def coalesce(row: np.ndarray, col: np.ndarray,
             weight: Optional[np.ndarray] = None
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sorted, deduplicated edges with summed duplicate weights."""
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    e = row.shape[0]
    w = (np.ascontiguousarray(weight, np.float32) if weight is not None
         else None)
    lib = _load()
    if lib is not None:
        orow = np.empty(e, np.int32)
        ocol = np.empty(e, np.int32)
        ow = np.empty(e, np.float32)
        n = int(max(row.max(initial=0), col.max(initial=0))) + 1
        m = lib.gc_coalesce(
            _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
            _ptr(w, ctypes.c_float) if w is not None else None,
            e, n, _ptr(orow, ctypes.c_int32), _ptr(ocol, ctypes.c_int32),
            _ptr(ow, ctypes.c_float))
        return orow[:m], ocol[:m], ow[:m]
    # numpy fallback
    if w is None:
        w = np.ones(e, np.float32)
    order = np.lexsort((col, row))
    r, c, ww = row[order], col[order], w[order]
    new = np.concatenate([[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])])
    seg = np.cumsum(new) - 1
    sums = np.bincount(seg, weights=ww)
    return r[new], c[new], sums.astype(np.float32)


def lcc_mask(row: np.ndarray, col: np.ndarray, num_nodes: int) -> np.ndarray:
    """Boolean mask of nodes in the largest connected component."""
    lib = _load()
    if lib is not None:
        row = np.ascontiguousarray(row, np.int32)
        col = np.ascontiguousarray(col, np.int32)
        out = np.zeros(num_nodes, np.uint8)
        lib.gc_lcc(_ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
                   row.shape[0], num_nodes, _ptr(out, ctypes.c_uint8))
        return out.astype(bool)
    from graph_neural_pde_tpu.data.datasets import largest_connected_component
    keep = largest_connected_component(np.stack([row, col]), num_nodes)
    m = np.zeros(num_nodes, bool)
    m[keep] = True
    return m


def random_walks(row: np.ndarray, col: np.ndarray, num_nodes: int, *,
                 walk_length: int = 20, walks_per_node: int = 10,
                 seed: int = 1) -> np.ndarray:
    """[num_nodes·walks_per_node, walk_length+1] uniform random walks."""
    lib = _load()
    if lib is not None:
        row = np.ascontiguousarray(row, np.int32)
        col = np.ascontiguousarray(col, np.int32)
        out = np.empty((num_nodes * walks_per_node, walk_length + 1), np.int32)
        lib.gc_random_walks(
            _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
            row.shape[0], num_nodes, walk_length, walks_per_node,
            max(seed, 1), _ptr(out, ctypes.c_int32))
        return out.astype(np.int64)
    from graph_neural_pde_tpu.rewiring.positional import random_walks as rw
    return rw(row, col, num_nodes, walk_length=walk_length,
              walks_per_node=walks_per_node, seed=seed)


def build_block_plan_native(row, col, weight, num_nodes: int, block_n: int,
                            chunk: int):
    """Native bucketed edge plan; returns the same arrays as plan._build
    (plus tags) or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    w = (np.ascontiguousarray(weight, np.float32) if weight is not None
         else None)
    e = row.shape[0]
    n_pad = ((num_nodes + block_n - 1) // block_n) * block_n
    nc = lib.gc_plan_count(_ptr(row, ctypes.c_int32),
                           _ptr(col, ctypes.c_int32), e, n_pad, block_n,
                           chunk)
    total = nc * chunk
    row_l = np.empty(total, np.int32)
    col_l = np.empty(total, np.int32)
    w_out = np.empty(total, np.float32)
    valid = np.empty(total, np.uint8)
    row_g = np.empty(total, np.int32)
    col_g = np.empty(total, np.int32)
    tags = np.empty(total, np.int64)
    chunk_rows = np.empty(nc, np.int32)
    chunk_cols = np.empty(nc, np.int32)
    lib.gc_plan_fill(
        _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
        _ptr(w, ctypes.c_float) if w is not None else None,
        e, n_pad, block_n, chunk,
        _ptr(row_l, ctypes.c_int32), _ptr(col_l, ctypes.c_int32),
        _ptr(w_out, ctypes.c_float), _ptr(valid, ctypes.c_uint8),
        _ptr(row_g, ctypes.c_int32), _ptr(col_g, ctypes.c_int32),
        _ptr(tags, ctypes.c_int64), _ptr(chunk_rows, ctypes.c_int32),
        _ptr(chunk_cols, ctypes.c_int32))
    return (row_l, col_l, w_out, valid.astype(bool), row_g, col_g, tags,
            chunk_rows, chunk_cols, n_pad)


def build_stripe_plan_native(row_sorted: np.ndarray, num_nodes: int,
                             block_n: int, chunk: int):
    """Native stripe-plan arrays (ops/pallas/stripe.build_stripe_plan's
    layout) or None when the library is unavailable. ``row_sorted`` must be
    the VALID edges' rows, ascending."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row_sorted, np.int32)
    e = row.shape[0]
    n_pad = ((num_nodes + block_n - 1) // block_n) * block_n
    nc = lib.gc_stripe_count(_ptr(row, ctypes.c_int32), e, num_nodes,
                             block_n, chunk)
    cap = nc * chunk
    row_local = np.empty(cap, np.int32)
    valid = np.empty(cap, np.uint8)
    chunk_rows = np.empty(nc, np.int32)
    slot_of_edge = np.empty(e, np.int32)
    node_degree = np.empty(n_pad, np.int32)
    lib.gc_stripe_fill(_ptr(row, ctypes.c_int32), e, num_nodes, block_n,
                       chunk, _ptr(row_local, ctypes.c_int32),
                       _ptr(valid, ctypes.c_uint8),
                       _ptr(chunk_rows, ctypes.c_int32),
                       _ptr(slot_of_edge, ctypes.c_int32),
                       _ptr(node_degree, ctypes.c_int32))
    return (row_local, valid.astype(bool), chunk_rows, slot_of_edge,
            node_degree, n_pad)
