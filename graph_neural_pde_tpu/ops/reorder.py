"""Node-reordering passes that manufacture block locality for the blocked
MXU kernels.

The blocked aggregation engine (ops/pallas/spmm_blocked.py over
ops/pallas/plan.py) tiles nodes into blocks of ``block_n`` and buckets
edges by (row_block, col_block); its cost is proportional to the padded
chunk count, so it wins exactly when edges concentrate in few buckets.
Real community-structured graphs only expose that structure after a
bandwidth-reducing relabeling — under an arbitrary node labeling a
community's edges spray across all block pairs and the plan degenerates
to near-uniform occupancy (the documented loss case in
spmm_blocked.py:20-26).

This module computes such relabelings on the host (one-off numpy
preprocessing, like the plan build itself) and applies them at the
dataset level, permuting features/labels/masks/positional encodings
together with the graph so model semantics are untouched: node
classification is invariant under a consistent relabeling, which
``tests/test_reorder.py`` pins (blocked spmm on the reordered graph
equals the permuted original; training metrics identical).

Orders
------
* ``rcm`` — reverse Cuthill-McKee: BFS from a min-degree seed, visiting
  neighbours in increasing-degree order, reversed. The classic
  bandwidth-reducing order; on a planted-partition graph it lays each
  community contiguously, collapsing the plan toward block-diagonal.
  Fast path: scipy.sparse.csgraph.reverse_cuthill_mckee (C); the numpy
  implementation below is the reference/fallback and the test oracle.
* ``degree`` — descending-degree order: groups hubs into the leading
  blocks. Cheaper and useful on scale-free graphs where a few hub
  blocks absorb most edges.

No reference analogue: /root/reference delegates sparse aggregation to
torch_sparse.spmm's CUDA gather, which is labeling-indifferent; block
locality is a TPU-plan concern.
"""

from __future__ import annotations

import sys
from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# permutation construction
# ---------------------------------------------------------------------------

def _symmetric_csr(row, col, num_nodes: int):
    """Undirected CSR (both edge directions kept; duplicates harmless for
    BFS). Returns (indptr int64[N+1], indices int64[sum deg])."""
    r = np.concatenate([row, col]).astype(np.int64)
    c = np.concatenate([col, row]).astype(np.int64)
    order = np.argsort(r, kind="stable")
    r, c = r[order], c[order]
    indptr = np.zeros(num_nodes + 1, np.int64)
    indptr[1:] = np.cumsum(np.bincount(r, minlength=num_nodes))
    return indptr, c


def _rcm_numpy(indptr, indices, num_nodes: int) -> np.ndarray:
    """Reference reverse Cuthill-McKee (pure numpy BFS).

    Returns ``order`` with order[new_id] = old_id — the same convention as
    scipy's reverse_cuthill_mckee."""
    deg = np.diff(indptr)
    visited = np.zeros(num_nodes, bool)
    order = np.empty(num_nodes, np.int64)
    pos = 0
    # components seeded at their min-degree unvisited node
    for s in np.argsort(deg, kind="stable"):
        if visited[s]:
            continue
        visited[s] = True
        order[pos] = s
        head, pos = pos, pos + 1
        while head < pos:
            u = order[head]
            head += 1
            nb = indices[indptr[u]:indptr[u + 1]]
            nb = np.unique(nb[~visited[nb]])       # dedup multi-edges
            if nb.size:
                nb = nb[np.argsort(deg[nb], kind="stable")]
                visited[nb] = True
                order[pos:pos + nb.size] = nb
                pos += nb.size
    return order[::-1].copy()


def rcm_order(row, col, num_nodes: int) -> np.ndarray:
    """Reverse Cuthill-McKee node order; order[new_id] = old_id."""
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    try:
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        n = num_nodes
        r = np.concatenate([row, col])
        c = np.concatenate([col, row])
        m = csr_matrix((np.ones(r.shape[0], np.float32), (r, c)),
                       shape=(n, n))
        return np.asarray(reverse_cuthill_mckee(m, symmetric_mode=True),
                          np.int64)
    except Exception:                               # pragma: no cover
        indptr, idx = _symmetric_csr(row, col, num_nodes)
        return _rcm_numpy(indptr, idx, num_nodes)


def degree_order(row, col, num_nodes: int) -> np.ndarray:
    """Descending-degree node order; order[new_id] = old_id."""
    indptr, _ = _symmetric_csr(np.asarray(row, np.int64),
                               np.asarray(col, np.int64), num_nodes)
    deg = np.diff(indptr)
    return np.argsort(-deg, kind="stable").astype(np.int64)


def node_order(method: str, row, col, num_nodes: int) -> np.ndarray:
    if method == "rcm":
        return rcm_order(row, col, num_nodes)
    if method == "degree":
        return degree_order(row, col, num_nodes)
    raise ValueError(f"unknown node_reorder '{method}' "
                     "(expected 'none', 'rcm' or 'degree')")


def invert_order(order: np.ndarray) -> np.ndarray:
    """new_of_old: inverse permutation (new_of_old[old_id] = new_id)."""
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0], dtype=order.dtype)
    return inv


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------

def relabel_graph(g, order: np.ndarray):
    """Relabel node ids through ``order`` (edge slots stay in place; only
    endpoint ids change, so plan builders re-sort downstream as usual)."""
    import jax.numpy as jnp
    from graph_neural_pde_tpu.ops.graph import Graph
    new_of_old = invert_order(order)
    m = np.asarray(g.mask)
    row = np.asarray(g.row, np.int64)
    col = np.asarray(g.col, np.int64)
    row_n = np.where(m, new_of_old[row], 0).astype(np.int32)
    col_n = np.where(m, new_of_old[col], 0).astype(np.int32)
    return Graph(row=jnp.asarray(row_n), col=jnp.asarray(col_n),
                 weight=g.weight, mask=g.mask, num_nodes=g.num_nodes,
                 rows_sorted=False)


def reorder_dataset(ds, method: str):
    """Apply a node reorder to a NodeDataset; returns (dataset, order).

    x/y/masks/pos_encoding are permuted consistently with the relabeled
    graph, and the order is stored on the result (``ds.reorder``) so
    later, externally-indexed node payloads (precomputed positional-
    encoding files, geom-gcn split files) can be mapped too."""
    import jax.numpy as jnp
    import dataclasses
    g = ds.graph
    n = int(np.asarray(ds.y).shape[0])
    assert g.num_nodes == n, (g.num_nodes, n)   # nodes are never padded here
    m = np.asarray(g.mask)
    order = node_order(method, np.asarray(g.row)[m], np.asarray(g.col)[m],
                       g.num_nodes)
    take = lambda a: jnp.asarray(np.asarray(a)[order])
    d2 = dataclasses.replace(
        ds, graph=relabel_graph(g, order), x=take(ds.x), y=take(ds.y),
        train_mask=take(ds.train_mask), val_mask=take(ds.val_mask),
        test_mask=take(ds.test_mask),
        pos_encoding=(None if ds.pos_encoding is None
                      else take(ds.pos_encoding)),
        reorder=order)
    return d2, order


# ---------------------------------------------------------------------------
# diagnostics
# ---------------------------------------------------------------------------

def plan_occupancy(plan) -> dict:
    """Block-plan fill statistics — the quantity a reorder improves."""
    valid = int(np.asarray(plan.valid).sum())
    buckets = np.unique(
        np.asarray(plan.chunk_rows, np.int64) * (2 ** 32)
        + np.asarray(plan.chunk_cols, np.int64)).shape[0]
    return {
        "capacity": int(plan.capacity),
        "valid_edges": valid,
        "fill": valid / max(plan.capacity, 1),
        "n_chunks": int(plan.n_chunks),
        "buckets": int(buckets),
    }


def bandwidth(row, col, order: Optional[np.ndarray] = None) -> int:
    """Max |row - col| under an optional relabeling — RCM's objective."""
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    if order is not None:
        inv = invert_order(np.asarray(order, np.int64))
        row, col = inv[row], inv[col]
    return int(np.abs(row - col).max()) if row.size else 0
