"""Static-shape graph container and normalisations.

The reference stores graphs as dynamically sized ``edge_index`` [2, E] tensors
and resizes them at runtime (edge subsampling, rewiring). Under XLA every
shape change recompiles, so here a graph is a *fixed-capacity* pytree: padded
COO arrays plus a validity mask. Rewiring and subsampling become mask/weight
updates at constant shape.

Conventions (matching torch_sparse.spmm semantics used throughout the
reference, e.g. /root/reference/src/function_laplacian_diffusion.py:28-36):
``out[row[e]] += weight[e] * x[col[e]]`` — ``row`` indexes the *output* node,
``col`` the node whose features are gathered.

Normalisations mirror /root/reference/src/utils.py:
  * ``get_rw_adj``          — utils.py:105-123 (random-walk, norm_dim row/col)
  * ``gcn_norm_fill_val``   — utils.py:55-72  (symmetric D^-1/2 A D^-1/2)
  * ``add_remaining_self_loops`` — PyG semantics relied on at utils.py:63,113
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass,
         data_fields=("row", "col", "weight", "mask"),
         meta_fields=("num_nodes", "rows_sorted"))
@dataclasses.dataclass(frozen=True)
class Graph:
    """Fixed-capacity COO graph.

    row, col : int32[E_pad]   — padded entries point at node 0
    weight   : float32[E_pad] — padded entries are 0.0
    mask     : bool[E_pad]    — validity of each edge slot
    num_nodes: static int
    rows_sorted: static bool  — edges ordered by row (enables the sorted
                                segment-sum fast path on TPU)
    """

    row: jax.Array
    col: jax.Array
    weight: jax.Array
    mask: jax.Array
    num_nodes: int
    rows_sorted: bool = False

    def sort_by_row(self) -> "Graph":
        """Stable-reorder edges by row; padding slots go last (row forced
        high for invalid slots before sorting, then reset to 0)."""
        key = jnp.where(self.mask, self.row, self.num_nodes)
        order = jnp.argsort(key, stable=True)
        mask = self.mask[order]
        return Graph(row=jnp.where(mask, self.row[order], 0),
                     col=jnp.where(mask, self.col[order], 0),
                     weight=jnp.where(mask, self.weight[order], 0.0),
                     mask=mask, num_nodes=self.num_nodes, rows_sorted=True)

    @property
    def capacity(self) -> int:
        return self.row.shape[0]

    @property
    def num_edges(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def with_weight(self, weight: jax.Array) -> "Graph":
        return dataclasses.replace(self, weight=weight)

    def with_edges(self, row, col, weight, mask) -> "Graph":
        return dataclasses.replace(self, row=row, col=col, weight=weight, mask=mask)


def make_graph(row, col, weight=None, *, num_nodes: int, capacity: int | None = None,
               pad_multiple: int = 1) -> Graph:
    """Build a Graph from (possibly unpadded) COO arrays, padding to capacity."""
    row = jnp.asarray(row, jnp.int32)
    col = jnp.asarray(col, jnp.int32)
    e = row.shape[0]
    if weight is None:
        weight = jnp.ones((e,), jnp.float32)
    else:
        weight = jnp.asarray(weight, jnp.float32)
    cap = capacity if capacity is not None else _round_up(max(e, 1), pad_multiple)
    assert cap >= e, f"capacity {cap} < num edges {e}"
    pad = cap - e
    mask = jnp.concatenate([jnp.ones((e,), bool), jnp.zeros((pad,), bool)])
    row = jnp.concatenate([row, jnp.zeros((pad,), jnp.int32)])
    col = jnp.concatenate([col, jnp.zeros((pad,), jnp.int32)])
    weight = jnp.concatenate([weight, jnp.zeros((pad,), jnp.float32)])
    return Graph(row=row, col=col, weight=weight, mask=mask, num_nodes=int(num_nodes))


# ---------------------------------------------------------------------------
# self loops
# ---------------------------------------------------------------------------

def pad_capacity(g: Graph, multiple: int) -> Graph:
    """Grow the padded edge arrays so ``capacity % multiple == 0`` (new tail
    slots are invalid). Mesh sharding (parallel.mesh.shard_graph) needs the
    capacity to divide evenly across devices. rows_sorted is dropped — the
    appended row-0 slots break the sorted invariant; prepare_graph re-sorts."""
    cap = g.capacity
    new = _round_up(cap, multiple)
    if new == cap:
        return g
    pad = new - cap
    return Graph(
        row=jnp.concatenate([g.row, jnp.zeros((pad,), jnp.int32)]),
        col=jnp.concatenate([g.col, jnp.zeros((pad,), jnp.int32)]),
        weight=jnp.concatenate([g.weight, jnp.zeros((pad,), jnp.float32)]),
        mask=jnp.concatenate([g.mask, jnp.zeros((pad,), bool)]),
        num_nodes=g.num_nodes, rows_sorted=False)


def add_remaining_self_loops(g: Graph, fill_value: float) -> Graph:
    """Add a self loop to every node; existing loop weights are kept.

    Matches PyG ``add_remaining_self_loops`` as used by
    /root/reference/src/utils.py:63,113: existing self-loop slots are masked
    out and all N loops are appended, carrying either the pre-existing loop
    weight or ``fill_value``. Output capacity grows by num_nodes (this is
    one-off preprocessing; the grown capacity is static thereafter).
    """
    n = g.num_nodes
    is_loop = (g.row == g.col) & g.mask
    # weight each node's pre-existing loop carries (fill_value if none)
    loop_w = jnp.full((n,), fill_value, g.weight.dtype)
    loop_w = loop_w.at[jnp.where(is_loop, g.row, n)].set(
        jnp.where(is_loop, g.weight, 0.0), mode="drop")
    keep = g.mask & ~is_loop
    row = jnp.concatenate([g.row, jnp.arange(n, dtype=jnp.int32)])
    col = jnp.concatenate([g.col, jnp.arange(n, dtype=jnp.int32)])
    weight = jnp.concatenate([jnp.where(keep, g.weight, 0.0), loop_w])
    mask = jnp.concatenate([keep, jnp.ones((n,), bool)])
    return Graph(row=row, col=col, weight=weight, mask=mask, num_nodes=n)


# ---------------------------------------------------------------------------
# normalisations
# ---------------------------------------------------------------------------

def _masked_degree(index: jax.Array, weight: jax.Array, mask: jax.Array, n: int) -> jax.Array:
    w = jnp.where(mask, weight, 0.0)
    return jax.ops.segment_sum(w, index, num_segments=n)


def get_rw_adj(g: Graph, *, norm_dim: int = 1, fill_value: float = 0.0) -> Graph:
    """Random-walk normalisation (semantics of /root/reference/src/utils.py:105-123).

    With ``norm_dim==1`` the degree is accumulated over ``col`` and each weight
    is divided by deg[col]; with ``norm_dim==0`` over ``row`` / deg[row].
    ``fill_value > 0`` first adds remaining self loops with that weight.
    """
    if fill_value != 0.0:
        g = add_remaining_self_loops(g, fill_value)
    idx = g.row if norm_dim == 0 else g.col
    deg = _masked_degree(idx, g.weight, g.mask, g.num_nodes)
    deg_inv = jnp.where(deg > 0, 1.0 / jnp.where(deg > 0, deg, 1.0), 0.0)
    weight = jnp.where(g.mask, g.weight * deg_inv[idx], 0.0)
    return g.with_weight(weight)


def gcn_norm_fill_val(g: Graph, *, fill_value: float = 0.0) -> Graph:
    """Symmetric GCN normalisation D^-1/2 (A + fill·I) D^-1/2.

    Semantics of /root/reference/src/utils.py:55-72 (degree over ``col``).
    """
    if int(fill_value) != 0:
        g = add_remaining_self_loops(g, fill_value)
    deg = _masked_degree(g.col, g.weight, g.mask, g.num_nodes)
    dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.where(deg > 0, deg, 1.0)), 0.0)
    weight = jnp.where(g.mask, dis[g.row] * g.weight * dis[g.col], 0.0)
    return g.with_weight(weight)


# ---------------------------------------------------------------------------
# structure ops (static shape)
# ---------------------------------------------------------------------------

def coalesce(g: Graph) -> Graph:
    """Deduplicate edges, summing weights of duplicates, at fixed capacity.

    TPU-native replacement for torch_sparse.coalesce
    (/root/reference/src/graph_rewiring.py:98): sort packed (row, col) keys,
    segment-sum runs of equal keys into the first slot of each run, mask the
    rest. Jittable; output order is sorted by (row, col) with padding last.
    """
    n = g.num_nodes
    # lexicographic (row, col) sort with invalid slots pushed last — avoids
    # packing row*n+col into one integer (overflows int32 for large graphs)
    row_k = jnp.where(g.mask, g.row, n)
    col_k = jnp.where(g.mask, g.col, n)
    order = jnp.lexsort((col_k, row_k))
    w_s = g.weight[order]
    row_s = g.row[order]
    col_s = g.col[order]
    mask_s = g.mask[order]
    rk, ck = row_k[order], col_k[order]
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), (rk[1:] != rk[:-1]) | (ck[1:] != ck[:-1])])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1          # run id per slot
    summed = jax.ops.segment_sum(jnp.where(mask_s, w_s, 0.0), seg,
                                 num_segments=g.capacity)
    weight = jnp.where(is_new, summed[seg], 0.0)
    mask = mask_s & is_new
    return Graph(row=jnp.where(mask, row_s, 0), col=jnp.where(mask, col_s, 0),
                 weight=jnp.where(mask, weight, 0.0), mask=mask, num_nodes=n)


def to_undirected(g: Graph) -> Graph:
    """Append reversed edges and coalesce. Capacity doubles (preprocessing)."""
    row = jnp.concatenate([g.row, g.col])
    col = jnp.concatenate([g.col, g.row])
    weight = jnp.concatenate([g.weight, g.weight])
    mask = jnp.concatenate([g.mask, g.mask])
    return coalesce(Graph(row=row, col=col, weight=weight, mask=mask,
                          num_nodes=g.num_nodes))


def make_symmetric(g: Graph) -> Graph:
    """(A + A^T) / 2 at doubled capacity (graph_rewiring.py:93-105 semantics)."""
    row = jnp.concatenate([g.row, g.col])
    col = jnp.concatenate([g.col, g.row])
    weight = jnp.concatenate([g.weight, g.weight]) * 0.5
    mask = jnp.concatenate([g.mask, g.mask])
    return coalesce(Graph(row=row, col=col, weight=weight, mask=mask,
                          num_nodes=g.num_nodes))


# ---------------------------------------------------------------------------
# test / analysis helpers
# ---------------------------------------------------------------------------

def dense_adjacency(g: Graph) -> jax.Array:
    """[N, N] dense matrix with A[row, col] = weight (oracle for tests)."""
    n = g.num_nodes
    a = jnp.zeros((n, n), g.weight.dtype)
    return a.at[g.row, g.col].add(jnp.where(g.mask, g.weight, 0.0))


def dirichlet_energy(g: Graph, x: jax.Array) -> jax.Array:
    """0.5 * sum_e w_e ||x_row - x_col||^2 (graph_rewiring.py:108-113)."""
    d = x[g.row] - x[g.col]
    sq = jnp.sum(d * d, axis=-1)
    return 0.5 * jnp.sum(jnp.where(g.mask, g.weight * sq, 0.0))


def full_adjacency(num_nodes: int) -> Graph:
    """All-pairs edge list (utils.py:161-167; the n2_radius branch of
    add_edges, graph_rewiring.py:221-222)."""
    r = np.repeat(np.arange(num_nodes, dtype=np.int32), num_nodes)
    c = np.tile(np.arange(num_nodes, dtype=np.int32), num_nodes)
    return make_graph(r, c, None, num_nodes=num_nodes)


def graph_from_numpy_edge_index(edge_index: np.ndarray, edge_weight=None, *,
                                num_nodes: int, pad_multiple: int = 1) -> Graph:
    """Host-side constructor from a [2, E] numpy edge_index."""
    return make_graph(edge_index[0], edge_index[1], edge_weight,
                      num_nodes=num_nodes, pad_multiple=pad_multiple)
