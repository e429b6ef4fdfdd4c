"""Explicit-collective edge-parallel aggregation (shard_map + psum).

The default multi-chip path lets XLA's SPMD partitioner derive the
collectives from sharding annotations (parallel.mesh). This module is the
*explicit* formulation of the same design — the graph analogue of
sequence-parallel attention (SURVEY.md §2b): each device owns a shard of the
padded edge list, computes partial per-node aggregates from its edges, and
the partials are summed over ICI with one psum.

Useful when you want manual control of the collective schedule (e.g. to
overlap the psum with the elementwise tail, or to extend to reduce_scatter
over node shards for very large node states).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from graph_neural_pde_tpu.ops.graph import Graph


def make_sharded_spmm(mesh: Mesh, g: Graph, axis_name: str = "edges"):
    """spmm_fn(x, w) -> A @ x with edges sharded over ``axis_name``.

    x and w are replicated inputs; each device gathers/aggregates only its
    edge shard and one psum over ICI produces the full [N, D] result on every
    device. Drop-in for the model's ``spmm_fn`` hook (models.blocks).
    """
    n = g.num_nodes

    def _shard_body(row, col, mask, x, w):
        wv = jnp.where(mask, w, 0.0)
        partial_sum = jax.ops.segment_sum(x[col] * wv[:, None], row,
                                          num_segments=n)
        return jax.lax.psum(partial_sum, axis_name)

    sharded = shard_map(
        _shard_body, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P(axis_name)),
        out_specs=P())

    def spmm_fn(x, w):
        return sharded(g.row, g.col, g.mask, x, w)

    return spmm_fn
