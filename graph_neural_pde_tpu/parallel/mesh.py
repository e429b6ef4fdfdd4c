"""Multi-chip scaling: edge-sharded graph diffusion over a device mesh.

The reference's entire distribution story is nn.DataParallel over full-graph
replicas (/root/reference/src/ray_tune.py:65-66) — useless for one large
graph. The TPU-native design shards the *padded edge list* across the mesh
('edges' axis) while node states and parameters stay replicated:

  * per-edge work (gathers, attention scores, exp/softmax numerators) is
    shard-local and embarrassingly parallel;
  * per-node reductions (segment_sum / segment_max in SpMM and the edge
    softmax) become local partial reductions + an AllReduce over ICI, which
    XLA's SPMD partitioner inserts automatically from the sharding
    annotations — the graph analogue of sequence-parallel attention.

Because every op in ops/ is a plain XLA op with static shapes, annotating
inputs with NamedSharding is sufficient; no NCCL/MPI code exists anywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_neural_pde_tpu.ops.graph import Graph


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "edges") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def _edge_sharding(mesh: Mesh, axis_name: str = "edges") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def shard_graph(mesh: Mesh, g: Graph, axis_name: str = "edges") -> Graph:
    """Shard the padded edge arrays across the mesh; capacity must divide
    the mesh size (pad_multiple in make_graph guarantees this)."""
    n = mesh.devices.size
    assert g.capacity % n == 0, (
        f"edge capacity {g.capacity} not divisible by mesh size {n}; "
        f"rebuild the graph with pad_multiple={n}")
    esh = _edge_sharding(mesh, axis_name)
    return Graph(
        row=jax.device_put(g.row, esh),
        col=jax.device_put(g.col, esh),
        weight=jax.device_put(g.weight, esh),
        mask=jax.device_put(g.mask, esh),
        num_nodes=g.num_nodes,
    )
