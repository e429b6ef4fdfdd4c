"""graph_neural_pde_tpu — a TPU-native graph neural diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
twitter-research/graph-neural-pde (GRAND, ICML 2021; BLEND, NeurIPS 2021;
CGNN baseline): GNNs as continuous-time diffusion PDEs on graphs,

    dx/dt = f(x(t), G),   x(0) = encoder(features),

integrated with on-device, jittable ODE solvers and decoded to node logits.

Design stance (not a port):
  * every hot-path structure is static-shaped: padded edge arrays with
    validity masks instead of dynamically resized edge_index tensors;
  * solvers are pure functions built on lax.scan / lax.while_loop with
    carried NFE counters instead of Python loops raising exceptions;
  * sparse aggregation is gather + segment-sum (and fused Pallas kernels)
    instead of torch_sparse.spmm / torch_scatter;
  * multi-chip scaling is edge-sharded aggregation over a jax.sharding.Mesh
    with psum over ICI, instead of nn.DataParallel.
"""

__version__ = "0.1.0"

from graph_neural_pde_tpu.config import Config, best_params  # noqa: F401
from graph_neural_pde_tpu.ops.graph import Graph  # noqa: F401
