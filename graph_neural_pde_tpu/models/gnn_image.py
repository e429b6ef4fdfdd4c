"""GNN_image: diffusion on pixel-grid graphs with per-image decoding.

Re-design of /root/reference/src/GNN_image.py: pixel intensities diffuse
directly on the grid graph (no encoder projection — GNN_image.forward never
applies m1), then every image's node states flatten into one vector decoded
by a single linear head. ``forward_plot_T`` / ``forward_plot_path`` expose
the diffusion trajectory for visualisation (GNN_image.py:49-94).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.blocks import block_forward, init_block, prepare_graph
from graph_neural_pde_tpu.models.layers import dropout, linear_apply, linear_init
from graph_neural_pde_tpu.ops.graph import Graph


class GNNImageModel:
    def __init__(self, cfg: Config, graph: Graph, im_height: int,
                 im_width: int, im_chan: int, num_classes: int,
                 batch_size: int):
        # the ODE state width is the channel count (pixels diffuse raw)
        self.cfg = cfg.replace(hidden_dim=im_chan)
        from graph_neural_pde_tpu.models.blocks import build_spmm_engine
        self.graph, self.spmm_fn = build_spmm_engine(
            self.cfg, prepare_graph(self.cfg, graph))
        self.h, self.w, self.c = im_height, im_width, im_chan
        self.num_classes = num_classes
        self.batch_size = batch_size

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params = {
            "m2": linear_init(k1, self.h * self.w * self.c, self.num_classes),
            "block": init_block(k2, self.cfg, self.c),
        }
        return params, {}

    def _diffuse(self, params, x, training, rng):
        x = dropout(rng, x, self.cfg.input_dropout, training)
        n = x.shape[0]
        if self.graph.num_nodes > n:   # plan layout pads the node count
            import jax.numpy as jnp
            x = jnp.pad(x, ((0, self.graph.num_nodes - n), (0, 0)))
        z, stats, regs = block_forward(params["block"], self.cfg, self.graph,
                                       x, training, spmm_fn=self.spmm_fn)
        return z[:n], stats, regs

    def apply(self, params, state, x, training=False,
              rng: Optional[jax.Array] = None):
        """x: [batch·H·W, C] pixel features -> [batch, num_classes] logits."""
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        z, stats, regs = self._diffuse(params, x, training, k1)
        z = jax.nn.relu(z)
        z = dropout(k2, z, cfg.dropout, training)
        z = z.reshape(self.batch_size, self.h * self.w * self.c)
        return linear_apply(params["m2"], z), state, stats, regs

    def forward_plot_T(self, params, x, rng=None):
        """Diffused pixel states at t=T, flattened per image."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        z, _, _ = self._diffuse(params, x, False, rng)
        z = jax.nn.relu(z)
        return z.reshape(self.batch_size, self.h * self.w * self.c)

    def forward_plot_path(self, params, x, frames: int, rng=None):
        """Stitched diffusion trajectory: frames+1 snapshots per image."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        z = dropout(rng, x, self.cfg.input_dropout, False)
        paths = [z.reshape(self.batch_size, -1)]
        for _ in range(frames):
            z, _, _ = block_forward(params["block"], self.cfg, self.graph, z,
                                    False)
            z = jax.nn.relu(z)
            paths.append(z.reshape(self.batch_size, -1))
        return jnp.stack(paths, axis=1)
