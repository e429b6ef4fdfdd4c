"""Positional encodings for BLEND: GDC diffusion PEs, DeepWalk, hyperbolic.

Re-implements the PE pipeline of /root/reference/src/graph_rewiring.py:244-342,
deepwalk_embeddings.py and pos_enc_factorisation.py:

  * apply_beltrami — load a cached encoding (the reference's
    ``{dataset}_{type}.pkl`` pickle format is read compatibly; new caches are
    written as .npz) or compute it
  * GDC PE — dense diffusion matrix rows/cols (rewiring.gdc)
  * DeepWalk PE — random-walk corpus + skip-gram with negative sampling
    trained in JAX (replacing PyG Node2Vec, deepwalk_embeddings.py:23-48)
  * NMF compression to ``embedding_dim`` for large graphs
    (pos_enc_factorisation.py:58-85)
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.ops.graph import Graph
from graph_neural_pde_tpu.rewiring.gdc import gdc_position_encoding


# ---------------------------------------------------------------------------
# DeepWalk (random walks + skip-gram negative sampling)
# ---------------------------------------------------------------------------

def random_walks(row: np.ndarray, col: np.ndarray, num_nodes: int, *,
                 walk_length: int = 20, walks_per_node: int = 10,
                 seed: int = 0) -> np.ndarray:
    """Uniform random walks over a CSR adjacency (host, vectorised numpy).

    Replaces torch_cluster's random-walk kernel used by PyG Node2Vec
    (the p=q=1 case the reference runs, deepwalk_embeddings.py:23-29).
    """
    order = np.argsort(row, kind="stable")
    col_sorted = col[order]
    deg = np.bincount(row, minlength=num_nodes)
    ptr = np.concatenate([[0], np.cumsum(deg)])
    rng = np.random.default_rng(seed)

    starts = np.tile(np.arange(num_nodes), walks_per_node)
    walks = np.empty((starts.shape[0], walk_length + 1), np.int64)
    walks[:, 0] = starts
    cur = starts
    for step in range(walk_length):
        d = deg[cur]
        offs = (rng.random(cur.shape[0]) * np.maximum(d, 1)).astype(np.int64)
        nxt = col_sorted[ptr[cur] + np.minimum(offs, np.maximum(d - 1, 0))]
        nxt = np.where(d > 0, nxt, cur)         # isolated nodes self-loop
        walks[:, step + 1] = nxt
        cur = nxt
    return walks


def deepwalk_embeddings(row, col, num_nodes: int, *, dim: int = 64,
                        walk_length: int = 20, walks_per_node: int = 10,
                        context: int = 5, negatives: int = 1,
                        epochs: int = 3, lr: float = 0.01, seed: int = 0
                        ) -> np.ndarray:
    """Skip-gram-with-negative-sampling embeddings trained in JAX."""
    from graph_neural_pde_tpu import runtime as native
    if native.available():
        walks = native.random_walks(np.asarray(row), np.asarray(col),
                                    num_nodes, walk_length=walk_length,
                                    walks_per_node=walks_per_node,
                                    seed=seed + 1)
    else:
        walks = random_walks(np.asarray(row), np.asarray(col), num_nodes,
                             walk_length=walk_length,
                             walks_per_node=walks_per_node, seed=seed)
    # (center, context) pairs within the window
    centers, contexts = [], []
    for off in range(1, context + 1):
        centers.append(walks[:, :-off].reshape(-1))
        contexts.append(walks[:, off:].reshape(-1))
    centers = np.concatenate(centers)
    contexts = np.concatenate(contexts)

    rng = np.random.default_rng(seed + 1)
    key = jax.random.PRNGKey(seed)
    emb_in = 0.1 * jax.random.normal(key, (num_nodes, dim))
    emb_out = jnp.zeros((num_nodes, dim))

    batch = 65536

    @jax.jit
    def step(emb_in, emb_out, c, ctx, neg):
        def loss_fn(ei, eo):
            vc = ei[c]
            pos = jnp.sum(vc * eo[ctx], axis=1)
            negd = jnp.einsum("bd,bkd->bk", vc, eo[neg])
            l_pos = -jnp.mean(jax.nn.log_sigmoid(pos))
            l_neg = -jnp.mean(jax.nn.log_sigmoid(-negd))
            return l_pos + l_neg

        g_in, g_out = jax.grad(loss_fn, argnums=(0, 1))(emb_in, emb_out)
        return emb_in - lr * g_in * num_nodes, emb_out - lr * g_out * num_nodes

    n_pairs = centers.shape[0]
    for _ in range(epochs):
        perm = rng.permutation(n_pairs)
        for s in range(0, n_pairs - batch + 1, batch):
            sel = perm[s:s + batch]
            neg = rng.integers(0, num_nodes, size=(batch, negatives))
            emb_in, emb_out = step(emb_in, emb_out,
                                   jnp.asarray(centers[sel]),
                                   jnp.asarray(contexts[sel]),
                                   jnp.asarray(neg))
    return np.asarray(emb_in, np.float32)


def nmf_compress(pe: np.ndarray, dim: int, seed: int = 0) -> np.ndarray:
    """Non-negative matrix factorisation compression of a dense PE
    (pos_enc_factorisation.py:58-85)."""
    from sklearn.decomposition import NMF
    model = NMF(n_components=dim, init="random", random_state=seed,
                max_iter=200)
    return model.fit_transform(np.maximum(pe, 0.0)).astype(np.float32)


# ---------------------------------------------------------------------------
# apply_beltrami
# ---------------------------------------------------------------------------

def apply_beltrami(g: Graph, cfg: Config, data_dir: Optional[str] = None,
                   node_order: Optional[np.ndarray] = None) -> np.ndarray:
    """Load-or-compute positional encodings (graph_rewiring.py:244-282).

    Reads the reference's pickle cache format when present
    (``{data_dir}/pos_encodings/{dataset}_{type}.pkl``; DW pickles store
    {'data': encodings}), otherwise computes GDC or DeepWalk encodings and
    caches them as .npz.

    ``node_order`` (ops/reorder.py, order[new_id] = old_id): disk-cached
    encodings are indexed by the ORIGINAL node ids, so a cfg.node_reorder
    relabeling must permute them on load; freshly computed encodings use
    the (already relabeled) graph and need nothing.
    """
    if data_dir:
        remap = ((lambda p: p[np.asarray(node_order)])
                 if node_order is not None else (lambda p: p))
        pkl = os.path.join(data_dir, "pos_encodings",
                           f"{cfg.dataset}_{cfg.pos_enc_type}.pkl")
        if os.path.exists(pkl):
            with open(pkl, "rb") as f:
                pe = pickle.load(f)
            if cfg.pos_enc_type.startswith("DW") and isinstance(pe, dict):
                pe = pe["data"]
            return remap(np.asarray(pe, np.float32))
        npz = pkl[:-4] + ".npz"
        if os.path.exists(npz):
            return remap(np.load(npz)["pe"].astype(np.float32))

    if cfg.pos_enc_type == "GDC":
        pe = np.asarray(gdc_position_encoding(g, cfg), np.float32)
    elif cfg.pos_enc_type.startswith("DW"):
        dim = int(cfg.pos_enc_type[2:] or 64)
        r = np.asarray(g.row)[np.asarray(g.mask)]
        c = np.asarray(g.col)[np.asarray(g.mask)]
        pe = deepwalk_embeddings(r, c, g.num_nodes, dim=dim, seed=cfg.seed)
    else:
        raise ValueError(
            f"The positional encoding type you specified "
            f"({cfg.pos_enc_type}) does not exist")

    if data_dir and node_order is None:
        # a node_reorder run computes PEs in RELABELED order — caching them
        # under the dataset name would poison later unreordered loads
        os.makedirs(os.path.join(data_dir, "pos_encodings"), exist_ok=True)
        np.savez(os.path.join(data_dir, "pos_encodings",
                              f"{cfg.dataset}_{cfg.pos_enc_type}.npz"), pe=pe)
    return pe
