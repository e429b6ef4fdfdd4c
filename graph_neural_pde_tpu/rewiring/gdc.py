"""Graph Diffusion Convolution (GDC / DIGL) rewiring and positional encodings.

Re-implements the PyG GDC machinery the reference drives through
graph_rewiring.apply_gdc (/root/reference/src/graph_rewiring.py:51-90) and
GDCWrapper.position_encoding (graph_rewiring.py:345-401), plus the exact
PPR/heat matrices of DIGL_data.py:126-160 — on device with jnp:

  * transition matrices: 'sym' D^-1/2 A D^-1/2 and 'col' A D^-1
  * exact diffusion: PPR  α(I − (1−α)T)^-1   and  heat  exp(t(T − I))
  * approximate PPR via power iteration (for graphs too large to invert)
  * sparsification: per-column top-k or global threshold

Dense N×N math — exactly like the reference's 'exact' path — so intended for
the citation-scale graphs it is used on.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.ops.graph import Graph, dense_adjacency, make_graph


def _add_self_loops_dense(a: jnp.ndarray, w: float) -> jnp.ndarray:
    return a + w * jnp.eye(a.shape[0], dtype=a.dtype)


def transition_matrix(a: jnp.ndarray, normalization: str) -> jnp.ndarray:
    deg = jnp.sum(a, axis=0)
    if normalization == "sym":
        dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.where(deg > 0, deg, 1.0)), 0.0)
        return dis[:, None] * a * dis[None, :]
    if normalization == "col":
        dinv = jnp.where(deg > 0, 1.0 / jnp.where(deg > 0, deg, 1.0), 0.0)
        return a * dinv[None, :]
    if normalization == "row":
        deg_r = jnp.sum(a, axis=1)
        dinv = jnp.where(deg_r > 0, 1.0 / jnp.where(deg_r > 0, deg_r, 1.0), 0.0)
        return dinv[:, None] * a
    raise ValueError(normalization)


def exact_ppr_matrix(t_mat: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """α (I − (1−α) T)^-1 (DIGL_data.py:126-133 / PyG diffusion_matrix_exact)."""
    n = t_mat.shape[0]
    return alpha * jnp.linalg.inv(jnp.eye(n) - (1.0 - alpha) * t_mat)


def exact_heat_matrix(t_mat: jnp.ndarray, t: float) -> jnp.ndarray:
    """exp(t (T − I)) (DIGL_data.py:136-143)."""
    n = t_mat.shape[0]
    return jax.scipy.linalg.expm(t * (t_mat - jnp.eye(n)))


def approx_ppr_matrix(t_mat: jnp.ndarray, alpha: float, iters: int = 64
                      ) -> jnp.ndarray:
    """Power-iteration PPR: S_{k+1} = αI + (1−α) T S_k (dense, jittable)."""
    n = t_mat.shape[0]
    eye = jnp.eye(n)

    def body(_, s):
        return alpha * eye + (1.0 - alpha) * t_mat @ s

    return jax.lax.fori_loop(0, iters, body, eye)


def sparsify_topk(mat: jnp.ndarray, k: int, dim: int = 0) -> jnp.ndarray:
    """Keep the top-k entries along ``dim`` (PyG sparsify_dense 'topk')."""
    if dim == 0:
        vals = jax.lax.top_k(mat.T, k)[0][:, -1]      # kth largest per column
        return jnp.where(mat >= vals[None, :], mat, 0.0)
    vals = jax.lax.top_k(mat, k)[0][:, -1]
    return jnp.where(mat >= vals[:, None], mat, 0.0)


def sparsify_threshold(mat: jnp.ndarray, eps: float) -> jnp.ndarray:
    return jnp.where(mat >= eps, mat, 0.0)


def diffusion_dense(g: Graph, cfg: Config) -> jnp.ndarray:
    """Self-loops → 'sym' transition → exact/approx diffusion (dense)."""
    a = dense_adjacency(g)
    if cfg.self_loop_weight:
        a = _add_self_loops_dense(a, cfg.self_loop_weight)
    t_in = transition_matrix(a, "sym")
    if cfg.gdc_method == "ppr":
        if cfg.exact:
            s = exact_ppr_matrix(t_in, cfg.ppr_alpha)
        else:
            s = approx_ppr_matrix(t_in, cfg.ppr_alpha)
    elif cfg.gdc_method == "heat":
        s = exact_heat_matrix(t_in, cfg.heat_time)
    else:
        raise ValueError(f"unknown gdc_method {cfg.gdc_method}")
    return s


def apply_gdc(g: Graph, cfg: Config, *, pad_multiple: int = 1) -> Graph:
    """GDC rewiring: diffuse, sparsify, col-normalise — returns a new Graph
    (apply_gdc 'combined' semantics, graph_rewiring.py:51-90)."""
    s = diffusion_dense(g, cfg)
    if cfg.gdc_sparsification == "topk":
        s = sparsify_topk(s, cfg.gdc_k, dim=0)
    else:
        s = sparsify_threshold(s, cfg.gdc_threshold)
    s = transition_matrix(s, "col")
    r, c = np.nonzero(np.asarray(s))
    w = np.asarray(s)[r, c]
    return make_graph(r.astype(np.int32), c.astype(np.int32), w,
                      num_nodes=g.num_nodes, pad_multiple=pad_multiple)


def gdc_position_encoding(g: Graph, cfg: Config) -> jnp.ndarray:
    """Dense diffusion matrix as positional encodings — *not* sparsified
    (GDCWrapper.position_encoding, graph_rewiring.py:363-401). Row or column
    orientation per cfg.pos_enc_orientation (apply_gdc type='pos_encoding')."""
    s = diffusion_dense(g, cfg)
    s = transition_matrix(s, "col")
    return s if cfg.pos_enc_orientation == "row" else s.T


def two_hop(g: Graph, *, pad_multiple: int = 1) -> Graph:
    """Add 2-hop edges (TwoHop transform, graph_rewiring.py:43-48).

    Host scipy sparse product — the reference's torch_sparse.spspmm analogue;
    preprocessing only, never on the hot path.
    """
    import scipy.sparse as sp
    r = np.asarray(g.row)[np.asarray(g.mask)]
    c = np.asarray(g.col)[np.asarray(g.mask)]
    n = g.num_nodes
    a = sp.coo_matrix((np.ones(len(r)), (r, c)), shape=(n, n)).tocsr()
    a2 = (a @ a).tocoo()
    rows = np.concatenate([r, a2.row])
    cols = np.concatenate([c, a2.col])
    keep = rows != cols                                    # TwoHop drops loops
    key = rows[keep] * n + cols[keep]
    _, idx = np.unique(key, return_index=True)
    rr, cc = rows[keep][idx], cols[keep][idx]
    return make_graph(rr.astype(np.int32), cc.astype(np.int32), None,
                      num_nodes=n, pad_multiple=pad_multiple)
