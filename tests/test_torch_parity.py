"""Numerical parity against an independent torch replica of the reference.

torch (CPU) is available, so the subtlest reference semantics — the
SpGraphTransAttentionLayer head reshape/transpose order, the four score
types, softmax grouping by edge[attention_norm_idx], squareplus, and the
laplacian RHS — are replicated here in pure torch (mirroring
/root/reference/src/function_transformer_attention.py math, scatter softmax
written out by hand) and compared with this framework under IDENTICAL
weights. Agreement is required to ~f32 precision.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the torch oracle is a test-only dependency: stay collection-clean
# (and skip, not fail) in torch-less environments like the CPU CI
torch = pytest.importorskip("torch")

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.attention import (
    apply_transformer_attention,
    init_transformer_attention,
)
from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs
from graph_neural_pde_tpu.ops.graph import make_graph


def torch_scatter_softmax(src, index, n):
    """PyG softmax(src, index) replica: per-group max, exp, normalise."""
    smax = torch.full((n, src.shape[1]), -float("inf"))
    smax = smax.index_reduce(0, index, src, "amax", include_self=True)
    out = (src - smax[index]).exp()
    denom = torch.zeros((n, src.shape[1]))
    denom = denom.index_add(0, index, out)
    return out / (denom[index] + 1e-16)


def torch_squareplus(src, index, n):
    """utils.squareplus replica (global max, per-group normalise)."""
    out = src - src.max()
    out = (out + torch.sqrt(out ** 2 + 4)) / 2
    denom = torch.zeros((n, src.shape[1]))
    denom = denom.index_add(0, index, out)
    return out / (denom[index] + 1e-16)


def torch_attention(x, edge, w, cfg, n):
    """SpGraphTransAttentionLayer.forward replica
    (function_transformer_attention.py:173-214) in plain torch."""
    h, d_k = cfg.heads, cfg.attention_dim // cfg.heads
    q = x @ w["Q_w"] + w["Q_b"]
    k = x @ w["K_w"] + w["K_b"]
    # view(-1, h, d_k).transpose(1, 2) -> [N, d_k, h]
    q = q.view(-1, h, d_k).transpose(1, 2)
    k = k.view(-1, h, d_k).transpose(1, 2)
    src = q[edge[0]]                      # [E, d_k, h]
    dst = k[edge[1]]
    at = cfg.attention_type
    if at == "scaled_dot":
        prods = (src * dst).sum(dim=1) / math.sqrt(d_k)
    elif at == "exp_kernel":
        prods = w["output_var"] ** 2 * torch.exp(
            -((src - dst) ** 2).sum(dim=1) / (2 * w["lengthscale"] ** 2))
    elif at == "cosine_sim":
        cos = torch.nn.CosineSimilarity(dim=1, eps=1e-5)
        prods = cos(src, dst)
    elif at == "pearson":
        src = src - src.mean(dim=1, keepdim=True)
        dst = dst - dst.mean(dim=1, keepdim=True)
        cos = torch.nn.CosineSimilarity(dim=1, eps=1e-5)
        prods = cos(src, dst)
    idx = edge[cfg.attention_norm_idx]
    if cfg.square_plus:
        return torch_squareplus(prods, idx, n)
    return torch_scatter_softmax(prods, idx, n)


def setup(att_type="scaled_dot", square_plus=False, norm_idx=0, seed=0):
    rng = np.random.default_rng(seed)
    n, e, d = 25, 90, 12
    row = rng.integers(0, n, e).astype(np.int32)
    col = rng.integers(0, n, e).astype(np.int32)
    g = make_graph(row, col, None, num_nodes=n, capacity=e)
    cfg = Config(function="laplacian", hidden_dim=d, attention_dim=12,
                 heads=3, attention_type=att_type, square_plus=square_plus,
                 attention_norm_idx=norm_idx)
    x = rng.normal(size=(n, d)).astype(np.float32)
    params = init_transformer_attention(jax.random.PRNGKey(seed), cfg, d)
    # break the constant-1e-5 init so scores differ strongly
    for name, kk in (("Q", 1), ("K", 2), ("V", 3)):
        params[name]["w"] = 0.5 * jax.random.normal(
            jax.random.PRNGKey(kk), params[name]["w"].shape)
    return g, cfg, x, params, (row, col)


def torch_weights(params, cfg):
    w = {}
    for name in ("Q", "K"):
        w[f"{name}_w"] = torch.tensor(np.asarray(params[name]["w"]))
        w[f"{name}_b"] = torch.tensor(np.asarray(params[name]["b"]))
    if cfg.attention_type == "exp_kernel":
        w["output_var"] = torch.tensor(np.asarray(params["output_var"]))
        w["lengthscale"] = torch.tensor(np.asarray(params["lengthscale"]))
    return w


class TestAttentionParity:
    @pytest.mark.parametrize("att_type,square_plus,norm_idx", [
        ("scaled_dot", False, 0), ("scaled_dot", False, 1),
        ("scaled_dot", True, 1), ("cosine_sim", False, 0),
        ("pearson", False, 0), ("exp_kernel", False, 0),
        ("exp_kernel", True, 1),
    ])
    def test_attention_matches_torch(self, att_type, square_plus, norm_idx):
        g, cfg, x, params, (row, col) = setup(att_type, square_plus, norm_idx)
        ours, _ = apply_transformer_attention(params, cfg, jnp.asarray(x), g)
        edge = torch.tensor(np.stack([row, col]).astype(np.int64))
        theirs = torch_attention(torch.tensor(x), edge, torch_weights(params, cfg),
                                 cfg, g.num_nodes)
        np.testing.assert_allclose(np.asarray(ours),
                                   theirs.detach().numpy(),
                                   rtol=2e-4, atol=1e-6)


class TestLaplacianRHSParity:
    def test_rhs_and_euler_steps_match_torch(self):
        """Full GRAND-l step: frozen attention + alpha*(Ax−x) + beta*x0,
        three explicit euler steps, vs a torch loop."""
        g, cfg, x, params, (row, col) = setup("scaled_dot", True, 0)
        cfg = cfg.replace(block="attention", add_source=True)
        att, _ = apply_transformer_attention(params, cfg, jnp.asarray(x), g)
        aux = FuncAux(attention=att, x0=jnp.asarray(x), edge_weight=g.weight)
        fparams = {"alpha_train": jnp.asarray(0.3), "beta_train": jnp.asarray(0.2)}
        rhs = make_rhs(cfg, g)

        h = 0.1
        y = jnp.asarray(x)
        for _ in range(3):
            y = y + h * rhs(fparams, aux, 0.0, y)

        # torch replica
        att_t = torch.tensor(np.asarray(att)).mean(dim=1)
        edge = torch.tensor(np.stack([row, col]).astype(np.int64))
        yt = torch.tensor(x)
        x0t = torch.tensor(x)
        alpha = torch.sigmoid(torch.tensor(0.3))
        for _ in range(3):
            ax = torch.zeros_like(yt).index_add(
                0, edge[0], att_t[:, None] * yt[edge[1]])
            f = alpha * (ax - yt) + 0.2 * x0t
            yt = yt + h * f
        np.testing.assert_allclose(np.asarray(y), yt.numpy(),
                                   rtol=2e-4, atol=1e-5)
