"""Functional NN primitives: linear layers, batch norm, dropout.

Parameter initialisation reproduces the torch defaults the reference relies
on (weights and bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for nn.Linear;
constant 1e-5 attention weights at
/root/reference/src/function_transformer_attention.py:122-126; xavier-normal
gain 1.414 for the GAT layer at function_GAT_attention.py:94-101).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear_init(key, in_dim: int, out_dim: int, mode: str = "torch"):
    """Params {'w': [in,out], 'b': [out]} for y = x @ w + b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(max(in_dim, 1))
    if mode == "torch":
        w = jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound)
    elif mode == "const1e-5":
        w = jnp.full((in_dim, out_dim), 1e-5, jnp.float32)
    elif mode == "xavier_normal_1.414":
        std = 1.414 * math.sqrt(2.0 / (in_dim + out_dim))
        w = std * jax.random.normal(kw, (in_dim, out_dim), jnp.float32)
    else:
        raise ValueError(mode)
    b = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def linear_apply(p, x):
    return x @ p["w"] + p["b"]


def dropout(key, x, rate: float, training: bool):
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# batch norm over nodes (torch BatchNorm1d semantics, momentum 0.1, eps 1e-5)
# ---------------------------------------------------------------------------

def bn_init(dim: int):
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,)),
             "count": jnp.zeros(())}
    return params, state


def bn_apply(params, state, x, training: bool, momentum: float = 0.1,
             eps: float = 1e-5):
    """Returns (y, new_state)."""
    if training:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"], new_state
