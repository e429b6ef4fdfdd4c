"""Pytree arithmetic for solvers.

ODE states are arbitrary pytrees (plain arrays, or tuples carrying
regulariser accumulators alongside the node features, mirroring the tuple
states of /root/reference/src/block_constant.py:40-43). All solver math is
expressed through these helpers so any state structure works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(s, a):
    return jax.tree_util.tree_map(lambda x: s * x, a)


def tree_axpy(s, x, y):
    """y + s * x"""
    return jax.tree_util.tree_map(lambda xi, yi: yi + s * xi, x, y)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_lincomb(coeffs, trees):
    """sum_i coeffs[i] * trees[i] — coefficients may be python or traced scalars."""
    out = tree_scale(coeffs[0], trees[0])
    for c, t in zip(coeffs[1:], trees[1:]):
        out = tree_axpy(c, t, out)
    return out


def tree_rms(a) -> jax.Array:
    """Root-mean-square over every element of the pytree.

    Matches torchdiffeq's state-wide rms norm (flatten-and-concat semantics,
    cf. /root/reference/src/utils.py:21-35).
    """
    leaves = jax.tree_util.tree_leaves(a)
    sq = sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)
    n = sum(x.size for x in leaves)
    return jnp.sqrt(sq / n)


def error_ratio(err, y0, y1, rtol: float, atol: float) -> jax.Array:
    """rms(err / (atol + rtol * max(|y0|, |y1|))) — torchdiffeq accept metric."""
    def scale(e, a, b):
        tol = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        return e / tol
    scaled = jax.tree_util.tree_map(scale, err, y0, y1)
    return tree_rms(scaled)
