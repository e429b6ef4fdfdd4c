"""Segment (per-node) reductions over padded edge arrays.

TPU-native replacements for the torch_scatter / PyG kernels the reference's
hot path runs on:
  * ``segment_softmax``   — PyG ``softmax(src, index)`` used for edge-wise
    attention normalisation (/root/reference/src/function_transformer_attention.py:213,
    function_GAT_attention.py:114)
  * ``segment_squareplus``— ``squareplus`` (/root/reference/src/utils.py:179-208)
  * ``segment_sum/max/mean`` — torch_scatter.scatter(..., reduce=...)

All functions take a validity ``mask`` so padded edge slots never contribute,
and all shapes are static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(values: jax.Array, index: jax.Array, num_segments: int,
                mask: jax.Array | None = None) -> jax.Array:
    if mask is not None:
        shape = mask.shape + (1,) * (values.ndim - mask.ndim)
        values = jnp.where(mask.reshape(shape), values, 0)
    return jax.ops.segment_sum(values, index, num_segments=num_segments)


def segment_max(values: jax.Array, index: jax.Array, num_segments: int,
                mask: jax.Array | None = None) -> jax.Array:
    neg_inf = jnp.array(-jnp.inf, values.dtype)
    if mask is not None:
        shape = mask.shape + (1,) * (values.ndim - mask.ndim)
        values = jnp.where(mask.reshape(shape), values, neg_inf)
    return jax.ops.segment_max(values, index, num_segments=num_segments)


def segment_mean(values: jax.Array, index: jax.Array, num_segments: int,
                 mask: jax.Array | None = None) -> jax.Array:
    s = segment_sum(values, index, num_segments, mask)
    ones = jnp.ones(index.shape, values.dtype)
    cnt = segment_sum(ones, index, num_segments, mask)
    cnt = jnp.maximum(cnt, 1.0)
    return s / cnt.reshape(cnt.shape + (1,) * (s.ndim - cnt.ndim))


def segment_softmax(scores: jax.Array, index: jax.Array, num_segments: int,
                    mask: jax.Array | None = None) -> jax.Array:
    """Numerically stable per-segment softmax over edges.

    ``scores`` is [E] or [E, H]; the softmax is over all edges sharing
    ``index[e]``. Padded edges (mask False) get probability 0 and do not
    affect the normalisation. Matches PyG ``softmax(src, index)``.

    """
    if mask is not None:
        shape = mask.shape + (1,) * (scores.ndim - mask.ndim)
        scores = jnp.where(mask.reshape(shape), scores, -jnp.inf)
    smax = segment_max(scores, index, num_segments)
    # empty segments have max -inf; guard the gather
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.exp(scores - smax[index])
    if mask is not None:
        shape = mask.shape + (1,) * (scores.ndim - mask.ndim)
        ex = jnp.where(mask.reshape(shape), ex, 0.0)
    denom = jax.ops.segment_sum(ex, index, num_segments=num_segments)
    return ex / (denom[index] + 1e-16)


def segment_squareplus(scores: jax.Array, index: jax.Array, num_segments: int,
                       mask: jax.Array | None = None) -> jax.Array:
    """Squareplus-normalised attention (semantics of /root/reference/src/utils.py:179-208).

    out = (s - max(s) + sqrt((s - max(s))^2 + 4)) / 2, normalised per segment.
    The max is *global* (over all valid edges), exactly as in the reference.
    """
    if mask is not None:
        shape = mask.shape + (1,) * (scores.ndim - mask.ndim)
        gmax = jnp.max(jnp.where(mask.reshape(shape), scores, -jnp.inf))
    else:
        gmax = jnp.max(scores)
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    out = scores - gmax
    out = (out + jnp.sqrt(out * out + 4.0)) / 2.0
    if mask is not None:
        shape = mask.shape + (1,) * (scores.ndim - mask.ndim)
        out = jnp.where(mask.reshape(shape), out, 0.0)
    denom = jax.ops.segment_sum(out, index, num_segments=num_segments)
    return out / (denom[index] + 1e-16)


def normalize_attention(att: jax.Array, index: jax.Array, num_segments: int,
                        mask: jax.Array | None = None) -> jax.Array:
    """att / (segment_sum(att)[index] + 1e-16).

    The renormalisation used after hard-attention edge subsampling
    (/root/reference/src/block_transformer_hard_attention.py:43-46).
    """
    if mask is not None:
        shape = mask.shape + (1,) * (att.ndim - mask.ndim)
        att = jnp.where(mask.reshape(shape), att, 0.0)
    s = jax.ops.segment_sum(att, index, num_segments=num_segments)
    return att / (s[index] + 1e-16)
