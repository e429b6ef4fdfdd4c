"""Probe 9b: split the 38 ms pack_plus_gather into pack vs gather, and race
packing/gather variants.

Variants:
  pack_f32         current: f32 concat -> astype(bf16)        (baseline pack)
  pack_bf16        concat bf16 components directly
  gather_only      bf16 [n_pad, wpad] table -> [cap, wpad]    (pure gather)
  gather_split     3 separate gathers (q | ct_ax | aux)       vs one wide
  pack+gather cur  the exact bwd composition, jitted together
  pack+gather b16  bf16-native pack + gather, jitted together
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from bench import build_benchmark, _sync  # noqa: E402


def timeit(fn, *args, reps=10, label=""):
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / reps * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    model, params, state, x, g_raw, nf, nc = build_benchmark()
    g = model.graph
    plan = model.stripe_plan
    rng = np.random.default_rng(0)
    d, heads = 128, model.cfg.heads
    att = model.cfg.attention_dim
    hp = max(8, heads)
    n_pad = plan.num_nodes
    cap = plan.capacity
    print(f"n_pad={n_pad} cap={cap} att={att} heads={heads} hp={hp}")

    chunk = plan.chunk
    row_of_slot = (np.repeat(np.asarray(plan.chunk_rows), chunk)
                   * plan.block_n + np.asarray(plan.row_local))
    rowv_np = row_of_slot[np.asarray(plan.col_src_slot)]
    rowv_np = np.where(np.asarray(plan.col_plan.valid), rowv_np,
                       0).astype(np.int32)
    rowv = jnp.asarray(rowv_np)

    qw = jnp.asarray(rng.normal(size=(d, att)) * 0.1, jnp.float32)
    qb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
    xn = jnp.asarray(rng.normal(size=(n_pad, d)) * 0.5, jnp.float32)
    ct_ax = jnp.asarray(rng.normal(size=(n_pad, d)), jnp.float32)
    recip = jnp.asarray(rng.normal(size=(n_pad, heads)), jnp.float32)
    ct_den = jnp.asarray(rng.normal(size=(n_pad, hp)), jnp.float32)

    wbase = att + d + 2 * hp
    wpad = -(-wbase // 128) * 128
    print(f"wbase={wbase} wpad={wpad}  gather bytes={cap * wpad * 2 / 1e9:.2f} GB")

    def pack_f32(ct_ax, recip, ct_den, xn, qw, qb):
        xn_f = xn.astype(jnp.float32)
        q = xn_f @ qw + qb
        rpad = jnp.zeros((q.shape[0], hp - heads), jnp.float32)
        w_tab = jnp.concatenate(
            [q, ct_ax.astype(jnp.float32),
             jnp.concatenate([recip * (1.0 / heads), rpad], axis=1),
             ct_den], axis=1)
        if wpad > wbase:
            w_tab = jnp.concatenate(
                [w_tab, jnp.zeros((q.shape[0], wpad - wbase), jnp.float32)],
                axis=1)
        return w_tab.astype(jnp.bfloat16)

    def pack_bf16(ct_ax, recip, ct_den, xn, qw, qb):
        q = (xn @ qw + qb).astype(jnp.bfloat16)
        rpad = jnp.zeros((q.shape[0], hp - heads), jnp.bfloat16)
        parts = [q, ct_ax.astype(jnp.bfloat16),
                 (recip * (1.0 / heads)).astype(jnp.bfloat16), rpad,
                 ct_den.astype(jnp.bfloat16)]
        if wpad > wbase:
            parts.append(jnp.zeros((q.shape[0], wpad - wbase), jnp.bfloat16))
        return jnp.concatenate(parts, axis=1)

    timeit(jax.jit(pack_f32), ct_ax, recip, ct_den, xn, qw, qb,
           label="pack_f32 (alone)")
    timeit(jax.jit(pack_bf16), ct_ax, recip, ct_den, xn, qw, qb,
           label="pack_bf16 (alone)")
    w_tab = jax.jit(pack_bf16)(ct_ax, recip, ct_den, xn, qw, qb)

    timeit(jax.jit(lambda t: t[rowv]), w_tab, label="gather_only [cap,%d]b16" % wpad)

    q_tab = w_tab[:, :att]
    ctax_tab = w_tab[:, att:att + d]
    aux_tab = w_tab[:, att + d:att + d + 2 * hp]
    timeit(jax.jit(lambda a, b, c: (a[rowv], b[rowv], c[rowv])),
           q_tab, ctax_tab, aux_tab, label="gather_split 3x")

    def pg_cur(ct_ax, recip, ct_den, xn, qw, qb):
        return pack_f32(ct_ax, recip, ct_den, xn, qw, qb)[rowv]

    def pg_b16(ct_ax, recip, ct_den, xn, qw, qb):
        return pack_bf16(ct_ax, recip, ct_den, xn, qw, qb)[rowv]

    timeit(jax.jit(pg_cur), ct_ax, recip, ct_den, xn, qw, qb,
           label="pack_f32+gather (jit together)")
    timeit(jax.jit(pg_b16), ct_ax, recip, ct_den, xn, qw, qb,
           label="pack_bf16+gather (jit together)")

    # reference points: how fast IS a [cap] gather from a node table here?
    x16 = xn.astype(jnp.bfloat16)
    timeit(jax.jit(lambda t: t[rowv]), x16, label="gather [cap,128]b16 (ref)")
    x16w = jnp.concatenate([x16, x16], axis=1)
    timeit(jax.jit(lambda t: t[rowv]), x16w, label="gather [cap,256]b16 (ref)")


if __name__ == "__main__":
    main()


def barrier_variant():
    import jax
    import jax.numpy as jnp
    main_mod = sys.modules["__main__"]
