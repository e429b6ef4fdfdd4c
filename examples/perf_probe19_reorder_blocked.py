"""Probe 19: node reordering (ops/reorder.py) x blocked MXU kernels.

Question: how much does an RCM relabeling buy the pallas_blocked engine on
a community-structured graph, and where does that leave it vs the XLA
gather/segment-sum path?

Regime (the blocked engine's documented win case, spmm_blocked.py:20-26):
many node blocks, strong communities the size of a block, sparse
inter-community traffic — a kNN graph on low-dim embeddings or a clustered
mesh, NOT the uniform-random arxiv stand-in (where ops.spmm stays best and
nothing here applies). Under an arbitrary labeling each community sprays
across every block pair and the plan pays the one-chunk-per-bucket floor on
all blocks^2 buckets; RCM collapses it toward block-diagonal.

Run on TPU: python examples/perf_probe19_reorder_blocked.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.ops.graph import make_graph
from graph_neural_pde_tpu.ops.pallas.spmm_blocked import (
    make_plan_pair, make_spmm)
from graph_neural_pde_tpu.ops.reorder import (
    invert_order, plan_occupancy, rcm_order)
from graph_neural_pde_tpu.ops.spmm import spmm


def community_graph(n_comm=64, comm_size=1024, deg_in=6, n_inter=128,
                    seed=0):
    rng = np.random.default_rng(seed)
    n = n_comm * comm_size
    rows, cols = [], []
    for c in range(n_comm):
        lo = c * comm_size
        u = np.repeat(np.arange(lo, lo + comm_size), deg_in)
        v = lo + rng.integers(0, comm_size, size=comm_size * deg_in)
        rows.append(u), cols.append(v)
    rows.append(rng.integers(0, n, size=n_inter))
    cols.append(rng.integers(0, n, size=n_inter))
    row = np.concatenate(rows)
    col = np.concatenate(cols)
    keep = row != col
    row, col = row[keep], col[keep]
    row, col = np.concatenate([row, col]), np.concatenate([col, row])
    perm = rng.permutation(n)      # scrambled arrival labeling
    return perm[row], perm[col], n


def _sync(arr):
    # block_until_ready is unreliable over the axon tunnel: fetch 1 element
    _ = float(jax.device_get(arr.reshape(-1)[:1])[0])


def bench_fn(f, *args, reps=20):
    _sync(f(*args))
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    _sync(out)
    return (time.time() - t0) / reps * 1e3


def main():
    d = 128
    row, col, n = community_graph()
    e = row.shape[0]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = np.ones(e, np.float32)
    print(f"n={n} edges={e} d={d} device={jax.devices()[0].device_kind}")

    order = rcm_order(row, col, n)
    inv = invert_order(order)
    layouts = {"scrambled": (row, col), "rcm": (inv[row], inv[col])}

    results = {}
    for name, (r, c) in layouts.items():
        t0 = time.time()
        plans = make_plan_pair(r, c, w, num_nodes=n, block_n=1024,
                               chunk=1024)
        build_s = time.time() - t0
        occ = plan_occupancy(plans.fwd)
        fn = jax.jit(make_spmm(plans))
        x_pad = (x if plans.fwd.num_nodes == n else
                 jnp.pad(x, ((0, plans.fwd.num_nodes - n), (0, 0))))
        ms = bench_fn(fn, x_pad, jnp.asarray(plans.fwd.weight))
        results[name] = ms
        print(f"[{name}] chunks={occ['n_chunks']} buckets={occ['buckets']} "
              f"fill={occ['fill']:.3f} build={build_s:.1f}s "
              f"blocked_spmm={ms:.2f} ms ({e / ms / 1e3:.1f}M edge/s)")

    g = make_graph(layouts["rcm"][0], layouts["rcm"][1], w, num_nodes=n,
                   pad_multiple=1024)
    xla_fn = jax.jit(lambda xx: spmm(g, xx))
    ms_xla = bench_fn(xla_fn, x)
    print(f"[xla] gather/segment-sum spmm={ms_xla:.2f} ms "
          f"({e / ms_xla / 1e3:.1f}M edge/s)")
    print(f"reorder speedup on the blocked engine: "
          f"{results['scrambled'] / results['rcm']:.2f}x; "
          f"blocked(rcm) vs xla: {ms_xla / results['rcm']:.2f}x")


if __name__ == "__main__":
    main()
