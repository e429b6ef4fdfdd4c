"""TPU microbenchmarks for the fused-RHS redesign (round 2).

Measures, on the real chip:
  A. XLA random gather cost vs width and dtype (is it really width-free?)
  B. XLA sorted segment-sum (scatter side) for reference
  C. stripe scatter/gather with on-the-fly one-hot at block_n 1024/256/128
  D. stripe scatter/gather with PRECOMPUTED bf16 one-hot (plan is static!)

Prints one line per datapoint; flushes immediately so a Mosaic fault in a
later experiment doesn't lose earlier numbers.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 169_343
E = 2_332_486
SEED = 0


def _sync(out):
    # force a host fetch of ONE element: block_until_ready is unreliable over
    # the tunnel, and fetching the full array would move hundreds of MB
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jax.device_get(leaf.reshape(-1)[:1])[0])


def bench(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps


def report(name, dt):
    print(f"{name}: {dt*1e3:.2f} ms  ({dt/E*1e9:.2f} ns/edge)", flush=True)


rng = np.random.default_rng(SEED)
row = np.sort(rng.integers(0, N, size=E).astype(np.int32))
col = rng.integers(0, N, size=E).astype(np.int32)
row_d = jnp.asarray(row)
col_d = jnp.asarray(col)

print(f"device={jax.devices()[0]}", flush=True)

# ---- A: XLA random gather, width/dtype sweep ------------------------------
for width in (64, 128, 192, 256):
    for dt_ in (jnp.float32, jnp.bfloat16):
        tab = jnp.asarray(rng.normal(size=(N, width)), dt_)
        f = jax.jit(lambda t, c: jnp.take(t, c, axis=0))
        d = bench(f, tab, col_d)
        report(f"A xla-gather w={width} {dt_.__name__}", d)

# ---- B: XLA sorted segment-sum ---------------------------------------------
for width in (128, 258):
    vals = jnp.asarray(rng.normal(size=(E, width)), jnp.float32)
    f = jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=N, indices_are_sorted=True))
    d = bench(f, vals, row_d)
    report(f"B xla-segsum w={width} f32", d)

# ---- C/D: stripe kernels ----------------------------------------------------
sys.path.insert(0, "/root/repo")
from graph_neural_pde_tpu.ops.pallas.stripe import (  # noqa: E402
    build_stripe_plan, _stripe_gather_call, _stripe_scatter_call)


def precomp_onehot_scatter(plan, onehot, vals, block_n, chunk, nc, d):
    """Scatter with precomputed bf16 one-hot [capacity, block_n]."""
    def kernel(cr_ref, p_ref, v_ref, o_ref):
        i = pl.program_id(0)
        prev = cr_ref[jnp.maximum(i - 1, 0)]

        @pl.when((i == 0) | (cr_ref[i] != prev))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jax.lax.dot_general(
            p_ref[:], v_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk, block_n), lambda i, cr: (i, 0)),
            pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_nodes, d), jnp.float32),
    )(jnp.asarray(plan.chunk_rows), onehot, vals)


def precomp_onehot_gather(plan, onehot, table, block_n, chunk, nc, d):
    def kernel(cr_ref, p_ref, t_ref, o_ref):
        o_ref[:] = jnp.dot(p_ref[:], t_ref[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk, block_n), lambda i, cr: (i, 0)),
            pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),
        ],
        out_specs=pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.capacity, d), jnp.float32),
    )(jnp.asarray(plan.chunk_rows), onehot, table)


def make_onehot(plan):
    """bf16 one-hot [capacity, block_n] built on device from the plan."""
    rl = jnp.asarray(plan.row_local)
    v = jnp.asarray(plan.valid)
    iota = jnp.arange(plan.block_n, dtype=jnp.int32)
    return ((rl[:, None] == iota[None, :]) & v[:, None]).astype(jnp.bfloat16)


for block_n, chunk in ((1024, 1024), (256, 1024), (128, 1024), (128, 512)):
    try:
        plan = build_stripe_plan(row, num_nodes=N, block_n=block_n,
                                 chunk=chunk)
        pad_frac = plan.capacity / E - 1
        for width in (128, 258):
            vals = jnp.asarray(
                rng.normal(size=(plan.capacity, width)) *
                plan.valid[:, None], jnp.float32)
            tab = jnp.asarray(rng.normal(size=(plan.num_nodes, width)),
                              jnp.float32)
            f = jax.jit(lambda v: _stripe_scatter_call(plan, v,
                                                       interpret=False))
            d = bench(f, vals)
            report(f"C stripe-scatter bn={block_n} ck={chunk} w={width} "
                   f"(pad {pad_frac:.1%})", d)
            g = jax.jit(lambda t: _stripe_gather_call(plan, t,
                                                      interpret=False))
            d = bench(g, tab)
            report(f"C stripe-gather  bn={block_n} ck={chunk} w={width}", d)

            onehot = make_onehot(plan)
            jax.block_until_ready(onehot)
            fs = jax.jit(functools.partial(
                precomp_onehot_scatter, plan, block_n=block_n, chunk=chunk,
                nc=plan.n_chunks, d=width))
            d = bench(fs, onehot, vals)
            report(f"D precomp-scatter bn={block_n} ck={chunk} w={width}", d)
            fg = jax.jit(functools.partial(
                precomp_onehot_gather, plan, block_n=block_n, chunk=chunk,
                nc=plan.n_chunks, d=width))
            d = bench(fg, onehot, tab)
            report(f"D precomp-gather  bn={block_n} ck={chunk} w={width}", d)
    except Exception as e:  # noqa: BLE001
        print(f"FAILED bn={block_n} ck={chunk}: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

print("DONE", flush=True)
