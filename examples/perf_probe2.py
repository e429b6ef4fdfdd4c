"""TPU probe 2: scatter width/alignment/chunk variants + col-side redesign.

Decides the fused-RHS v2 engine:
  A. stripe scatter: chunk scaling (grid overhead?) and width alignment
     (258 vs 256 vs 384-padded vs split 256+8)
  B. col side: gather x[E,128] then project k_e = gathered @ K (vs packed
     192-wide gather), f32 and bf16
  C. normalize-first factorization: scatter u [E,8] -> den, stripe-gather
     den back, single [E,128] scatter
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from graph_neural_pde_tpu.ops.pallas.stripe import (  # noqa: E402
    build_stripe_plan, _stripe_scatter_call, _stripe_gather_call)

N = 169_343
E = 2_332_486
SEED = 0


def _sync(out):
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
col = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
print(f"device={jax.devices()[0]}", flush=True)

# ---- A: scatter chunk/width variants ---------------------------------------
for block_n, chunk in ((128, 2048), (128, 4096), (256, 2048), (256, 4096)):
    try:
        plan = build_stripe_plan(row, num_nodes=N, block_n=block_n,
                                 chunk=chunk)
        pad = plan.capacity / E - 1
        for width in (128, 256, 258):
            vals = jnp.asarray(rng.normal(size=(plan.capacity, width)) *
                               plan.valid[:, None], jnp.float32)
            f = jax.jit(lambda v: _stripe_scatter_call(plan, v,
                                                       interpret=False))
            d = bench(f, vals)
            report(f"A scat bn={block_n} ck={chunk} w={width} "
                   f"(pad {pad:.0%})", d)
    except Exception as e:  # noqa: BLE001
        print(f"A FAILED bn={block_n} ck={chunk}: {type(e).__name__} "
              f"{str(e)[:150]}", flush=True)

plan = build_stripe_plan(row, num_nodes=N, block_n=128, chunk=2048)

# split: 256-wide numerators + 8-wide denominators (two pallas calls)
v256 = jnp.asarray(rng.normal(size=(plan.capacity, 256)) *
                   plan.valid[:, None], jnp.float32)
v8 = jnp.asarray(rng.normal(size=(plan.capacity, 8)) *
                 plan.valid[:, None], jnp.float32)


@jax.jit
def split_scatter(a, b):
    return (_stripe_scatter_call(plan, a, interpret=False),
            _stripe_scatter_call(plan, b, interpret=False))


d = bench(split_scatter, v256, v8)
report("A split-scatter 256+8 bn=128 ck=2048", d)

# 384-padded single scatter
v384 = jnp.concatenate([v256, jnp.zeros((plan.capacity, 128), jnp.float32)],
                       axis=1)
f384 = jax.jit(lambda v: _stripe_scatter_call(plan, v, interpret=False))
d = bench(f384, v384)
report("A scat-padded w=384 bn=128 ck=2048", d)

# bf16 input payload
v258 = jnp.asarray(rng.normal(size=(plan.capacity, 258)) *
                   plan.valid[:, None], jnp.bfloat16)
f258b = jax.jit(lambda v: _stripe_scatter_call(plan, v, interpret=False))
d = bench(f258b, v258)
report("A scat w=258 bf16-payload bn=128 ck=2048", d)

# ---- B: col side — gather+project vs packed gather -------------------------
for dt_ in (jnp.float32, jnp.bfloat16):
    x = jnp.asarray(rng.normal(size=(N, 128)), dt_)
    K = jnp.asarray(rng.normal(size=(128, 64)) * 0.1, dt_)

    @jax.jit
    def gather_project(x, K, c):
        g = jnp.take(x, c, axis=0)          # [E, 128]
        k_e = g @ K                          # [E, 64]
        return g, k_e

    d = bench(gather_project, x, K, col)
    report(f"B gather128+project {dt_.__name__}", d)

    pack = jnp.concatenate([jnp.asarray(rng.normal(size=(N, 64)), dt_), x],
                           axis=1)
    fp = jax.jit(lambda p, c: jnp.take(p, c, axis=0))
    d = bench(fp, pack, col)
    report(f"B packed-gather192 {dt_.__name__}", d)

# ---- C: normalize-first factorization --------------------------------------
H = 2
u = jnp.asarray(np.abs(rng.normal(size=(plan.capacity, 8))) *
                plan.valid[:, None], jnp.float32)   # H=2 padded to 8
xg = jnp.asarray(rng.normal(size=(plan.capacity, 128)), jnp.float32)


@jax.jit
def normalize_first(u, xg):
    den = _stripe_scatter_call(plan, u, interpret=False)       # [N, 8]
    den_e = _stripe_gather_call(plan, den, interpret=False)    # [E, 8]
    w = jnp.mean(u[:, :H] / (den_e[:, :H] + 1e-16), axis=1)    # [E]
    return _stripe_scatter_call(plan, w[:, None] * xg, interpret=False)


d = bench(normalize_first, u, xg)
report("C normalize-first (scat8 + gath8 + scat128)", d)

print("DONE", flush=True)
