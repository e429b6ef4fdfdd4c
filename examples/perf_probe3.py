"""TPU probe 3: mega-kernel tiling sweep + full train-step timing.

  A. fused RHS forward at stripe_block_n {128, 256} x chunk {1024, 2048}
  B. stripe laplacian spmm matvec vs XLA at arxiv scale
  C. full training step (fwd+bwd, rk4) wall clock
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from graph_neural_pde_tpu.config import Config                     # noqa
from graph_neural_pde_tpu.models.gnn import GNNModel               # noqa
from graph_neural_pde_tpu.ops.graph import make_graph              # noqa
from graph_neural_pde_tpu.training.train import Trainer            # noqa

N, E_DIR = 169_343, 1_166_243


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = float(jax.device_get(leaf.reshape(-1)[:1])[0])


def bench(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps


rng = np.random.default_rng(0)
row = rng.integers(0, N, size=E_DIR, dtype=np.int64)
col = rng.integers(0, N, size=E_DIR, dtype=np.int64)
row_u = np.concatenate([row, col]).astype(np.int32)
col_u = np.concatenate([col, row]).astype(np.int32)
g = make_graph(row_u, col_u, num_nodes=N, pad_multiple=1024)
x = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
print(f"device={jax.devices()[0]}", flush=True)

base = Config(
    dataset="arxiv-syn", block="constant", function="transformer",
    method="rk4", step_size=1.0, time=3.676, hidden_dim=128,
    attention_dim=32, heads=2, self_loop_weight=1.0, input_dropout=0.0,
    dropout=0.0, max_nfe=1000, stripe_fused=True,
    rhs_payload_dtype="bfloat16", dtype="bfloat16")

# ---- A: tiling sweep --------------------------------------------------------
for bn, ck in ((128, 2048), (256, 2048), (128, 1024)):
    try:
        cfg = base.replace(stripe_block_n=bn, stripe_chunk=ck)
        model = GNNModel(cfg, 128, 40, g)
        params, state = model.init(jax.random.PRNGKey(0))

        @jax.jit
        def fwd(p, xx):
            logits, _, stats, _ = model.apply(p, state, xx, training=False)
            return logits, stats["nfe"]

        dt = bench(fwd, params, x)
        nfe = int(jax.device_get(fwd(params, x)[1]))
        e_valid = int(jax.device_get(g.num_edges))
        print(f"A mega bn={bn} ck={ck}: fwd {dt*1e3:.1f} ms "
              f"({nfe*e_valid/dt/1e6:.1f}M edge·NFE/s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"A FAILED bn={bn} ck={ck}: {type(ex).__name__} "
              f"{str(ex)[:150]}", flush=True)

# ---- B: stripe laplacian matvec --------------------------------------------
from graph_neural_pde_tpu.models.blocks import (build_stripe_engine,  # noqa
                                                prepare_graph)
from graph_neural_pde_tpu.ops.spmm import make_stripe_spmm, spmm      # noqa

cfgl = base.replace(function="laplacian", block="constant")
gp = prepare_graph(cfgl, g)
g2, plan = build_stripe_engine(cfgl, gp)
f_st = make_stripe_spmm(g2, plan, jnp.bfloat16)
x_pad = jnp.pad(x, ((0, g2.num_nodes - N), (0, 0)))
d = bench(jax.jit(lambda xx: f_st(xx, g2.weight)), x_pad)
print(f"B stripe-spmm matvec: {d*1e3:.2f} ms", flush=True)
d = bench(jax.jit(lambda xx: spmm(g2, xx)), x_pad)
print(f"B xla-spmm matvec:    {d*1e3:.2f} ms", flush=True)

# ---- C: train step ----------------------------------------------------------
cfg = base.replace(stripe_block_n=128, stripe_chunk=2048)
model = GNNModel(cfg, 128, 40, g)
trainer = Trainer(model)
params, state = model.init(jax.random.PRNGKey(0))
opt_state = trainer.optimizer.init(params)
y = jnp.asarray(rng.integers(0, 40, N), jnp.int32)
mask = jnp.asarray(rng.random(N) < 0.5)


def step(p, s, o):
    return trainer._train_step(p, s, o, x, None, y, mask,
                               jax.random.PRNGKey(1))


out = step(params, state, opt_state)
_sync(out[3])
t0 = time.time()
for _ in range(3):
    out = step(params, state, opt_state)
_sync(out[3])
print(f"C train step (fwd+bwd, 16 NFE): {(time.time()-t0)/3*1e3:.0f} ms",
      flush=True)
print("DONE", flush=True)
