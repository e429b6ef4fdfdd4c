"""Headline benchmark: GRAND-nl edge throughput at ogbn-arxiv scale.

Measures the framework's hot path — the transformer-attention ODE RHS
(multihead attention recomputed every solver step + SpMM aggregation,
/root/reference/src/function_transformer_attention.py:38-53) — on a graph
sized like ogbn-arxiv (169,343 nodes, ~2.33M directed edges after
symmetrisation + self loops) with the tuned arxiv widths
(hidden 162→128-aligned, attention_dim 32, heads 2; best_params.py:7).

Metric: edge-updates per second × NFE (BASELINE.md), i.e. valid edges / mean
RHS-evaluation time. vs_baseline is the ratio against 1.5e8 edge·NFE/s — an
estimate of the reference stack (torchdiffeq + torch_sparse + PyG
scatter-softmax) on a V100-class GPU: ~1.3 GB of gather traffic + scatter
atomics + two score gathers + scatter softmax per RHS eval ≈ 15-25 ms at
2.5M edges. The reference publishes no numbers (BASELINE.md), so this is the
fairest stand-in we can state; single-chip TPU sparse ops are index-latency
bound (~10 ns/edge/op), and the framework's path to the ≥10× target is the
edge-sharded multi-chip design (latency-bound work scales linearly with
chips) plus the Chebyshev expm solver (5-20× fewer matvecs per solve on
every tuned config — see solvers/chebyshev.py).

Prints ONE JSON line to stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_benchmark(num_nodes=169_343, num_edges=1_166_243, hidden=128,
                    attention_dim=32, heads=2, seed=0):
    from graph_neural_pde_tpu.config import Config
    from graph_neural_pde_tpu.models.gnn import GNNModel
    from graph_neural_pde_tpu.ops.graph import make_graph
    from graph_neural_pde_tpu.data.synthetic import NodeDataset

    rng = np.random.default_rng(seed)
    row = rng.integers(0, num_nodes, size=num_edges, dtype=np.int64)
    col = rng.integers(0, num_nodes, size=num_edges, dtype=np.int64)
    # symmetrise like data.py:90-94 (to_undirected)
    row_u = np.concatenate([row, col]).astype(np.int32)
    col_u = np.concatenate([col, row]).astype(np.int32)

    g = make_graph(row_u, col_u, num_nodes=num_nodes, pad_multiple=1024)

    num_classes, num_features = 40, 128
    x = rng.normal(size=(num_nodes, num_features)).astype(np.float32)

    cfg = Config(
        dataset="ogbn-arxiv-synthetic", block="constant", function="transformer",
        method="rk4", step_size=1.0, time=3.6760155951687636,
        hidden_dim=hidden, attention_dim=attention_dim, heads=heads,
        self_loop_weight=1.0, add_source=False, input_dropout=0.0, dropout=0.0,
        max_nfe=1000, stripe_fused=True,
    )
    model = GNNModel(cfg, num_features, num_classes, g)
    params, state = model.init(jax.random.PRNGKey(seed))
    return model, params, state, jnp.asarray(x)


def main():
    model, params, state, x = build_benchmark()
    g = model.graph
    e_valid = int(jax.device_get(g.num_edges))

    @jax.jit
    def forward(params, x):
        logits, _, stats, _ = model.apply(params, state, x, training=False)
        return logits, stats["nfe"]

    # compile + warm up
    t_compile = time.time()
    logits, nfe = forward(params, x)
    logits.block_until_ready()
    compile_s = time.time() - t_compile
    nfe = int(jax.device_get(nfe))

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        logits, _ = forward(params, x)
    logits.block_until_ready()
    dt = (time.time() - t0) / reps

    edge_updates_per_sec = nfe * e_valid / dt
    baseline = 1.5e8  # estimated torchdiffeq V100 edge·NFE/s (see docstring)
    print(json.dumps({
        "metric": "grand_nl_arxiv_edge_updates_per_sec_nfe",
        "value": round(edge_updates_per_sec, 1),
        "unit": "edge·NFE/s",
        "vs_baseline": round(edge_updates_per_sec / baseline, 3),
    }))
    print(f"# nfe={nfe} edges={e_valid} fwd={dt*1000:.1f}ms "
          f"compile={compile_s:.1f}s device={jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
