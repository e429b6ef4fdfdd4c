"""Main training CLI: ``python -m graph_neural_pde_tpu.run --dataset Cora``.

Equivalent of /root/reference/src/run_GNN.py:215-442: merge tuned best
params with command-line overrides, load the dataset, compute Beltrami
positional encodings if requested, pick the model variant
(GNN / GNNEarly / GNN_KNN / GNNKNNEarly), and run the epoch loop with
optional kNN rewiring and in-integrator best-val tracking.

Flags are auto-generated from the Config dataclass — every field is a
``--flag`` — so the reference's ~90-flag surface carries over 1:1.
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from typing import Optional

import jax
import numpy as np

from graph_neural_pde_tpu.config import Config, best_params
from graph_neural_pde_tpu.data.datasets import (
    generate_random_splits,
    get_dataset,
    set_train_val_test_split,
)
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.models.gnn_early import GNNEarlyModel
from graph_neural_pde_tpu.models.gnn_knn import GNNKNNEarlyModel, GNNKNNModel
from graph_neural_pde_tpu.training.train import Trainer


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_dir", type=str, default="./data")
    parser.add_argument("--use_best_params", action="store_true",
                        help="merge the tuned per-dataset config underneath "
                             "the command line (best_params.py semantics)")
    parser.add_argument("--checkpoint_path", type=str, default=None,
                        help="save the best-val params/state here (npz)")
    for f in dataclasses.fields(Config):
        name = f"--{f.name}"
        if f.type == "bool" or isinstance(f.default, bool):
            # --flag / --no-flag pairs so booleans defaulting to True
            # (not_lcc, no_early, fused_attention_agg, ...) can be disabled
            parser.add_argument(name, action=argparse.BooleanOptionalAction,
                                default=None)
        elif f.name in ("jacobian_norm2", "total_deriv", "kinetic_energy",
                        "directional_penalty"):
            parser.add_argument(name, type=float, default=None)
        elif isinstance(f.default, int):
            parser.add_argument(name, type=int, default=None)
        elif isinstance(f.default, float):
            parser.add_argument(name, type=float, default=None)
        elif isinstance(f.default, str):
            parser.add_argument(name, type=str, default=None)
        elif f.default is None and "str" in str(f.type):
            # Optional[str] fields (e.g. rewiring)
            parser.add_argument(name, type=str, default=None)
    return parser


def config_from_args(args) -> Config:
    base = best_params.get(args.dataset, Config()) if (
        args.use_best_params and args.dataset) else Config()
    overrides = {f.name: getattr(args, f.name)
                 for f in dataclasses.fields(Config)
                 if getattr(args, f.name, None) is not None}
    # argparse store_true gives False defaults as None (kept), True as True
    return base.replace(**overrides)


def select_model(cfg: Config, num_features, num_classes, graph, pos_enc_dim=0):
    """run_GNN.py:232-235 model dispatch."""
    if cfg.rewire_KNN or cfg.fa_layer:
        cls = GNNKNNModel if cfg.no_early else GNNKNNEarlyModel
    else:
        cls = GNNModel if cfg.no_early else GNNEarlyModel
    return cls(cfg, num_features, num_classes, graph, pos_enc_dim=pos_enc_dim)


def main(cfg: Config, data_dir: str = "./data", verbose: bool = True,
         checkpoint_path: Optional[str] = None,
         split_idx: Optional[int] = None):
    from graph_neural_pde_tpu.utils.compile_cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    # fail fast on invalid block/function names (model_configurations.py
    # semantics) instead of erroring mid-forward
    from graph_neural_pde_tpu.models.registry import set_block, set_function
    set_block(cfg)
    set_function(cfg)

    # The reference passes opt['not_lcc'] (default True) directly as use_lcc
    # (run_GNN.py:223 -> data.py:34), so despite the name, LCC extraction is ON
    # by default and OFF for ogbn-arxiv (not_lcc=False in best_params.py:7).
    dataset = get_dataset(cfg, data_dir, use_lcc=cfg.not_lcc)

    pos_encoding = None
    if cfg.beltrami:
        from graph_neural_pde_tpu.rewiring.positional import apply_beltrami
        pe = apply_beltrami(dataset.graph, cfg, data_dir,
                            node_order=dataset.reorder)
        cfg = cfg.replace(pos_enc_dim=pe.shape[1])
        import jax.numpy as jnp
        pos_encoding = jnp.asarray(pe)
        dataset.pos_encoding = pos_encoding

    # fixed geom-gcn splits for the heterophilic datasets (run_GNN.py uses
    # get_fixed_splits via --geom_gcn_splits; heterophilic.py:295-319)
    if cfg.geom_gcn_splits:
        import jax.numpy as jnp
        from graph_neural_pde_tpu.data.datasets import load_geom_gcn_split
        import os
        tm, vm, sm = load_geom_gcn_split(
            os.path.join(data_dir, "splits"), cfg.dataset,
            split_idx=(split_idx if split_idx is not None
                       else cfg.seed) % 10,
            n=int(dataset.y.shape[0]))
        if dataset.reorder is not None:
            # split files index ORIGINAL node ids; ride the relabeling
            o = np.asarray(dataset.reorder)
            tm, vm, sm = tm[o], vm[o], sm[o]
        dataset.train_mask = jnp.asarray(tm)
        dataset.val_mask = jnp.asarray(vm)
        dataset.test_mask = jnp.asarray(sm)

    # random development split for the citation graphs (run_GNN.py:237-238)
    if not cfg.planetoid_split and cfg.dataset in ("Cora", "Citeseer",
                                                   "Pubmed"):
        import jax.numpy as jnp
        y_np = np.asarray(dataset.y)
        seed = int(np.random.randint(0, 1000))
        ndev = 5000 if cfg.dataset == "CoauthorCS" else 1500
        tm, vm, sm = set_train_val_test_split(seed, y_np, ndev)
        dataset.train_mask = jnp.asarray(tm)
        dataset.val_mask = jnp.asarray(vm)
        dataset.test_mask = jnp.asarray(sm)

    # --mesh_devices N: edge-shard the graph over an N-device mesh and
    # replicate node state/params (the multi-chip design of parallel/mesh.py,
    # reachable from the CLI; tests/test_multichip.py pins sharded == single)
    mesh = None
    if cfg.mesh_devices and cfg.mesh_devices > 1:
        import jax.numpy as jnp
        from graph_neural_pde_tpu.ops.graph import pad_capacity
        from graph_neural_pde_tpu.parallel.mesh import (
            make_mesh, replicate, shard_graph)
        ndev = len(jax.devices())
        if ndev < cfg.mesh_devices:
            raise ValueError(
                f"--mesh_devices {cfg.mesh_devices}: only {ndev} jax "
                f"device(s) visible (for a CPU test mesh set XLA_FLAGS="
                f"--xla_force_host_platform_device_count="
                f"{cfg.mesh_devices})")
        mesh = make_mesh(cfg.mesh_devices)
        # the single-device Pallas engines build host-side plans; the mesh
        # path rides XLA SPMD collectives over plain ops
        cfg = cfg.replace(stripe_fused=False, spmm_impl="xla")
        dataset.graph = shard_graph(
            mesh, pad_capacity(dataset.graph, cfg.mesh_devices))
        dataset.x = replicate(mesh, dataset.x)
        dataset.y = replicate(mesh, dataset.y)
        dataset.train_mask = replicate(mesh, dataset.train_mask)
        dataset.val_mask = replicate(mesh, dataset.val_mask)
        dataset.test_mask = replicate(mesh, dataset.test_mask)
        if pos_encoding is not None:
            pos_encoding = replicate(mesh, pos_encoding)
            dataset.pos_encoding = pos_encoding

    model = select_model(cfg, dataset.num_features, dataset.num_classes,
                         dataset.graph, pos_enc_dim=cfg.pos_enc_dim)
    trainer = Trainer(model)

    key = jax.random.PRNGKey(cfg.seed)
    k_init, key = jax.random.split(key)
    params, state = model.init(k_init)
    if mesh is not None:
        from graph_neural_pde_tpu.parallel.mesh import replicate as _rep
        params = _rep(mesh, params)
        state = _rep(mesh, state)
    opt_state = trainer.optimizer.init(params)
    if mesh is not None:
        from graph_neural_pde_tpu.parallel.mesh import replicate as _rep2
        opt_state = _rep2(mesh, opt_state)

    best = {"val_acc": 0.0, "test_acc": 0.0, "train_acc": 0.0, "epoch": 0,
            "best_time": cfg.time}
    for epoch in range(1, cfg.epoch):
        t0 = time.time()

        if (cfg.rewire_KNN and epoch % cfg.rewire_KNN_epoch == 0
                and hasattr(model, "rewire")):
            # online mode iterates the rewire/probe loop within the epoch
            # (--KNN_online/--KNN_online_reps, run_GNN.py:405-406)
            reps = cfg.KNN_online_reps if cfg.KNN_online else 1
            for _ in range(reps):
                model.rewire(params, state, dataset.x, pos_encoding)

        if cfg.edge_sampling and epoch % cfg.edge_sampling_epoch == 0:
            # BLEND densify-then-sparsify surgery between epochs
            # (apply_edge_sampling, graph_rewiring.py:227-241)
            from graph_neural_pde_tpu.models.attention import (
                apply_transformer_attention)
            from graph_neural_pde_tpu.rewiring.edges import apply_edge_sampling
            import jax as _jax

            def mean_att(graph):
                x0, _ = model.encode(params, state, dataset.x, pos_encoding,
                                     False, _jax.random.PRNGKey(0))
                if graph.num_nodes > x0.shape[0]:
                    # stripe-plan graphs pad the node count to block_n
                    import jax.numpy as _jnp2
                    x0 = _jnp2.pad(
                        x0, ((0, graph.num_nodes - x0.shape[0]), (0, 0)))
                att_params = params["block"].get(
                    "att", params["block"]["func"].get("att"))
                if att_params is None:
                    # reference-faithful: edge sampling scores edges by the
                    # model's attention (graph_rewiring.py:151-153 calls
                    # odeblock.get_attention_weights, which only attention
                    # blocks/functions provide — a constant block with the
                    # laplacian function fails there too)
                    raise ValueError(
                        "--edge_sampling needs an attention-bearing model: "
                        "use --block attention/mixed/hard_attention or "
                        "--function transformer/GAT")
                att, _ = apply_transformer_attention(att_params, cfg, x0,
                                                     graph,
                                                     edge_weight=graph.weight)
                return np.asarray(jnp_mean_heads(att))

            import jax.numpy as _jnp

            def jnp_mean_heads(att):
                return _jnp.mean(att, axis=1)

            reps = (cfg.edge_sampling_online_reps if cfg.edge_sampling_online
                    else 1)
            for rep in range(reps):
                model.graph = apply_edge_sampling(
                    model.graph, cfg, mean_att,
                    np.random.default_rng(cfg.seed + epoch * 131 + rep),
                    capacity=model.graph.capacity).sort_by_row()
            # rebuild the Pallas engines against the sampled graph (round 5:
            # edge_sampling rides the stripe engine — plans rebuilt per
            # surgery, compiled steps keyed by plan identity like the kNN
            # rewiring hook)
            model._build_engines()

        if cfg.fa_layer and hasattr(model, "set_fa_graph"):
            # rebuild the fa-layer graph from the current model (the
            # reference rebuilds it INSIDE every forward — add_edges +
            # attention edge_sampling at the evolved z, GNN_KNN.py:73-77;
            # here it is between-epoch host surgery at static shapes, with
            # a dedicated stripe plan per rebuild)
            from graph_neural_pde_tpu.rewiring.edges import (
                apply_edge_sampling as _aes)
            import jax as _jax2

            def mean_att_fa(graph):
                z = model.solve_ode(params, state, dataset.x, pos_encoding,
                                    rng=_jax2.random.PRNGKey(0))
                if graph.num_nodes > z.shape[0]:
                    import jax.numpy as _jnp3
                    z = _jnp3.pad(
                        z, ((0, graph.num_nodes - z.shape[0]), (0, 0)))
                from graph_neural_pde_tpu.models.attention import (
                    apply_transformer_attention as _ata)
                att_params = params["block"].get(
                    "att", params["block"]["func"].get("att"))
                att, _ = _ata(att_params, cfg, z, graph,
                              edge_weight=graph.weight)
                import jax.numpy as _jnp4
                return np.asarray(_jnp4.mean(att, axis=1))

            cfg_fa = cfg.replace(
                edge_sampling_rmv=cfg.fa_layer_edge_sampling_rmv)
            fa_cap = (model.fa_graph.capacity
                      if model.fa_graph is not None else None)
            model.set_fa_graph(_aes(
                model.graph, cfg_fa, mean_att_fa,
                np.random.default_rng(cfg.seed + epoch * 137),
                capacity=fa_cap))

        if mesh is not None and (cfg.rewire_KNN or cfg.edge_sampling
                                 or cfg.fa_layer):
            # between-epoch host surgery rebuilt the edge arrays on the
            # default device — ride them back onto the mesh (surgery keeps
            # the capacity, so divisibility survives the initial pad)
            from graph_neural_pde_tpu.ops.graph import pad_capacity as _pc
            from graph_neural_pde_tpu.parallel.mesh import shard_graph as _sg
            model.graph = _sg(mesh, _pc(model.graph, cfg.mesh_devices))
            if getattr(model, "fa_graph", None) is not None:
                model.fa_graph = _sg(
                    mesh, _pc(model.fa_graph, cfg.mesh_devices))

        key, k_step = jax.random.split(key)
        params, state, opt_state, loss, tstats = trainer._train_step(
            params, state, opt_state, dataset.x, pos_encoding, dataset.y,
            dataset.train_mask, k_step, model.graph)
        (tr, va, te), _, _ = trainer._eval_step(
            params, state, dataset.x, pos_encoding, dataset.y,
            (dataset.train_mask, dataset.val_mask, dataset.test_mask),
            model.graph)
        tr, va, te = float(tr), float(va), float(te)
        best_time = cfg.time
        if va > best["val_acc"]:
            best.update(val_acc=va, test_acc=te, train_acc=tr, epoch=epoch,
                        best_time=cfg.time)
            if checkpoint_path:
                from graph_neural_pde_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(checkpoint_path,
                                {"params": params, "state": state},
                                metadata={"val_acc": va, "epoch": epoch})
        if not cfg.no_early and hasattr(model, "apply_early"):
            _, snap, _ = model.apply_early(
                params, state, dataset.x, dataset.y,
                (dataset.train_mask, dataset.val_mask, dataset.test_mask),
                pos_encoding)
            if float(snap.val) > best["val_acc"]:
                best.update(val_acc=float(snap.val), test_acc=float(snap.test),
                            train_acc=float(snap.train), epoch=epoch,
                            best_time=float(snap.time))
            best_time = float(snap.time)

        if verbose:
            from graph_neural_pde_tpu.solvers.tableaus import TABLEAUS
            bwd = (0 if cfg.adjoint else int(tstats["accepted"])
                   * (TABLEAUS[cfg.method].num_stages
                      if cfg.method in TABLEAUS else 1))
            print(f"Epoch: {epoch:03d}, Runtime {time.time() - t0:.6f}, "
                  f"Loss {float(loss):.6f}, forward nfe {int(tstats['nfe'])}, "
                  f"backward nfe {bwd}, "
                  f"Train: {tr:.4f}, Val: {va:.4f}, Test: {te:.4f}, "
                  f"Best time: {best_time:.4f}")
    if verbose:
        print(f"best val accuracy {best['val_acc']:.6f} with test accuracy "
              f"{best['test_acc']:.6f} at epoch {best['epoch']} and best time "
              f"{best['best_time']:.6f}")
    return best["train_acc"], best["val_acc"], best["test_acc"]


def run_splits(cfg: Config, data_dir: str = "./data", verbose: bool = True,
               checkpoint_path: Optional[str] = None):
    """Run cfg.num_splits independent repetitions and aggregate.

    geom-gcn datasets iterate over the 10 fixed splits
    (heterophilic.py:295-319); citation datasets draw a fresh random
    development split per rep (train_ray_rand semantics, ray_tune.py:40-93).
    Reports mean/sem/95%-CI like run_best_ray.py:71-74.
    """
    if cfg.num_splits <= 1:
        return main(cfg, data_dir, verbose, checkpoint_path)
    from graph_neural_pde_tpu.utils.stats import mean_confidence_interval
    results = []
    for rep in range(cfg.num_splits):
        res = main(cfg.replace(seed=cfg.seed + rep), data_dir, verbose,
                   checkpoint_path=(f"{checkpoint_path}_rep{rep}"
                                    if checkpoint_path else None),
                   split_idx=rep)
        results.append(res)
        if verbose:
            print(f"[split {rep + 1}/{cfg.num_splits}] "
                  f"test acc {res[2]:.4f}")
    accs = [r[2] for r in results]
    mean = float(np.mean(accs))
    ci = mean_confidence_interval(accs)
    if verbose:
        print(f"over {cfg.num_splits} splits: test acc {mean:.4f} "
              f"± {ci:.4f} (95% CI)")
    tr = float(np.mean([r[0] for r in results]))
    va = float(np.mean([r[1] for r in results]))
    return tr, va, mean


if __name__ == "__main__":
    parsed = build_parser().parse_args()
    run_splits(config_from_args(parsed), data_dir=parsed.data_dir,
               checkpoint_path=parsed.checkpoint_path)
