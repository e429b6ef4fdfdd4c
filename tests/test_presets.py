"""Every tuned best-params preset must train + evaluate end-to-end.

Exercises each reproduction config's structural path (block, function,
attention type, adjoint method, early-stop integrator, batch norm) on a
small synthetic stand-in — the NFE budget is trimmed so CPU CI stays fast,
everything else is the tuned config.
"""

import jax
import numpy as np
import pytest

from graph_neural_pde_tpu.config import best_params
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.models.gnn_early import GNNEarlyModel
from graph_neural_pde_tpu.training.train import Trainer


@pytest.fixture(scope="module")
def dataset():
    return make_sbm_dataset(num_nodes=60, num_classes=4, num_features=12,
                            seed=13)


def test_presets_select_stripe_engine(dataset):
    """Every tuned config rides the stripe MXU engine once stripe_fused
    resolves ON (the TPU auto-default): all presets use function=laplacian,
    so build_stripe_engine must return a plan and GNNModel must route its
    aggregation through make_stripe_spmm. Forced True here because the CPU
    auto-resolution is OFF."""
    from graph_neural_pde_tpu.models.blocks import (
        build_stripe_engine, prepare_graph)
    for name, cfg0 in best_params.items():
        cfg = cfg0.replace(stripe_fused=True, stripe_block_n=8,
                           stripe_chunk=16, hidden_dim=16, attention_dim=16,
                           heads=2)
        g = prepare_graph(cfg, dataset.graph)
        _, plan = build_stripe_engine(cfg, g)
        assert plan is not None, f"{name} did not select the stripe engine"
        model = GNNModel(cfg, dataset.num_features, dataset.num_classes,
                         dataset.graph)
        assert model.spmm_fn is not None, name
        assert model.stripe_plan is not None, name


def test_stripe_auto_resolution_off_on_cpu(dataset):
    """stripe_fused=None (auto) resolves OFF away from TPU backends."""
    from graph_neural_pde_tpu.models.blocks import (
        build_stripe_engine, prepare_graph)
    cfg = best_params["Cora"].replace(hidden_dim=16, attention_dim=16, heads=2)
    assert cfg.stripe_fused is None
    g = prepare_graph(cfg, dataset.graph)
    _, plan = build_stripe_engine(cfg, g)
    assert plan is None  # CPU backend: auto keeps the XLA engine


@pytest.mark.parametrize("name", sorted(best_params))
def test_preset_trains_and_evaluates(name, dataset):
    cfg = best_params[name].replace(
        max_nfe=600, max_test_steps=12, epoch=3,
        # keep CPU CI fast; structure (block/function/adjoint/atts) unchanged
        hidden_dim=16, attention_dim=16,
        heads=min(best_params[name].heads, 4),
        time=min(best_params[name].time, 4.0),
    )
    if cfg.attention_dim % cfg.heads:
        cfg = cfg.replace(attention_dim=cfg.heads * 4)
    model_cls = GNNModel if cfg.no_early else GNNEarlyModel
    model = model_cls(cfg, dataset.num_features, dataset.num_classes,
                      dataset.graph)
    trainer = Trainer(model)
    params, state, best, logs = trainer.fit(dataset, epochs=3, verbose=False)
    assert np.isfinite(logs[-1].loss), (name, logs[-1])
    assert logs[-1].fwd_nfe > 0
    if not cfg.no_early:
        logits, snap, stats = model.apply_early(
            params, state, dataset.x, dataset.y,
            (dataset.train_mask, dataset.val_mask, dataset.test_mask))
        assert np.isfinite(np.asarray(logits)).all(), name
        assert 0.0 <= float(snap.val) <= 1.0
