"""Block/function name registry (model_configurations.py:17-44 equivalent).

The actual implementations are dispatch branches inside models.blocks /
models.functions (static per-Config code paths, so each combination jits to
its own specialized program); this module centralises the valid names and
mirrors the reference's set_block/set_function validation.
"""

from __future__ import annotations

from graph_neural_pde_tpu.config import Config

BLOCKS = ("constant", "mixed", "attention", "hard_attention", "rewire_attention")
FUNCTIONS = ("laplacian", "transformer", "GAT")


def set_block(cfg: Config) -> str:
    if cfg.block not in BLOCKS:
        raise ValueError(f"Block type {cfg.block} not defined.")
    return cfg.block


def set_function(cfg: Config) -> str:
    if cfg.function not in FUNCTIONS:
        raise ValueError(f"Function type {cfg.function} not defined.")
    return cfg.function
