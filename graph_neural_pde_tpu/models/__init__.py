from graph_neural_pde_tpu.models.gnn import GNNModel  # noqa: F401
