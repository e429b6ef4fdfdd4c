from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset  # noqa: F401
