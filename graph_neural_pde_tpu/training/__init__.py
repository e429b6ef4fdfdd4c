from graph_neural_pde_tpu.training.train import (  # noqa: F401
    Trainer,
    accuracy,
    cross_entropy_loss,
    make_optimizer,
)
