from graph_neural_pde_tpu.utils.stats import (  # noqa: F401
    get_sem,
    mean_confidence_interval,
)
from graph_neural_pde_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
