from graph_neural_pde_tpu.rewiring.gdc import apply_gdc, gdc_position_encoding  # noqa: F401
from graph_neural_pde_tpu.rewiring.knn import knn_graph  # noqa: F401
