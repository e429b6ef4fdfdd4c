from graph_neural_pde_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_graph,
    replicate,
)
