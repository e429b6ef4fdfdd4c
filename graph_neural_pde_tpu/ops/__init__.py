from graph_neural_pde_tpu.ops.graph import (  # noqa: F401
    Graph,
    add_remaining_self_loops,
    coalesce,
    dense_adjacency,
    dirichlet_energy,
    gcn_norm_fill_val,
    get_rw_adj,
    make_graph,
    to_undirected,
)
from graph_neural_pde_tpu.ops.scatter import (  # noqa: F401
    segment_max,
    segment_mean,
    segment_softmax,
    segment_squareplus,
    segment_sum,
)
from graph_neural_pde_tpu.ops.spmm import spmm, spmm_multihead  # noqa: F401
