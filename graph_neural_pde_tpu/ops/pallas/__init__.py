from graph_neural_pde_tpu.ops.pallas.plan import BlockPlan, build_block_plan  # noqa: F401
from graph_neural_pde_tpu.ops.pallas.spmm_blocked import spmm_blocked  # noqa: F401
