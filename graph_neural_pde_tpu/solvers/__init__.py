from graph_neural_pde_tpu.solvers.api import SolverOptions, odeint  # noqa: F401
from graph_neural_pde_tpu.solvers.tableaus import TABLEAUS, Tableau  # noqa: F401
