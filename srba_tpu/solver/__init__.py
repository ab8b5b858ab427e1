from srba_tpu.solver.lm import (  # noqa: F401
    SolverConfig,
    WindowBatch,
    get_solver,
    make_lm_solver,
)
from srba_tpu.solver.window import build_window, write_back  # noqa: F401
