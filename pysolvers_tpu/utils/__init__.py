from .timing import Timer
from .tab import Tab
from .profiling import SpeedOfLight, measure, trace, current_chip, spmv_sol
from .checkpoint import (save_pytree, load_pytree, save_solve_state,
                         load_solve_state)

__all__ = ["Timer", "Tab", "SpeedOfLight", "measure", "trace",
           "current_chip", "spmv_sol",
           "save_pytree", "load_pytree", "save_solve_state",
           "load_solve_state"]
