from .timing import Timer
from .tab import Tab
from .profiling import SpeedOfLight, measure, trace, current_chip, spmv_sol

__all__ = ["Timer", "Tab", "SpeedOfLight", "measure", "trace",
           "current_chip", "spmv_sol"]
