from .newton import NewtonSolver, FuncAdapter1D, PreconditionerFreeze
from .linesearch import SimpleBacktrack, TrivialLinesearch, LineSearchBase

__all__ = ["NewtonSolver", "FuncAdapter1D", "PreconditionerFreeze",
           "SimpleBacktrack", "TrivialLinesearch", "LineSearchBase"]
