from .krylov import (cg_solve, cg_solve_multi, gmres_solve,
                     gmres_solve_multi, KrylovState)
from .preconditioner import (Preconditioner, PreconditionerType,
                             IdentityPreconditionerType,
                             JacobiPreconditionerType,
                             ChebyshevPreconditionerType)
from .ilu import (ilut_factor, ict_factor, ILUTPreconditionerType,
                  ICPreconditionerType)

__all__ = [
    "cg_solve", "cg_solve_multi", "gmres_solve",
    "gmres_solve_multi", "KrylovState",
    "Preconditioner", "PreconditionerType", "IdentityPreconditionerType",
    "JacobiPreconditionerType", "ChebyshevPreconditionerType",
    "ilut_factor", "ict_factor", "ILUTPreconditionerType",
    "ICPreconditionerType",
]
