from .spmv import matvec, ell_spmv_xla, dia_spmv_pallas, dia_spmv_xla

__all__ = ["matvec", "ell_spmv_xla", "dia_spmv_pallas", "dia_spmv_xla"]
