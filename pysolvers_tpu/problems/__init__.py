from .laplacian import (fd_laplacian_1d, fd_laplacian_2d,
                        fd_convection_diffusion_2d,
                        fd_vector_laplacian_2d)
from .dh import dh_test_problem
from .bratu import Bratu2D

__all__ = ["fd_laplacian_1d", "fd_laplacian_2d",
           "fd_convection_diffusion_2d", "fd_vector_laplacian_2d",
           "dh_test_problem", "Bratu2D"]
