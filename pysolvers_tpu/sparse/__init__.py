from .host import HostCSR
from .device import EllMatrix, DiaMatrix
from .io import read_mtx, write_mtx

__all__ = ["HostCSR", "EllMatrix", "DiaMatrix", "read_mtx", "write_mtx"]
