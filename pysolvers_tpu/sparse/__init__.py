from .host import HostCSR
from .device import EllMatrix, DiaMatrix
from .bdia import BdiaMatrix
from .io import read_mtx, write_mtx

__all__ = ["HostCSR", "EllMatrix", "DiaMatrix", "BdiaMatrix", "read_mtx",
           "write_mtx"]
