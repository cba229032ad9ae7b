from . import checkpoint, image
from .checkpoint import Accumulator
from .image import read_png, rmse, write_png, write_ppm

__all__ = [
    "checkpoint",
    "image",
    "Accumulator",
    "read_png",
    "rmse",
    "write_png",
    "write_ppm",
]
