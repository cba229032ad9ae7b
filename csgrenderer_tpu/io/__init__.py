from . import checkpoint, image, video
from .checkpoint import Accumulator
from .image import read_png, rmse, write_png, write_ppm
from .video import write_gif

__all__ = [
    "checkpoint",
    "image",
    "Accumulator",
    "read_png",
    "rmse",
    "write_png",
    "write_ppm",
    "video",
    "write_gif",
]
