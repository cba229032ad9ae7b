from .config import (
    MeshConfig,
    RenderConfig,
    checked,
    disable_debug_mode,
    enable_debug_mode,
)
from .logging import get_logger

__all__ = [
    "MeshConfig",
    "RenderConfig",
    "enable_debug_mode",
    "checked",
    "disable_debug_mode",
    "get_logger",
]
