from .loop import App
from .preview import PreviewServer
from .renderers import PathTraceRenderer, WololoRenderer
from .stats import FrameStats, StatsClock

__all__ = [
    "App",
    "FrameStats",
    "StatsClock",
    "PathTraceRenderer",
    "PreviewServer",
    "WololoRenderer",
]
