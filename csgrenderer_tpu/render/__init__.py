from . import integrator, intersect, interval, materials, sampling, tape_eval, tonemap
from .integrator import (
    SphereScene,
    SurfaceHit,
    render_image,
    render_wololo_frame,
    sky_color,
    tape_hit_adapter,
    trace_paths,
)

__all__ = [
    "integrator",
    "intersect",
    "interval",
    "materials",
    "sampling",
    "tape_eval",
    "tonemap",
    "SphereScene",
    "SurfaceHit",
    "render_image",
    "render_wololo_frame",
    "sky_color",
    "tape_hit_adapter",
    "trace_paths",
]
