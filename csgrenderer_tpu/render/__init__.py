from . import integrator, intersect, interval, materials, sampling, tape_eval, tonemap, trimesh
from .aov import AOVs, render_aovs
from .denoise import atrous_denoise, denoise_frame
from .integrator import (
    SphereScene,
    SurfaceHit,
    render_image,
    render_wololo_frame,
    sky_color,
    tape_hit_adapter,
    trace_paths,
)
from .trimesh import MeshScene, concat_meshes, icosphere, make_mesh, quad

__all__ = [
    "integrator",
    "intersect",
    "interval",
    "materials",
    "sampling",
    "tape_eval",
    "tonemap",
    "AOVs",
    "render_aovs",
    "atrous_denoise",
    "denoise_frame",
    "SphereScene",
    "SurfaceHit",
    "render_image",
    "render_wololo_frame",
    "sky_color",
    "tape_hit_adapter",
    "trace_paths",
    "trimesh",
    "MeshScene",
    "concat_meshes",
    "icosphere",
    "make_mesh",
    "quad",
]
