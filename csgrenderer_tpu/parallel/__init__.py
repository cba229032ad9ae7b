from .mesh import (
    SAMPLE_AXIS,
    TILE_AXIS,
    initialize_multihost,
    make_mesh,
    single_device_mesh,
)
from .shard import (
    render_image_sharded,
    render_scene_sharded,
    render_to_noise_sharded,
)

__all__ = [
    "TILE_AXIS",
    "SAMPLE_AXIS",
    "initialize_multihost",
    "make_mesh",
    "single_device_mesh",
    "render_image_sharded",
    "render_scene_sharded",
    "render_to_noise_sharded",
]
