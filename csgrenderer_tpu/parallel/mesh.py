"""Device-mesh construction for multi-chip rendering.

The reference is single-GPU by construction — it literally takes
``vk_physical_devices[0]`` (renderer.c:519-520). The TPU-native story
(SURVEY §2a/§5) is a first-class mesh layer: a 2D logical mesh with named
axes ``("tile", "sample")`` — image rows sharded across "tile", samples per
pixel sharded across "sample" — with cross-chip accumulation riding ICI
collectives (``psum`` over the sample axis).

Ray tracing needs no halo exchange (rays are independent), so the mesh
shape is a pure throughput knob: more "sample" ways cuts time-to-quality for
a fixed image; more "tile" ways scales resolution.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

TILE_AXIS = "tile"
SAMPLE_AXIS = "sample"


def make_mesh(
    tile_ways: int | None = None,
    sample_ways: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("tile", "sample") mesh over ``devices`` (default: all).

    With no arguments, all devices go to the tile axis.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if tile_ways is None:
        if n % sample_ways:
            raise ValueError(f"{n} devices not divisible by sample_ways={sample_ways}")
        tile_ways = n // sample_ways
    if tile_ways * sample_ways != n:
        raise ValueError(
            f"mesh {tile_ways}x{sample_ways} != {n} available devices"
        )
    arr = np.asarray(devices).reshape(tile_ways, sample_ways)
    return Mesh(arr, (TILE_AXIS, SAMPLE_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, devices=jax.devices()[:1])
