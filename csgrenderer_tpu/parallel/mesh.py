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


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """Join a multi-host (DCN) rendering job: ``jax.distributed.initialize``
    with this framework's conventions (SURVEY §5's "optional DCN for
    multi-host" slot).

    After this, ``jax.devices()`` returns the GLOBAL device list and
    ``make_mesh`` lays processes out along the *tile* axis (see below), so
    the same ``render_scene_sharded`` call runs unchanged: image rows
    shard across hosts over DCN-adjacent mesh rows, samples stay on
    intra-host ICI, and the one psum per frame crosses DCN only along
    "tile" when tile_ways spans processes. Idempotent (a second call is a
    no-op). On a single-controller TPU slice this is unnecessary —
    ``jax.devices()`` already sees every chip over ICI.

    Arguments mirror ``jax.distributed.initialize``; all three default to
    auto-detection from the cluster environment where available.
    Works on CPU processes too (the two-process smoke test,
    tests/test_multihost.py, drives exactly this path).
    """
    if jax._src.distributed.global_state.client is not None:  # already up
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def make_mesh(
    tile_ways: int | None = None,
    sample_ways: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("tile", "sample") mesh over ``devices`` (default: all).

    With no arguments, all devices go to the tile axis. In a multi-host
    job (after ``initialize_multihost``), devices are ordered by
    (process, local id), so the LAST mesh axis ("sample") stays inside a
    host whenever sample_ways divides the per-process device count — the
    per-frame radiance psum then rides ICI, and only the row-slab layout
    (no collective) spans DCN.
    """
    devices = jax.devices() if devices is None else devices
    devices = sorted(
        devices, key=lambda d: (getattr(d, "process_index", 0), d.id)
    )
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
