"""Checkpoint/resume for progressive accumulation state.

The reference has no persistent runtime state at all (SURVEY.md §5
"Checkpoint / resume: None") — animation is a pure function of the time
uniform. Our framework introduces real state: the progressive accumulator
(sum of sample radiances + sample count per pixel) for the 4K config. This
module makes it durable, resumable, and mesh-shape-independent (arrays are
saved fully replicated/gathered).

Uses numpy ``.npz`` as the format (self-contained, no service deps); an
orbax-backed variant can layer on later without changing the API.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import Array


class Accumulator(NamedTuple):
    """Progressive render state: running radiance sum and sample count."""

    radiance_sum: Array  # [H, W, 3] f32, linear
    sample_count: Array  # [] int32
    # Host-side Python int: the per-call kernel counters are int32 (fine for
    # one call), but the running total passes 2^31 in under a minute of 4K
    # progressive rendering at ~100 Mrays/s, so it must be arbitrary-
    # precision. Reading it forces a sync, which add() accepts: the
    # accumulator consumer reads the image each frame anyway.
    rays_traced: int

    @staticmethod
    def zeros(height: int, width: int) -> "Accumulator":
        return Accumulator(
            radiance_sum=jnp.zeros((height, width, 3), jnp.float32),
            sample_count=jnp.zeros((), jnp.int32),
            rays_traced=0,
        )

    def add(self, radiance: Array, samples: int, rays) -> "Accumulator":
        return Accumulator(
            radiance_sum=self.radiance_sum + radiance,
            sample_count=self.sample_count + samples,
            rays_traced=self.rays_traced + int(rays),
        )

    def image(self) -> Array:
        """Current mean-radiance estimate."""
        n = jnp.maximum(self.sample_count, 1)
        return self.radiance_sum / n.astype(jnp.float32)


def save(path, acc: Accumulator, **metadata) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path,
        radiance_sum=np.asarray(acc.radiance_sum),
        sample_count=np.asarray(acc.sample_count),
        rays_traced=np.asarray(acc.rays_traced, np.int64),
        **{f"meta_{k}": np.asarray(v) for k, v in metadata.items()},
    )


def load(path) -> tuple[Accumulator, dict]:
    with np.load(path) as z:
        acc = Accumulator(
            radiance_sum=jnp.asarray(z["radiance_sum"]),
            sample_count=jnp.asarray(z["sample_count"]),
            rays_traced=int(z["rays_traced"]),
        )
        meta = {
            k[len("meta_") :]: z[k] for k in z.files if k.startswith("meta_")
        }
    return acc, meta


# -- orbax variant (same Accumulator, directory-based, async-capable) -------


def save_orbax(path, acc: Accumulator, **metadata) -> None:
    """Orbax-backed checkpoint (a DIRECTORY): the production-grade variant
    for long multi-host progressive renders — atomic finalization, works
    with sharded arrays. The npz format stays the default (single file, no
    service deps)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    payload = {
        "radiance_sum": np.asarray(acc.radiance_sum),
        "sample_count": np.asarray(acc.sample_count),
        "rays_traced": np.asarray(acc.rays_traced, np.int64),
        "metadata": {k: np.asarray(v) for k, v in metadata.items()},
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def load_orbax(path) -> tuple[Accumulator, dict]:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    z = ckptr.restore(Path(path).resolve())
    acc = Accumulator(
        radiance_sum=jnp.asarray(z["radiance_sum"]),
        sample_count=jnp.asarray(np.asarray(z["sample_count"], np.int32)),
        rays_traced=int(z["rays_traced"]),
    )
    return acc, dict(z.get("metadata") or {})
