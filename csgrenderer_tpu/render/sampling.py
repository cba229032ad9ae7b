"""Stateless, counter-based RNG + sampling for the path tracer.

Design note (SURVEY.md §7 "hard parts" #4): per-(pixel, sample, bounce)
randomness must NOT depend on array shapes or mesh layout, or golden images
change when the device count changes. ``jax.random`` keys folded per-shard
would do exactly that. Instead we hash integer counters per ray with PCG4D
(Jarzynski & Olano, "Hash Functions for GPU Rendering", JCGT 2020 — public
algorithm), which is pure VPU integer math, identical under any sharding, and
equally usable inside Pallas kernels.

All samplers take integer counter arrays and return f32 in [0, 1).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def pcg4d(a: Array, b: Array, c: Array, d: Array) -> tuple[Array, Array, Array, Array]:
    """PCG4D hash: four uint32 counters -> four well-mixed uint32 words."""
    v = [
        jnp.asarray(a).astype(jnp.uint32),
        jnp.asarray(b).astype(jnp.uint32),
        jnp.asarray(c).astype(jnp.uint32),
        jnp.asarray(d).astype(jnp.uint32),
    ]
    mul = jnp.uint32(1664525)
    inc = jnp.uint32(1013904223)
    v = [x * mul + inc for x in v]
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    v = [x ^ (x >> jnp.uint32(16)) for x in v]
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    return v[0], v[1], v[2], v[3]


def _to_unit_float(u: Array) -> Array:
    """uint32 -> f32 in [0, 1) using the top 24 bits (exactly representable)."""
    return (u >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def uniform4(a: Array, b: Array, c: Array, d: Array) -> Array:
    """[..., 4] uniforms in [0,1) from four integer counter arrays."""
    w0, w1, w2, w3 = pcg4d(a, b, c, d)
    return jnp.stack(
        [_to_unit_float(w0), _to_unit_float(w1), _to_unit_float(w2), _to_unit_float(w3)],
        axis=-1,
    )


def sample_unit_vector(u1: Array, u2: Array) -> Array:
    """Uniform direction on the unit sphere from two uniforms; [..., 3]."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = (2.0 * jnp.pi) * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_in_unit_disk(u1: Array, u2: Array) -> Array:
    """Uniform point in the unit disk (polar warp); [..., 2]."""
    r = jnp.sqrt(u1)
    phi = (2.0 * jnp.pi) * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def sample_cosine_hemisphere(n: Array, u1: Array, u2: Array) -> Array:
    """Cosine-weighted direction about unit normal n — as n + unit_vector.

    RTIOW's ``lambertian`` scatter (normal + random unit vector) IS a
    cosine-weighted hemisphere sample; we use that form directly because it
    needs no basis construction (cheaper and branch-free on the VPU).
    Degenerate near-zero sums are caught by the caller.
    """
    return n + sample_unit_vector(u1, u2)
