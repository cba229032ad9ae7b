"""Linear radiance -> displayable image: gamma, exposure, quantization.

RTIOW uses gamma-2 (sqrt); the reference shader writes linear color straight
to the (UNORM) swapchain — so the milestone-01 compatibility path uses
``gamma=1.0``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def tonemap(
    linear: Array, gamma: float = 2.0, exposure: float = 1.0
) -> Array:
    """Clamped gamma-corrected image in [0, 1]."""
    x = jnp.clip(linear * exposure, 0.0, 1.0)
    if gamma == 1.0:
        return x
    if gamma == 2.0:
        return jnp.sqrt(x)
    return x ** (1.0 / gamma)


def to_uint8(img01: Array) -> Array:
    return jnp.clip(img01 * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
