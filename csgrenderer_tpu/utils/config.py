"""Typed runtime configuration.

The reference's config story is two compile-time macros and CWD-relative
shader paths (``src/wololo/config.h:3-6``, SURVEY §5); here configuration is
data: dataclasses with validation, consumed by demos/bench/CLI. Debug mode
maps the reference's Vulkan validation layers onto JAX's checking tools
(``renderer.c:397`` -> jax_debug_nans/checkify), toggled at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RenderConfig:
    width: int = 1280
    height: int = 720
    spp: int = 16
    max_bounces: int = 8
    seed: int = 0
    sky: str = "rtiow"  # "rtiow" | "wololo" | "black"
    gamma: float = 2.0
    jitter: bool = True
    lens: bool = False
    nee: bool = False  # next-event estimation (emissive SphereScenes)
    debug: bool = False  # enables NaN checking (the "validation layer" mode)
    # a-trous/SVGF denoise of the linear radiance before tonemap, guided
    # by the deterministic AOV G-buffer (render/denoise.py, render/aov.py)
    denoise: bool = False
    denoise_iterations: int = 4

    def __post_init__(self):
        if self.width <= 0 or self.height <= 0:
            raise ValueError("resolution must be positive")
        if self.spp <= 0 or self.max_bounces <= 0:
            raise ValueError("spp and max_bounces must be positive")
        if self.sky not in ("rtiow", "wololo", "black"):
            raise ValueError(f"bad sky mode {self.sky!r}")
        if self.denoise_iterations < 1:
            raise ValueError("denoise_iterations must be >= 1")

    @property
    def aspect_ratio(self) -> float:
        return self.width / self.height

    @property
    def rays_per_frame(self) -> int:
        """Ray budget metric: W*H*spp*bounces (SURVEY §5 Mrays accounting)."""
        return self.width * self.height * self.spp * self.max_bounces


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for multi-chip rendering (parallel/)."""

    tile_axis: int = 1  # ways to shard image rows
    sample_axis: int = 1  # ways to shard samples-per-pixel

    @property
    def num_devices(self) -> int:
        return self.tile_axis * self.sample_axis


def enable_debug_mode() -> None:
    """The 'validation layer' switch (SURVEY §5): NaN debugging on.

    The analog of the reference's Vulkan validation layers
    (``renderer.c:397``, gated by WO_DEBUG): numerical faults raise at the
    originating op instead of silently propagating.
    """
    import jax

    jax.config.update("jax_debug_nans", True)


def disable_debug_mode() -> None:
    import jax

    jax.config.update("jax_debug_nans", False)


def checked(fn):
    """Wrap a jittable function with ``checkify`` float/NaN/div checks.

    The second half of the 'validation layer' story: unlike
    ``enable_debug_mode`` (a global, eager-failing switch), this instruments
    one function functionally — checks run *inside* jit on device and
    ``throw()`` on the host afterwards. Use on render steps under test:

        img, rays = checked(render_fn)(scene, t)
    """
    import jax
    from jax.experimental import checkify

    checked_fn = jax.jit(checkify.checkify(fn, errors=checkify.float_checks))

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
