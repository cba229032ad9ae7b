"""Next-event estimation (render/lights.py + kernel NEE): sampler pdf,
unbiasedness vs plain path tracing, variance reduction, kernel parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgrenderer_tpu.camera import Camera
from csgrenderer_tpu.kernels import render_image_pallas
from csgrenderer_tpu.models import night_scene
from csgrenderer_tpu.render import render_image
from csgrenderer_tpu.render.integrator import SphereScene
from csgrenderer_tpu.render.lights import (
    extract_lights,
    sample_sphere_cone,
    sphere_ray_t,
)


def small_scene():
    return SphereScene(
        centers=jnp.asarray(
            [[0, -100.5, -1], [0, 0, -1], [1.2, 0.8, -0.6], [-1.0, 0.1, -0.4]],
            jnp.float32,
        ),
        radii=jnp.asarray([100, 0.5, 0.35, 0.25], jnp.float32),
        mat_kind=jnp.asarray([1, 1, 4, 2], jnp.int32),
        albedo=jnp.asarray(
            [[0.6, 0.6, 0.5], [0.4, 0.2, 0.7], [6.0, 5.0, 4.0],
             [0.9, 0.9, 0.9]],
            jnp.float32,
        ),
        mat_param=jnp.asarray([0, 0, 0, 0.05], jnp.float32),
    )


CAM = Camera.look_at(
    (0, 0.6, 2.0), (0, 0, -1), vfov_degrees=50.0, aspect_ratio=1.0
)


def test_extract_lights():
    scene = small_scene()
    lights = extract_lights(scene)
    assert lights.num_lights == 1
    np.testing.assert_allclose(lights.centers[0], [1.2, 0.8, -0.6])
    # a scene without emissives has no lights
    no_em = scene._replace(mat_kind=jnp.asarray([1, 1, 1, 2], jnp.int32))
    assert extract_lights(no_em) is None
    with pytest.raises(ValueError):
        render_image_pallas(no_em, CAM, 8, 8, spp=1, nee=True, interpret=True)


def test_cone_sampler_integrates_solid_angle():
    """MC-integrating the constant 1 over the cone pdf must return the
    subtended solid angle 2 pi (1 - cos_max): every sample's inv_pdf IS
    that constant, and every sampled direction must hit the sphere."""
    p = jnp.zeros((4096, 3), jnp.float32)
    c = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -5.0]), (4096, 3))
    r = jnp.float32(1.0)
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.random(4096, np.float32))
    u2 = jnp.asarray(rng.random(4096, np.float32))
    d, inv_pdf = sample_sphere_cone(p, c, r, u1, u2)
    cos_max = np.sqrt(1.0 - 1.0 / 25.0)
    np.testing.assert_allclose(
        np.asarray(inv_pdf), 2.0 * np.pi * (1.0 - cos_max), rtol=1e-5
    )
    t = sphere_ray_t(p, d, c, r)
    assert float(jnp.max(t)) < 1e29  # every cone sample hits the sphere
    # inside the sphere: no valid cone
    _, inv0 = sample_sphere_cone(
        c, c, r, u1[:4096], u2[:4096]
    )
    assert float(jnp.max(inv0)) == 0.0


def test_nee_is_unbiased_and_lower_variance():
    """NEE at 64 spp must agree with converged plain PT (energy parity)
    and beat plain PT at equal spp."""
    scene = small_scene()
    lights = extract_lights(scene)
    ref, _ = render_image(
        scene.nearest_hit, CAM, 32, 32, spp=3072, max_bounces=5, seed=1,
        sky="black",
    )
    ne, _ = render_image(
        scene.nearest_hit, CAM, 32, 32, spp=64, max_bounces=5, seed=2,
        sky="black", lights=lights,
    )
    pt, _ = render_image(
        scene.nearest_hit, CAM, 32, 32, spp=64, max_bounces=5, seed=2,
        sky="black",
    )
    ref, ne, pt = map(np.asarray, (ref, ne, pt))
    # energy parity (means within a tight band of the converged mean)
    assert abs(ne.mean() - ref.mean()) < 0.02 * max(ref.mean(), 1e-6) + 0.002
    # variance: NEE error well under plain-PT error at the same spp
    err_ne = np.sqrt(((ne - ref) ** 2).mean())
    err_pt = np.sqrt(((pt - ref) ** 2).mean())
    assert err_ne < 0.7 * err_pt


def test_kernel_nee_matches_jnp():
    scene = small_scene()
    lights = extract_lights(scene)
    img_j, rays_j = render_image(
        scene.nearest_hit, CAM, 48, 48, spp=8, max_bounces=5, seed=2,
        sky="black", lights=lights,
    )
    img_k, rays_k = render_image_pallas(
        scene, CAM, 48, 48, spp=8, max_bounces=5, seed=2, sky="black",
        nee=True, interpret=True,
    )
    j, k = np.asarray(img_j), np.asarray(img_k)
    # same RNG counters, same math: near-bit-exact (a handful of paths may
    # flip on fp ulps at silhouettes)
    assert abs(int(rays_j) - int(rays_k)) <= int(rays_j) * 1e-3
    assert float(np.sqrt(((k - j) ** 2).mean())) < 1e-4


def test_night_scene_kernel_runs():
    scene = night_scene(grid=3)
    cam = Camera.look_at(
        (6.5, 2.2, 6.5), (0.0, 0.6, 0.0), vfov_degrees=32.0,
        aspect_ratio=1.0,
    )
    img, rays = render_image_pallas(
        scene, cam, 32, 32, spp=4, max_bounces=4, seed=5, sky="black",
        nee=True, interpret=True,
    )
    img = np.asarray(img)
    assert int(rays) > 0
    assert np.isfinite(img).all() and img.max() > 0.0


def test_grid_nee_shadow_segments_match_jnp():
    """NEE through the grid-worklist path (shadow segments woven into the
    fused-DDA wavefront, common.grid_wavefront) against the jnp reference:
    same estimator, same RNG counters; the bf16 worklist tables allow only
    silhouette-level drift."""
    from csgrenderer_tpu.kernels.worklist import pack_grid

    scene = night_scene()  # full scene: griddable (148 spheres)
    assert pack_grid(scene) is not None  # the test must hit the grid path
    cam = Camera.look_at(
        (6.5, 2.2, 6.5), (0.0, 0.6, 0.0), vfov_degrees=32.0,
        aspect_ratio=1.0,
    )
    img_j, rays_j = render_image(
        scene.nearest_hit, cam, 40, 40, spp=6, max_bounces=4, seed=2,
        sky="black", lights=extract_lights(scene),
    )
    img_k, rays_k = render_image_pallas(
        scene, cam, 40, 40, spp=6, max_bounces=4, seed=2, sky="black",
        nee=True, interpret=True, worklist=True,  # force the grid path
    )
    j, k = np.asarray(img_j), np.asarray(img_k)
    # shadow segments are not counted as path segments: counters match
    assert abs(int(rays_j) - int(rays_k)) <= max(4, int(rays_j) * 1e-3)
    assert float(np.sqrt(((k - j) ** 2).mean())) < 2e-3
    assert abs(float(k.mean()) - float(j.mean())) < 1e-3
