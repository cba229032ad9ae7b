"""AOV pass (render/aov.py) + a-trous denoiser (render/denoise.py).

Beyond-reference components (the reference outputs beauty color only,
ubershader1.frag:160-163). Coverage: G-buffer correctness/alignment on a
real scene, measured noise reduction against a high-spp reference render,
edge preservation across normal/depth discontinuities, hit-gate behavior
at silhouettes, and jit purity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgrenderer_tpu.camera import Camera
from csgrenderer_tpu.models import two_spheres_scene
from csgrenderer_tpu.render import (
    AOVs,
    atrous_denoise,
    denoise_frame,
    render_aovs,
    render_image,
)

W, H = 96, 54


@pytest.fixture(scope="module")
def diffuse_setup():
    scene = two_spheres_scene()
    camera = Camera.look_at(
        (0, 0, 0), (0, 0, -1), vfov_degrees=90.0, aspect_ratio=W / H
    )
    return scene, camera


def test_aovs_shapes_and_alignment(diffuse_setup):
    scene, camera = diffuse_setup
    aovs = render_aovs(scene.nearest_hit, camera, W, H)
    assert aovs.depth.shape == (H, W)
    assert aovs.normal.shape == (H, W, 3)
    assert aovs.albedo.shape == (H, W, 3)
    assert aovs.hit.shape == (H, W)

    # center pixel: the small sphere at (0,0,-1) — a hit, unit normal
    # facing roughly +z (toward the camera), finite positive depth
    cy, cx = H // 2, W // 2
    assert bool(aovs.hit[cy, cx])
    assert float(aovs.depth[cy, cx]) == pytest.approx(0.5, abs=0.05)
    n = np.asarray(aovs.normal[cy, cx])
    assert np.linalg.norm(n) == pytest.approx(1.0, abs=1e-4)
    assert n[2] > 0.9

    # top-left pixel: sky — miss, inf depth, zero normal, sky albedo
    assert not bool(aovs.hit[0, 0])
    assert not np.isfinite(float(aovs.depth[0, 0]))
    assert np.allclose(np.asarray(aovs.normal[0, 0]), 0.0)
    alb = np.asarray(aovs.albedo[0, 0])
    assert alb[2] >= alb[0]  # sky gradient is blue-heavy at the top


def test_denoise_reduces_noise_vs_reference(diffuse_setup):
    scene, camera = diffuse_setup
    noisy, _ = render_image(
        scene.nearest_hit, camera, W, H, spp=2, max_bounces=4, seed=0
    )
    ref, _ = render_image(
        scene.nearest_hit, camera, W, H, spp=256, max_bounces=4, seed=1
    )
    aovs = render_aovs(scene.nearest_hit, camera, W, H)
    den = atrous_denoise(noisy, aovs)

    rmse_noisy = float(jnp.sqrt(jnp.mean((noisy - ref) ** 2)))
    rmse_den = float(jnp.sqrt(jnp.mean((den - ref) ** 2)))
    # the filter must cut at least 40% of the 2-spp error
    assert rmse_den < 0.6 * rmse_noisy
    assert np.all(np.isfinite(np.asarray(den)))


def test_denoise_frame_convenience_matches_manual(diffuse_setup):
    scene, camera = diffuse_setup
    noisy, _ = render_image(
        scene.nearest_hit, camera, W, H, spp=2, max_bounces=3, seed=0
    )
    a = denoise_frame(noisy, scene.nearest_hit, camera, iterations=2)
    aovs = render_aovs(scene.nearest_hit, camera, W, H)
    b = atrous_denoise(noisy, aovs, iterations=2)
    assert np.allclose(np.asarray(a), np.asarray(b))


def _synthetic_edge(h=32, w=32, noise=0.15, seed=0):
    """Two flat regions split at w//2 by a joint normal+depth edge."""
    rng = np.random.default_rng(seed)
    left = np.zeros((h, w), bool)
    left[:, : w // 2] = True
    color = np.where(left[..., None], 0.2, 0.8).astype(np.float32)
    noisy = color + rng.normal(0.0, noise, color.shape).astype(np.float32)
    normal = np.where(
        left[..., None], np.array([0, 0, 1.0]), np.array([1.0, 0, 0])
    ).astype(np.float32)
    depth = np.where(left, 1.0, 2.0).astype(np.float32)
    aovs = AOVs(
        depth=jnp.asarray(depth),
        normal=jnp.asarray(normal),
        albedo=jnp.ones((h, w, 3), jnp.float32),
        hit=jnp.ones((h, w), bool),
    )
    return jnp.asarray(noisy), jnp.asarray(color), aovs, left


def test_denoise_smooths_flat_regions_without_edge_bleed():
    noisy, clean, aovs, left = _synthetic_edge()
    den = np.asarray(atrous_denoise(noisy, aovs, iterations=3))
    # intra-region noise drops by >3x
    err_in = np.abs(np.asarray(noisy) - np.asarray(clean))
    err_out = np.abs(den - np.asarray(clean))
    assert err_out.mean() < err_in.mean() / 3.0
    # the step across the edge survives: region means stay apart
    assert den[:, : den.shape[1] // 2].mean() == pytest.approx(0.2, abs=0.05)
    assert den[:, den.shape[1] // 2 :].mean() == pytest.approx(0.8, abs=0.05)
    # the single pixel columns flanking the edge keep >80% of the step
    step = den[:, den.shape[1] // 2].mean() - den[:, den.shape[1] // 2 - 1].mean()
    assert step > 0.8 * 0.6


def test_denoise_hit_gate_blocks_sky_bleed():
    noisy, clean, aovs, left = _synthetic_edge(noise=0.0)
    # right half becomes sky: hit=False, depth=inf per the AOV contract
    hit = np.asarray(aovs.hit).copy()
    hit[:, hit.shape[1] // 2 :] = False
    depth = np.asarray(aovs.depth).copy()
    depth[:, hit.shape[1] // 2 :] = np.inf
    aovs = aovs._replace(
        hit=jnp.asarray(hit), depth=jnp.asarray(depth)
    )
    den = np.asarray(atrous_denoise(noisy, aovs, iterations=3))
    # noiseless input + hard hit gate: both regions are exactly preserved
    assert np.allclose(den, np.asarray(clean), atol=1e-5)


def test_denoise_is_jit_pure():
    noisy, _, aovs, _ = _synthetic_edge()
    eager = atrous_denoise(noisy, aovs, iterations=2)
    jitted = jax.jit(lambda c, a: atrous_denoise(c, a, iterations=2))(
        noisy, aovs
    )
    assert np.allclose(np.asarray(eager), np.asarray(jitted), atol=1e-6)
