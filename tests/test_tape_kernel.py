"""CSG tape Pallas kernel vs the jnp tape evaluator (interpret mode)."""

import functools

import numpy as np
import pytest

from csgrenderer_tpu.camera import Camera
from csgrenderer_tpu.kernels.tape_kernel import render_image_tape_pallas
from csgrenderer_tpu.models import animated_csg_scene, config3_csg_scene
from csgrenderer_tpu.render import render_image, tape_hit_adapter
from csgrenderer_tpu.scene import Material, NodeArgument, SceneGraph


def compare(tape, cam, w, h, spp, bounces, seed, sky="rtiow", tol=1e-4):
    hit = functools.partial(tape_hit_adapter, tape)
    ref, rrays = render_image(
        hit, cam, w, h, spp=spp, max_bounces=bounces, seed=seed, sky=sky
    )
    img, krays = render_image_tape_pallas(
        tape, cam, w, h, spp=spp, max_bounces=bounces, seed=seed, sky=sky,
        interpret=True,
    )
    ref, img = np.asarray(ref), np.asarray(img)
    assert not np.isnan(img).any()
    rmse = float(np.sqrt(np.mean((ref - img) ** 2)))
    assert rmse <= tol, f"rmse {rmse}"
    assert int(krays) == int(rrays)
    return img


def test_config3_matches_reference():
    tape = config3_csg_scene().compile(k=2)
    cam = Camera.look_at((3, 2.5, 4), (0.1, 0, 0), vfov_degrees=35, aspect_ratio=1.0)
    compare(tape, cam, 32, 32, spp=1, bounces=3, seed=3)


def test_deep_csg_matches_reference():
    g, animate = animated_csg_scene(4)
    tape = animate(g.compile(k=2), 1.0)
    cam = Camera.look_at((0, 2.0, 7.0), (0.5, 0, 0), vfov_degrees=40, aspect_ratio=1.0)
    compare(tape, cam, 24, 24, spp=1, bounces=3, seed=5)


def test_rotated_leaves_and_materials():
    import numpy as onp

    from csgrenderer_tpu.math import quaternion as quat

    q = tuple(onp.asarray(quat.from_axis_angle(onp.array([0.0, 1.0, 0.0]), 0.6)))
    g = SceneGraph()
    b = g.add_box_node((0.7, 0.7, 0.7), Material.metal((0.9, 0.8, 0.6), 0.05))
    c = g.add_cylinder_node(0.5, 1.2, Material.dielectric(1.5))
    hs = g.add_infinite_planar_partition_node(
        (0.0, 1.0, 0.0), Material.lambertian((0.4, 0.5, 0.6))
    )
    u = g.add_union_of_node(NodeArgument(b, orientation=q), NodeArgument(c))
    g.add_union_of_node(NodeArgument(u), NodeArgument(hs, offset=(0, -1.2, 0)))
    tape = g.compile(k=2)
    cam = Camera.look_at((3, 2, 4), (0, 0, 0), vfov_degrees=40, aspect_ratio=1.0)
    compare(tape, cam, 24, 24, spp=1, bounces=3, seed=7)


def test_entering_flag_on_difference_surface():
    # glass shell: big sphere minus inner sphere; a ray entering the carved
    # region must see correct front-face on the inner (subtracted) surface
    g = SceneGraph()
    outer = g.add_sphere_node(1.0, Material.dielectric(1.5))
    inner = g.add_sphere_node(0.6, Material.dielectric(1.5))
    g.add_difference_of_node(NodeArgument(outer), NodeArgument(inner))
    tape = g.compile(k=2)
    cam = Camera.look_at((0, 0, 3), (0, 0, 0), vfov_degrees=45, aspect_ratio=1.0)
    compare(tape, cam, 24, 24, spp=1, bounces=5, seed=9)


def test_black_sky_mode():
    g = SceneGraph()
    g.add_sphere_node(1.0, Material.emissive((2.0, 1.0, 0.5)))
    tape = g.compile(k=2)
    cam = Camera.look_at((0, 0, 4), (0, 0, 0), vfov_degrees=45, aspect_ratio=1.0)
    img = compare(tape, cam, 32, 32, spp=1, bounces=2, seed=1, sky="black")
    assert img[0, 0].max() == 0.0  # corner: no sky, no sphere
    assert img[16, 16].max() > 1.0  # center: emissive


def test_normal_map_attribution_matches_reference():
    """Direct owner/normal comparison: normal-map materials make bounce-1
    radiance = the attribution normal itself, so any owner or normal
    divergence between kernel and jnp is visible immediately (lambertian
    scenes hide it behind RNG until bounce 2)."""
    g = SceneGraph(max_node_count=16)
    s = g.add_sphere_node(1.0, Material.normal_map())
    b = g.add_box_node((0.8, 0.8, 0.8), Material.normal_map())
    c = g.add_cylinder_node(0.55, 1.6, Material.normal_map())
    u = g.add_union_of_node(
        NodeArgument(s, offset=(-0.3, 0, 0)), NodeArgument(b, offset=(0.5, 0, 0))
    )
    g.add_difference_of_node(NodeArgument(u), NodeArgument(c))
    tape = g.compile(k=2)
    cam = Camera.look_at((3, 2.5, 4), (0.1, 0, 0), vfov_degrees=35, aspect_ratio=1.0)
    compare(tape, cam, 48, 48, spp=1, bounces=1, seed=3)


def test_generalized_merge_network_fuzz():
    """The odd-even merge network must sort for ALL operand length combos
    (per-node interval widths make unequal, non-power-of-two merges the
    common case)."""
    import itertools

    import jax.numpy as jnp

    from csgrenderer_tpu.kernels.tape_kernel import _merge_sorted_planes

    rng = np.random.default_rng(11)
    # k=4 tapes produce 7/8-length event merges in _combine; cover
    # through length 8 on both operands (advisor round-2 finding)
    for la, lb in itertools.product(range(0, 9), range(0, 9)):
        for _ in range(20):
            a = np.sort(rng.integers(0, 15, la)).astype(np.float32)
            b = np.sort(rng.integers(0, 15, lb)).astype(np.float32)
            got = _merge_sorted_planes(
                [jnp.full((1, 1), v) for v in a],
                [jnp.full((1, 1), v) for v in b],
            )
            got = [float(np.asarray(p)[0, 0]) for p in got]
            assert got == sorted(a.tolist() + b.tolist())
