"""Fused Pallas path-tracing kernel for triangle meshes.

The mesh sibling of the sphere megakernel: per 1024-ray tile, every bounce
tests all faces with a vectorized Möller-Trumbore over [F, 128] broadcast
planes (the round-1 brute-force pattern — per-cell worklists for triangles
are the designed follow-up, same tables as kernels/worklist.py). The
sample/bounce machinery (wavefront regeneration, RNG, materials, shading)
is the shared scaffold in kernels/common.py.

Winner attributes are one-hot MXU-gathered; geometric normals are stored
hi/lo split so the single-pass bf16 gather reconstructs them to ~1.6e-5.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera.pinhole import Camera
from ..render.trimesh import MeshScene
from .common import (
    BIG,
    BIG_CUT,
    META_SIZE,
    TILE,
    TILE_LANES,
    TILE_ROWS,
    camera_ray_planes,
    classic_wavefront,
    shade_and_advance,
)
from .megakernel import pack_camera


class _PackedMesh(NamedTuple):
    cols: jax.Array  # [F_pad, 16] f32: v0(3), e1(3), e2(3)
    attr: jax.Array  # [16, F_pad] f32: n_hi(3), n_lo(3), kind, param, alb(3)


def pack_mesh(mesh: MeshScene) -> _PackedMesh:
    import ml_dtypes

    v0 = np.asarray(mesh.v0, np.float32)
    e1 = np.asarray(mesh.e1, np.float32)
    e2 = np.asarray(mesh.e2, np.float32)
    f = v0.shape[0]
    f_pad = max(8, int(np.ceil(f / 8)) * 8)
    cols = np.zeros((f_pad, 16), np.float32)
    cols[:f, 0:3] = v0
    cols[:f, 3:6] = e1
    cols[:f, 6:9] = e2
    # padding faces: zero edges -> det == 0 -> inv_det inf -> rejected

    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    n_hi = n.astype(ml_dtypes.bfloat16).astype(np.float32)
    n_lo = n - n_hi
    attr = np.zeros((16, f_pad), np.float32)
    attr[0:3, :f] = n_hi.T
    attr[3:6, :f] = n_lo.T
    attr[6, :f] = np.asarray(mesh.mat_kind, np.float32)
    attr[7, :f] = np.asarray(mesh.mat_param, np.float32)
    attr[8:11, :f] = np.asarray(mesh.albedo, np.float32).T
    return _PackedMesh(cols=jnp.asarray(cols), attr=jnp.asarray(attr))


def _make_kernel(width, height, spp, max_bounces, lens, sky, f_pad, n_pix):
    inv_w = np.float32(1.0 / width)
    inv_h = np.float32(1.0 / height)
    eps = np.float32(1e-3)

    def kernel(cam_ref, meta_ref, cols_ref, attr_ref,
               out_r_ref, out_g_ref, out_b_ref, rays_ref):
        tile_idx = pl.program_id(0)
        seed = meta_ref[0, 0]
        sample_offset = meta_ref[0, 1]
        pixel_offset = meta_ref[0, 2]

        cam = [cam_ref[0, i] for i in range(19)]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 1)
        local_pix = tile_idx * TILE + row_ids * TILE_LANES + lane_ids
        in_image = local_pix < n_pix
        pix = local_pix + pixel_offset
        px = (pix % width).astype(jnp.float32)
        py = (pix // width).astype(jnp.float32)
        pix_u = pix.astype(jnp.uint32)

        attr = attr_ref[:]
        face_iota = jax.lax.broadcasted_iota(jnp.int32, (f_pad, TILE_LANES), 0)
        shape = (f_pad, TILE_LANES)
        bcast = [
            jnp.broadcast_to(cols_ref[:, j : j + 1], shape) for j in range(9)
        ]
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = bcast

        def intersect_tile(ox, oy, oz, dx, dy, dz):
            """Nearest Möller-Trumbore hit per lane + winner attr planes."""
            t_rows = []
            attr_rows = []
            for g in range(TILE_ROWS):
                dxr, dyr, dzr = dx[g:g+1], dy[g:g+1], dz[g:g+1]
                oxr, oyr, ozr = ox[g:g+1], oy[g:g+1], oz[g:g+1]
                # pvec = d x e2
                pvx = dyr * e2z - dzr * e2y
                pvy = dzr * e2x - dxr * e2z
                pvz = dxr * e2y - dyr * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = 1.0 / det  # inf/NaN on degenerate -> rejected
                tvx = oxr - v0x
                tvy = oyr - v0y
                tvz = ozr - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                # qvec = tvec x e1
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (dxr * qvx + dyr * qvy + dzr * qvz) * inv_det
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tt > eps)
                ta = jnp.where(valid, tt, BIG)
                t_best = jnp.min(ta, axis=0, keepdims=True)  # [1,128]
                cand = jnp.where(ta == t_best, face_iota, jnp.int32(f_pad))
                sel = jnp.min(cand, axis=0, keepdims=True)
                onehot = (face_iota == sel).astype(jnp.float32)
                got = jnp.dot(attr, onehot, preferred_element_type=jnp.float32)
                t_rows.append(t_best)
                attr_rows.append(got)

            t_pl = jnp.concatenate(t_rows, axis=0)
            raw = [
                jnp.concatenate([ar[j:j+1] for ar in attr_rows], axis=0)
                for j in range(11)
            ]
            n = (raw[0] + raw[3], raw[1] + raw[4], raw[2] + raw[5])
            return t_pl, n, raw[6], raw[7], (raw[8], raw[9], raw[10])

        def camera_rays(s_plane):
            return camera_ray_planes(
                cam, px, py, pix_u, s_plane, seed, inv_w, inv_h, lens
            )

        def bounce_step(b, s, pu, o, d, thr, rad, active_i, rays, extra):
            ox, oy, oz = o
            dx, dy, dz = d
            active = active_i > 0
            t_pl, n_geo, kind, param, alb = intersect_tile(
                ox, oy, oz, dx, dy, dz
            )
            hit = t_pl < BIG_CUT
            ngx, ngy, ngz = n_geo
            front = (dx * ngx + dy * ngy + dz * ngz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            n = (ngx * sgn, ngy * sgn, ngz * sgn)
            (o, d, thr, rad, term) = shade_and_advance(
                active, t_pl, hit, n, front, kind, param, alb,
                o, d, thr, rad, pix_u, s, b, seed, sky,
            )
            rays = rays + active_i
            active_i = (active & hit & ~term).astype(jnp.int32)
            return o, d, thr, rad, active_i, rays, extra

        state = classic_wavefront(
            bounce_step, camera_rays, spp, max_bounces, in_image,
            sample_offset.astype(jnp.uint32),
        )
        out_r_ref[:] = state["rad"][0]
        out_g_ref[:] = state["rad"][1]
        out_b_ref[:] = state["rad"][2]
        rays_ref[:] = state["rays"]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounces", "lens", "sky", "interpret",
        "rows",
    ),
)
def _render_mesh_packed(
    packed, cam_row, width, height, spp, max_bounces, seed, sample_offset,
    lens, sky, interpret, rows, row_offset,
):
    n_pix = width * rows
    n_tiles = pl.cdiv(n_pix, TILE)
    meta = jnp.zeros((1, META_SIZE), jnp.int32)
    meta = meta.at[0, 0].set(jnp.asarray(seed, jnp.int32))
    meta = meta.at[0, 1].set(jnp.asarray(sample_offset, jnp.int32))
    meta = meta.at[0, 2].set(jnp.asarray(row_offset, jnp.int32) * width)

    f_pad = packed.attr.shape[1]
    kernel = _make_kernel(
        width, height, spp, max_bounces, lens, sky, f_pad, n_pix
    )
    plane = jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.float32)
    iplane = jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.int32)
    plane_spec = pl.BlockSpec(
        (TILE_ROWS, TILE_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    r, g, b, rays = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(plane_spec, plane_spec, plane_spec, plane_spec),
        out_shape=(plane, plane, plane, iplane),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cam_row, meta, packed.cols, packed.attr)

    flat = jnp.stack(
        [r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1
    )[:n_pix]
    image = flat.reshape(rows, width, 3) / spp
    return image, jnp.sum(rays)


def render_image_mesh_pallas(
    mesh: MeshScene,
    camera: Camera,
    width: int,
    height: int,
    spp: int = 1,
    max_bounces: int = 8,
    seed: int = 0,
    sky: str = "rtiow",
    jitter: bool = True,
    lens: bool = False,
    sample_offset=0,
    interpret: bool = False,
    rows: int | None = None,
    row_offset=0,
):
    """Drop-in for ``integrator.render_image`` on MeshScene."""
    if not jitter:
        raise NotImplementedError("mesh kernel always jitters")
    packed = pack_mesh(mesh)
    cam_row = pack_camera(camera)
    return _render_mesh_packed(
        packed, cam_row, width, height, spp, max_bounces,
        jnp.asarray(seed, jnp.int32), jnp.asarray(sample_offset, jnp.int32),
        lens, sky, interpret,
        height if rows is None else rows,
        jnp.asarray(row_offset, jnp.int32),
    )
