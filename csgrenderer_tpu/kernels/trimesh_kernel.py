"""Fused Pallas path-tracing kernels for triangle meshes.

Two modes, sharing the wavefront machinery in kernels/common.py:

- **Brute** (small meshes): per 1024-ray tile, every bounce tests all
  faces with a vectorized Möller-Trumbore over [F, 128] broadcast planes
  (the round-1 pattern) on the classic per-pixel wavefront loop.
- **Grid** (``worklist="auto"``, meshes of ~200+ faces): per-voxel
  triangle worklists walked by a per-lane 3D DDA fused into the rotating
  wavefront loop (common.grid_wavefront) — the mesh realization of the
  design that took the sphere kernel from 87 to 448+ Mrays/s. Host packer,
  table layout, and the DDA/gather step live in kernels/tri_worklist.py;
  huge-footprint faces (ground quads) plus voxel spill are brute-forced
  as unrolled scalar Möller-Trumbore from SMEM every iteration, bounding
  the walk.

Winner attributes are one-hot MXU-gathered; in grid mode only the edge
vectors + a material id are carried (geometric normal = cross(e1, e2) at
shade time; kind/param/albedo come from a tiny material table gathered
once per iteration).
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
    dot3 as _dot3,
    grid_wavefront,
    shade_and_advance,
)
from .megakernel import pack_camera
from .tri_worklist import (
    N_ATTRS,
    N_SECTIONS,
    pack_tri_grid,
    tri_grid_setup,
    tri_grid_step,
)


_MESH_PREP_CACHE: dict = {}


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


def pack_mesh_globals(glob_mesh: MeshScene, glob_mat: np.ndarray):
    """SMEM scalar table for the grid mode's brute-forced faces:
    [G_pad, 16] f32 rows of v0(3), e1(3), e2(3), mat_id."""
    g = int(np.asarray(glob_mesh.v0).shape[0])
    g_pad = max(1, g)
    cols = np.zeros((g_pad, 16), np.float32)
    if g:
        cols[:g, 0:3] = np.asarray(glob_mesh.v0, np.float32)
        cols[:g, 3:6] = np.asarray(glob_mesh.e1, np.float32)
        cols[:g, 6:9] = np.asarray(glob_mesh.e2, np.float32)
        cols[:g, 9] = np.asarray(glob_mat, np.float32)
    return cols


def _stream_dma_serve(grid_static):
    """True when the round-5 CSGR_STREAM_SERVE=dma census mode stages a
    VMEM-resident stream table through the DMA path (needs the scratch
    + semaphore the HBM service uses)."""
    from csgrenderer_tpu.kernels.tri_worklist import _stream_serve_mode

    return (grid_static is not None
            and grid_static.gather_pages > 0
            and not grid_static.hbm_table
            and _stream_serve_mode() == "dma")


def _make_kernel(width, height, spp, max_bounces, lens, sky, f_pad, n_pix,
                 grid_static=None, n_globals=0, mat_pad=0, n_lights=0):
    inv_w = np.float32(1.0 / width)
    inv_h = np.float32(1.0 / height)
    eps = np.float32(1e-3)

    def kernel(cam_ref, meta_ref, *rest):
        lights_ref = None
        stream_scratch = None
        if grid_static is not None:
            n_tiers = len(grid_static.tiers)
            glob_ref, dense_ref = rest[0], rest[1]
            tier_refs = rest[2 : 2 + n_tiers]
            rest2 = rest[2 + n_tiers :]
            mats_ref = rest2[0]
            if n_lights:
                lights_ref = rest2[1]
                rest2 = rest2[1:]
            if grid_static.hbm_table or _stream_dma_serve(grid_static):
                # trailing scratch args (phase B, or the round-5
                # CSGR_STREAM_SERVE=dma staging of VMEM tables): VMEM
                # slab scratch + DMA semaphore for the page copies
                stream_scratch = (rest2[-2], rest2[-1])
                rest2 = rest2[:-2]
            (out_r_ref, out_g_ref, out_b_ref, rays_ref) = rest2[1:]
        elif n_lights:
            (cols_ref, attr_ref, lights_ref,
             out_r_ref, out_g_ref, out_b_ref, rays_ref) = rest
        else:
            (cols_ref, attr_ref,
             out_r_ref, out_g_ref, out_b_ref, rays_ref) = rest
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
        sample_offset_u = sample_offset.astype(jnp.uint32)

        def camera_rays(s_plane, px=px, py=py, pix_u=pix_u):
            return camera_ray_planes(
                cam, px, py, pix_u, s_plane, seed, inv_w, inv_h, lens
            )

        if grid_static is None:
            attr = attr_ref[:]
            face_iota = jax.lax.broadcasted_iota(
                jnp.int32, (f_pad, TILE_LANES), 0
            )
            shape = (f_pad, TILE_LANES)
            bcast = [
                jnp.broadcast_to(cols_ref[:, j : j + 1], shape)
                for j in range(9)
            ]
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = bcast

            def intersect_tile(ox, oy, oz, dx, dy, dz):
                """Nearest MT hit per lane + winner attr planes."""
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
                    got = jnp.dot(
                        attr, onehot, preferred_element_type=jnp.float32
                    )
                    t_rows.append(t_best)
                    attr_rows.append(got)

                t_pl = jnp.concatenate(t_rows, axis=0)
                raw = [
                    jnp.concatenate([ar[j:j+1] for ar in attr_rows], axis=0)
                    for j in range(11)
                ]
                n = (raw[0] + raw[3], raw[1] + raw[4], raw[2] + raw[5])
                return t_pl, n, raw[6], raw[7], (raw[8], raw[9], raw[10])

            def occlusion_min_t(p3, ld3):
                """Shadow min-t: the MT pass without winner attributes."""
                hx, hy, hz = p3
                ldx, ldy, ldz = ld3
                t_rows = []
                for g in range(TILE_ROWS):
                    dxr, dyr, dzr = (
                        ldx[g:g+1], ldy[g:g+1], ldz[g:g+1]
                    )
                    oxr, oyr, ozr = hx[g:g+1], hy[g:g+1], hz[g:g+1]
                    pvx = dyr * e2z - dzr * e2y
                    pvy = dzr * e2x - dxr * e2z
                    pvz = dxr * e2y - dyr * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = 1.0 / det
                    tvx = oxr - v0x
                    tvy = oyr - v0y
                    tvz = ozr - v0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v = (dxr * qvx + dyr * qvy + dzr * qvz) * inv_det
                    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    valid = (
                        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (tt > eps)
                    )
                    t_rows.append(jnp.min(
                        jnp.where(valid, tt, BIG), axis=0, keepdims=True
                    ))
                return jnp.concatenate(t_rows, axis=0)

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
                emit_scale = None
                if n_lights:
                    # brute mesh NEE: area-sampled TriLights + MIS; the
                    # shadow test is one extra min-t MT pass (the brute
                    # analog of the megakernel's nee_planes block)
                    from .common import (
                        nee_tri_planes,
                        scatter_pdf_lam_planes,
                        scatter_pdf_metal_planes,
                        tri_bsdf_mis_table_planes,
                    )

                    # brute lamps always ride SMEM scalar rows (the VMEM
                    # table layout is grid-mode only; brute meshes are
                    # small, so the where-chain cost is acceptable)
                    light_scal = [
                        [lights_ref[i, j] for j in range(16)]
                        for i in range(n_lights)
                    ]
                    t_safe = jnp.where(hit, t_pl, 1.0)
                    hpx = ox + t_safe * dx
                    hpy = oy + t_safe * dy
                    hpz = oz + t_safe * dz
                    w_b = tri_bsdf_mis_table_planes(
                        light_scal, n_lights, (hpx, hpy, hpz),
                        (dx, dy, dz), t_safe, extra,
                    )
                    emit_scale = jnp.where(
                        (kind == 4.0) & (extra > 0.0) & (b > jnp.uint32(0)),
                        w_b, 1.0,
                    )
                    is_lam = kind == 1.0
                    glossy = (kind == 2.0) & (param > jnp.float32(1e-4))

                    def pdf_b_fn(ld, cos):
                        pdf_lam = (
                            jnp.maximum(cos, 0.0)
                            * np.float32(1.0 / np.pi)
                        )
                        pdf_met = scatter_pdf_metal_planes(
                            (dx, dy, dz), n, param, ld
                        )
                        pdf_met = jnp.where(cos > 0.0, pdf_met, 0.0)
                        return jnp.where(
                            is_lam, pdf_lam,
                            jnp.where(glossy, pdf_met, 0.0),
                        )

                    dr, dg, db = nee_tri_planes(
                        light_scal, n_lights, (hpx, hpy, hpz), n, alb,
                        occlusion_min_t, pu if pu is not None else pix_u,
                        s, b, seed, pdf_b_fn=pdf_b_fn,
                    )
                    nee_mask = active & hit & (is_lam | glossy)
                    rad = tuple(
                        r_ + jnp.where(nee_mask, t_ * d_, 0.0)
                        for r_, t_, d_ in zip(rad, thr, (dr, dg, db))
                    )
                d_in = (dx, dy, dz)
                (o, d, thr, rad, term) = shade_and_advance(
                    active, t_pl, hit, n, front, kind, param, alb,
                    o, d, thr, rad, pix_u, s, b, seed, sky,
                    emit_scale=emit_scale,
                )
                rays = rays + active_i
                cont = active & hit & ~term
                if n_lights:
                    extra = jnp.where(
                        cont & is_lam,
                        scatter_pdf_lam_planes(n, d),
                        jnp.where(
                            cont & glossy,
                            scatter_pdf_metal_planes(d_in, n, param, d),
                            0.0,
                        ),
                    )
                active_i = cont.astype(jnp.int32)
                return o, d, thr, rad, active_i, rays, extra

            extra0 = None
            if n_lights:
                extra0 = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.float32)
            state = classic_wavefront(
                bounce_step, camera_rays, spp, max_bounces, in_image,
                sample_offset_u, extra0=extra0,
            )
        else:
            # ---- grid mode: fused 3D DDA on the rotating wavefront ----
            n_tiles_static = (n_pix + TILE - 1) // TILE
            stream_mode = grid_static.gather_pages > 0

            def slot_pixel(k_plane):
                rrot = (row_ids + k_plane) & 7
                if stream_mode:
                    # BLOCK assignment: a row group's 128 lanes cover one
                    # contiguous scanline chunk, so their rays sit in 1-2
                    # Morton table pages (the demand-paged gather's whole
                    # premise, tri_worklist stream mode). Rotation still
                    # averages load over the tile's 8 rows.
                    lp = tile_idx * TILE + rrot * TILE_LANES + lane_ids
                else:
                    lp = (
                        rrot * TILE_LANES + lane_ids
                    ) * n_tiles_static + tile_idx
                return lp + pixel_offset, lp < n_pix

            def brute_globals(o, d):
                """Unrolled scalar MT over the SMEM globals table."""
                ox, oy, oz = o
                dx, dy, dz = d
                t_best = jnp.full_like(ox, BIG)
                attrs = [jnp.zeros_like(ox) for _ in range(N_ATTRS)]
                for gi in range(n_globals):
                    g = [glob_ref[gi, j] for j in range(10)]
                    (v0x_, v0y_, v0z_, e1x_, e1y_, e1z_,
                     e2x_, e2y_, e2z_, mid_) = g
                    pvx = dy * e2z_ - dz * e2y_
                    pvy = dz * e2x_ - dx * e2z_
                    pvz = dx * e2y_ - dy * e2x_
                    det = e1x_ * pvx + e1y_ * pvy + e1z_ * pvz
                    inv_det = 1.0 / det
                    tvx = ox - v0x_
                    tvy = oy - v0y_
                    tvz = oz - v0z_
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z_ - tvz * e1y_
                    qvy = tvz * e1x_ - tvx * e1z_
                    qvz = tvx * e1y_ - tvy * e1x_
                    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                    tt = (e2x_ * qvx + e2y_ * qvy + e2z_ * qvz) * inv_det
                    valid = (
                        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tt > eps)
                    )
                    tc = jnp.where(valid, tt, BIG)
                    better = tc < t_best
                    t_best = jnp.where(better, tc, t_best)
                    svals = (e1x_, e1y_, e1z_, e2x_, e2y_, e2z_, mid_)
                    attrs = [
                        jnp.where(better, sv, av)
                        for sv, av in zip(svals, attrs)
                    ]
                return t_best, tuple(attrs)

            def seg_init(o, d):
                t0, attrs0 = brute_globals(o, d)
                march0, walk0 = tri_grid_setup(grid_static, o, d, t0)
                return None, (t0, jnp.zeros_like(t0), attrs0), (
                    march0, walk0,
                )

            def grid_step_fn(ray_ctx, state, o, d):
                # stream mode passes the tier REF itself: the step slices
                # [*, 128] page slabs out of it (pl.ds), or DMAs them
                # from HBM (phase B), instead of loading the whole table
                tabs = (
                    tuple(tier_refs) if stream_mode
                    else tuple(r[:] for r in tier_refs)
                )
                return tri_grid_step(
                    grid_static, dense_ref[:], tabs, state, o, d,
                    stream_scratch=stream_scratch,
                )

            mat_iota_f = jax.lax.broadcasted_iota(
                jnp.int32, (mat_pad, TILE_LANES), 0
            ).astype(jnp.float32)
            mats_b = mats_ref[:]

            def hit_surface(attrs, o, d, t_safe):
                (e1x_, e1y_, e1z_, e2x_, e2y_, e2z_, mid) = attrs
                dx, dy, dz = d
                ngx = e1y_ * e2z_ - e1z_ * e2y_
                ngy = e1z_ * e2x_ - e1x_ * e2z_
                ngz = e1x_ * e2y_ - e1y_ * e2x_
                inv_len = jax.lax.rsqrt(
                    jnp.maximum(
                        _dot3(ngx, ngy, ngz, ngx, ngy, ngz),
                        jnp.float32(1e-20),
                    )
                )
                ngx, ngy, ngz = ngx * inv_len, ngy * inv_len, ngz * inv_len
                front = _dot3(dx, dy, dz, ngx, ngy, ngz) < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                n = (ngx * sgn, ngy * sgn, ngz * sgn)
                # material fetch: tiny one-hot over the unique-material table
                rows = [[] for _ in range(5)]
                for g in range(TILE_ROWS):
                    onehot = (mat_iota_f == mid[g : g + 1]).astype(
                        mats_b.dtype
                    )
                    got = jax.lax.dot_general(
                        mats_b, onehot,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [8, 128]
                    for j in range(5):
                        rows[j].append(got[j : j + 1])
                kind, param, ar, ag, ab = (
                    jnp.concatenate(r, axis=0) for r in rows
                )
                return n, front, kind, param, (ar, ag, ab)

            nee_sample = None
            nee_mis_scale = None
            if n_lights:
                # emissive-FACE lamps: area-sampled NEE + MIS, the mesh
                # twin of the megakernel's sphere-lamp machinery. Shadow
                # rays ride the same tri walk (t_out clamped to the lamp
                # distance by grid_wavefront); lamp ids are -2 (the mesh
                # walk carries no face ids), so occlusion is the pure
                # relative-distance rule — see nee_sample_tri_planes.
                from .common import (
                    nee_sample_tri_planes,
                    scatter_pdf_metal_planes,
                    tri_bsdf_mis_planes,
                )

                def nee_sample(p, nrm, alb_, d_in, kind_, param_,
                               pix_u_cur, cur_s, b_plane):
                    if n_lights > 8:
                        # many lamps (e.g. a tessellated light sphere):
                        # [16, L_pad] VMEM table, one-hot gather in
                        # nee_sample_tri_planes instead of a 16*L
                        # where-chain
                        light_scal = lights_ref[:]
                    else:
                        light_scal = [
                            [lights_ref[i, j] for j in range(16)]
                            for i in range(n_lights)
                        ]

                    def pdf_b_fn(ld, cos):
                        pdf_lam = (
                            jnp.maximum(cos, 0.0) * np.float32(1.0 / np.pi)
                        )
                        pdf_met = scatter_pdf_metal_planes(
                            d_in, nrm, param_, ld
                        )
                        pdf_met = jnp.where(cos > 0.0, pdf_met, 0.0)
                        glossy_ = (kind_ == 2.0) & (
                            param_ > jnp.float32(1e-4)
                        )
                        return jnp.where(
                            kind_ == 1.0, pdf_lam,
                            jnp.where(glossy_, pdf_met, 0.0),
                        )

                    return nee_sample_tri_planes(
                        light_scal, n_lights, p, nrm, alb_,
                        pix_u_cur, cur_s, b_plane, seed,
                        pdf_b_fn=pdf_b_fn,
                    )

                def nee_mis_scale(attrs_, o_, pdf_b, d_, t_safe_):
                    # winner attrs: e1(3), e2(3), mat id
                    return tri_bsdf_mis_planes(
                        (attrs_[0], attrs_[1], attrs_[2]),
                        (attrs_[3], attrs_[4], attrs_[5]),
                        d_, t_safe_, pdf_b, n_lights,
                    )

            zero = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.float32)
            zero_i = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.int32)
            walk0 = (zero_i, zero_i, zero_i, zero, zero, zero, zero)
            import os as _os

            state = grid_wavefront(
                spp=spp, max_bounces=max_bounces, width=width, seed=seed,
                sky=sky, sample_offset_u=sample_offset_u,
                local_pix=local_pix, row_ids=row_ids,
                pix_u0=pix.astype(jnp.uint32),
                slot_pixel=slot_pixel, camera_rays=camera_rays,
                seg_init=seg_init, grid_step_fn=grid_step_fn,
                hit_surface=hit_surface, n_attrs=N_ATTRS,
                walk0=walk0,
                steps_per_iter=int(_os.environ.get("CSGR_MESH_STEPS", "1")),
                nee_sample=nee_sample,
                nee_mis_scale=nee_mis_scale,
                walk_t_out_index=6,  # (ix, iy, iz, tmx, tmy, tmz, t_out)
            )
        out_r_ref[:] = state["rad"][0]
        out_g_ref[:] = state["rad"][1]
        out_b_ref[:] = state["rad"][2]
        import os as _os
        if _os.environ.get("CSGR_DEBUG_ITERS") and grid_static is not None:
            # iteration census (sum(rays) then reports wavefront
            # iterations x tiles): deferral / occupancy diagnosis
            rays_ref[:] = state["iters"]
        elif (_os.environ.get("CSGR_DEBUG_TRIPS")
              and grid_static is not None):
            # stream-service trip census (sum(rays)/1024 = total trips
            # across tiles; tri_grid_step accumulates into id_best)
            rays_ref[:] = state["id_best"].astype(jnp.int32)
        else:
            rays_ref[:] = state["rays"]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounces", "lens", "sky", "interpret",
        "rows", "grid_static", "n_globals", "n_lights",
    ),
)
def _render_mesh_packed(
    packed, cam_row, width, height, spp, max_bounces, seed, sample_offset,
    lens, sky, interpret, rows, row_offset,
    grid_static=None, n_globals=0, grid_tables=None, lights_tab=None,
    n_lights=0,
):
    n_pix = width * rows
    n_tiles = pl.cdiv(n_pix, TILE)
    meta = jnp.zeros((1, META_SIZE), jnp.int32)
    meta = meta.at[0, 0].set(jnp.asarray(seed, jnp.int32))
    meta = meta.at[0, 1].set(jnp.asarray(sample_offset, jnp.int32))
    meta = meta.at[0, 2].set(jnp.asarray(row_offset, jnp.int32) * width)

    if grid_static is None:
        f_pad = packed.attr.shape[1]
        mat_pad = 0
    else:
        f_pad = 0
        mat_pad = grid_tables[-1].shape[1]
    kernel = _make_kernel(
        width, height, spp, max_bounces, lens, sky, f_pad, n_pix,
        grid_static=grid_static, n_globals=n_globals, mat_pad=mat_pad,
        n_lights=n_lights,
    )
    plane = jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.float32)
    iplane = jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.int32)
    plane_spec = pl.BlockSpec(
        (TILE_ROWS, TILE_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    scratch_shapes = []
    if grid_static is None:
        inputs = [cam_row, meta, packed.cols, packed.attr]
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        if n_lights:
            inputs.append(lights_tab)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    else:
        # grid_tables = (dense, tier_table_0, ..., tier_table_k, mats)
        inputs = [cam_row, meta, packed, *grid_tables]
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]  # globals
        # grid_tables = (dense, tier..., mats); phase B puts the (one)
        # stream chunk table in ANY (HBM) — the service DMAs page slabs
        hbm = bool(grid_static.hbm_table)
        in_specs += [
            pl.BlockSpec(
                memory_space=pl.ANY
                if (hbm and 1 <= i < len(grid_tables) - 1)
                else pltpu.VMEM
            )
            for i in range(len(grid_tables))
        ]
        if n_lights:
            inputs.append(lights_tab)
            in_specs.append(pl.BlockSpec(
                memory_space=pltpu.VMEM if n_lights > 8 else pltpu.SMEM
            ))
        if hbm or _stream_dma_serve(grid_static):
            (q_s, _, _), = grid_static.tiers
            rr = N_SECTIONS * q_s + 1  # + continuation-flag row
            rr_pad = int(np.ceil(rr / 8.0)) * 8
            k = max(1, int(grid_static.gather_pages))
            # per-group HBM voting (CSGR_HBM_VOTE=block) DMAs each
            # group's own k slabs: 8x the scratch slots. The dma-serve
            # census mode stages VMEM tables the same block-vote way.
            from csgrenderer_tpu.kernels.tri_worklist import (
                _hbm_vote_mode,
            )

            n_slabs = (TILE_ROWS * k
                       if (_hbm_vote_mode() == "block" or not hbm)
                       else k)
            scratch_shapes = [
                pltpu.VMEM(
                    (n_slabs * rr_pad, TILE_LANES), grid_tables[1].dtype
                ),
                pltpu.SemaphoreType.DMA,
            ]
    r, g, b, rays = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(plane_spec, plane_spec, plane_spec, plane_spec),
        out_shape=(plane, plane, plane, iplane),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
        scratch_shapes=scratch_shapes,
    )(*inputs)

    if grid_static is not None and grid_static.gather_pages == 0:
        # un-stride: kernel slot q of tile t holds pixel q*n_tiles + t
        # (stream mode uses BLOCK assignment: slots are already in pixel
        # order, nothing to permute)
        def unstride(arr):
            return arr.reshape(n_tiles, TILE).T.reshape(-1)

        r, g, b = unstride(r), unstride(g), unstride(b)
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
    worklist: bool | str = "auto",
    gather_pages: int = 4,
    nee: bool = False,
):
    """Drop-in for ``integrator.render_image`` on MeshScene.

    ``worklist``: "auto" builds per-voxel triangle worklists when the mesh
    is large enough to profit (kernels/tri_worklist.py); True forces the
    attempt, False forces brute force; "stream" forces the demand-paged
    single-tier gather (tri_worklist stream mode) regardless of size.
    ``gather_pages``: stream-mode pages served per row group per
    iteration (tri_worklist.TriGridStatic.gather_pages).
    ``nee``: area-sampled next-event estimation on the mesh's emissive
    faces (render/lights.TriLights), MIS-paired like the sphere paths.
    Grid mode runs the shadow ray as a worklist walk segment; the brute
    path pays one extra min-t Möller-Trumbore pass per bounce.
    """
    if not jitter:
        raise NotImplementedError("mesh kernel always jitters")

    def _prepare():
        grid_static = None
        grid_tables = None
        n_globals = 0
        if worklist in (True, "auto", "stream", "tiered"):
            import ml_dtypes

            res = pack_tri_grid(
                mesh,
                stream={"stream": True, "tiered": False}.get(
                    worklist, "auto"
                ),
                gather_pages=gather_pages,
            )
            if res is not None:
                pack, glob_mesh, glob_mat = res
                grid_static = pack.static
                grid_tables = (
                    jnp.asarray(pack.dense_map.astype(ml_dtypes.bfloat16)),
                    *(
                        jnp.asarray(t.astype(ml_dtypes.bfloat16))
                        for t in pack.tables
                    ),
                    jnp.asarray(pack.mats.astype(ml_dtypes.bfloat16)),
                )
                n_globals = int(pack.globals_idx.shape[0])
                packed = jnp.asarray(pack_mesh_globals(glob_mesh, glob_mat))
            elif worklist in (True, "stream", "tiered"):
                raise ValueError(
                    f"worklist={worklist!r} but the mesh is not griddable"
                )
            else:
                packed = pack_mesh(mesh)
        else:
            packed = pack_mesh(mesh)
        lights_tab = None
        n_lights = 0
        if nee:
            from ..render.lights import extract_mesh_lights

            lights = extract_mesh_lights(mesh)
            if lights is None:
                raise ValueError(
                    "nee=True but the mesh has no emissive faces"
                )
            n_lights = lights.num_lights
            tab = np.zeros((n_lights, 16), np.float32)
            tab[:, 0:3] = lights.v0
            tab[:, 3:6] = lights.e1
            tab[:, 6:9] = lights.e2
            tab[:, 9:12] = lights.emit
            tab[:, 12:15] = lights.normal
            tab[:, 15] = lights.area
            if n_lights > 8 and grid_static is not None:
                # VMEM one-hot-gather layout: [16, L_pad], lamps padded
                # with zero columns (zero area -> never picked: li is
                # clamped to n_lights - 1). Grid mode only — the brute
                # path keeps SMEM scalar rows at any L.
                l_pad = int(np.ceil(n_lights / 128.0)) * 128
                tabv = np.zeros((16, l_pad), np.float32)
                tabv[:, :n_lights] = tab.T
                lights_tab = jnp.asarray(tabv)
            else:
                lights_tab = jnp.asarray(tab)
        return packed, grid_static, grid_tables, n_globals, lights_tab, \
            n_lights

    from .common import device_cache
    from .megakernel import _CAM_CACHE

    packed, grid_static, grid_tables, n_globals, lights_tab, n_lights = (
        device_cache(
            _MESH_PREP_CACHE,
            (id(mesh.v0), str(worklist), gather_pages, nee),
            mesh.v0, _prepare,
        )
    )
    cam_row = device_cache(
        _CAM_CACHE, id(camera.origin), camera.origin,
        lambda: pack_camera(camera),
    )
    return _render_mesh_packed(
        packed, cam_row, width, height, spp, max_bounces,
        jnp.asarray(seed, jnp.int32), jnp.asarray(sample_offset, jnp.int32),
        lens, sky, interpret,
        height if rows is None else rows,
        jnp.asarray(row_offset, jnp.int32),
        grid_static=grid_static, n_globals=n_globals,
        grid_tables=grid_tables, lights_tab=lights_tab, n_lights=n_lights,
    )
