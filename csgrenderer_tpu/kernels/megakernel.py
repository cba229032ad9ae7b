"""Fused Pallas TPU path-tracing megakernel for sphere scenes.

This is the perf path for the headline benchmark (RTIOW final scene,
BASELINE.json) — the TPU-native realization of the reference's fragment
ubershader (``ubershader1.frag:97-163``), grown to the full RTIOW material
set, with the entire sample loop x bounce loop fused into one kernel so ray
state never leaves VMEM/registers.

Why the pure-XLA path is slow: at 1080p a wave of rays against ~500 spheres
materializes [N, S] intermediates in HBM (hundreds of MB per elementwise
op) — memory-bound at ~9 Mrays/s measured. Here each grid step owns a
1024-ray tile whose [S, 128] intersection matrices live entirely on-chip.

Layout decisions (the heart of the design):

- Per-ray state (origins, directions, throughput, radiance) is stored as
  [8, 128] component planes — the native f32 VPU tile — so all per-ray math
  runs at full lane utilization with zero relayouts.
- The sphere test processes one plane row (128 rays) at a time against all
  spheres as [S, 128] tiles: per-ray scalars enter as natural [1, 128] row
  slices, per-sphere constants as [S, 128] broadcasts prepared once per
  tile; the whole quadratic (cross terms + discriminant/root/select) is
  exact f32 VPU broadcast math. (An MXU formulation of the cross terms
  needed 6-pass f32 matmuls for precision — net slower than the VPU.)
- Nearest-hit attributes are fetched with a one-hot single-pass bf16 MXU
  matmul ([16, S] @ [S, 128]) instead of a gather — the TPU way to index a
  table; sphere centers are stored hi/lo-split in the table so bf16 rounding
  costs nothing (see pack_scene).
- The sample x bounce nest is a single WAVEFRONT while_loop: every lane owns
  one pixel and immediately regenerates its next camera sample when its path
  terminates (per-lane sample/bounce counters), so lane occupancy stays near
  100% instead of draining to the longest path each sample (SURVEY §7
  "active-ray compaction", realized per-tile).
- RNG is the same counter-based PCG4D as the jnp path (render/sampling.py),
  on uint32 planes, so kernel output matches the reference implementation
  sample-for-sample and stays sharding-invariant.

Rays are counted as actually-traced segments (sum of active lanes per wave),
matching SURVEY §5's Mrays accounting. Counters are int32: a single call is
good for ~2e9 segments (e.g. 4K at ~100 spp); accumulate across calls in
Python (the progressive renderer does) for more.
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
from ..render.integrator import SphereScene
from .common import (
    BIG,
    BIG_CUT,
    CAM_SIZE as _CAM_SIZE,
    META_SIZE as _META_SIZE,
    TILE,
    TILE_LANES,
    TILE_ROWS,
    bsdf_mis_scale_planes,
    camera_ray_planes,
    classic_wavefront,
    device_cache,
    dot3 as _dot3,
    grid_wavefront,
    nee_planes,
    scatter_pdf_lam_planes,
    scatter_pdf_metal_planes,
    shade_and_advance,
)
from .worklist import grid_setup, grid_step, pack_grid

# device-resident packed-input caches (see common.device_cache): static
# scenes/cameras skip the per-call host->device uploads that capped the
# realtime loop
_SCENE_PREP_CACHE: dict = {}
_CAM_CACHE: dict = {}


def _make_kernel(width, height, spp, max_bounces, lens, sky, s_pad, n_pix,
                 grid_static=None, n_globals=0, n_lights=0,
                 classic_rotate=False):
    """Build the kernel body with static config baked in.

    ``grid_static``: a worklist.GridStatic — when set, ``cols_ref`` holds
    only the GLOBAL spheres (brute-forced every wave) and the kernel takes
    an extra ``grid_ref`` worklist table; the nearest-hit is refined by the
    per-lane grid DDA (kernels/worklist.py), which is where the post-
    roofline throughput comes from.
    """

    inv_w = np.float32(1.0 / width)
    inv_h = np.float32(1.0 / height)

    # few-enough globals are brute-forced as unrolled SCALAR quadratics
    # straight from SMEM (no padded [8,128] broadcast planes, no pad-sphere
    # waste): ~110 ops for the RTIOW scene's 4 globals vs ~200 broadcast
    scalar_globals = grid_static is not None and 0 < n_globals <= 16

    def kernel(cam_ref, meta_ref, cols_ref, attr_ref, *rest):
        if grid_static is not None and n_lights:
            (glob_ref, grid_ref, lights_ref, out_r_ref, out_g_ref,
             out_b_ref, rays_ref) = rest
        elif grid_static is not None:
            (glob_ref, grid_ref, out_r_ref, out_g_ref, out_b_ref,
             rays_ref) = rest
        elif n_lights:
            (lights_ref, out_r_ref, out_g_ref, out_b_ref, rays_ref) = rest
        else:
            (out_r_ref, out_g_ref, out_b_ref, rays_ref) = rest
        tile_idx = pl.program_id(0)
        seed = meta_ref[0, 0]
        sample_offset = meta_ref[0, 1]
        pixel_offset = meta_ref[0, 2]  # global flat-pixel offset of this slab

        cam = [cam_ref[0, i] for i in range(19)]
        (cox, coy, coz, llx, lly, llz, hx, hy, hz, vx, vy, vz,
         ux, uy, uz, vvx, vvy, vvz, lens_radius) = cam

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 1)
        local_pix = tile_idx * TILE + row_ids * TILE_LANES + lane_ids  # [8,128]
        in_image = local_pix < n_pix  # n_pix = pixels in THIS slab
        # RNG counters and camera coords use GLOBAL pixel ids so any row
        # sharding of the image reproduces the single-device render exactly.
        pix = local_pix + pixel_offset
        px = (pix % width).astype(jnp.float32)
        py = (pix // width).astype(jnp.float32)
        pix_u = pix.astype(jnp.uint32)

        # Grid mode: per-pixel lane binding makes a tile run at the pace of
        # its most expensive PIXEL (glass ~8 bounces/sample vs sky ~1 —
        # measured 3.26 wave iterations per segment vs the ~1.5 the step
        # statistics allow). So (a) tiles take pixels STRIDED across the
        # image (slot q of tile t -> pixel q*n_tiles + t) and (b) a lane's
        # pixel ROTATES over its lane-column's 8 row slots per sample
        # (sample k of pixel slot (r,l) is worked by lane ((r-k)%8, l)), so
        # every lane's load is the average of 8 image-wide pixels. Completed
        # samples are scattered back to their pixel's row with masked
        # sublane reductions (no transposes, no MXU).
        n_tiles_static = (n_pix + TILE - 1) // TILE

        def slot_pixel(k_plane):
            """(global pixel id, valid) for each lane's sample-k slot."""
            rrot = (row_ids + k_plane) & 7
            lp = (rrot * TILE_LANES + lane_ids) * n_tiles_static + tile_idx
            return lp + pixel_offset, lp < n_pix

        attr = attr_ref[:]  # [16, s_pad]
        sphere_iota = jax.lax.broadcasted_iota(jnp.int32, (s_pad, TILE_LANES), 0)
        # Per-sphere constants broadcast to [rows, 128] ONCE per tile; the
        # per-(ray, sphere) cross terms are then pure f32 VPU broadcast math.
        # (The earlier [S,4]@[4,128] MXU formulation needed 6-pass f32
        # matmuls for precision — slower than the VPU and serialized with it.)
        # rows = all spheres brute-forced here: the full scene normally, only
        # the globals when the grid worklists handle the rest.
        if not scalar_globals:
            shape = (cols_ref.shape[0], TILE_LANES)
            cxb = jnp.broadcast_to(cols_ref[:, 0:1], shape)
            cyb = jnp.broadcast_to(cols_ref[:, 1:2], shape)
            czb = jnp.broadcast_to(cols_ref[:, 2:3], shape)
            ccr2b = jnp.broadcast_to(cols_ref[:, 3:4], shape)
            c2xb = jnp.broadcast_to(cols_ref[:, 4:5], shape)  # 2 * center
            c2yb = jnp.broadcast_to(cols_ref[:, 5:6], shape)
            c2zb = jnp.broadcast_to(cols_ref[:, 6:7], shape)
        if grid_static is not None and not scalar_globals:
            # shading attrs of the brute-forced globals, broadcast once per
            # tile: the fused wave selects the winner's row with a min-trick
            # instead of a full-scene one-hot gather (ATTR_NAMES order,
            # centers reuse cxb/cyb/czb)
            glob_attr_b = [cxb, cyb, czb] + [
                jnp.broadcast_to(cols_ref[:, j : j + 1], shape)
                for j in range(7, 13)
            ]

        def _gather_attrs(id_pl):
            """One-hot attr fetch by per-ray (f32-encoded) sphere id planes."""
            attr_rows = []
            for g in range(TILE_ROWS):
                onehot = (
                    sphere_iota.astype(jnp.float32) == id_pl[g : g + 1]
                ).astype(jnp.float32)
                got = jnp.dot(attr, onehot, preferred_element_type=jnp.float32)
                attr_rows.append(got)  # [16,128]
            return attr_rows

        def _unpack_attr_rows(attr_rows):
            raw = [
                jnp.concatenate([ar[j:j+1] for ar in attr_rows], axis=0)
                for j in range(12)
            ]  # c_hi(3), c_lo(3), inv_r, kind, param, albedo(3)
            return [
                raw[0] + raw[3],  # cx
                raw[1] + raw[4],  # cy
                raw[2] + raw[5],  # cz
                raw[6], raw[7], raw[8], raw[9], raw[10], raw[11],
            ]  # cx, cy, cz, inv_r, kind, param, alb_r, alb_g, alb_b

        def brute_globals_scalar(ox, oy, oz, dx, dy, dz, a, inv_a, eps_a):
            """Unrolled per-sphere scalar quadratics from SMEM — whole-tile
            planes per sphere, no padding. Globals-first ordering makes the
            unroll index the global sphere id."""
            big_pl = jnp.full_like(a, BIG)
            t_best = big_pl
            id_best = jnp.zeros_like(a)
            attrs = [jnp.zeros_like(a) for _ in range(9)]
            od = _dot3(ox, oy, oz, dx, dy, dz)
            oo = _dot3(ox, oy, oz, ox, oy, oz)
            for si in range(n_globals):
                g = [glob_ref[si, j]
                     for j in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)]
                (cx_, cy_, cz_, ccr2_, c2x_, c2y_, c2z_, inv_r_, kind_,
                 param_, ar_, ag_, ab_) = g
                # expanded form with f64-precomputed ccr2 — the same float
                # grouping as the broadcast brute pass (bit-identical)
                c_dot_d = cx_ * dx + cy_ * dy + cz_ * dz
                c2_dot_o = c2x_ * ox + c2y_ * oy + c2z_ * oz
                half_b = od - c_dot_d
                cterm = oo - c2_dot_o + ccr2_
                disc = half_b * half_b - a * cterm
                sq = jnp.sqrt(disc)  # NaN -> miss via comparison routing
                ta0 = -half_b - sq
                ta1 = -half_b + sq
                ta = jnp.where(ta0 > eps_a, ta0, ta1)
                tc = jnp.where(ta > eps_a, ta * inv_a, BIG)
                better = tc < t_best
                t_best = jnp.where(better, tc, t_best)
                id_best = jnp.where(better, jnp.float32(si), id_best)
                svals = (cx_, cy_, cz_, inv_r_, kind_, param_, ar_, ag_, ab_)
                attrs = [
                    jnp.where(better, sv, av)
                    for sv, av in zip(svals, attrs)
                ]
            return t_best, id_best, tuple(attrs)

        def brute_globals(ox, oy, oz, dx, dy, dz, a, inv_a, eps_a):
            """(t, id, attrs) planes: nearest hit + winner attributes over
            the brute-force (global) sphere table."""
            if scalar_globals:
                return brute_globals_scalar(
                    ox, oy, oz, dx, dy, dz, a, inv_a, eps_a
                )
            od = _dot3(ox, oy, oz, dx, dy, dz)
            oo = _dot3(ox, oy, oz, ox, oy, oz)
            g_pad = cols_ref.shape[0]
            giota = jax.lax.broadcasted_iota(
                jnp.int32, (g_pad, TILE_LANES), 0
            )

            t_rows = []
            id_rows = []
            attr_rows = [[] for _ in range(9)]
            for g in range(TILE_ROWS):
                dxr, dyr, dzr = dx[g:g+1], dy[g:g+1], dz[g:g+1]
                oxr, oyr, ozr = ox[g:g+1], oy[g:g+1], oz[g:g+1]
                c_dot_d = cxb * dxr + cyb * dyr + czb * dzr
                c2_dot_o = c2xb * oxr + c2yb * oyr + c2zb * ozr
                half_b = od[g:g+1] - c_dot_d
                cterm = oo[g:g+1] - c2_dot_o + ccr2b
                a_row = a[g:g+1]
                disc = half_b * half_b - a_row * cterm
                sq = jnp.sqrt(disc)  # NaN -> miss via comparison routing
                ta0 = -half_b - sq
                ta1 = -half_b + sq
                eps_row = eps_a[g:g+1]
                ta = jnp.where(ta0 > eps_row, ta0, ta1)
                ta = jnp.where(ta > eps_row, ta, BIG)
                ta_best = jnp.min(ta, axis=0, keepdims=True)
                t_best = jnp.where(
                    ta_best < BIG_CUT, ta_best * inv_a[g:g+1], BIG
                )
                cand = jnp.where(ta == ta_best, giota, jnp.int32(s_pad))
                sel = jnp.min(cand, axis=0, keepdims=True)
                t_rows.append(t_best)
                id_rows.append(sel.astype(jnp.float32))
                sel_mask = giota == sel
                for j, ab_ in enumerate(glob_attr_b):
                    attr_rows[j].append(
                        jnp.min(
                            jnp.where(sel_mask, ab_, BIG), axis=0,
                            keepdims=True,
                        )
                    )

            return (
                jnp.concatenate(t_rows, axis=0),
                jnp.concatenate(id_rows, axis=0),
                tuple(jnp.concatenate(r, axis=0) for r in attr_rows),
            )

        def intersect_tile(ox, oy, oz, dx, dy, dz):
            """Nearest hit for the whole tile. Returns planes."""
            od = _dot3(ox, oy, oz, dx, dy, dz)
            oo = _dot3(ox, oy, oz, ox, oy, oz)
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a

            # the per-ray 1/a scale is deferred to the per-group winner:
            # a > 0, so ordering and eps tests hold on t*a directly, saving
            # two [s_pad,128] multiplies per group in the hot loop
            eps_a = jnp.float32(1e-3) * a

            t_rows = []
            attr_rows = []
            for g in range(TILE_ROWS):
                dxr, dyr, dzr = dx[g:g+1], dy[g:g+1], dz[g:g+1]
                oxr, oyr, ozr = ox[g:g+1], oy[g:g+1], oz[g:g+1]
                c_dot_d = cxb * dxr + cyb * dyr + czb * dzr  # [s_pad,128]
                c2_dot_o = c2xb * oxr + c2yb * oyr + c2zb * ozr  # 2c . o
                half_b = od[g:g+1] - c_dot_d
                cterm = oo[g:g+1] - c2_dot_o + ccr2b
                a_row = a[g:g+1]
                disc = half_b * half_b - a_row * cterm
                # no max(disc, 0) and no disc>0 test: sqrt(neg) -> NaN, and
                # NaN compares falsify both selections, routing misses to BIG
                sq = jnp.sqrt(disc)
                ta0 = -half_b - sq  # = t0 * a
                ta1 = -half_b + sq
                eps_row = eps_a[g:g+1]
                ta = jnp.where(ta0 > eps_row, ta0, ta1)
                ta = jnp.where(ta > eps_row, ta, BIG)
                ta_best = jnp.min(ta, axis=0, keepdims=True)  # [1,128]
                t_best = jnp.where(
                    ta_best < BIG_CUT, ta_best * inv_a[g:g+1], BIG
                )
                cand = jnp.where(ta == ta_best, sphere_iota, jnp.int32(s_pad))
                sel = jnp.min(cand, axis=0, keepdims=True)  # [1,128]
                onehot = (sphere_iota == sel).astype(jnp.float32)  # [s_pad,128]
                # Single-pass bf16 MXU gather: safe because the table stores
                # centers split hi/lo (both bf16-exactly-representable-ish)
                # and every other attribute tolerates 0.4% rounding.
                got = jnp.dot(attr, onehot, preferred_element_type=jnp.float32)
                t_rows.append(t_best)
                attr_rows.append(got)  # [16,128]

            t_pl = jnp.concatenate(t_rows, axis=0)  # [8,128]
            return t_pl, _unpack_attr_rows(attr_rows)

        def occlusion_t(p, ld):
            """Shadow-test nearest-hit distance (unit dir, no attributes):
            the brute quadratic over all spheres, t only."""
            px_, py_, pz_ = p
            ldx, ldy, ldz = ld
            od = _dot3(px_, py_, pz_, ldx, ldy, ldz)
            oo = _dot3(px_, py_, pz_, px_, py_, pz_)
            t_rows = []
            for g in range(TILE_ROWS):
                c_dot_d = cxb * ldx[g:g+1] + cyb * ldy[g:g+1] + czb * ldz[g:g+1]
                c2_dot_o = c2xb * px_[g:g+1] + c2yb * py_[g:g+1] + c2zb * pz_[g:g+1]
                half_b = od[g:g+1] - c_dot_d
                cterm = oo[g:g+1] - c2_dot_o + ccr2b
                disc = half_b * half_b - cterm  # unit dir: a == 1
                sq = jnp.sqrt(disc)
                ta0 = -half_b - sq
                ta1 = -half_b + sq
                eps_ = jnp.float32(1e-3)
                ta = jnp.where(ta0 > eps_, ta0, ta1)
                ta = jnp.where(ta > eps_, ta, BIG)
                t_rows.append(jnp.min(ta, axis=0, keepdims=True))
            return jnp.concatenate(t_rows, axis=0)

        def bounce_step(b, s, pu, o, d, thr, rad, active_i, rays, extra):
            """One bounce for the whole tile (classic_wavefront callback)."""
            ox, oy, oz = o
            dx, dy, dz = d
            tr, tg, tb = thr
            rr, rg, rb = rad
            # Mosaic cannot carry i1 vectors through loop state; active
            # travels as int32 0/1 and is re-materialized as a mask here.
            active = active_i > 0

            t_pl, (cx, cy, cz, inv_r, kind, param, ar, ag, ab) = (
                intersect_tile(ox, oy, oz, dx, dy, dz)
            )
            hit = t_pl < BIG_CUT
            t_safe = jnp.where(hit, t_pl, 1.0)
            onx = (ox + t_safe * dx - cx) * inv_r
            ony = (oy + t_safe * dy - cy) * inv_r
            onz = (oz + t_safe * dz - cz) * inv_r
            front = _dot3(dx, dy, dz, onx, ony, onz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            n = (onx * sgn, ony * sgn, onz * sgn)

            emit_scale = None
            if n_lights:
                # MIS NEE: direct light at lambertian/glossy hits; lamp
                # emission reached BY a pairable scatter carries the
                # balance-heuristic partner weight (the scatter's pdf rides
                # in ``extra``; b == 0 = fresh camera ray, whose stale
                # value must pass emission through unweighted)
                w_b = bsdf_mis_scale_planes(
                    n_lights, (cx, cy, cz), inv_r, (ox, oy, oz), extra
                )
                emit_scale = jnp.where(
                    (kind == 4.0) & (extra > 0.0) & (b > jnp.uint32(0)),
                    w_b, 1.0,
                )
                hpx = ox + t_safe * dx
                hpy = oy + t_safe * dy
                hpz = oz + t_safe * dz
                light_scal = [
                    [lights_ref[i, j] for j in range(8)]
                    for i in range(n_lights)
                ]
                is_lam = kind == 1.0
                glossy = (kind == 2.0) & (param > jnp.float32(1e-4))

                def pdf_b_fn(ld, cos):
                    pdf_lam = jnp.maximum(cos, 0.0) * np.float32(1.0 / np.pi)
                    pdf_met = scatter_pdf_metal_planes(
                        (dx, dy, dz), n, param, ld
                    )
                    pdf_met = jnp.where(cos > 0.0, pdf_met, 0.0)
                    return jnp.where(
                        is_lam, pdf_lam, jnp.where(glossy, pdf_met, 0.0)
                    )

                dr, dg, db = nee_planes(
                    light_scal, n_lights, (hpx, hpy, hpz), n,
                    (ar, ag, ab), occlusion_t,
                    pix_u if pu is None else pu, s, b, seed,
                    pdf_b_fn=pdf_b_fn,
                )
                nee_mask = active & hit & (is_lam | glossy)
                rr = rr + jnp.where(nee_mask, tr * dr, 0.0)
                rg = rg + jnp.where(nee_mask, tg * dg, 0.0)
                rb = rb + jnp.where(nee_mask, tb * db, 0.0)

            d_in = (dx, dy, dz)  # incoming direction (pre-scatter)
            (o2, d2, thr2, rad2, term) = shade_and_advance(
                active, t_pl, hit, n, front, kind, param, (ar, ag, ab),
                (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), (rr, rg, rb),
                pix_u if pu is None else pu, s, b, seed, sky,
                emit_scale=emit_scale,
            )
            (ox, oy, oz), (dx, dy, dz) = o2, d2
            (tr, tg, tb), (rr, rg, rb) = thr2, rad2

            rays = rays + active_i
            cont = active & hit & ~term
            if n_lights:
                # carried scatter pdf (the MIS pairing): cosine lobe for
                # lambertian, the metal lobe for glossy scatters
                extra = jnp.where(
                    cont & is_lam,
                    scatter_pdf_lam_planes(n, (dx, dy, dz)),
                    jnp.where(
                        cont & glossy,
                        scatter_pdf_metal_planes(
                            d_in, n, param, (dx, dy, dz)
                        ),
                        0.0,
                    ),
                )
            active_i = cont.astype(jnp.int32)
            return (
                (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), (rr, rg, rb),
                active_i, rays, extra,
            )

        def camera_rays(s_plane, px=px, py=py, pix_u=pix_u):
            """Primary rays for per-lane sample ids ``s_plane`` (uint32)."""
            return camera_ray_planes(
                cam[:19], px, py, pix_u, s_plane, seed, inv_w, inv_h, lens
            )

        sample_offset_u = sample_offset.astype(jnp.uint32)

        if grid_static is None:
            # the classic wavefront loop is the shared scaffold in common.py
            extra0 = None
            if n_lights:
                # carried cosine pdf of the previous scatter (f32)
                extra0 = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.float32)
            rotate = None
            if classic_rotate:
                # rotating strided assignment on the BRUTE path: same
                # slot->pixel map as the grid mode (outputs unstrided by
                # the caller); values are bit-identical — RNG is keyed by
                # (pixel, sample), rotation only changes which lane works
                # which pixel
                rotate = dict(
                    slot_pixel=slot_pixel, row_ids=row_ids, width=width,
                    pix0=pix.astype(jnp.uint32), done0=local_pix >> 31,
                )
            state = classic_wavefront(
                bounce_step, camera_rays, spp, max_bounces, in_image,
                sample_offset_u, extra0=extra0, rotate=rotate,
            )
        else:
            # fused-DDA wavefront (common.grid_wavefront): one grid cell per
            # lane per iteration, finished lanes shade + regenerate in the
            # same iteration (see kernels/worklist.py module docstring for
            # why not a nested while_loop: per-wave MAX step count ~12 vs
            # mean 1.33)
            def seg_init(o, d):
                ox, oy, oz = o
                dx, dy, dz = d
                a = _dot3(dx, dy, dz, dx, dy, dz)
                inv_a = 1.0 / a
                eps_a = jnp.float32(1e-3) * a
                t0, id0, attrs0 = brute_globals(
                    ox, oy, oz, dx, dy, dz, a, inv_a, eps_a
                )
                march0, *walk = grid_setup(grid_static, o, d, t0)
                return (
                    (a, inv_a, eps_a), (t0, id0, attrs0),
                    (march0, tuple(walk)),
                )

            def grid_step_fn(ray_ctx, state, o, d):
                a, inv_a, eps_a = ray_ctx
                march, walk, t_best, id_best, attrs = state
                (march, *walk2, t_best, id_best, attrs) = grid_step(
                    grid_static, grid_ref[:],
                    (march, *walk, t_best, id_best, attrs),
                    o, d, a, inv_a, eps_a,
                )
                return march, tuple(walk2), t_best, id_best, attrs

            def hit_surface(attrs, o, d, t_safe):
                (cx, cy, cz, inv_r, kind, param, ar, ag, ab) = attrs
                ox, oy, oz = o
                dx, dy, dz = d
                onx = (ox + t_safe * dx - cx) * inv_r
                ony = (oy + t_safe * dy - cy) * inv_r
                onz = (oz + t_safe * dz - cz) * inv_r
                front = _dot3(dx, dy, dz, onx, ony, onz) < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                n = (onx * sgn, ony * sgn, onz * sgn)
                return n, front, kind, param, (ar, ag, ab)

            zero = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.float32)
            zero_i = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.int32)
            nee_sample = None
            nee_mis_scale = None
            if n_lights:
                from .common import nee_sample_planes

                def nee_sample(p, nrm, alb_, d_in, kind_, param_,
                               pix_u_cur, cur_s, b_plane):
                    light_scal = [
                        [lights_ref[i, j] for j in range(8)]
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

                    return nee_sample_planes(
                        light_scal, n_lights, p, nrm, alb_,
                        pix_u_cur, cur_s, b_plane, seed,
                        pdf_b_fn=pdf_b_fn,
                    )

                def nee_mis_scale(attrs_, o_, pdf_b, _d=None, _t=None):
                    # ATTR_NAMES order: cx, cy, cz, inv_r, ...
                    return bsdf_mis_scale_planes(
                        n_lights, (attrs_[0], attrs_[1], attrs_[2]),
                        attrs_[3], o_, pdf_b,
                    )

            # steps_per_iter stays 1: 2 DDA steps/iteration measured 7%
            # SLOWER on the headline config (483 vs 520 Mrays/s) — most
            # segments finish in <= 1 step, so the second step is wasted
            # for them and the modeled scaffold amortization never
            # materializes (doc/PERF_NOTES census).
            state = grid_wavefront(
                spp=spp, max_bounces=max_bounces, width=width, seed=seed,
                sky=sky, sample_offset_u=sample_offset_u,
                local_pix=local_pix, row_ids=row_ids,
                pix_u0=pix.astype(jnp.uint32),
                slot_pixel=slot_pixel, camera_rays=camera_rays,
                seg_init=seg_init, grid_step_fn=grid_step_fn,
                hit_surface=hit_surface, n_attrs=9,
                walk0=(zero_i, zero_i, zero, zero, zero, zero, zero),
                nee_sample=nee_sample,
                nee_mis_scale=nee_mis_scale,
                walk_t_out_index=6,  # (ix, iz, tmaxx, tmaxz, tdx, tdz, t_out)
                # K wave_steps per while iteration: the loop BOUNDARY
                # (cond reduction + backedge) measured ~306 ns/iter,
                # and the unroll ladder keeps paying past 4 — measured
                # 64-spp headline 711.7 (u4) / 734.7 (u8) / 750.4 (u16)
                # Mrays/s (doc/PERF_NOTES round 4e/4f). The ladder's
                # peak moves DOWN with spp (fewer steps per tile means
                # the duplicated tail idles sooner): 16-spp measured
                # u8 150.6 ms / u16 153.1 / u32 153.8 (round-5 ladder),
                # and 2-spp realtime measured u1 36.8 / u16 34.1 /
                # u4 42.1 fps (round 4h) — hence the 3-tier split.
                # Unlike steps_per_iter (extra DDA work for lanes that
                # didn't need it), unroll repeats the WHOLE step —
                # regeneration included — so no lane wastes work and
                # the output is bit-identical. Off-TPU the knob only
                # multiplies XLA:CPU compile time (the 8-device
                # shard_map tests went from ~6 min to wedged-for-an-
                # hour at unroll=4), so it pays on the real target
                # only.
                unroll=(16 if spp >= 32 else (8 if spp >= 8 else 4))
                if jax.default_backend() == "tpu" else 1,
            )
        out_r_ref[:] = state["rad"][0]
        out_g_ref[:] = state["rad"][1]
        out_b_ref[:] = state["rad"][2]
        import os as _os
        if _os.environ.get("CSGR_DEBUG_ITERS") and grid_static is not None:
            rays_ref[:] = state["iters"]
        else:
            rays_ref[:] = state["rays"]
        if "pad" in state:
            # CSGR_WAVE_PAD census: consume the pad carries so the while
            # simplifier can't DCE them; the comparison is always False
            # (pad values stay ~iteration-count scale, far below BIG)
            rays_ref[:] = rays_ref[:] + (
                state["pad"][0] > BIG
            ).astype(jnp.int32)

    return kernel


class _PackedScene(NamedTuple):
    cols: jax.Array  # [s_pad, 8] f32: cx, cy, cz, |c|^2 - r^2
    attr: jax.Array  # [16, s_pad] f32: c_hi(3), c_lo(3), inv_r, kind, param, albedo(3)


def pack_scene(scene: SphereScene, n_brute: int | None = None) -> _PackedScene:
    """Precompute the kernel's sphere tables (host-side, once per scene).

    ``cols`` feeds the VPU cross-term broadcasts. ``attr`` is the one-hot
    gather table; centers are split into a bf16-exact hi part plus a small lo
    remainder so the gather can use the MXU's fast single bf16 pass without
    losing world-space precision (bf16(c_lo) error ~ 0.4% of an already-small
    remainder).

    ``n_brute``: number of leading spheres to include in the brute-force
    ``cols`` table (the "globals" when a grid worklist covers the rest);
    ``attr`` always covers the whole scene.
    """
    c = np.asarray(scene.centers, np.float32)
    r = np.asarray(scene.radii, np.float32)
    kind = np.asarray(scene.mat_kind, np.float32)
    alb = np.asarray(scene.albedo, np.float32)
    prm = np.asarray(scene.mat_param, np.float32)
    s = c.shape[0]
    s_pad = max(8, int(np.ceil(s / 8)) * 8)
    nb = s if n_brute is None else n_brute
    nb_pad = max(8, int(np.ceil(nb / 8)) * 8)

    cols = np.zeros((nb_pad, 16), np.float32)
    attr = np.zeros((16, s_pad), np.float32)
    cols[:nb, 0:3] = c[:nb]
    cols[:nb, 3] = np.sum(c[:nb] * c[:nb], axis=1) - r[:nb] * r[:nb]
    cols[:nb, 4:7] = 2.0 * c[:nb]  # pre-scaled for the c-term dot
    # shading attrs of the brute spheres (worklist mode selects them with a
    # min-trick instead of the one-hot attr gather): inv_r, kind, param, alb
    # signed: a NEGATIVE radius flips the outward normal — the RTIOW
    # hollow-bubble trick (sphere inside a glass sphere with r < 0)
    cols[:nb, 7] = 1.0 / np.where(np.abs(r[:nb]) > 1e-12, r[:nb], 1e-12)
    cols[:nb, 8] = kind[:nb]
    cols[:nb, 9] = prm[:nb]
    cols[:nb, 10:13] = alb[:nb]
    cols[:nb, 13] = r[:nb] * r[:nb]  # oc-form quadratic (scalar globals)
    # padding spheres: huge positive c-term constant => disc < 0 always
    cols[nb:, 3] = 1e30

    import ml_dtypes

    c_hi = c.astype(ml_dtypes.bfloat16).astype(np.float32)
    c_lo = c - c_hi
    attr[0:3, :s] = c_hi.T
    attr[3:6, :s] = c_lo.T
    attr[6, :s] = 1.0 / np.where(np.abs(r) > 1e-12, r, 1e-12)  # signed
    attr[7, :s] = kind
    attr[8, :s] = prm
    attr[9:12, :s] = alb.T
    return _PackedScene(
        cols=jnp.asarray(cols),
        attr=jnp.asarray(attr),
    )


def pack_camera(camera: Camera) -> jax.Array:
    vals = jnp.concatenate([
        camera.origin, camera.lower_left, camera.horizontal, camera.vertical,
        camera.u, camera.v, camera.lens_radius[None],
        jnp.zeros((_CAM_SIZE - 19,), jnp.float32),
    ])
    return vals.reshape(1, _CAM_SIZE).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounces", "lens", "sky", "interpret",
        "rows", "grid_static", "n_globals", "n_lights", "classic_rotate",
    ),
)
def _render_packed(
    packed: _PackedScene,
    cam_row: jax.Array,
    width: int,
    height: int,
    spp: int,
    max_bounces: int,
    seed,
    sample_offset,
    lens: bool,
    sky: str,
    interpret: bool,
    rows: int,
    row_offset,
    grid_static=None,
    grid_table=None,
    n_globals=0,
    lights_tab=None,
    n_lights=0,
    classic_rotate=False,
):
    n_pix = width * rows  # this slab's pixel count (rows == height unsharded)
    n_tiles = pl.cdiv(n_pix, TILE)
    meta = jnp.zeros((1, _META_SIZE), jnp.int32)
    meta = meta.at[0, 0].set(jnp.asarray(seed, jnp.int32))
    meta = meta.at[0, 1].set(jnp.asarray(sample_offset, jnp.int32))
    meta = meta.at[0, 2].set(jnp.asarray(row_offset, jnp.int32) * width)

    s_pad = packed.attr.shape[1]  # static via the array shape
    kernel = _make_kernel(
        width, height, spp, max_bounces, lens, sky, s_pad, n_pix,
        grid_static=grid_static, n_globals=n_globals, n_lights=n_lights,
        classic_rotate=classic_rotate,
    )
    out_shape = (
        jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.int32),
    )
    plane_spec = pl.BlockSpec(
        (TILE_ROWS, TILE_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cam row
        pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
        pl.BlockSpec(memory_space=pltpu.VMEM),  # cols
        pl.BlockSpec(memory_space=pltpu.VMEM),  # attr
    ]
    inputs = [cam_row, meta, packed.cols, packed.attr]
    if grid_static is not None:
        # the same cols table again, as SMEM scalars for the unrolled
        # globals quadratics
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(packed.cols)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # worklists
        inputs.append(grid_table)
    if n_lights:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # lights
        inputs.append(lights_tab)
    r, g, b, rays = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(
            plane_spec,
            plane_spec,
            plane_spec,
            plane_spec,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)

    if grid_static is not None or classic_rotate:
        # un-stride: kernel slot q of tile t holds pixel q*n_tiles + t
        def unstride(arr):
            return arr.reshape(n_tiles, TILE).T.reshape(-1)

        r, g, b = unstride(r), unstride(g), unstride(b)
    flat = jnp.stack(
        [r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1
    )[:n_pix]
    image = flat.reshape(rows, width, 3) / spp
    return image, jnp.sum(rays)


def render_image_pallas(
    scene: SphereScene,
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
    nee: bool = False,
    rotate: bool | str = "auto",
):
    """Drop-in for ``integrator.render_image`` on SphereScene.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU) — the
    "fake backend" used by tests to validate against the jnp reference.
    ``rows``/``row_offset`` render a full-width horizontal slab of the
    ``width x height`` image (the sharding primitive; RNG and camera stay
    functions of global pixel coordinates, mirroring integrator.render_tile).

    ``worklist``: "auto" builds per-cell grid worklists when the scene shape
    profits (many small slab-confined spheres — kernels/worklist.py); True
    forces the attempt, False forces pure brute force.

    ``nee=True`` enables next-event estimation toward the scene's emissive
    spheres (render/lights.py). On the brute path the shadow test is one
    extra pass over the broadcast sphere tables; on the grid-worklist path
    shadow rays run as SHADOW SEGMENTS through the same fused DDA
    (common.grid_wavefront nee_sample hook), with the sampled lamp's own
    surface hit excluded by sphere id.

    ``rotate``: rotating strided sample assignment on the BRUTE (classic)
    path — bit-identical output (RNG is pixel-keyed); it averages a
    lane's load over its column's 8 image-strided pixels, so it pays on
    scenes with per-pixel load variance. "auto" enables it whenever the
    brute path runs with several samples; the grid-worklist path always
    rotates regardless.
    """
    if not jitter:
        raise NotImplementedError("megakernel always jitters (spp>=1)")
    if nee and not (np.asarray(scene.mat_kind) == 4).any():
        raise ValueError("nee=True but the scene has no emissive spheres")
    if worklist == "auto" and scene.num_spheres < 256:
        # measured crossover (doc/PERF_NOTES): per-cell worklists only
        # beat the rotating brute pass once that pass is expensive.
        # Night scene, 148 spheres: brute 365 vs grid 237 plain, 249 vs
        # 161 with NEE; RTIOW/night at ~490: grid wins decisively (520 vs
        # ~90 plain, 96 vs 65 NEE). Force worklist=True to override.
        worklist = False

    def _prepare(scene=scene):
        lights_tab = None
        n_lights = 0
        grid_static = None
        grid_table = None
        n_glob = 0
        if worklist in (True, "auto"):
            packed_grid = pack_grid(scene)
            if packed_grid is not None:
                import ml_dtypes

                pack, scene = packed_grid  # scene reordered: globals first
                n_glob = pack.n_globals
                grid_static = pack.static
                # bf16 storage is lossless here (every value bf16-exact)
                # and makes the in-kernel gather a native single-pass MXU
                # matmul
                grid_table = jnp.asarray(
                    pack.table.astype(ml_dtypes.bfloat16)
                )
                packed = pack_scene(scene, n_brute=pack.n_globals)
            elif worklist is True:
                raise ValueError(
                    "worklist=True but the scene is not griddable"
                )
            else:
                packed = pack_scene(scene)
        else:
            packed = pack_scene(scene)
        if nee:
            # lights resolved AFTER any worklist reordering: the 8th
            # column is the lamp's scene-sphere id in the kernel's id
            # space, letting the grid path's shadow walk exclude the
            # lamp's own surface hit exactly (render/lights.py owns the
            # extraction + estimator)
            from ..render.lights import extract_lights

            lights, ids = extract_lights(scene, return_ids=True)
            n_lights = lights.num_lights
            tab = np.zeros((n_lights, 8), np.float32)
            tab[:, 0:3] = lights.centers
            tab[:, 3] = lights.radii
            tab[:, 4:7] = lights.emit
            tab[:, 7] = ids.astype(np.float32)
            lights_tab = jnp.asarray(tab)
        return packed, grid_static, grid_table, n_glob, lights_tab, n_lights

    (packed, grid_static, grid_table, n_glob, lights_tab, n_lights) = (
        device_cache(
            _SCENE_PREP_CACHE,
            (id(scene.centers), str(worklist), nee),
            scene.centers,
            _prepare,
        )
    )
    cam_row = device_cache(
        _CAM_CACHE, id(camera.origin), camera.origin,
        lambda: pack_camera(camera),
    )
    if rotate == "auto":
        # rotation averages a lane's load over its column's 8 pixels; the
        # win needs multiple samples to amortize the scatter
        rotate = spp >= 4
    return _render_packed(
        packed, cam_row, width, height, spp, max_bounces,
        jnp.asarray(seed, jnp.int32), jnp.asarray(sample_offset, jnp.int32),
        lens, sky, interpret,
        height if rows is None else rows,
        jnp.asarray(row_offset, jnp.int32),
        grid_static=grid_static,
        grid_table=grid_table,
        n_globals=0 if grid_static is None else n_glob,
        lights_tab=lights_tab,
        n_lights=n_lights,
        classic_rotate=bool(rotate) and grid_static is None,
    )
