"""Shared plane-level building blocks for the Pallas path-tracing kernels.

All kernels keep per-ray state as [8, 128] f32 "component planes" (the
native VPU tile). This module holds the pieces common to the sphere-soup
megakernel and the CSG tape kernel:

- PCG4D RNG over uint32 planes (bit-identical to render/sampling.py);
- RTIOW material scatter on planes (bit-identical to render/materials.py);
- thin-lens/pinhole camera ray generation from SMEM scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TILE_ROWS = 8
TILE_LANES = 128
TILE = TILE_ROWS * TILE_LANES

BIG = np.float32(1e30)
BIG_CUT = np.float32(5e29)

# Camera scalar layout in the f32 SMEM row
CAM_SIZE = 24
META_SIZE = 8


def device_cache(cache: dict, key, keyhold, build):
    """Memoize DEVICE-RESIDENT packed inputs keyed on host-array identity.

    The packers (pack_scene, grid tables, camera rows, light tables) are
    cheap host work, but uploading their products costs a host->device
    transfer per kernel call — ~ms each under the axon tunnel, which
    capped the realtime path-tracing loop at ~15 fps (demo6). Static
    scenes re-upload identical bytes every frame; this cache keys on
    ``id()`` of a representative source array (``keyhold`` pins it
    against id reuse) so animated scenes (fresh arrays per frame) miss
    naturally. Inside a jit/shard_map trace the cache is BYPASSED both
    ways (no read, no write): jnp.asarray returns tracers there, and a
    cached tracer would leak out of its trace.
    """
    try:
        from jax._src.core import trace_state_clean
        clean = trace_state_clean()
    except Exception:  # API moved: fall back to always-rebuild
        clean = False
    if not clean:
        return build()
    ent = cache.get(key)
    if ent is not None and ent[0] is keyhold:
        return ent[1]
    val = build()
    if len(cache) > 32:
        cache.clear()
    cache[key] = (keyhold, val)
    return val


def pcg4d_planes(a, b, c, d):
    """PCG4D hash on uint32 planes -> four f32 uniforms in [0,1)."""
    mul = jnp.uint32(1664525)
    inc = jnp.uint32(1013904223)
    v = [x * mul + inc for x in (a, b, c, d)]
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    v = [x ^ (x >> jnp.uint32(16)) for x in v]
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    scale = jnp.float32(1.0 / 16777216.0)
    # Mosaic has no uint32->f32 cast; after >>8 the value fits 24 bits, so
    # the int32 round-trip is exact.
    return tuple(
        (x >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * scale
        for x in v
    )


def dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def scatter_planes(kind, param, alb, d, n, front, u0, u1, u2):
    """RTIOW material dispatch on planes (see render/materials.py).

    kind/param/alb_* are per-ray attribute planes; d the incoming direction
    planes; n the unit shading normal planes (already opposing d); front the
    solid-level front-face mask. Returns (new_d, atten, emitted, terminate).
    """
    dx, dy, dz = d
    nx, ny, nz = n
    ar, ag, ab = alb

    inv_len = jax.lax.rsqrt(
        jnp.maximum(dot3(dx, dy, dz, dx, dy, dz), jnp.float32(1e-20))
    )
    udx, udy, udz = dx * inv_len, dy * inv_len, dz * inv_len

    z = 1.0 - 2.0 * u0
    r_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = jnp.float32(2.0 * np.pi) * u1
    rux = r_ * jnp.cos(phi)
    ruy = r_ * jnp.sin(phi)
    ruz = z

    lamx, lamy, lamz = nx + rux, ny + ruy, nz + ruz
    lam_deg = dot3(lamx, lamy, lamz, lamx, lamy, lamz) < jnp.float32(1e-12)
    lamx = jnp.where(lam_deg, nx, lamx)
    lamy = jnp.where(lam_deg, ny, lamy)
    lamz = jnp.where(lam_deg, nz, lamz)

    ud_dot_n = dot3(udx, udy, udz, nx, ny, nz)
    rfx = udx - 2.0 * ud_dot_n * nx
    rfy = udy - 2.0 * ud_dot_n * ny
    rfz = udz - 2.0 * ud_dot_n * nz
    mex = rfx + param * rux
    mey = rfy + param * ruy
    mez = rfz + param * ruz
    metal_absorbed = dot3(mex, mey, mez, nx, ny, nz) <= 0.0

    ior = jnp.maximum(param, jnp.float32(1e-6))
    eta = jnp.where(front, 1.0 / ior, ior)
    cos_t = jnp.minimum(-ud_dot_n, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot = eta * sin_t > 1.0
    r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
    rp = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    use_refl = cannot | (u2 < rp)
    ppx = eta * (udx + cos_t * nx)
    ppy = eta * (udy + cos_t * ny)
    ppz = eta * (udz + cos_t * nz)
    pl2 = dot3(ppx, ppy, ppz, ppx, ppy, ppz)
    par = -jnp.sqrt(jnp.abs(1.0 - pl2))
    refx = ppx + par * nx
    refy = ppy + par * ny
    refz = ppz + par * nz
    dlx = jnp.where(use_refl, rfx, refx)
    dly = jnp.where(use_refl, rfy, refy)
    dlz = jnp.where(use_refl, rfz, refz)

    is_lam = kind == 1.0
    is_metal = kind == 2.0
    is_diel = kind == 3.0
    is_em = kind == 4.0
    is_nm = kind == 0.0

    ndx = jnp.where(is_lam, lamx, jnp.where(is_metal, mex, dlx))
    ndy = jnp.where(is_lam, lamy, jnp.where(is_metal, mey, dly))
    ndz = jnp.where(is_lam, lamz, jnp.where(is_metal, mez, dlz))
    atr = jnp.where(is_diel, 1.0, ar)
    atg = jnp.where(is_diel, 1.0, ag)
    atb = jnp.where(is_diel, 1.0, ab)
    emr = jnp.where(is_nm, 0.5 * (nx + 1.0), jnp.where(is_em, ar, 0.0))
    emg = jnp.where(is_nm, 0.5 * (ny + 1.0), jnp.where(is_em, ag, 0.0))
    emb = jnp.where(is_nm, 0.5 * (nz + 1.0), jnp.where(is_em, ab, 0.0))
    term = is_nm | is_em | (is_metal & metal_absorbed)
    return (
        (ndx, ndy, ndz),
        (atr, atg, atb),
        (emr, emg, emb),
        term,
        (udx, udy, udz),
    )


def camera_ray_planes(cam, px, py, pix_u, s_plane, seed, inv_w, inv_h, lens):
    """Primary-ray planes for per-lane sample ids — the shared raygen of all
    wavefront kernels. ``cam`` is the unpacked 19-scalar camera tuple."""
    (cox, coy, coz, llx, lly, llz, hx, hy, hz, vx, vy, vz,
     ux, uy, uz, vvx, vvy, vvz, lens_radius) = cam
    u0, u1, u2, u3 = pcg4d_planes(
        pix_u, s_plane,
        jnp.broadcast_to(jnp.uint32(0xA5A5A5A5), pix_u.shape),
        jnp.broadcast_to(seed.astype(jnp.uint32), pix_u.shape),
    )
    st_x = (px + u0) * inv_w
    st_y = 1.0 - (py + u1) * inv_h
    if lens:
        lr = jnp.sqrt(u2)
        lphi = jnp.float32(2.0 * np.pi) * u3
        rd0 = lens_radius * lr * jnp.cos(lphi)
        rd1 = lens_radius * lr * jnp.sin(lphi)
        offx = rd0 * ux + rd1 * vvx
        offy = rd0 * uy + rd1 * vvy
        offz = rd0 * uz + rd1 * vvz
    else:
        offx = offy = offz = jnp.zeros_like(st_x)
    o = (cox + offx, coy + offy, coz + offz)
    d = (
        llx + st_x * hx + st_y * vx - cox - offx,
        lly + st_x * hy + st_y * vy - coy - offy,
        llz + st_x * hz + st_y * vz - coz - offz,
    )
    return o, d


def shade_and_advance(
    mask, t, hit, n, front, kind, param, alb,
    o, d, thr, rad, pix_u, cur_s, b_plane, seed, sky,
    emit_scale=None,
):
    """The shared per-segment shading tail of every wavefront kernel:
    RNG -> material scatter -> sky/emission accumulation -> path advance.

    ``mask``: which lanes shade this wave (active lanes in the classic loop,
    finished-marching lanes in the fused-DDA loop). ``n`` must already be
    the unit shading normal opposing d; ``front`` the solid-level
    front-face flag. ``emit_scale``: optional f32 plane multiplying the
    EMISSION term only (the MIS partner weight on BSDF-found lamp
    emission — the sky is unaffected). Returns (o, d, thr, rad, term)
    with updates applied only under ``mask & hit`` / ``mask & ~hit`` as
    appropriate.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    tr, tg, tb = thr
    rr, rg, rb = rad

    u0, u1, u2, _u3 = pcg4d_planes(
        pix_u, cur_s, b_plane,
        jnp.broadcast_to(seed.astype(jnp.uint32), cur_s.shape),
    )
    (ndx, ndy, ndz), (atr, atg, atb), (emr, emg, emb), term, ud = (
        scatter_planes(kind, param, alb, (dx, dy, dz), n, front, u0, u1, u2)
    )
    if emit_scale is not None:
        emr = emr * emit_scale
        emg = emg * emit_scale
        emb = emb * emit_scale
    skr, skg, skb = sky_planes(ud, sky)

    t_safe = jnp.where(hit, t, 1.0)
    hx_ = ox + t_safe * dx
    hy_ = oy + t_safe * dy
    hz_ = oz + t_safe * dz

    missed = mask & ~hit
    hit_m = mask & hit
    rr = rr + jnp.where(missed, tr * skr, 0.0)
    rg = rg + jnp.where(missed, tg * skg, 0.0)
    rb = rb + jnp.where(missed, tb * skb, 0.0)
    rr = rr + jnp.where(hit_m, tr * emr, 0.0)
    rg = rg + jnp.where(hit_m, tg * emg, 0.0)
    rb = rb + jnp.where(hit_m, tb * emb, 0.0)
    tr = jnp.where(hit_m, tr * atr, tr)
    tg = jnp.where(hit_m, tg * atg, tg)
    tb = jnp.where(hit_m, tb * atb, tb)
    ox = jnp.where(hit_m, hx_, ox)
    oy = jnp.where(hit_m, hy_, oy)
    oz = jnp.where(hit_m, hz_, oz)
    dx = jnp.where(hit_m, ndx, dx)
    dy = jnp.where(hit_m, ndy, dy)
    dz = jnp.where(hit_m, ndz, dz)
    return (
        (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), (rr, rg, rb), term,
    )


def classic_wavefront(
    bounce_step, camera_rays, spp, max_bounces, in_image, sample_offset_u,
    extra0=None, rotate=None, unroll: int = 1,
):
    """The per-lane wavefront loop shared by the brute megakernel and the
    CSG tape kernel: every lane regenerates a new camera sample the moment
    its path terminates.

    ``bounce_step(b_plane_u32, s_plane_u32, pix_u, o, d, thr, rad,
    active_i, rays, extra) -> (o, d, thr, rad, active_i, rays, extra)``
    runs one bounce for the whole tile. ``extra`` is an optional pytree of
    per-lane accumulators (e.g. the tape kernel's overflow counter).

    ``rotate``: dict enabling the ROTATING STRIDED sample assignment (the
    occupancy fix measured on the megakernel: per-pixel lane binding makes
    a tile run at its most expensive pixel's pace; rotating each lane over
    its lane-column's 8 image-strided pixels per sample averages the load).
    Keys:
      - ``slot_pixel(k_plane) -> (global pixel id, valid)``
      - ``row_ids``: [8,128] row iota (scatter destinations)
      - ``width``: image width (px/py recompute)
      - ``pix0``: initial pix_u plane (value-dependent, non-splat)
      - ``done0``: initial done plane (value-dependent zeros)
    In rotating mode ``camera_rays(s, px, py, pix_u)`` takes the per-regen
    pixel planes, bounce_step's ``rad`` aggregates the CURRENT SAMPLE only,
    and completed samples are scattered to their pixel's row slot with
    masked sublane reductions; outputs are in strided-slot layout (pixel =
    slot * n_tiles + tile — the caller un-strides).

    Returns the final state dict.
    """
    shape = in_image.shape
    zero = jnp.zeros(shape, jnp.float32)
    zero_i = jnp.zeros(shape, jnp.int32)
    state0 = dict(
        o=(zero, zero, zero),
        d=(zero, zero, zero),
        thr=(zero, zero, zero),
        rad=(zero, zero, zero),
        active=zero_i,
        b_ctr=zero_i,
        cur_s=jnp.zeros(shape, jnp.uint32),
        done=jnp.where(in_image, 0, spp).astype(jnp.int32),
        rays=zero_i,
    )
    if rotate is not None:
        state0["done"] = rotate["done0"]
        state0["samp"] = (zero, zero, zero)
        state0["pix_u"] = rotate["pix0"]
    if extra0 is not None:
        state0["extra"] = extra0

    def wave_cond(st):
        has_work = (st["active"] > 0) | (st["done"] < spp)
        return jnp.max(has_work.astype(jnp.int32)) > 0

    def wave_step(st):
        want = (st["active"] == 0) & (st["done"] < spp)
        s_new = st["done"].astype(jnp.uint32) + sample_offset_u
        if rotate is None:
            regen = want
            consumed = want
            go, gd = camera_rays(s_new)
            pix_cur = None
        else:
            width = rotate["width"]
            pixg, valid = rotate["slot_pixel"](st["done"])
            regen = want & valid
            consumed = want  # invalid slots are consumed with no work
            px_n = (pixg % width).astype(jnp.float32)
            py_n = (pixg // width).astype(jnp.float32)
            pixu_n = pixg.astype(jnp.uint32)
            pix_cur = jnp.where(regen, pixu_n, st["pix_u"])
            go, gd = camera_rays(s_new, px_n, py_n, pixu_n)

        def sel(new, old):
            return jnp.where(regen, new, old)

        o = tuple(sel(g, v) for g, v in zip(go, st["o"]))
        d = tuple(sel(g, v) for g, v in zip(gd, st["d"]))
        one = jnp.ones_like(go[0])
        thr = tuple(sel(one, v) for v in st["thr"])
        cur_s = jnp.where(regen, s_new, st["cur_s"])
        b_ctr = jnp.where(regen, 0, st["b_ctr"])
        done = st["done"] + consumed.astype(jnp.int32)
        active_entry = jnp.where(regen, 1, st["active"])

        if rotate is None:
            agg = st["rad"]
        else:
            agg = tuple(sel(jnp.zeros_like(one), v) for v in st["samp"])

        (o, d, thr, agg, active_i, rays, extra) = bounce_step(
            b_ctr.astype(jnp.uint32), cur_s, pix_cur, o, d, thr, agg,
            active_entry, st["rays"], st.get("extra"),
        )
        b_ctr = b_ctr + 1
        active_i = jnp.where(b_ctr >= max_bounces, 0, active_i)

        out = dict(
            o=o, d=d, thr=thr, active=active_i, b_ctr=b_ctr,
            cur_s=cur_s, done=done, rays=rays,
        )
        if rotate is None:
            out["rad"] = agg
        else:
            # scatter completed samples to their pixel's row slot:
            # dst row = (r + k) % 8, realized as masked sublane reductions
            complete = (active_entry > 0) & (active_i == 0)
            k_cur = (cur_s - sample_offset_u).astype(jnp.int32)
            dst = (rotate["row_ids"] + k_cur) & 7
            masks = [complete & (dst == t_row) for t_row in range(8)]
            rad = []
            for s_ch, r_ch in zip(agg, st["rad"]):
                contrib = jnp.where(complete, s_ch, 0.0)
                rows = [
                    r_ch[t : t + 1]
                    + jnp.sum(jnp.where(masks[t], contrib, 0.0),
                              axis=0, keepdims=True)
                    for t in range(8)
                ]
                rad.append(jnp.concatenate(rows, axis=0))
            out["rad"] = tuple(rad)
            out["samp"] = agg
            out["pix_u"] = pix_cur
        if extra is not None:
            out["extra"] = extra
        return out

    # ``unroll``: K bounce-steps per while iteration, amortizing the loop
    # BOUNDARY (scalar cond reduction + backedge, measured ~306 ns/iter on
    # the grid path — doc/PERF_NOTES round 4). wave_step is pure and idle
    # on lanes with nothing to do, so output is bit-identical at any K.
    # CSGR_WAVE_UNROLL overrides for census runs.
    import os as _os

    unroll = int(_os.environ.get("CSGR_WAVE_UNROLL", str(unroll)))
    if unroll > 1:
        def wave_body(st):
            for _ in range(unroll):
                st = wave_step(st)
            return st
    else:
        wave_body = wave_step

    return jax.lax.while_loop(wave_cond, wave_body, state0)


def nee_sample_planes(
    light_scal, n_lights, p, n, alb,
    pix_u, cur_s, b_plane, seed, pdf_b_fn=None,
):
    """NEE lamp sampling on planes (occlusion deferred to the caller):
    pick a lamp, cone-sample a direction toward it, compute the analytic
    lamp hit distance and the pdf/BRDF-weighted contribution.

    ``light_scal``: per-light lists of >= 8 SMEM scalars (cx, cy, cz, r,
    er, eg, eb, sphere_id). Returns (ld(3 planes), tl, (wr, wg, wb),
    lamp_id, ok): contribution = w under "not occluded before tl"; w is
    already zero where ``ok`` is False (back-facing cone, p inside the
    lamp, degenerate — callers may skip the shadow walk on ~ok).
    ``lamp_id``: the sampled lamp's scene-sphere id plane (8th scalar;
    -1 rows if the caller has no id space) — lets a worklist-based
    occlusion test exclude the lamp's own surface hit exactly instead of
    by distance tolerance.

    ``pdf_b_fn(ld(3 planes), cos) -> pdf plane``: the vertex BSDF's
    solid-angle pdf at the light direction (the MIS pairing); default is
    the cosine lobe max(cos, 0)/pi. Glossy vertices pass the metal-lobe
    pdf (scatter_pdf_metal_planes) — the kernel twin of
    render/lights.nee_contribution's pdf_b_fn.
    """
    px, py, pz = p
    nx, ny, nz = n
    ar, ag, ab = alb
    eps = np.float32(1e-3)
    two_pi = jnp.float32(2.0 * np.pi)

    u0, u1, u2, _ = pcg4d_planes(
        pix_u, cur_s,
        b_plane | jnp.uint32(0x80000000),  # decouple from scatter RNG
        jnp.broadcast_to(seed.astype(jnp.uint32), cur_s.shape),
    )
    # light pick: unrolled where-chain over the (few) lights
    li = jnp.minimum(
        (u0 * np.float32(n_lights)).astype(jnp.int32), n_lights - 1
    )
    zero = jnp.zeros_like(px)
    cx = cy = cz = r_ = er = eg = eb = zero
    lamp_id = zero - 1.0
    for i in range(n_lights):
        s = light_scal[i]
        pick = li == i
        cx = jnp.where(pick, s[0], cx)
        cy = jnp.where(pick, s[1], cy)
        cz = jnp.where(pick, s[2], cz)
        r_ = jnp.where(pick, s[3], r_)
        er = jnp.where(pick, s[4], er)
        eg = jnp.where(pick, s[5], eg)
        eb = jnp.where(pick, s[6], eb)
        lamp_id = jnp.where(pick, s[7], lamp_id)

    # cone sampling toward the sphere (render/lights.sample_sphere_cone)
    tox, toy, toz = cx - px, cy - py, cz - pz
    dist2 = dot3(tox, toy, toz, tox, toy, toz)
    r2 = r_ * r_
    outside = dist2 > r2 * np.float32(1.0 + 1e-6)
    cos_max = jnp.sqrt(
        jnp.maximum(0.0, 1.0 - r2 / jnp.maximum(dist2, jnp.float32(1e-20)))
    )
    z = 1.0 + u2 * (cos_max - 1.0)
    phi = two_pi * u1
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    inv_len = jax.lax.rsqrt(jnp.maximum(dist2, jnp.float32(1e-20)))
    wx, wy, wz = tox * inv_len, toy * inv_len, toz * inv_len
    sign = jnp.where(wz >= 0.0, 1.0, -1.0)
    a_ = -1.0 / (sign + wz)
    b_ = wx * wy * a_
    t0x, t0y, t0z = 1.0 + sign * wx * wx * a_, sign * b_, -sign * wx
    t1x, t1y, t1z = b_, sign + wy * wy * a_, -wy
    cp, sp = jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t
    ldx = cp * t0x + sp * t1x + z * wx
    ldy = cp * t0y + sp * t1y + z * wy
    ldz = cp * t0z + sp * t1z + z * wz
    inv_pdf = jnp.where(outside, two_pi * (1.0 - cos_max), 0.0)

    # analytic hit distance on the sampled lamp (identity-free shadow
    # target, render/lights.sphere_ray_t)
    half_b = -(tox * ldx + toy * ldy + toz * ldz)  # oc = p - c = -to_c
    cc = dist2 - r2
    sq = jnp.sqrt(half_b * half_b - cc)  # NaN on miss -> rejected
    tl0 = -half_b - sq
    tl1 = -half_b + sq
    tl = jnp.where(tl0 > eps, tl0, tl1)
    tl = jnp.where(tl > eps, tl, BIG)

    cos = dot3(nx, ny, nz, ldx, ldy, ldz)
    if pdf_b_fn is None:
        pdf_b = jnp.maximum(cos, 0.0) * np.float32(1.0 / np.pi)
    else:
        pdf_b = pdf_b_fn((ldx, ldy, ldz), cos)
    ok = (pdf_b > 0.0) & (inv_pdf > 0.0) & (tl < BIG_CUT)
    # balance-heuristic MIS vs the vertex's BSDF strategy folds to
    # q / (1 + q), q = pdf_b * L * ip (render/lights.nee_contribution)
    q = pdf_b * np.float32(n_lights) * inv_pdf
    scale = jnp.where(ok, q / (1.0 + q), 0.0)
    return (
        (ldx, ldy, ldz), tl,
        (ar * er * scale, ag * eg * scale, ab * eb * scale), lamp_id, ok,
    )


def nee_sample_tri_planes(
    light_scal, n_lights, p, n, alb,
    pix_u, cur_s, b_plane, seed, pdf_b_fn=None,
):
    """Triangle-lamp NEE on planes — the kernel twin of
    render/lights.nee_contribution_tri (area sampling, double-sided
    lamps), structured exactly like nee_sample_planes.

    ``light_scal``: EITHER per-light lists of >= 16 SMEM scalars
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, er, eg, eb,
    nx, ny, nz, area) — an unrolled where-chain, right for a few lamps —
    OR a single [16, L_pad] VMEM array for MANY lamps (emissive lamp
    geometry like a mesh light sphere easily has dozens-hundreds of
    faces): the picked lamp's 16 rows come from one one-hot MXU gather
    per row group (~L/8 vector ops) instead of 16*L vector selects.
    Returns (ld(3), tl, w(3), lamp_id, ok) with
    lamp_id = -2 rows: mesh walks do not track face ids, so the shadow
    occlusion test degenerates to the pure distance tolerance — exact
    enough because the sampled point lies ON the lamp face (its own hit
    lands at ~tl, inside the 1e-4 relative window; bf16 table
    reconstruction error is ~1e-5 of a cell, well below it)."""
    px, py, pz = p
    nx_, ny_, nz_ = n
    ar, ag, ab = alb

    u0, u1, u2, _ = pcg4d_planes(
        pix_u, cur_s,
        b_plane | jnp.uint32(0x80000000),  # decouple from scatter RNG
        jnp.broadcast_to(seed.astype(jnp.uint32), cur_s.shape),
    )
    li = jnp.minimum(
        (u0 * np.float32(n_lights)).astype(jnp.int32), n_lights - 1
    )
    zero = jnp.zeros_like(px)
    if not isinstance(light_scal, (list, tuple)):
        # [16, L_pad] table: one-hot gather of each lane's lamp row set
        tab = light_scal
        l_pad = tab.shape[1]
        l_iota = jax.lax.broadcasted_iota(
            jnp.int32, (l_pad, li.shape[1]), 0
        )
        rows: list = [[] for _ in range(16)]
        for g in range(li.shape[0]):
            onehot = (l_iota == li[g : g + 1]).astype(tab.dtype)
            # HIGHEST: lamp geometry must survive in full f32 (the
            # default TPU dot is ONE bf16 pass — would shift sampled
            # points ~0.4% and break the 1e-4 shadow window); the dot
            # is [16, L]@[L, 128], far off any hot path
            got = jax.lax.dot_general(
                tab, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [16, 128]
            for j in range(16):
                rows[j].append(got[j : j + 1])
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
         er, eg, eb, lnx, lny, lnz, area) = (
            jnp.concatenate(r, axis=0) for r in rows
        )
    else:
        v0x = v0y = v0z = e1x = e1y = e1z = e2x = e2y = e2z = zero
        er = eg = eb = lnx = lny = lnz = area = zero
        for i in range(n_lights):
            s = light_scal[i]
            pick = li == i
            v0x = jnp.where(pick, s[0], v0x)
            v0y = jnp.where(pick, s[1], v0y)
            v0z = jnp.where(pick, s[2], v0z)
            e1x = jnp.where(pick, s[3], e1x)
            e1y = jnp.where(pick, s[4], e1y)
            e1z = jnp.where(pick, s[5], e1z)
            e2x = jnp.where(pick, s[6], e2x)
            e2y = jnp.where(pick, s[7], e2y)
            e2z = jnp.where(pick, s[8], e2z)
            er = jnp.where(pick, s[9], er)
            eg = jnp.where(pick, s[10], eg)
            eb = jnp.where(pick, s[11], eb)
            lnx = jnp.where(pick, s[12], lnx)
            lny = jnp.where(pick, s[13], lny)
            lnz = jnp.where(pick, s[14], lnz)
            area = jnp.where(pick, s[15], area)

    # uniform area sample: r = sqrt(u1), barycentrics (1 - r, u2 r)
    r_s = jnp.sqrt(u1)
    bu = 1.0 - r_s
    bv = u2 * r_s
    qx = v0x + bu * e1x + bv * e2x
    qy = v0y + bu * e1y + bv * e2y
    qz = v0z + bu * e1z + bv * e2z
    tox, toy, toz = qx - px, qy - py, qz - pz
    dist2 = dot3(tox, toy, toz, tox, toy, toz)
    tl = jnp.sqrt(jnp.maximum(dist2, jnp.float32(1e-20)))
    inv_tl = 1.0 / tl
    ldx, ldy, ldz = tox * inv_tl, toy * inv_tl, toz * inv_tl

    cos = dot3(nx_, ny_, nz_, ldx, ldy, ldz)
    if pdf_b_fn is None:
        pdf_b = jnp.maximum(cos, 0.0) * np.float32(1.0 / np.pi)
    else:
        pdf_b = pdf_b_fn((ldx, ldy, ldz), cos)
    cos_l = jnp.abs(dot3(lnx, lny, lnz, ldx, ldy, ldz))
    ok = (
        (pdf_b > 0.0) & (cos_l > jnp.float32(1e-6))
        & (dist2 > jnp.float32(1e-12))
    )
    # q = pdf_b / pdf_L, pdf_L = dist^2 / (|cos_l| A L)
    q = (
        pdf_b * np.float32(n_lights) * area * cos_l
        / jnp.maximum(dist2, jnp.float32(1e-20))
    )
    scale = jnp.where(ok, q / (1.0 + q), 0.0)
    lamp_id = zero - 2.0  # never matches id_best: distance rule only
    return (
        (ldx, ldy, ldz), tl,
        (ar * er * scale, ag * eg * scale, ab * eb * scale), lamp_id, ok,
    )


def tri_bsdf_mis_planes(attrs_e1, attrs_e2, d, t_safe, prev_pdf_b,
                        n_lights):
    """MIS partner weight for mesh-lamp emission found BY the BSDF
    sample: the kernel twin of render/lights.bsdf_mis_scale_tri, with
    the hit face's geometry read from the carried winner attrs.

    ``attrs_e1``/``attrs_e2``: the winner face's edge planes (3 each);
    ``d``: the ray direction planes (NOT necessarily unit — RTIOW
    scatters are unnormalized); ``t_safe``: the hit t in units of |d|.
    With c = cross(e1, e2) (|c| = 2A):  A |cos_l| = |d . c| / (2 |d|)
    and dist^2 = t^2 |d|^2, so
        q = prev_pdf_b * L * |d . c| / (2 t^2 |d|^3)."""
    e1x, e1y, e1z = attrs_e1
    e2x, e2y, e2z = attrs_e2
    dx, dy, dz = d
    cx = e1y * e2z - e1z * e2y
    cy = e1z * e2x - e1x * e2z
    cz = e1x * e2y - e1y * e2x
    dist2 = jnp.maximum(t_safe * t_safe, jnp.float32(1e-20))
    inv_dl = jax.lax.rsqrt(
        jnp.maximum(dot3(dx, dy, dz, dx, dy, dz), jnp.float32(1e-20))
    )
    q = (
        prev_pdf_b * np.float32(n_lights)
        * jnp.abs(dot3(dx, dy, dz, cx, cy, cz)) * np.float32(0.5)
        * inv_dl * inv_dl * inv_dl
        / dist2
    )
    return q / (q + 1.0)


def scatter_pdf_lam_planes(n, d_new):
    """Plane twin of render/lights.scatter_pdf_lambertian: cos/pi of the
    normalized scatter direction (the carried MIS BSDF pdf)."""
    nx, ny, nz = n
    dx, dy, dz = d_new
    inv_len = jax.lax.rsqrt(
        jnp.maximum(dot3(dx, dy, dz, dx, dy, dz), jnp.float32(1e-20))
    )
    return (
        jnp.maximum(dot3(nx, ny, nz, dx, dy, dz) * inv_len, 0.0)
        * np.float32(1.0 / np.pi)
    )


def scatter_pdf_metal_planes(d_in, n, fuzz, d_new):
    """Plane twin of render/lights.scatter_pdf_metal: solid-angle pdf of
    the RTIOW fuzzy-metal lobe (endpoint uniform on the radius-fuzz
    sphere about the unit mirror direction); 0 for mirror metal
    (fuzz ~ 0) and outside the lobe's cone."""
    dix, diy, diz = d_in
    nx, ny, nz = n
    dx, dy, dz = d_new
    inv_len = jax.lax.rsqrt(
        jnp.maximum(dot3(dix, diy, diz, dix, diy, diz), jnp.float32(1e-20))
    )
    ux, uy, uz = dix * inv_len, diy * inv_len, diz * inv_len
    udn = dot3(ux, uy, uz, nx, ny, nz)
    rx = ux - 2.0 * udn * nx
    ry = uy - 2.0 * udn * ny
    rz = uz - 2.0 * udn * nz
    winv = jax.lax.rsqrt(
        jnp.maximum(dot3(dx, dy, dz, dx, dy, dz), jnp.float32(1e-20))
    )
    c = dot3(dx, dy, dz, rx, ry, rz) * winv
    f_ok = fuzz > jnp.float32(1e-4)
    f = jnp.maximum(fuzz, jnp.float32(1e-4))
    g2 = c * c - 1.0 + f * f
    g = jnp.sqrt(jnp.maximum(g2, jnp.float32(1e-20)))
    tp = c + g
    tm = c - g
    num = jnp.where(tp > 0.0, tp * tp, 0.0) + jnp.where(
        tm > 0.0, tm * tm, 0.0
    )
    pdf = num / (jnp.float32(4.0 * np.pi) * f * g)
    return jnp.where(f_ok & (g2 > 0.0), pdf, 0.0)


def bsdf_mis_scale_planes(n_lights, c, inv_r, o, pdf_b):
    """Plane twin of render/lights.bsdf_mis_scale, with the hit lamp's
    geometry taken straight from the winner attributes (cx, cy, cz,
    signed inv_r) instead of a table match: w_B = q / (q + 1),
    q = pdf_b * L * ip, ip = 2 pi (1 - cos_max) from the ray origin
    (= the previous vertex), BIG when the origin is inside the lamp."""
    cx, cy, cz = c
    ox, oy, oz = o
    r2 = 1.0 / jnp.maximum(inv_r * inv_r, jnp.float32(1e-20))
    tox, toy, toz = cx - ox, cy - oy, cz - oz
    dist2 = dot3(tox, toy, toz, tox, toy, toz)
    outside = dist2 > r2 * np.float32(1.0 + 1e-6)
    cos_max = jnp.sqrt(
        jnp.maximum(0.0, 1.0 - r2 / jnp.maximum(dist2, jnp.float32(1e-20)))
    )
    ip = jnp.where(
        outside, jnp.float32(2.0 * np.pi) * (1.0 - cos_max),
        jnp.float32(1e30),
    )
    q = pdf_b * np.float32(n_lights) * ip
    return q / (q + 1.0)


def bsdf_mis_scale_table_planes(light_scal, n_lights, p_hit, o, pdf_b):
    """Plane twin of render/lights.bsdf_mis_scale for kernels whose winner
    attributes carry no lamp geometry (the CSG tape path): the lamp
    containing ``p_hit`` is identified by min |dist(p_hit, c_l) - r_l|
    over the (few) light scalars — the same argmin the jnp reference
    runs over its light table — then w_B = q / (q + 1) with
    q = pdf_b * L * ip, ip the cone inv-pdf from ``o`` (BIG inside)."""
    hx, hy, hz = p_hit
    ox, oy, oz = o
    best_score = None
    cx = cy = cz = r_ = None
    for i in range(n_lights):
        s = light_scal[i]
        dx_, dy_, dz_ = hx - s[0], hy - s[1], hz - s[2]
        dist = jnp.sqrt(dot3(dx_, dy_, dz_, dx_, dy_, dz_))
        score = jnp.abs(dist - s[3])
        if best_score is None:
            best_score = score
            cx = jnp.zeros_like(hx) + s[0]
            cy = jnp.zeros_like(hx) + s[1]
            cz = jnp.zeros_like(hx) + s[2]
            r_ = jnp.zeros_like(hx) + s[3]
        else:
            better = score < best_score  # strict: first min wins (argmin)
            best_score = jnp.where(better, score, best_score)
            cx = jnp.where(better, s[0], cx)
            cy = jnp.where(better, s[1], cy)
            cz = jnp.where(better, s[2], cz)
            r_ = jnp.where(better, s[3], r_)
    tox, toy, toz = cx - ox, cy - oy, cz - oz
    dist2 = dot3(tox, toy, toz, tox, toy, toz)
    r2 = r_ * r_
    outside = dist2 > r2 * np.float32(1.0 + 1e-6)
    cos_max = jnp.sqrt(
        jnp.maximum(0.0, 1.0 - r2 / jnp.maximum(dist2, jnp.float32(1e-20)))
    )
    ip = jnp.where(
        outside, jnp.float32(2.0 * np.pi) * (1.0 - cos_max),
        jnp.float32(1e30),
    )
    q = pdf_b * np.float32(n_lights) * ip
    return q / (q + 1.0)


def nee_planes(
    light_scal, n_lights, p, n, alb, occlusion_t,
    pix_u, cur_s, b_plane, seed, pdf_b_fn=None,
):
    """Next-event estimation on planes — the kernel twin of
    render/lights.nee_contribution (same math, same RNG counters, so the
    kernels validate against the jnp reference).

    ``occlusion_t(p, dir) -> t planes``: the scene's nearest-hit distance
    along a unit direction (shadow test only — no attributes). Returns
    (dr, dg, db) direct-light radiance planes (multiply by path
    throughput under the caller's lambertian/glossy mask).
    ``pdf_b_fn``: see nee_sample_planes (glossy MIS pairing).
    """
    ld, tl, (wr, wg, wb), _, _ = nee_sample_planes(
        light_scal, n_lights, p, n, alb, pix_u, cur_s, b_plane, seed,
        pdf_b_fn=pdf_b_fn,
    )
    t_occ = occlusion_t(p, ld)
    vis = ~(t_occ < tl * np.float32(1.0 - 1e-4))
    return (
        jnp.where(vis, wr, 0.0),
        jnp.where(vis, wg, 0.0),
        jnp.where(vis, wb, 0.0),
    )


def nee_tri_planes(
    light_scal, n_lights, p, n, alb, occlusion_t,
    pix_u, cur_s, b_plane, seed, pdf_b_fn=None,
):
    """Triangle-lamp NEE with an explicit occlusion callback — the mesh
    twin of nee_planes (used by the BRUTE mesh path, where the shadow
    test is one extra Möller-Trumbore min-t pass instead of a worklist
    walk). ``occlusion_t(p, dir) -> t planes`` along a UNIT direction."""
    ld, tl, (wr, wg, wb), _, _ = nee_sample_tri_planes(
        light_scal, n_lights, p, n, alb, pix_u, cur_s, b_plane, seed,
        pdf_b_fn=pdf_b_fn,
    )
    t_occ = occlusion_t(p, ld)
    vis = ~(t_occ < tl * np.float32(1.0 - 1e-4))
    return (
        jnp.where(vis, wr, 0.0),
        jnp.where(vis, wg, 0.0),
        jnp.where(vis, wb, 0.0),
    )


def tri_bsdf_mis_table_planes(light_scal, n_lights, p_hit, d, t_safe,
                              prev_pdf_b):
    """MIS partner weight for mesh-lamp emission found BY the BSDF
    sample, via a lamp-TABLE search (the brute mesh path carries winner
    NORMALS, not edges, so tri_bsdf_mis_planes's edge-cross form is
    unavailable): the lamp containing the hit is argmin plane distance
    |(p_hit - v0_l) . n_l| over the (small) lamp list — the kernel twin
    of render/lights.bsdf_mis_scale_tri. d may be unnormalized
    (q = pdf_b * L * A * |d . n_l| * |d|^-3 / t^2, n_l unit)."""
    hx, hy, hz = p_hit
    dx, dy, dz = d
    best = None
    lnx = lny = lnz = area = None
    for i in range(n_lights):
        s = light_scal[i]
        pd = jnp.abs(
            (hx - s[0]) * s[12] + (hy - s[1]) * s[13]
            + (hz - s[2]) * s[14]
        )
        if best is None:
            best = pd
            lnx = pd * 0.0 + s[12]
            lny = pd * 0.0 + s[13]
            lnz = pd * 0.0 + s[14]
            area = pd * 0.0 + s[15]
        else:
            better = pd < best
            best = jnp.where(better, pd, best)
            lnx = jnp.where(better, s[12], lnx)
            lny = jnp.where(better, s[13], lny)
            lnz = jnp.where(better, s[14], lnz)
            area = jnp.where(better, s[15], area)
    inv_dl = jax.lax.rsqrt(
        jnp.maximum(dot3(dx, dy, dz, dx, dy, dz), jnp.float32(1e-20))
    )
    dist2 = jnp.maximum(t_safe * t_safe, jnp.float32(1e-20))
    q = (
        prev_pdf_b * np.float32(n_lights) * area
        * jnp.abs(dot3(dx, dy, dz, lnx, lny, lnz))
        * inv_dl * inv_dl * inv_dl / dist2
    )
    return q / (q + 1.0)


def grid_wavefront(
    *,
    spp,
    max_bounces,
    width,
    seed,
    sky,
    sample_offset_u,
    local_pix,
    row_ids,
    pix_u0,
    slot_pixel,
    camera_rays,
    seg_init,
    grid_step_fn,
    hit_surface,
    n_attrs,
    walk0,
    steps_per_iter=1,
    nee_sample=None,
    nee_mis_scale=None,
    walk_t_out_index=None,
    unroll: int = 1,
):
    """The fused-DDA wavefront loop shared by the grid-worklist kernels
    (sphere megakernel, triangle-mesh kernel).

    One while-loop iteration = one grid-DDA step per lane; lanes whose walk
    completed shade + regenerate in the SAME iteration (the occupancy trick
    that took the sphere path from 87 to 310 Mrays/s — see worklist.py), and
    each lane's pixel ROTATES over its lane-column's 8 image-strided slots
    per sample so per-lane load is an 8-pixel average (310 -> 402).

    Geometry plugs in through three callbacks:
      - ``seg_init(o, d) -> (ray_ctx, (t0, id0, attrs0), (march0, walk0))``:
        fresh-segment init — brute-force pass over the global (ungridded)
        primitives bounding the walk, per-segment ray invariants (ray_ctx),
        and the DDA setup: march0 (int32 plane, 1 = keep walking) plus an
        OPAQUE per-lane traversal-state tuple ``walk0`` (2D DDA carries
        (ix, iz, tmaxx, tmaxz, t_out); a 3D DDA adds its third axis — the
        loop only threads it through).
      - ``grid_step_fn(ray_ctx, (march, walk, t_best, id_best, attrs), o, d)
        -> (march, walk, t_best, id_best, attrs)``: ONE DDA step for every
        lane (finished lanes fetch the pad cell).
      - ``hit_surface(attrs, o, d, t_safe) -> (n, front, kind, param, alb)``:
        shading inputs from the carried winner attributes.

    ``slot_pixel(k_plane) -> (global pixel id, valid)`` maps each lane's
    sample-k slot to its rotated strided pixel; ``camera_rays(s, px, py,
    pix_u)`` generates primary rays for explicit pixel planes. Outputs are
    in strided-slot layout (the caller un-strides, see megakernel).

    ``nee_sample(p, n, alb, d_in, kind, param, pix_u, cur_s, b_plane) ->
    (ld(3), tl, w(3), lamp_id, ok)``: enables next-event estimation as
    SHADOW SEGMENTS woven
    into the wavefront — after a lambertian path vertex, the lane's next
    segment walks the shadow ray toward the sampled lamp through the SAME
    DDA machinery (bounded by ``tl`` via ``walk_t_out_index``, the
    position of t_out inside the walk tuple); on completion the weighted
    contribution is added iff nothing but the lamp itself (excluded by
    ``id_best == lamp_id``, exact) lies strictly before the lamp, and the
    lane resumes its stashed scattered path segment. Lamp emission
    reached BY a lambertian scatter carries the balance-heuristic MIS
    partner weight (``nee_mis_scale(attrs, o, pdf_b, d, t_safe) ->
    plane``, the kernel twin of render/lights.bsdf_mis_scale /
    bsdf_mis_scale_tri; the carried scatter pdf rides the ``prevpdf``
    plane; sphere lamps read the lamp from attrs + o, triangle lamps
    derive it from the winner edges + d + the hit t) — the same MIS
    estimator as the brute-path nee_planes, with the shadow test riding
    the worklist walk instead of a broadcast table pass.
    """
    shape = local_pix.shape
    zero = jnp.zeros(shape, jnp.float32)
    zero_i = jnp.zeros(shape, jnp.int32)
    state0 = dict(
        o=(zero, zero, zero),
        d=(zero, zero, zero),
        thr=(zero, zero, zero),
        rad=(zero, zero, zero),
        active=zero_i,
        b_ctr=zero_i,
        cur_s=jnp.zeros(shape, jnp.uint32),
        rays=zero_i,
        seg=zero_i,  # 1 -> lane needs intersect init this iteration
        march=zero_i,
        walk=walk0,
        t_best=zero,
        id_best=zero,
        iters=zero_i,
        attrs=tuple(zero for _ in range(n_attrs)),  # carried winner attrs
        samp=(zero, zero, zero),  # current sample's radiance
        pix_u=pix_u0,  # overwritten at first regen
    )
    # slot validity is handled per sample at regeneration (the rotating
    # assignment visits different slots), so every lane starts owing spp
    # samples. NB: the 0-init must be VALUE-DEPENDENT — a splat init pins
    # the while-carry to a replicated Mosaic layout the non-uniform body
    # value can't relayout into.
    state0["done"] = local_pix >> 31  # local_pix >= 0 -> all zeros
    if nee_sample is not None:
        # shadow-segment machinery: 0 = path segment; 1 = shadow segment,
        # path resumes after; 2 = shadow segment, sample completes after
        state0["shadow"] = zero_i
        state0["pend_d"] = (zero, zero, zero)  # stashed scattered dir
        state0["w"] = (zero, zero, zero)  # pending NEE contribution
        state0["t_lamp"] = zero
        state0["lamp_id"] = zero
        state0["prevpdf"] = zero  # cosine pdf of the scatter (0 = not lam)

    def wave_cond(st):
        has_work = (st["active"] > 0) | (st["done"] < spp)
        return jnp.max(has_work.astype(jnp.int32)) > 0

    def wave_step(st):
        # 1. regenerate dead lanes that still owe samples; each lane's
        # next pixel comes from the rotating strided slot map, and
        # invalid slots (partial last tile) are consumed with no work
        want = (st["active"] == 0) & (st["done"] < spp)
        k_new = st["done"]
        pix_new, valid = slot_pixel(k_new)
        regen = want & valid
        consumed = want  # valid or not, the sample index advances
        s_new = k_new.astype(jnp.uint32) + sample_offset_u
        px_n = (pix_new % width).astype(jnp.float32)
        py_n = (pix_new // width).astype(jnp.float32)
        pixu_n = pix_new.astype(jnp.uint32)
        pix_cur = jnp.where(regen, pixu_n, st["pix_u"])
        (gox, goy, goz), (gdx, gdy, gdz) = camera_rays(
            s_new, px_n, py_n, pixu_n
        )

        def sel(new, old):
            return jnp.where(regen, new, old)

        ox, oy, oz = (sel(g, o) for g, o in zip((gox, goy, goz), st["o"]))
        dx, dy, dz = (sel(g, o) for g, o in zip((gdx, gdy, gdz), st["d"]))
        one = jnp.ones_like(gox)
        tr, tg, tb = (sel(one, t) for t in st["thr"])
        sr, sg, sb = (sel(jnp.zeros_like(one), v) for v in st["samp"])
        cur_s = jnp.where(regen, s_new, st["cur_s"])
        b_ctr = jnp.where(regen, 0, st["b_ctr"])
        done = st["done"] + consumed.astype(jnp.int32)
        active_i = jnp.where(regen, 1, st["active"])
        seg = jnp.where(regen, 1, st["seg"])

        # 2+3. per-segment ray invariants + fresh-segment init (globals
        # brute force bounds the walk)
        ray_ctx, (t0, id0, attrs0), (march_n, walk_n) = seg_init(
            (ox, oy, oz), (dx, dy, dz)
        )
        fresh = (seg > 0) & (active_i > 0)
        t_best = jnp.where(fresh, t0, st["t_best"])
        id_best = jnp.where(fresh, id0, st["id_best"])
        attrs = tuple(
            jnp.where(fresh, a0, ao)
            for a0, ao in zip(attrs0, st["attrs"])
        )
        march = jnp.where(fresh, march_n, st["march"])
        walk = jax.tree_util.tree_map(
            lambda new, old: jnp.where(fresh, new, old), walk_n, st["walk"]
        )
        if nee_sample is not None:
            # a freshly initialized SHADOW segment only needs to march as
            # far as the sampled lamp: clamp the walk's t_out
            shadow_st = st["shadow"]
            walk = list(walk)
            walk[walk_t_out_index] = jnp.where(
                fresh & (shadow_st > 0),
                jnp.minimum(walk[walk_t_out_index], st["t_lamp"]),
                walk[walk_t_out_index],
            )
            walk = tuple(walk)

        # 4. ``steps_per_iter`` DDA steps for every lane (finished lanes
        # fetch pad). The scaffolding around the walk — regen, camera rays,
        # seg init, shade, scatter, the loop-state selects — is ~2/3 of the
        # iteration cost (measured census, doc/PERF_NOTES), so segments
        # needing 2+ cells amortize it over several steps per iteration;
        # two sequential steps are value-identical to two iterations of
        # marching, so output is bit-identical to steps_per_iter=1.
        for _ in range(steps_per_iter):
            (march, walk, t_best, id_best, attrs) = grid_step_fn(
                ray_ctx, (march, walk, t_best, id_best, attrs),
                (ox, oy, oz), (dx, dy, dz),
            )

        # 5. lanes whose walk completed shade + scatter now (winner
        # attrs were carried out of the walk — no gather needed);
        # segment contributions accumulate into the SAMPLE-local planes
        finish = (active_i > 0) & (march == 0)
        if nee_sample is not None:
            path_fin = finish & (shadow_st == 0)
            shad_fin = finish & (shadow_st > 0)
        else:
            path_fin = finish
        hit = t_best < BIG_CUT
        t_safe = jnp.where(hit, t_best, 1.0)
        n, front, kind, param, alb = hit_surface(
            attrs, (ox, oy, oz), (dx, dy, dz), t_safe
        )

        emit_scale = None
        if nee_sample is not None:
            # NEE at lambertian/glossy path vertices: sample a lamp now
            # (same RNG counters as the brute path), walk the shadow ray
            # as the lane's NEXT segment. Emission of lamps reached BY a
            # pairable scatter carries the MIS partner weight (b == 0
            # camera rays pass emission through unweighted).
            w_b = nee_mis_scale(
                attrs, (ox, oy, oz), st["prevpdf"], (dx, dy, dz), t_safe
            )
            emit_scale = jnp.where(
                (kind == 4.0) & (st["prevpdf"] > 0.0) & (b_ctr > 0),
                w_b, 1.0,
            )
            hpx = ox + t_safe * dx
            hpy = oy + t_safe * dy
            hpz = oz + t_safe * dz
            d_in = (dx, dy, dz)  # incoming direction at the vertex
            ld, tl, w3, lamp, nee_ok = nee_sample(
                (hpx, hpy, hpz), n, alb, d_in, kind, param, pix_cur, cur_s,
                b_ctr.astype(jnp.uint32),
            )
            glossy = (kind == 2.0) & (param > jnp.float32(1e-4))
            nee_mask = path_fin & hit & ((kind == 1.0) | glossy)
            # weight carries the path throughput AT the vertex
            w_pend = tuple(
                jnp.where(nee_mask, t_ * w_, 0.0)
                for t_, w_ in zip((tr, tg, tb), w3)
            )
            nee_go = nee_mask & nee_ok

        (o2, d2, thr2, samp2, term) = shade_and_advance(
            path_fin, t_best, hit, n, front, kind, param, alb,
            (ox, oy, oz), (dx, dy, dz), (tr, tg, tb), (sr, sg, sb),
            pix_cur, cur_s, b_ctr.astype(jnp.uint32), seed, sky,
            emit_scale=emit_scale,
        )
        (ox, oy, oz), (dx, dy, dz) = o2, d2
        (tr, tg, tb), (sr, sg, sb) = thr2, samp2
        hit_fin = path_fin & hit

        rays = st["rays"] + path_fin.astype(jnp.int32)
        b_ctr = b_ctr + path_fin.astype(jnp.int32)
        cont = hit_fin & ~term & (b_ctr < max_bounces)
        active_i = jnp.where(path_fin, cont.astype(jnp.int32), active_i)
        seg = cont.astype(jnp.int32)  # continuing lanes re-init next iter
        complete = path_fin & ~cont

        if nee_sample is not None:
            # carried scatter pdf for the NEXT path segment's MIS weight —
            # computed HERE while (dx, dy, dz) is still the scattered
            # direction (the shadow-start block below re-aims nee_go lanes
            # at the lamp). Stale-value reset on regen first: a lane that
            # regenerates and finishes its first segment in the same
            # iteration keeps the freshly computed pdf.
            pdf_lam = scatter_pdf_lam_planes(n, (dx, dy, dz))
            pdf_met = scatter_pdf_metal_planes(d_in, n, param, (dx, dy, dz))
            prevpdf = jnp.where(regen, 0.0, st["prevpdf"])
            prevpdf = jnp.where(
                path_fin,
                jnp.where(
                    cont & (kind == 1.0), pdf_lam,
                    jnp.where(cont & glossy, pdf_met, 0.0),
                ),
                prevpdf,
            )

            # 5a. start shadow segments: stash the scattered direction,
            # aim the lane at the lamp; shadow code 2 = the sample is done
            # once the shadow walk completes
            pdx, pdy, pdz = st["pend_d"]
            pdx = jnp.where(nee_go, dx, pdx)
            pdy = jnp.where(nee_go, dy, pdy)
            pdz = jnp.where(nee_go, dz, pdz)
            dx = jnp.where(nee_go, ld[0], dx)
            dy = jnp.where(nee_go, ld[1], dy)
            dz = jnp.where(nee_go, ld[2], dz)
            w_st = tuple(
                jnp.where(nee_go, wn, wo)
                for wn, wo in zip(w_pend, st["w"])
            )
            t_lamp_st = jnp.where(nee_go, tl, st["t_lamp"])
            lamp_st = jnp.where(nee_go, lamp, st["lamp_id"])
            shadow = jnp.where(
                nee_go, jnp.where(cont, 1, 2), shadow_st
            )
            active_i = jnp.where(nee_go, 1, active_i)
            seg = jnp.where(nee_go, 1, seg)
            complete = complete & ~nee_go  # deferred to the shadow finish

            # 5b. finish shadow segments: visible iff nothing except the
            # sampled lamp itself (excluded by id, exact under the bf16
            # tables) lies strictly before the lamp; then restore the
            # stashed path direction and resume (or complete the sample)
            occluded = (
                (t_best < t_lamp_st * np.float32(1.0 - 1e-4))
                & (id_best != lamp_st)
            )
            vis = shad_fin & ~occluded
            sr = sr + jnp.where(vis, w_st[0], 0.0)
            sg = sg + jnp.where(vis, w_st[1], 0.0)
            sb = sb + jnp.where(vis, w_st[2], 0.0)
            dx = jnp.where(shad_fin, pdx, dx)
            dy = jnp.where(shad_fin, pdy, dy)
            dz = jnp.where(shad_fin, pdz, dz)
            resume = shad_fin & (shadow_st == 1)
            active_i = jnp.where(shad_fin, resume.astype(jnp.int32),
                                 active_i)
            seg = jnp.where(resume, 1, seg)
            complete = complete | (shad_fin & (shadow_st == 2))
            shadow = jnp.where(shad_fin, 0, shadow)

        # 6. completed samples scatter to their pixel's row slot:
        # dst row = (r + k) % 8 (the rotation's inverse), realized as 8
        # masked sublane reductions — no cross-lane moves needed
        k_cur = (cur_s - sample_offset_u).astype(jnp.int32)
        dst = (row_ids + k_cur) & 7
        rr, rg, rb = st["rad"]
        masks = [complete & (dst == t_row) for t_row in range(8)]
        new_rows = [[], [], []]
        for ch, (s_ch, r_ch) in enumerate(
            zip((sr, sg, sb), (rr, rg, rb))
        ):
            contrib = jnp.where(complete, s_ch, 0.0)
            for t_row in range(8):
                add = jnp.sum(
                    jnp.where(masks[t_row], contrib, 0.0),
                    axis=0, keepdims=True,
                )
                new_rows[ch].append(r_ch[t_row : t_row + 1] + add)
        rr = jnp.concatenate(new_rows[0], axis=0)
        rg = jnp.concatenate(new_rows[1], axis=0)
        rb = jnp.concatenate(new_rows[2], axis=0)

        out = dict(
            o=(ox, oy, oz), d=(dx, dy, dz), thr=(tr, tg, tb),
            rad=(rr, rg, rb), active=active_i, b_ctr=b_ctr,
            cur_s=cur_s, done=done, rays=rays,
            iters=st["iters"] + 1,
            seg=seg, march=march, walk=walk,
            t_best=t_best, id_best=id_best, attrs=attrs,
            samp=(sr, sg, sb), pix_u=pix_cur,
        )
        if nee_sample is not None:
            out["shadow"] = shadow
            out["pend_d"] = (pdx, pdy, pdz)
            out["w"] = w_st
            out["t_lamp"] = t_lamp_st
            out["lamp_id"] = lamp_st
            out["prevpdf"] = prevpdf
        if "pad" in st:
            out["pad"] = tuple(p + dx for p in st["pad"])
        return out

    # --- census instrumentation (env-gated; outputs correct, timing
    # experiments for the doc/PERF_NOTES remainder itemization) ---
    # CSGR_WAVE_PAD=N: N extra value-dependent planes threaded through
    # the carry (each costs one add/iter + its carry residency) — the
    # ns/iter slope over N measures the marginal loop-state cost.
    # CSGR_WAVE_UNROLL=K: K wave_steps per while iteration (overrides the
    # ``unroll`` parameter) — the while-loop BOUNDARY (cond reduction +
    # backedge) measured ~306 ns/iter, 29% of the sphere path's
    # per-iteration cost (doc/PERF_NOTES round 4), so the sphere caller
    # defaults unroll=4; wave_step is state->state pure and idle on
    # completed lanes, so output is IDENTICAL at any K (iters still
    # counts steps). Mesh callers keep 1: their iterations are 10-27 us
    # (service-dominated) and K-plicating the service trace only bloats
    # the compile.
    import os as _os

    pad_n = int(_os.environ.get("CSGR_WAVE_PAD", "0"))
    if pad_n:
        state0["pad"] = tuple(
            local_pix.astype(jnp.float32) * 0.0 + np.float32(i)
            for i in range(pad_n)
        )
    unroll = int(_os.environ.get("CSGR_WAVE_UNROLL", str(unroll)))
    if unroll > 1:
        def wave_body(st):
            for _ in range(unroll):
                st = wave_step(st)
            return st
    else:
        wave_body = wave_step

    return jax.lax.while_loop(wave_cond, wave_body, state0)


def sky_planes(ud, mode: str):
    """Background radiance planes from unit direction planes."""
    udx, udy, udz = ud
    if mode == "black":
        zero = jnp.zeros_like(udy)
        return zero, zero, zero
    if mode == "rtiow":
        t = 0.5 * (udy + 1.0)
    elif mode == "wololo":
        t = udy
    else:  # pragma: no cover
        raise ValueError(f"bad sky mode {mode}")
    return (
        (1.0 - t) + t * 0.5,
        (1.0 - t) + t * 0.7,
        (1.0 - t) + t * 1.0,
    )
