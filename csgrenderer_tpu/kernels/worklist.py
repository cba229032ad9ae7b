"""Per-cell sphere worklists for the megakernel: grid packer + in-kernel DDA.

The round-1 brute-force megakernel is AT the VPU roofline (doc/PERF_NOTES):
every wave tests all S spheres against all 1024 rays. The reference point is
the per-pixel loop over the whole scene in the fragment shader
(/root/reference/src/wololo/renderer/ubershader1.frag:84-95) — to go past
the roofline the per-ray candidate set must shrink algorithmically.

The classic GPU answer (and doc/ROADMAP's round-1 sketch) is wavefront
binning: SORT rays into spatially coherent bins, then intersect each bin
against a per-bin worklist. The worked cost model put the Pallas binning
kernel at 12-25 cycles/record — ~0.5-1.2 s/frame of pure data movement.

This module takes the opposite, TPU-native route: move the WORKLISTS to the
rays instead of the rays to the worklists. Each lane gathers its own cell's
sphere list with a one-hot MXU matmul (the TPU's indexed load; the attribute
gather in megakernel.py already demonstrated it overlaps with VPU work), so
no coherence — and therefore no sorting — is needed at all:

- Host packer (``pack_grid``): small spheres confined to a thin y-slab are
  binned into a Cx x Cz grid over xz (circle-rectangle overlap, so every
  cell lists EVERY sphere whose surface can appear inside it). Oversized /
  outlier spheres stay "global" and keep the brute-force path (ground +
  hero spheres in the RTIOW scene). Cells that overflow the M slots spill
  their widest spheres to globals — correct, just slower.
- Kernel fragments (``grid_setup`` / ``grid_step``): per-lane 2D DDA over
  the grid. Each step: cell one-hot [C,128] -> MXU gather of the cell's
  M-slot table -> slot-major parameter planes -> one vectorized 8-slot
  quadratic per row group. A lane stops when its best hit precedes the
  next cell (cells are visited in increasing ray-t, so this is exact),
  when it leaves the grid/slab, or when it passes the globals' best hit.

The DDA is WAVEFRONT-FUSED by the megakernel: measured step statistics on
real path rays are mean 1.33 steps/segment but per-1024-lane-wave MAX ~12,
so a nested while_loop (one walk per bounce) runs every wave to its slowest
lane and erases the win (measured: 86.7 Mrays/s, == brute force). Instead
the megakernel's outer wavefront loop performs ONE grid_step per iteration
per lane and lets finished lanes shade/regenerate immediately — the same
per-lane regeneration trick that fixed bounce drain in round 1, applied to
traversal.

Numeric layout: every table value is stored bf16-EXACT in two f32 rows
(hi = bf16(v), lo = bf16(v - hi)), so the one-hot matmul runs in the MXU's
single fast bf16 pass and reconstructs v to ~1.6e-5 relative (centers to
~2e-4 absolute here — two orders below a 1080p pixel footprint). Sphere ids
are split digit-wise (id = 256a + b) for the same reason. Padding
cells/slots carry r2 = -1e30, which drives the discriminant negative and
routes to a miss through the kernel's NaN-comparison convention.

Correctness argument for the early exit: a sphere's every surface point
lies in some cell of the grid (the grid bbox is inflated by each sphere's
radius), and that cell lists the sphere; the DDA visits cells in increasing
t, so any hit with t before the current cell's entry was already found in
an earlier cell.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import BIG, TILE_LANES, TILE_ROWS

PAD_R2 = np.float32(-1e30)

# table row-section order (each section is m rows, slot-major). Geometry
# values are hi/lo split (bf16-exact pairs); shading attributes ride along
# so the winner's material is carried out of the walk and the shade step
# needs NO full-scene gather. kind is a small exact integer; albedo/param
# tolerate bf16's 0.4% (color/fuzz), inv_r is hi/lo (feeds the normal).
_SECTIONS = (
    "cx_hi", "cx_lo", "cy_hi", "cy_lo", "cz_hi", "cz_lo",
    "r2_hi", "r2_lo", "id_hi", "id_lo",
    "inv_r_hi", "inv_r_lo", "kind", "param", "alb_r", "alb_g", "alb_b",
)
N_SECTIONS = len(_SECTIONS)
# attrs carried per lane through the walk, in the order grid_step returns
ATTR_NAMES = ("cx", "cy", "cz", "inv_r", "kind", "param", "ar", "ag", "ab")


class GridStatic(NamedTuple):
    """Hashable static grid config baked into the kernel at trace time."""

    cx: int  # cells along x
    cz: int  # cells along z
    c_pad: int  # padded cell-table width (multiple of 128); last col = pad
    m: int  # worklist slots per cell (multiple of 8)
    x0: float
    z0: float
    cell: float  # cell edge length (square cells)
    y_lo: float
    y_hi: float


class GridPack(NamedTuple):
    static: GridStatic
    table: np.ndarray  # [N_SECTIONS*m, c_pad] f32, all values bf16-exact
    order: np.ndarray  # permutation: new index -> original sphere index
    n_globals: int  # globals occupy reordered indices [0, n_globals)


def _bf16_split(v):
    """v (f64/f32 array) -> (hi, lo) f32 pair, both exactly bf16."""
    import ml_dtypes

    v32 = np.asarray(v, np.float32)
    hi = v32.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = (v32 - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
    return hi, lo


def _overlap_lists(cgrid, rgrid, x0, z0, cell, ncx, ncz):
    """Per-cell candidate lists via circle-rectangle overlap (numpy)."""
    lists: list[list[int]] = [[] for _ in range(ncx * ncz)]
    for i in range(cgrid.shape[0]):
        cx_, cz_, r = cgrid[i, 0], cgrid[i, 2], rgrid[i]
        ix0 = max(0, int(np.floor((cx_ - r - x0) / cell)))
        ix1 = min(ncx - 1, int(np.floor((cx_ + r - x0) / cell)))
        iz0 = max(0, int(np.floor((cz_ - r - z0) / cell)))
        iz1 = min(ncz - 1, int(np.floor((cz_ + r - z0) / cell)))
        for ix in range(ix0, ix1 + 1):
            # nearest point of the cell's x-range to the center
            nx = np.clip(cx_, x0 + ix * cell, x0 + (ix + 1) * cell)
            for iz in range(iz0, iz1 + 1):
                nz = np.clip(cz_, z0 + iz * cell, z0 + (iz + 1) * cell)
                if (nx - cx_) ** 2 + (nz - cz_) ** 2 <= r * r + 1e-12:
                    lists[ix * ncz + iz].append(i)
    return lists


_PACK_CACHE: dict = {}


def pack_grid(
    scene,
    m: int = 8,
    max_cells: int = 32 * 32,
    min_grid_spheres: int = 48,
    radius_factor: float = 4.0,
):
    """Build a GridPack for a SphereScene, or None if a grid won't help.

    Returns (pack, reordered_scene). Small spheres (radius <= radius_factor
    x median radius) that fit a thin y-slab go into the grid; everything
    else stays global. The reordered scene puts globals first so the brute
    pass's sphere indices are already global attribute-table indices.

    Everything returned is NUMPY: inside a jit trace jnp.asarray(numpy)
    returns a tracer (jax >= 0.9) and would poison host-side packing
    downstream; the jit boundary converts instead.

    Results are memoized on the scene's array identities: the packer is
    host-side numpy and a progressive renderer calls it every frame with
    the same immutable scene.
    """
    from ..render.integrator import SphereScene

    key = (id(scene.centers), id(scene.radii), m, max_cells)
    cached = _PACK_CACHE.get(key)
    if cached is not None and cached[0] is scene.centers:
        return cached[1]

    def _memo(result):
        if len(_PACK_CACHE) > 32:
            _PACK_CACHE.clear()
        _PACK_CACHE[key] = (scene.centers, result)
        return result

    c = np.asarray(scene.centers, np.float64)
    r_signed = np.asarray(scene.radii, np.float64)
    r = np.abs(r_signed)  # negative radius = flipped normal, same geometry
    s = c.shape[0]
    if s < min_grid_spheres:
        return _memo(None)

    med = float(np.median(r))
    small = r <= radius_factor * med
    if int(small.sum()) < min_grid_spheres:
        return _memo(None)

    # the slab must be thin relative to the xz extent, else a 2D grid is the
    # wrong spatial structure for this scene
    y_lo = float(np.min(c[small, 1] - r[small]))
    y_hi = float(np.max(c[small, 1] + r[small]))
    ex_x = float(np.max(c[small, 0] + r[small]) - np.min(c[small, 0] - r[small]))
    ex_z = float(np.max(c[small, 2] + r[small]) - np.min(c[small, 2] - r[small]))
    if (y_hi - y_lo) > 0.5 * max(ex_x, ex_z):
        return _memo(None)

    x0 = float(np.min(c[small, 0] - r[small]))
    x1 = float(np.max(c[small, 0] + r[small]))
    z0 = float(np.min(c[small, 2] - r[small]))
    z1 = float(np.max(c[small, 2] + r[small]))

    idx_small = np.where(small)[0]
    cgrid = c[idx_small]
    rgrid = r[idx_small]

    # choose the LARGEST cell (fewest cells -> cheapest one-hot) whose worst
    # cell still fits m slots; spill overfull cells' widest spheres to
    # globals if even the densest grid can't fit
    best = None
    best_candidate = None
    target = max(ex_x, ex_z)
    for n_side in (6, 7, 8, 9, 10, 11, 12, 14, 16, 20, 24, 28, 32):
        cell = target / n_side + 1e-9
        ncx = max(1, int(np.ceil((x1 - x0) / cell)))
        ncz = max(1, int(np.ceil((z1 - z0) / cell)))
        if ncx * ncz > max_cells:
            break
        lists = _overlap_lists(cgrid, rgrid, x0, z0, cell, ncx, ncz)
        worst = max((len(l) for l in lists), default=0)
        if worst <= m:
            best = (cell, ncx, ncz, lists, [])
            break
        best_candidate = (cell, ncx, ncz, lists)
    if best is None:
        if best_candidate is None:
            return _memo(None)
        # densest grid still overflows: spill widest spheres of overfull
        # cells until everything fits
        cell, ncx, ncz, lists = best_candidate
        spilled: set[int] = set()
        changed = True
        while changed:
            changed = False
            for l in lists:
                live = [i for i in l if i not in spilled]
                if len(live) > m:
                    live_sorted = sorted(live, key=lambda i: -rgrid[i])
                    for i in live_sorted[: len(live) - m]:
                        spilled.add(i)
                    changed = True
        lists = [[i for i in l if i not in spilled] for l in lists]
        best = (cell, ncx, ncz, lists, sorted(spilled))
        if len(spilled) > 0.25 * len(idx_small):
            return _memo(None)

    cell, ncx, ncz, lists, spilled_local = best
    spilled_set = set(spilled_local)
    grid_local = [i for i in range(len(idx_small)) if i not in spilled_set]
    grid_orig = idx_small[grid_local]
    global_orig = np.setdiff1d(np.arange(s), grid_orig)

    order = np.concatenate([global_orig, grid_orig])
    inv = np.empty(s, np.int64)
    inv[order] = np.arange(s)

    n_globals = len(global_orig)
    c_cells = ncx * ncz
    c_pad = int(np.ceil((c_cells + 1) / 128.0)) * 128  # +1 pad column

    table = np.zeros((N_SECTIONS * m, c_pad), np.float32)
    table[6 * m : 7 * m, :] = PAD_R2  # r2_hi: pad cells/slots always miss
    for cell_i, l in enumerate(lists):
        live = [i for i in l if i not in spilled_set]
        assert len(live) <= m
        for slot, i in enumerate(live):
            gi = int(inv[idx_small[i]])  # reordered global sphere index
            oi = idx_small[i]  # original scene index for attributes
            vals = {}
            vals["cx_hi"], vals["cx_lo"] = _bf16_split(cgrid[i, 0])
            vals["cy_hi"], vals["cy_lo"] = _bf16_split(cgrid[i, 1])
            vals["cz_hi"], vals["cz_lo"] = _bf16_split(cgrid[i, 2])
            vals["r2_hi"], vals["r2_lo"] = _bf16_split(rgrid[i] * rgrid[i])
            rs = r_signed[idx_small[i]]
            vals["id_hi"] = np.float32(256 * (gi // 256))  # bf16-exact
            vals["id_lo"] = np.float32(gi % 256)  # bf16-exact (<= 255)
            vals["inv_r_hi"], vals["inv_r_lo"] = _bf16_split(
                1.0 / (rs if abs(rs) > 1e-12 else 1e-12)
            )
            vals["kind"] = np.float32(np.asarray(scene.mat_kind)[oi])
            vals["param"] = np.float32(np.asarray(scene.mat_param)[oi])
            alb = np.asarray(scene.albedo)[oi]
            vals["alb_r"] = np.float32(alb[0])
            vals["alb_g"] = np.float32(alb[1])
            vals["alb_b"] = np.float32(alb[2])
            for sec, v in vals.items():
                table[_SECTIONS.index(sec) * m + slot, cell_i] = v

    reordered = SphereScene(
        centers=np.asarray(scene.centers)[order],
        radii=np.asarray(scene.radii)[order],
        mat_kind=np.asarray(scene.mat_kind)[order],
        albedo=np.asarray(scene.albedo)[order],
        mat_param=np.asarray(scene.mat_param)[order],
    )
    static = GridStatic(
        cx=ncx,
        cz=ncz,
        c_pad=c_pad,
        m=m,
        x0=x0,
        z0=z0,
        cell=float(cell),
        y_lo=y_lo,
        y_hi=y_hi,
    )
    pack = GridPack(
        static=static,
        table=table,
        order=order,
        n_globals=n_globals,
    )
    return _memo((pack, reordered))


# ---------------------------------------------------------------------------
# kernel-side fragments (trace-time builders over [8,128] planes)
# ---------------------------------------------------------------------------


def grid_setup(gs: GridStatic, o, d, t_glob):
    """DDA init for fresh segments.

    Returns (march, ix, iz, tmaxx, tmaxz, tdx, tdz, t_out) planes —
    tdx/tdz are the per-axis t increments (cell / |d|), carried through
    the walk so grid_step pays no per-step divides (VPU divides are
    multi-pass; measured census put scaffolding cost far above the slot
    math, so every recurrent divide counts). ``t_glob`` is the globals'
    best hit — cells beyond it cannot contain a nearer hit, so it bounds
    the walk.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    eps_y = np.float32(1e-12)
    big = BIG
    inv_cell = np.float32(1.0 / gs.cell)

    # one reciprocal per axis, shared by the slab ranges and the DDA init
    inv_dx = 1.0 / dx  # +-inf on zero: masked via flat_* below
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    def axis_range(o_c, d_c, inv, lo, hi):
        t0 = (np.float32(lo) - o_c) * inv
        t1 = (np.float32(hi) - o_c) * inv
        lo_t = jnp.minimum(t0, t1)
        hi_t = jnp.maximum(t0, t1)
        # |d| ~ 0: inside -> (-BIG, BIG), outside -> empty
        flat = jnp.abs(d_c) < eps_y
        inside = (o_c >= np.float32(lo)) & (o_c <= np.float32(hi))
        lo_t = jnp.where(flat, jnp.where(inside, -big, big), lo_t)
        hi_t = jnp.where(flat, jnp.where(inside, big, -big), hi_t)
        return lo_t, hi_t

    x1 = gs.x0 + gs.cx * gs.cell
    z1 = gs.z0 + gs.cz * gs.cell
    tx_lo, tx_hi = axis_range(ox, dx, inv_dx, gs.x0, x1)
    ty_lo, ty_hi = axis_range(oy, dy, inv_dy, gs.y_lo, gs.y_hi)
    tz_lo, tz_hi = axis_range(oz, dz, inv_dz, gs.z0, z1)
    t_in = jnp.maximum(
        jnp.maximum(tx_lo, ty_lo), jnp.maximum(tz_lo, np.float32(1e-3))
    )
    t_out = jnp.minimum(jnp.minimum(tx_hi, ty_hi), tz_hi)
    t_out = jnp.minimum(t_out, t_glob)

    march = (t_in <= t_out).astype(jnp.int32)

    px = ox + t_in * dx
    pz = oz + t_in * dz
    ix0 = jnp.clip(
        jnp.floor((px - np.float32(gs.x0)) * inv_cell).astype(jnp.int32),
        0, gs.cx - 1,
    )
    iz0 = jnp.clip(
        jnp.floor((pz - np.float32(gs.z0)) * inv_cell).astype(jnp.int32),
        0, gs.cz - 1,
    )
    step_x = jnp.where(dx > 0, 1, jnp.where(dx < 0, -1, 0)).astype(jnp.int32)
    step_z = jnp.where(dz > 0, 1, jnp.where(dz < 0, -1, 0)).astype(jnp.int32)
    flat_x = jnp.abs(dx) < eps_y
    flat_z = jnp.abs(dz) < eps_y
    next_bx = np.float32(gs.x0) + (
        ix0 + jnp.where(step_x > 0, 1, 0)
    ).astype(jnp.float32) * np.float32(gs.cell)
    next_bz = np.float32(gs.z0) + (
        iz0 + jnp.where(step_z > 0, 1, 0)
    ).astype(jnp.float32) * np.float32(gs.cell)
    tmaxx0 = jnp.where(flat_x, big, (next_bx - ox) * inv_dx)
    tmaxz0 = jnp.where(flat_z, big, (next_bz - oz) * inv_dz)
    tdx = jnp.where(flat_x, big, jnp.abs(np.float32(gs.cell) * inv_dx))
    tdz = jnp.where(flat_z, big, jnp.abs(np.float32(gs.cell) * inv_dz))
    return march, ix0, iz0, tmaxx0, tmaxz0, tdx, tdz, t_out


def grid_step(gs: GridStatic, tab, state, o, d, a, inv_a, eps_a):
    """ONE DDA step for every lane: gather + m-slot test + advance.

    ``state`` = (march, ix, iz, tmaxx, tmaxz, tdx, tdz, t_out, t_best,
    id_best, attrs) where attrs is the 9-tuple of carried winner-attribute
    planes (ATTR_NAMES order). Returns the updated tuple. Lanes with
    march == 0 fetch the pad cell (guaranteed miss) and keep their state.
    """
    (march, ix, iz, tmaxx, tmaxz, tdx, tdz, t_out, t_best, id_best,
     attrs) = state
    ox, oy, oz = o
    dx, dy, dz = d
    m = gs.m
    big = BIG
    pad_cell = np.int32(gs.c_pad - 1)

    act = march > 0
    cell_id = jnp.where(act, ix * gs.cz + iz, pad_cell)
    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (gs.c_pad, TILE_LANES), 0)

    t_rows = []
    id_rows = []
    attr_rows = [[] for _ in range(9)]
    for g in range(TILE_ROWS):
        # bf16 one-hot + bf16 table = the MXU's native single-pass matmul;
        # loses nothing because the one-hot is 0/1 and every table value is
        # stored bf16-exact (hi/lo split)
        onehot = (cell_iota == cell_id[g : g + 1]).astype(tab.dtype)
        got = jax.lax.dot_general(
            tab, onehot,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )  # [N_SECTIONS*m, 128]
        cxs = got[0 * m : 1 * m] + got[1 * m : 2 * m]
        cys = got[2 * m : 3 * m] + got[3 * m : 4 * m]
        czs = got[4 * m : 5 * m] + got[5 * m : 6 * m]
        r2s = got[6 * m : 7 * m] + got[7 * m : 8 * m]
        ids = got[8 * m : 9 * m] + got[9 * m : 10 * m]

        ocx = ox[g : g + 1] - cxs
        ocy = oy[g : g + 1] - cys
        ocz = oz[g : g + 1] - czs
        half_b = ocx * dx[g : g + 1] + ocy * dy[g : g + 1] + ocz * dz[g : g + 1]
        cterm = ocx * ocx + ocy * ocy + ocz * ocz - r2s
        disc = half_b * half_b - a[g : g + 1] * cterm
        sq = jnp.sqrt(disc)  # NaN on miss: comparisons reject it
        ta0 = -half_b - sq
        ta1 = -half_b + sq
        eps_row = eps_a[g : g + 1]
        ta = jnp.where(ta0 > eps_row, ta0, ta1)
        tc = jnp.where(ta > eps_row, ta * inv_a[g : g + 1], big)
        tc_min = jnp.min(tc, axis=0, keepdims=True)  # [1,128]
        winner = jnp.where(tc == tc_min, ids, big)
        id_min = jnp.min(winner, axis=0, keepdims=True)
        t_rows.append(tc_min)
        id_rows.append(id_min)
        # winner attrs by id (consistent across attrs even on t-ties)
        sel = ids == id_min
        slot_attrs = (
            cxs, cys, czs,
            got[10 * m : 11 * m] + got[11 * m : 12 * m],  # inv_r
            got[12 * m : 13 * m],  # kind
            got[13 * m : 14 * m],  # param
            got[14 * m : 15 * m],  # alb_r
            got[15 * m : 16 * m],  # alb_g
            got[16 * m : 17 * m],  # alb_b
        )
        for j, sa in enumerate(slot_attrs):
            attr_rows[j].append(
                jnp.min(jnp.where(sel, sa, big), axis=0, keepdims=True)
            )

    t_cand = jnp.concatenate(t_rows, axis=0)  # [8,128]
    id_cand = jnp.concatenate(id_rows, axis=0)
    improve = act & (t_cand < t_best)
    t_best = jnp.where(improve, t_cand, t_best)
    id_best = jnp.where(improve, id_cand, id_best)
    attrs = tuple(
        jnp.where(improve, jnp.concatenate(rows, axis=0), old)
        for rows, old in zip(attr_rows, attrs)
    )

    # --- advance (tdx/tdz precomputed by grid_setup — no per-step divides)
    step_x = jnp.where(dx > 0, 1, jnp.where(dx < 0, -1, 0)).astype(jnp.int32)
    step_z = jnp.where(dz > 0, 1, jnp.where(dz < 0, -1, 0)).astype(jnp.int32)
    t_next = jnp.minimum(tmaxx, tmaxz)
    go_x = tmaxx <= tmaxz
    ix2 = ix + jnp.where(go_x, step_x, 0)
    iz2 = iz + jnp.where(go_x, 0, step_z)
    tmaxx2 = jnp.where(go_x, tmaxx + tdx, tmaxx)
    tmaxz2 = jnp.where(go_x, tmaxz, tmaxz + tdz)
    in_grid = (ix2 >= 0) & (ix2 < gs.cx) & (iz2 >= 0) & (iz2 < gs.cz)
    still = act & in_grid & (t_next <= t_out) & (t_next < t_best)
    ix = jnp.where(act, ix2, ix)
    iz = jnp.where(act, iz2, iz)
    tmaxx = jnp.where(act, tmaxx2, tmaxx)
    tmaxz = jnp.where(act, tmaxz2, tmaxz)
    return (
        still.astype(jnp.int32), ix, iz, tmaxx, tmaxz, tdx, tdz, t_out,
        t_best, id_best, attrs,
    )


def emit_grid_walk(gs: GridStatic, tab, o, d, a, inv_a, eps_a, t_best0, id_best0):
    """Whole-walk wrapper (setup + while over grid_step): used by the fuzz
    tests to validate the DDA semantics in isolation. The megakernel does
    NOT use this — it fuses one grid_step per wavefront iteration instead
    (see module docstring)."""
    march, ix, iz, tmaxx, tmaxz, tdx, tdz, t_out = grid_setup(
        gs, o, d, t_best0
    )
    attrs0 = tuple(jnp.zeros_like(t_best0) for _ in range(9))

    def cond(st):
        return jnp.max(st[0]) > 0

    def body(st):
        return grid_step(gs, tab, st, o, d, a, inv_a, eps_a)

    st = jax.lax.while_loop(
        cond, body,
        (march, ix, iz, tmaxx, tmaxz, tdx, tdz, t_out, t_best0, id_best0,
         attrs0),
    )
    return st[8], st[9]
