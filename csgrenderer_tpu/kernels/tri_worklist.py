"""Per-voxel triangle worklists: 3D grid packer + in-kernel 3D DDA.

The triangle sibling of kernels/worklist.py (the sphere grid). The brute
mesh kernel tests every face against every lane each wave — 17.8 Mrays/s
at ~1000 faces (doc/PERF_NOTES). Like the sphere path, worklists move to
the RAYS: each lane walks a voxel grid and fetches its current voxel's
face list with a one-hot MXU matmul.

Differences from the 2D sphere grid, all driven by mesh geometry:

- **3D voxels, not a 2D slab grid.** A ball-like mesh surface stacks many
  faces over one xz column (top, bottom, and the whole silhouette band),
  so 2D cells need 100+ slots; 3D voxels keep occupancy near the local
  "faces per surface patch" count.
- **Compact-cell indirection.** The one-hot gather's MXU cost is the WHOLE
  table per row-group (rows x width / 16384 cycles), and most 3D voxels
  are empty (mesh surfaces are 2D sheets). A tiny 2-row dense map
  (dense voxel id -> compact cell id, bf16-exact hi/lo split) keeps the
  fat geometry table at width = non-empty cells only.
- **Cell-relative hi/lo vertices.** Each slot stores v0 RELATIVE to its
  voxel's min corner, split bf16 hi/lo: |v0_rel| <~ cell so the
  reconstruction error is ~bf16_eps^2 * cell (~1e-5 here) — an order
  better than world-anchored storage; the kernel adds the corner back
  from the lane's walk coordinates. Edges e1/e2 are small and hi/lo too.
- **Material indirection.** Faces carry a 1-row mat id (exact <= 255 in
  bf16); kind/param/albedo live in a separate tiny table gathered once at
  shade time. This cuts geometry sections from 23 to 19 — directly
  proportional MXU savings.
- **Exact SAT binning.** Host packer bins by the exact triangle-box
  separating-axis test (Akenine-Moller 13-axis), not AABB overlap —
  duplication is the other factor in table size.

Padding convention: pad/empty cells and unused slots hold all-zero
geometry; Moller-Trumbore's det == 0 makes inv_det inf and u = 0 * inf =
NaN, whose comparisons reject the slot — no sentinel rows needed.

Correctness of the walk's early exit: every surface point of a gridded
face lies in some voxel whose list contains the face (exact SAT binning
over the full face); the DDA visits voxels in increasing ray-t, so any
hit with t before the current voxel's entry was already found.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import BIG, TILE_LANES, TILE_ROWS

# geometry table row sections (each section = m rows, slot-major)
_SECTIONS = (
    "v0x_hi", "v0x_lo", "v0y_hi", "v0y_lo", "v0z_hi", "v0z_lo",
    "e1x_hi", "e1x_lo", "e1y_hi", "e1y_lo", "e1z_hi", "e1z_lo",
    "e2x_hi", "e2x_lo", "e2y_hi", "e2y_lo", "e2z_hi", "e2z_lo",
    "mat_id",
)
N_SECTIONS = len(_SECTIONS)
# attrs carried per lane through the walk (e1/e2 feed the geometric
# normal at shade time; mat_id feeds the material-table gather)
ATTR_NAMES = ("e1x", "e1y", "e1z", "e2x", "e2y", "e2z", "mat_id")
N_ATTRS = len(ATTR_NAMES)


# id stored in the dense map for PAD and EMPTY voxels: matches no tier's
# iota (tier offsets stay far below), bf16-exact (256 * 255)
PAD_CI = 65280.0
# stream-mode bf16 tier-table VMEM budget (the table shares ~16 MB VMEM
# with the dense map, mats, and the wavefront's live planes).
# CSGR_STREAM_TABLE_BYTES overrides for census runs (e.g. "1" forces the
# HBM-resident DMA service on meshes whose table would fit VMEM).
_STREAM_TABLE_BYTES = int(
    __import__("os").environ.get("CSGR_STREAM_TABLE_BYTES", str(9 << 20))
)
# stream-mode chunk widths: N_SECTIONS*q + 1 flag row packed into k
# 128-row MXU blocks. The 2-block chunk (19*13+1 = 248) halves chain
# length vs the 1-block one (19*6+1 = 115) for the same dot issue count,
# so it's preferred; the 1-block chunk is the fallback when the doubled
# table rows bust the VMEM budget (very large meshes).
_STREAM_Q = (128 - 1) // 19
_STREAM_Q2 = (256 - 1) // 19

# dense maps wider than this use the two-level page-split layout: the
# flat lookup's one-hot compare costs O(dense_pad/8) vector ops per row
# group, the paged one a fixed ~O(n_pages/8 + 32); the crossover is
# where the fixed within-page select (two 128-row masked sums) stops
# dominating
_PAGED_MIN = 1024


class TriGridStatic(NamedTuple):
    """Hashable static grid config baked into the kernel at trace time.

    ``tiers``: ((m, width, offset), ...) — compact cells are partitioned
    into occupancy tiers, each with its own table of m slots x width
    columns; a cell's global compact id falls in [offset, offset + width).
    Tiering kills the slot slack of a single worst-case m: the one-hot
    gather cost is the TOTAL table footprint, so slots sized to each
    cell's actual occupancy are pure MXU savings.
    """

    nx: int  # voxels along x
    ny: int
    nz: int
    dense_pad: int  # padded dense-map width (multiple of 128)
    tiers: tuple  # ((m, width, offset), ...)
    n_compact: int  # total real compact cells (empty test threshold)
    x0: float
    y0: float
    z0: float
    cell: float  # voxel edge length (cubic)
    # two-level dense map (round 2b): voxel id = page * 128 + slot; the
    # lookup becomes page-one-hot [n_pages,128] -> MXU page gather ->
    # within-page masked sum — O(n_pages + 128) vector ops instead of
    # O(dense_pad), the 15k-face bottleneck. 0 = flat [2, dense_pad] map
    # (small scenes, where the flat compare is already cheaper).
    n_pages: int = 0
    # STREAM mode (round 3): ``gather_pages`` > 0 switches the face
    # gather from whole-table one-hots to DEMAND-PAGED gathers: compact
    # cells are a SINGLE tier of chained fixed-width chunk columns
    # ordered along the Morton curve, and an inner service loop
    # (``_stream_service``) serves, per row group per trip, one
    # 128-column table page (min-pending-page selection; off-page lanes
    # wait for a later trip, the loop runs until every lane resolves).
    # Gather cost per trip is O(1) in mesh size — the 100k-face scaling
    # fix (doc/PERF_NOTES).
    gather_pages: int = 0
    # phase B (round 3b): chunk table RESIDES IN HBM (pallas memory
    # space ANY); the service DMAs each served page's [rr_pad, 128] slab
    # into a VMEM scratch (k slabs, one DMA semaphore) before the dot.
    # Lifts the VMEM table budget entirely: capacity becomes HBM-bound
    # (hundreds of MB), the per-trip cost gains only the k page-copy
    # latencies (~63 KB each, started together and overlapped).
    hbm_table: int = 0
    # NARROW PAGES (round 5): logical page width in chunk columns. The
    # serve dot's MAC volume is rr x (k * page_w) x 128 — the round-4f
    # roofline showed only ~21 of a served 128-column page's lanes are
    # wanted, so narrowing the page cuts the contraction dim
    # proportionally as long as demand stays Morton-local (distinct
    # pages per group grows slower than 128/page_w). Physical layout:
    # page p occupies rows [p*rr_pad, (p+1)*rr_pad) with lanes
    # [0:page_w] holding its chunks (the narrow slab is then a STATIC
    # lane slice — no dynamic minor-dim slicing); VMEM cost scales by
    # 128/page_w. Output is bit-identical at any width (each lane's
    # chunk chain is served in the same order). CSGR_STREAM_PW knob.
    page_w: int = 128


class TriGridPack(NamedTuple):
    static: TriGridStatic
    dense_map: np.ndarray  # flat [2, dense_pad] or paged [256, pages] f32
    # (bf16-exact compact-id hi/lo; layout chosen by static.n_pages)
    tables: tuple  # per tier: [N_SECTIONS*m, width] f32 (bf16-exact)
    mats: np.ndarray  # [8, mat_pad] f32: kind, param, alb_r/g/b (+0 rows)
    globals_idx: np.ndarray  # original face indices brute-forced every wave


def _bf16_np(v):
    import ml_dtypes

    return np.asarray(v, np.float32).astype(ml_dtypes.bfloat16).astype(
        np.float32
    )


def _bf16_split(v):
    v32 = np.asarray(v, np.float64)
    hi = _bf16_np(v32)
    lo = _bf16_np(v32 - hi)
    return hi, lo


def _tri_box_overlap(v0, v1, v2, centers, half):
    """Exact SAT triangle-AABB overlap, vectorized over K boxes.

    v0/v1/v2: [3] triangle vertices; centers: [K, 3] box centers; half:
    scalar half-edge (cubic). Returns [K] bool.
    """
    h = np.asarray([half, half, half])
    p0 = v0[None] - centers  # [K,3]
    p1 = v1[None] - centers
    p2 = v2[None] - centers
    ok = np.ones(centers.shape[0], bool)

    # box axes: triangle AABB vs box
    tri_min = np.minimum(np.minimum(p0, p1), p2)
    tri_max = np.maximum(np.maximum(p0, p1), p2)
    ok &= np.all((tri_min <= h[None]) & (tri_max >= -h[None]), axis=1)

    # triangle plane vs box
    e0 = v1 - v0
    e1 = v2 - v1
    e2 = v0 - v2
    n = np.cross(e0, e1)
    r = np.sum(h * np.abs(n))
    s = np.sum(p0 * n[None], axis=1)
    ok &= np.abs(s) <= r + 1e-12

    # 9 cross-product axes
    for e in (e0, e1, e2):
        for j in range(3):
            ax = np.zeros(3)
            ax[(j + 1) % 3] = -e[(j + 2) % 3]
            ax[(j + 2) % 3] = e[(j + 1) % 3]
            ra = np.sum(h * np.abs(ax))
            q0 = np.sum(p0 * ax[None], axis=1)
            q1 = np.sum(p1 * ax[None], axis=1)
            q2 = np.sum(p2 * ax[None], axis=1)
            lo = np.minimum(np.minimum(q0, q1), q2)
            hi = np.maximum(np.maximum(q0, q1), q2)
            ok &= (lo <= ra + 1e-12) & (hi >= -ra - 1e-12)
    return ok


_SAT_NATIVE: object = None


def _native_sat():
    """ctypes handle to scene_core's csgr_tri_box_overlap_pairs, or None
    (no compiler / load failure — numpy fallback). One scalar early-exit
    C++ pass beats numpy's ~40 whole-array passes ~5x on the packer's
    binning; results are BIT-IDENTICAL (-ffp-contract=off, same
    expression order — parity-fuzzed in tests/test_tri_worklist.py)."""
    global _SAT_NATIVE
    if _SAT_NATIVE is None:
        try:
            import ctypes

            from ..scene.native import ensure_built

            lib = ctypes.CDLL(str(ensure_built()))
            fn = lib.csgr_tri_box_overlap_pairs
            dp = ctypes.POINTER(ctypes.c_double)
            fn.argtypes = [dp, dp, dp, dp, ctypes.c_double,
                           ctypes.c_longlong,
                           ctypes.POINTER(ctypes.c_ubyte)]
            fn.restype = None
            _SAT_NATIVE = fn
        except Exception:
            _SAT_NATIVE = False
    return _SAT_NATIVE or None


def _tri_box_overlap_pairs_native(v0p, v1p, v2p, centers, half, fn):
    import ctypes

    n = v0p.shape[0]
    out = np.zeros(n, np.uint8)
    args = []
    for a in (v0p, v1p, v2p, centers):
        a = np.ascontiguousarray(a, np.float64)
        args.append(a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    fn(*args, ctypes.c_double(float(half)), ctypes.c_longlong(n),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out.astype(bool)


def _tri_box_overlap_pairs(v0p, v1p, v2p, centers, half):
    """Vectorized SAT over (triangle, box) PAIRS: v0p/v1p/v2p/centers are
    [P, 3] with a DIFFERENT triangle per row (the batched form of
    _tri_box_overlap, which fixes one triangle). Same 13-axis test, same
    epsilons — bit-identical keep decisions. Dispatches to the native
    C++ twin when the scene-core library is available."""
    fn = _native_sat()
    if fn is not None and v0p.shape[0]:
        return _tri_box_overlap_pairs_native(
            v0p, v1p, v2p, centers, half, fn
        )
    h = np.asarray([half, half, half])
    p0 = v0p - centers
    p1 = v1p - centers
    p2 = v2p - centers
    ok = np.ones(centers.shape[0], bool)

    tri_min = np.minimum(np.minimum(p0, p1), p2)
    tri_max = np.maximum(np.maximum(p0, p1), p2)
    ok &= np.all((tri_min <= h[None]) & (tri_max >= -h[None]), axis=1)

    e0 = v1p - v0p
    e1 = v2p - v1p
    e2 = v0p - v2p
    n = np.cross(e0, e1)
    r = np.sum(h[None] * np.abs(n), axis=1)
    s = np.sum(p0 * n, axis=1)
    ok &= np.abs(s) <= r + 1e-12

    for e in (e0, e1, e2):
        for j in range(3):
            ax = np.zeros_like(e)
            ax[:, (j + 1) % 3] = -e[:, (j + 2) % 3]
            ax[:, (j + 2) % 3] = e[:, (j + 1) % 3]
            ra = np.sum(h[None] * np.abs(ax), axis=1)
            q0 = np.sum(p0 * ax, axis=1)
            q1 = np.sum(p1 * ax, axis=1)
            q2 = np.sum(p2 * ax, axis=1)
            lo = np.minimum(np.minimum(q0, q1), q2)
            hi = np.maximum(np.maximum(q0, q1), q2)
            ok &= (lo <= ra + 1e-12) & (hi >= -ra - 1e-12)
    return ok


_PACK_CACHE: dict = {}


def pack_tri_grid(
    mesh,
    m_max: int = 64,
    max_dense: int = 16384,
    max_compact: int = 2048,
    min_grid_faces: int = 192,
    footprint_factor: float = 6.0,
    max_globals: int = 16,
    stream: bool | str = "auto",
    gather_pages: int = 4,
):
    """Build a TriGridPack for a MeshScene, or None if a grid won't help.

    Returns (pack, globals_mesh): gridded faces live only in the voxel
    table; ``globals_mesh`` holds the faces brute-forced every wave (huge
    footprints like ground quads, plus spill from overfull voxels).

    ``stream``: demand-paged gather mode (see TriGridStatic.gather_pages)
    — a SINGLE Morton-ordered tier whose per-iteration gather cost is
    O(gather_pages), independent of mesh size. "auto" switches it on when
    the tiered whole-table gather would be the measured bottleneck (large
    meshes); True forces it, False forces the tiered dense gather. Stream
    mode also lifts the dense/compact caps (the two-level dense map and
    the paged gather keep per-iteration cost bounded, so big grids are
    pure capacity, not cost).

    Everything returned is NUMPY (host-side packing stays out of jit —
    jnp.asarray inside a trace returns a tracer, see worklist.pack_grid).
    Memoized on the mesh's array identities.
    """
    from ..render.trimesh import MeshScene

    import os as _envos

    key = (id(mesh.v0), id(mesh.e1), m_max, max_dense, max_compact,
           str(stream), gather_pages,
           _envos.environ.get("CSGR_STREAM_NSIDE", ""),
           _envos.environ.get("CSGR_STREAM_PW", ""),
           _envos.environ.get("CSGR_STREAM_Q", ""),
           _envos.environ.get("CSGR_STREAM_Q1", ""))
    cached = _PACK_CACHE.get(key)
    if cached is not None and cached[0] is mesh.v0:
        return cached[1]

    def _memo(result):
        if len(_PACK_CACHE) > 32:
            _PACK_CACHE.clear()
        _PACK_CACHE[key] = (mesh.v0, result)
        return result

    v0 = np.asarray(mesh.v0, np.float64)
    e1 = np.asarray(mesh.e1, np.float64)
    e2 = np.asarray(mesh.e2, np.float64)
    f = v0.shape[0]
    if f < min_grid_faces:
        return _memo(None)

    v1 = v0 + e1
    v2 = v0 + e2
    fmin = np.minimum(np.minimum(v0, v1), v2)
    fmax = np.maximum(np.maximum(v0, v1), v2)
    diag = np.linalg.norm(fmax - fmin, axis=1)
    med = float(np.median(diag))
    big_face = diag > footprint_factor * max(med, 1e-12)

    grid_mask = ~big_face
    if int(grid_mask.sum()) < min_grid_faces:
        return _memo(None)

    def build(cell, gmask):
        """Bin faces into voxels with the exact SAT test, vectorized over
        all (face, candidate-voxel) pairs at once (the per-face Python
        loop was the host packer's bottleneck: 68 s -> ~4 s at 15k
        faces). Keep decisions and per-cell list ORDER (faces ascending)
        are identical to the scalar loop."""
        idx = np.where(gmask)[0]
        g0 = np.min(fmin[idx], axis=0) - 1e-6
        g1 = np.max(fmax[idx], axis=0) + 1e-6
        dims = np.maximum(1, np.ceil((g1 - g0) / cell).astype(int))
        nxc, nyc, nzc = int(dims[0]), int(dims[1]), int(dims[2])
        if nxc * nyc * nzc + 1 > max_dense:
            return None
        half = cell / 2.0

        # per-face candidate voxel ranges (same floor/min as the loop)
        i0 = np.floor((fmin[idx] - g0) / cell).astype(np.int64)  # [F,3]
        i1 = np.minimum(
            np.floor((fmax[idx] - g0) / cell).astype(np.int64),
            dims[None] - 1,
        )
        span = i1 - i0 + 1  # [F,3]
        counts = span[:, 0] * span[:, 1] * span[:, 2]
        offsets = np.concatenate([[0], np.cumsum(counts)])
        total = int(offsets[-1])

        lists: dict[int, list[int]] = {}
        chunk = 2_000_000  # bound SAT temporaries (~15 [P,3] f64 arrays)
        # pair -> (face row, local candidate index) decomposition
        pair = np.arange(total, dtype=np.int64)
        frow = np.searchsorted(offsets, pair, side="right") - 1
        local = pair - offsets[frow]
        syz = span[frow, 1] * span[frow, 2]
        lx = local // syz
        rem = local - lx * syz
        ly = rem // span[frow, 2]
        lz = rem - ly * span[frow, 2]
        cand = i0[frow] + np.stack([lx, ly, lz], axis=1)  # [P,3]
        keep_ci = []
        keep_fi = []
        for s in range(0, total, chunk):
            e = min(s + chunk, total)
            fr = frow[s:e]
            fi = idx[fr]
            centers = g0[None] + (cand[s:e] + 0.5) * cell
            hitm = _tri_box_overlap_pairs(
                v0[fi], v1[fi], v2[fi], centers, half
            )
            c = cand[s:e][hitm]
            keep_ci.append((c[:, 0] * nyc + c[:, 1]) * nzc + c[:, 2])
            keep_fi.append(fi[hitm])
        ci_all = np.concatenate(keep_ci) if keep_ci else np.zeros(0, np.int64)
        fi_all = np.concatenate(keep_fi) if keep_fi else np.zeros(0, np.int64)
        # group by cell; faces ascending within a cell (pairs are emitted
        # in ascending (face, candidate) order, so a stable sort by cell
        # preserves the scalar loop's per-cell face order). Dict INSERTION
        # order must also match the scalar loop (first pair encountered):
        # downstream, sorted(..., key=occupancy) is stable and the tier
        # assignment of equal-occupancy cells follows insertion order —
        # byte-identical packs, verified by checksum against the loop.
        order = np.argsort(ci_all, kind="stable")
        ci_s = ci_all[order]
        fi_s = fi_all[order]
        bounds = np.flatnonzero(np.diff(ci_s)) + 1
        groups = {
            int(ci_grp[0]): [int(x) for x in fi_grp]
            for ci_grp, fi_grp in zip(
                np.split(ci_s, bounds), np.split(fi_s, bounds)
            )
            if ci_grp.size
        }
        uniq, first = np.unique(ci_all, return_index=True)
        for ci in uniq[np.argsort(first, kind="stable")]:
            lists[int(ci)] = groups[int(ci)]
        return (nxc, nyc, nzc), g0, lists

    # m values that fill k MXU row-blocks exactly: floor(128k / sections)
    m_opts = []
    _k = 1
    while True:
        _m = (128 * _k) // N_SECTIONS
        if _m >= m_max:
            m_opts.append(m_max)
            break
        m_opts.append(_m)
        _k += 1

    # pick the cell size minimizing the one-hot table footprint
    # (sections * m * c_pad ~ MXU cycles per gather); spill the largest
    # faces of overfull voxels to the brute-force globals
    def plan_tiers(occs):
        """Choose <= 3 occupancy tiers minimizing the MXU gather cost
        sum(ceil(N_SECTIONS*m_k / 128) * width_k) — the matmul runs in
        128-row blocks, so m choices that exactly fill blocks are free
        capacity. occs: per-cell face counts (capped at m_max)."""
        occs = np.sort(occs)
        worst = int(occs[-1])
        need = min(x for x in m_opts if x >= worst)

        def width(count):
            return int(np.ceil(count / 128.0)) * 128 if count else 0

        def cost(bounds):
            # bounds ascending, last >= need
            total = 0
            prev = 0
            for mb in bounds:
                cnt = int(np.searchsorted(occs, mb, side="right")) - prev
                blocks = int(np.ceil(N_SECTIONS * mb / 128.0))
                total += blocks * width(cnt)
                prev += cnt
            return total

        best_t = None
        import itertools

        for kt in (1, 2, 3):
            for combo in itertools.combinations(m_opts, kt):
                if combo[-1] < need:
                    continue
                c = cost(combo)
                if best_t is None or c < best_t[0]:
                    best_t = (c, combo)
        return best_t  # (MXU cost in width-columns, bounds)

    ext = float(np.max(np.max(fmax[grid_mask], axis=0)
                       - np.min(fmin[grid_mask], axis=0)))
    # stream mode lifts the capacity caps: the two-level dense map and
    # the demand-paged gather keep per-iteration COST bounded, so a big
    # grid is pure capacity. n_compact must stay below PAD_CI's id space.
    # "auto" considers the stream plan only for LARGE meshes (the tiered
    # gather is cheaper below ~8k faces, and small-mesh packs stay
    # byte-identical to the pre-stream packer).
    stream_ok = stream is True or (stream == "auto" and f >= 8000)
    if stream_ok:
        max_dense = max(max_dense, 262144)
        max_compact = max(max_compact, 32768)
    best_t = None  # tiered whole-table gather plan
    best_s = None  # stream (single Morton tier, paged gather) plan
    best_h = None  # stream plan with HBM-resident table (phase B)
    import os as _os

    # census knob: pin the stream plan to one cell-ladder rung (the
    # packer's score omits column efficiency — lanes served per page —
    # so the rung sweep must be measured, doc/PERF_NOTES round 4)
    _force_ns = int(_os.environ.get("CSGR_STREAM_NSIDE", "0"))
    # round 5: logical page width (must divide 128; VMEM cost scales by
    # 128/page_w — see TriGridStatic.page_w). MEASURED DEFAULT: pw=64
    # when the VMEM budget allows (15k 12.3 -> 14.4, 61k 5.7 -> 6.7
    # Mrays/s; pw=32 regressed to 13.0 at 15k — a ~210 ns non-MAC serve
    # floor, doc/PERF_NOTES round 5), falling back to 128 when the
    # 2x table doesn't fit. HBM-resident tables stay 128: the DMA slab
    # is physically 128 lanes wide either way, so narrow pages would
    # only double the page count and the DMA traffic.
    _pw_env = _os.environ.get("CSGR_STREAM_PW", "")
    if _pw_env:
        assert int(_pw_env) in (8, 16, 32, 64, 128), \
            "CSGR_STREAM_PW must divide 128"
        _pw_opts = (int(_pw_env),)
        _pw_hbm = int(_pw_env)
    else:
        _pw_opts = (64, 128)
        _pw_hbm = 128
    for n_side in (3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64):
        have = (best_t is not None) and (
            best_s is not None or not stream_ok
        ) and not (_force_ns and best_s is None)
        if have and n_side > 24:
            # the fine rungs exist for DENSE meshes (10k+ faces) whose
            # coarser cells overflow m_max everywhere; when a coarser
            # rung already fits, finer ones only add host pack time
            break
        cell = ext / n_side + 1e-9
        built = build(cell, grid_mask)
        if built is None:
            continue
        dims, g0, lists = built
        if not lists:
            continue
        if len(lists) > max_compact:
            continue
        # spill overfull voxels' largest faces to the brute globals
        # (tiered only: chained stream chunks have no occupancy cap)
        spilled: set[int] = set()
        for ci, l in lists.items():
            if len(l) > m_max:
                by_size = sorted(l, key=lambda i: -diag[i])
                for i in by_size[: len(l) - m_max]:
                    spilled.add(i)
        n_glob = int(big_face.sum()) + len(spilled)
        lists2 = {
            ci: [i for i in l if i not in spilled]
            for ci, l in lists.items()
        }
        lists2 = {ci: l for ci, l in lists2.items() if l}
        # score = per-iteration gather cost x expected iteration count
        # (DDA steps scale with cells crossed ~ ext/cell; the +K damps it
        # for the skip-empty fast path and the non-walk fixed work)
        it_factor = ext / cell + 10.0
        if stream is not True and lists2 and n_glob <= max_globals:
            occs = np.asarray([len(l) for l in lists2.values()])
            mxu_cols, bounds = plan_tiers(occs)
            cand = (
                (mxu_cols + 700.0) * it_factor, -cell,
                dims, g0, cell, lists2, spilled, bounds,
            )
            if best_t is None or cand[:2] < best_t[:2]:
                best_t = cand
        if int(big_face.sum()) > max_globals or not lists:
            continue
        occs = np.asarray([len(l) for l in lists.values()])
        if stream_ok and _force_ns and n_side != _force_ns:
            continue
        if stream_ok:
            # stream plan: CHAINED fixed-size chunks — every cell's faces
            # split into q-slot chunks (q*N_SECTIONS + 1 flag row packed
            # into 1-2 128-row MXU blocks), so the per-trip gather is
            # one page-slab dot regardless of worst-cell occupancy, and
            # crowded cells cost extra chain trips instead of fattening
            # every gather. The whole bf16 table must still FIT in VMEM
            # alongside the dense map — reject plans over the budget
            # (phase B: HBM-resident tables streamed by DMA would lift
            # this).
            fits = False
            hbm = False
            # census knobs: CSGR_STREAM_Q pins the chunk slot count
            # outright; CSGR_STREAM_Q1 forces the 1-block chunk (q=6,
            # rr=115 — half the per-serve MACs, ~1.67x the chain length
            # at 15k)
            _q_env = int(_os.environ.get("CSGR_STREAM_Q", "0"))
            if _q_env:
                _q_opts = (_q_env,)
            elif _os.environ.get("CSGR_STREAM_Q1"):
                _q_opts = (_STREAM_Q,)
            else:
                _q_opts = (_STREAM_Q2, _STREAM_Q)
            pw_c = _pw_opts[0]
            for q_s in _q_opts:
                for pw_c in _pw_opts:
                    chunks_per_cell = np.ceil(occs / q_s)
                    n_chunks = int(chunks_per_cell.sum())
                    # physical table rows = n_pages * rr_pad with 128
                    # lanes each (narrow pages use only lanes
                    # [0:page_w]) — the device table is bf16 (2 bytes)
                    rr_p = int(np.ceil((N_SECTIONS * q_s + 1) / 8.0)) * 8
                    n_pg_est = int(np.ceil(n_chunks / float(pw_c)))
                    fits = (
                        n_pg_est * rr_p * 128 * 2 <= _STREAM_TABLE_BYTES
                        and n_chunks < int(PAD_CI) - 128
                    )
                    if fits:
                        break
                if fits:
                    break
            if not fits:
                # phase B: table too big for VMEM -> HBM residency with
                # per-trip page DMA. Only the chunk ID SPACE still
                # binds (compact ids must stay below PAD_CI).
                q_s = _q_env or _STREAM_Q2
                pw_c = _pw_hbm
                chunks_per_cell = np.ceil(occs / q_s)
                n_chunks = int(chunks_per_cell.sum())
                fits = n_chunks < int(PAD_CI) - 128
                hbm = fits
            if fits:
                # the service consumes ONE chunk per trip. The fixed
                # term is CALIBRATED from the measured census
                # (doc/PERF_NOTES): per-iteration cost is dominated by
                # the wavefront scaffold + dense lookup, not the
                # page-slab gathers — iteration COUNT, i.e.
                # cell-crossings x chain length, is what the score
                # must minimize.
                import os as _os

                fixed = float(_os.environ.get("CSGR_STREAM_FIXED", 6000.0))
                chain_mult = float(np.mean(chunks_per_cell))
                blocks = (N_SECTIONS * q_s + 1 + 127) // 128
                # crossings split by cell kind: EMPTY cells ride the
                # skip-empty fast path (~0.4 of an iteration), occupied
                # cells cost their chain visits
                frac_occ = len(lists) / float(dims[0] * dims[1] * dims[2])
                per_cross = 0.4 * (1.0 - frac_occ) + frac_occ * chain_mult
                cand = (
                    (128.0 * blocks + fixed) * it_factor * per_cross,
                    -cell, dims, g0, cell, lists, set(), (q_s, pw_c),
                )
                if hbm:
                    if best_h is None or cand[:2] < best_h[:2]:
                        best_h = cand
                elif best_s is None or cand[:2] < best_s[:2]:
                    best_s = cand
    hbm_chosen = False
    if best_s is None and best_h is not None and stream is not False:
        # VMEM-fitting stream plan impossible: the HBM-resident table is
        # the only stream option (and, past the tiered capacity wall,
        # the only plan at all)
        best_s = best_h
        hbm_chosen = True
    if stream is True:
        mode, best = "stream", best_s
    elif stream is False or best_s is None:
        mode, best = "tiered", best_t
    elif best_t is None:
        mode, best = "stream", best_s
    else:
        # auto: tiered whenever it has a plan — measured faster up to
        # its capacity wall (doc/PERF_NOTES stream-mode census: the
        # whole-table MXU gather beats paged service until the table
        # cannot fit/spill, because page service pays deferral or
        # inner-loop overhead per voxel). Stream is the CAPACITY path.
        mode, best = "tiered", best_t
        hbm_chosen = False
    if best is None:
        return _memo(None)
    hbm_chosen = hbm_chosen and mode == "stream"

    _, _, dims, g0, cell, lists, spilled, bounds = best
    nxc, nyc, nzc = dims
    dense_n = nxc * nyc * nzc
    dense_pad = int(np.ceil((dense_n + 1) / 128.0)) * 128

    if mode == "stream":
        # CHAINED CHUNK layout: cells ordered along the Morton curve
        # (nearby voxels -> nearby columns -> a row group's lanes sit in
        # few distinct 128-column table pages), each cell's faces split
        # into consecutive q-slot chunk COLUMNS. Row N_SECTIONS*q is the
        # continuation flag (1 = another chunk of the same cell follows
        # in the next column); the dense map stores the FIRST chunk id.
        def _morton3(ci):
            cz = ci % nzc
            cy = (ci // nzc) % nyc
            cx = ci // (nzc * nyc)
            out = 0
            for b in range(10):
                out |= (
                    ((cx >> b & 1) << (3 * b))
                    | ((cy >> b & 1) << (3 * b + 1))
                    | ((cz >> b & 1) << (3 * b + 2))
                )
            return out

        cells_sorted = sorted(lists.items(), key=lambda kv: _morton3(kv[0]))
        q_s = bounds[0]
        _page_w = bounds[1]  # the plan's chosen logical page width
        chunk_cols: list = []  # (cell id, faces, more-follows)
        first_col: dict[int, int] = {}
        for ci, l in cells_sorted:
            n_ch = (len(l) + q_s - 1) // q_s
            first_col[ci] = len(chunk_cols)
            for c in range(n_ch):
                chunk_cols.append(
                    (ci, l[c * q_s : (c + 1) * q_s], c < n_ch - 1)
                )
        w = int(np.ceil(len(chunk_cols) / float(_page_w))) * _page_w
        tiers = [(q_s, w, 0)]
        tables = [np.zeros((N_SECTIONS * q_s + 1, w), np.float32)]
        n_compact = w
        tier_cells = [cells_sorted]
    else:
        # assign compact ids tier by tier (ascending occupancy tiers)
        by_occ = sorted(lists.items(), key=lambda kv: len(kv[1]))
        tier_cells = [[] for _ in bounds]
        for ci, l in by_occ:
            for ti, mb in enumerate(bounds):
                if len(l) <= mb:
                    tier_cells[ti].append((ci, l))
                    break
        tiers = []
        tables = []
        offset = 0
        for mb, cells in zip(bounds, tier_cells):
            w = int(np.ceil(len(cells) / 128.0)) * 128 if cells else 0
            if w == 0:
                continue
            tiers.append((mb, w, offset))
            tables.append(np.zeros((N_SECTIONS * mb, w), np.float32))
            offset += w
        n_compact = offset

    # dense map: PAD_CI everywhere (pad + empty voxels), real cells set
    # below. Built flat [2, dense_pad] first; repacked page-major after
    # the fill when the two-level layout pays (see _PAGED_MIN).
    dense_map = np.zeros((2, dense_pad), np.float32)
    dense_map[0, :] = np.float32(256 * (int(PAD_CI) // 256))
    dense_map[1, :] = np.float32(int(PAD_CI) % 256)

    # material table: unique (kind, param, albedo) rows
    kind = np.asarray(mesh.mat_kind, np.float64)
    prm = np.asarray(mesh.mat_param, np.float64)
    alb = np.asarray(mesh.albedo, np.float64)
    mat_rows = np.stack([kind, prm, alb[:, 0], alb[:, 1], alb[:, 2]], axis=1)
    uniq, face_mat = np.unique(
        _bf16_np(mat_rows), axis=0, return_inverse=True
    )
    if uniq.shape[0] > 255:
        return _memo(None)  # mat-id row is exact only to 255
    mat_pad = 128 * int(np.ceil((uniq.shape[0] + 1) / 128.0))
    mats = np.zeros((8, mat_pad), np.float32)
    mats[0:5, : uniq.shape[0]] = uniq.T

    assert n_compact < int(PAD_CI), "compact id space collides with PAD_CI"
    sec = {name: i for i, name in enumerate(_SECTIONS)}

    def fill_slots_batch(table, mb, cols, slots, fis, corners):
        """Vectorized slot fill: identical IEEE math to the old scalar
        fill_slot (bf16 hi/lo splits are elementwise), one fancy-indexed
        scatter per section — the per-(face, voxel)-pair Python loop was
        77% of a 45 s pack at 61k faces (1M+ scalar _bf16_split calls)."""
        cols = np.asarray(cols, np.int64)
        slots = np.asarray(slots, np.int64)
        fis = np.asarray(fis, np.int64)
        rel = v0[fis] - corners  # [N, 3] f64
        vals = {}
        for ax, axn in enumerate("xyz"):
            hi, lo = _bf16_split(rel[:, ax])
            vals[f"v0{axn}_hi"], vals[f"v0{axn}_lo"] = hi, lo
            hi, lo = _bf16_split(e1[fis, ax])
            vals[f"e1{axn}_hi"], vals[f"e1{axn}_lo"] = hi, lo
            hi, lo = _bf16_split(e2[fis, ax])
            vals[f"e2{axn}_hi"], vals[f"e2{axn}_lo"] = hi, lo
        vals["mat_id"] = face_mat[fis].astype(np.float32)
        for name, v in vals.items():
            table[sec[name] * mb + slots, cols] = v

    def cell_corners(cis):
        cis = np.asarray(cis, np.int64)
        cz = cis % nzc
        cy = (cis // nzc) % nyc
        cx = cis // (nzc * nyc)
        return g0[None] + np.stack([cx, cy, cz], axis=1).astype(
            np.float64
        ) * cell

    if mode == "stream":
        table = tables[0]
        cols_l: list = []
        slots_l: list = []
        fis_l: list = []
        cis_l: list = []
        for col, (ci, faces, more) in enumerate(chunk_cols):
            for slot, fi in enumerate(faces):
                cols_l.append(col)
                slots_l.append(slot)
                fis_l.append(fi)
                cis_l.append(ci)
            table[N_SECTIONS * q_s, col] = 1.0 if more else 0.0
        if cols_l:
            fill_slots_batch(
                table, q_s, cols_l, slots_l, fis_l, cell_corners(cis_l)
            )
        for ci, col0 in first_col.items():
            dense_map[0, ci] = np.float32(256 * (col0 // 256))
            dense_map[1, ci] = np.float32(col0 % 256)
        # PAGE-MAJOR repack: page p's [R, 128] slab lives at rows
        # [p*R, (p+1)*R) so the service slices it on the SUBLANE dim
        # (8-aligned static-width dynamic slice — measured 2-4x cheaper
        # than a dynamic-offset slice on the minor/lane dim,
        # tools/exp_slab.py)
        rr = table.shape[0]
        rr_pad = int(np.ceil(rr / 8.0)) * 8  # 8-aligned slab offsets
        n_pg = w // _page_w
        # narrow pages (page_w < 128): page p's chunks live in lanes
        # [0:page_w] of its slab; the trailing lanes stay zero so the
        # in-kernel narrow slice is STATIC ([:, :page_w])
        paged_tab = np.zeros((n_pg, rr_pad, 128), np.float32)
        paged_tab[:, :rr, :_page_w] = table.reshape(
            rr, n_pg, _page_w
        ).transpose(1, 0, 2)
        tables[0] = np.ascontiguousarray(
            paged_tab.reshape(n_pg * rr_pad, 128)
        )
    else:
        for (mb, w, toff), cells, table in zip(tiers, [c for c in tier_cells
                                                       if c], tables):
            cols_l = []
            slots_l = []
            fis_l = []
            cis_l = []
            for local_i, (ci, l) in enumerate(cells):
                compact_i = toff + local_i
                dense_map[0, ci] = np.float32(256 * (compact_i // 256))
                dense_map[1, ci] = np.float32(compact_i % 256)
                for slot, fi in enumerate(l):
                    cols_l.append(local_i)
                    slots_l.append(slot)
                    fis_l.append(fi)
                    cis_l.append(ci)
            if cols_l:
                fill_slots_batch(
                    table, mb, cols_l, slots_l, fis_l,
                    cell_corners(cis_l),
                )

    globals_idx = np.sort(
        np.concatenate([np.where(big_face)[0], np.fromiter(spilled, int,
                                                           len(spilled))])
    ).astype(np.int64)
    glob_mesh = MeshScene(
        v0=np.asarray(mesh.v0)[globals_idx],
        e1=np.asarray(mesh.e1)[globals_idx],
        e2=np.asarray(mesh.e2)[globals_idx],
        mat_kind=np.asarray(mesh.mat_kind)[globals_idx],
        albedo=np.asarray(mesh.albedo)[globals_idx],
        mat_param=np.asarray(mesh.mat_param)[globals_idx],
    )
    n_pages = 0
    if dense_pad > _PAGED_MIN:
        # page-major repack: entry v = page * 128 + slot lives at
        # [slot, page] (hi) / [128 + slot, page] (lo)
        n_pages = dense_pad // 128
        # n_pages >= 9 here (dense_pad > _PAGED_MIN), so pages_pad >= 16
        pages_pad = int(np.ceil(n_pages / 8.0)) * 8
        paged = np.zeros((256, pages_pad), np.float32)
        paged[0:128, :] = np.float32(256 * (int(PAD_CI) // 256))
        paged[128:256, :] = np.float32(int(PAD_CI) % 256)
        paged[0:128, :n_pages] = dense_map[0].reshape(n_pages, 128).T
        paged[128:256, :n_pages] = dense_map[1].reshape(n_pages, 128).T
        dense_map = paged
    static = TriGridStatic(
        nx=nxc, ny=nyc, nz=nzc, dense_pad=dense_pad, tiers=tuple(tiers),
        n_compact=n_compact,
        x0=float(g0[0]), y0=float(g0[1]), z0=float(g0[2]), cell=float(cell),
        n_pages=n_pages,
        gather_pages=gather_pages if mode == "stream" else 0,
        hbm_table=int(hbm_chosen),
        page_w=_page_w if mode == "stream" else 128,
    )
    # global-face material ids (for the shared shade-time mat gather)
    glob_mat = face_mat[globals_idx].astype(np.float32)
    pack = TriGridPack(
        static=static, dense_map=dense_map, tables=tuple(tables), mats=mats,
        globals_idx=globals_idx,
    )
    return _memo((pack, glob_mesh, glob_mat))


# ---------------------------------------------------------------------------
# kernel-side fragments (trace-time builders over [8,128] planes)
# ---------------------------------------------------------------------------


def _vote_mode():
    """Stream-service page-vote formulation (census knob): "pergroup" =
    8 independent [1,128] min-reduction loops (round-3 measured path);
    "block" = the same per-group vote computed as k row-wise [8,1] lane
    reductions over the full plane (candidate fix for the ~10.4 us/trip
    scalar-sync cost — doc/PERF_NOTES round 4)."""
    import os as _os

    return _os.environ.get("CSGR_STREAM_VOTE", "block")


def _page_slab(tab, page, rows_pad):
    """[rows_pad, 128] slab of PAGE-MAJOR table ``tab`` (page p occupies
    rows [p*rows_pad, (p+1)*rows_pad), rows_pad 8-aligned) at DYNAMIC
    page index — a SUBLANE-dim dynamic slice, measured 2-4x cheaper than
    the lane-dim slice of the [R, W] layout (tools/exp_slab.py). Works on
    a Pallas VMEM ref (``ref[pl.ds(...), :]``, the production path) and
    on a plain jnp array (``dynamic_slice``, the emit_tri_grid_walk fuzz
    path) transparently. NB: a Ref also satisfies isinstance(jax.Array)
    in interpret mode, so the Ref test must come first."""
    from jax._src.state.types import AbstractRef

    if isinstance(tab, jax.Ref) or isinstance(
        getattr(tab, "aval", None), AbstractRef
    ):
        from jax.experimental import pallas as pl

        return tab[pl.ds(page * rows_pad, rows_pad), :]
    return jax.lax.dynamic_slice_in_dim(
        tab, page * rows_pad, rows_pad, axis=0
    )


def tri_grid_setup(gs: TriGridStatic, o, d, t_glob):
    """3D DDA init for fresh segments. Returns (march, walk) with walk =
    (ix, iy, iz, tmaxx, tmaxy, tmaxz, t_out). ``t_glob`` (the brute
    globals' best hit) bounds the walk."""
    big = BIG
    eps = np.float32(1e-12)
    inv_cell = np.float32(1.0 / gs.cell)
    lo = (gs.x0, gs.y0, gs.z0)
    dims = (gs.nx, gs.ny, gs.nz)

    t_in = jnp.full_like(o[0], np.float32(1e-3))
    t_out = jnp.full_like(o[0], big)
    for ax in range(3):
        o_c, d_c = o[ax], d[ax]
        hi_w = np.float32(lo[ax] + dims[ax] * gs.cell)
        lo_w = np.float32(lo[ax])
        inv = 1.0 / d_c
        t0 = (lo_w - o_c) * inv
        t1 = (hi_w - o_c) * inv
        lo_t = jnp.minimum(t0, t1)
        hi_t = jnp.maximum(t0, t1)
        flat = jnp.abs(d_c) < eps
        inside = (o_c >= lo_w) & (o_c <= hi_w)
        lo_t = jnp.where(flat, jnp.where(inside, -big, big), lo_t)
        hi_t = jnp.where(flat, jnp.where(inside, big, -big), hi_t)
        t_in = jnp.maximum(t_in, lo_t)
        t_out = jnp.minimum(t_out, hi_t)
    t_out = jnp.minimum(t_out, t_glob)
    march = (t_in <= t_out).astype(jnp.int32)

    idxs = []
    tmaxs = []
    for ax in range(3):
        o_c, d_c = o[ax], d[ax]
        p = o_c + t_in * d_c
        i0 = jnp.clip(
            jnp.floor((p - np.float32(lo[ax])) * inv_cell).astype(jnp.int32),
            0, dims[ax] - 1,
        )
        step = jnp.where(d_c > 0, 1, jnp.where(d_c < 0, -1, 0)).astype(
            jnp.int32
        )
        flat = jnp.abs(d_c) < eps
        next_b = np.float32(lo[ax]) + (
            i0 + jnp.where(step > 0, 1, 0)
        ).astype(jnp.float32) * np.float32(gs.cell)
        tmax0 = jnp.where(flat, big, (next_b - o_c) / d_c)
        idxs.append(i0)
        tmaxs.append(tmax0)
    walk = (idxs[0], idxs[1], idxs[2], tmaxs[0], tmaxs[1], tmaxs[2], t_out)
    return march, walk


def _dda_advance3(gs: TriGridStatic, walk, d, act, t_best):
    """One 3-axis DDA advance; returns (still, walk)."""
    ix, iy, iz, tmaxx, tmaxy, tmaxz, t_out = walk
    big = BIG
    eps = np.float32(1e-12)
    t_next = jnp.minimum(jnp.minimum(tmaxx, tmaxy), tmaxz)
    go_x = (tmaxx <= tmaxy) & (tmaxx <= tmaxz)
    go_y = (~go_x) & (tmaxy <= tmaxz)
    go_z = (~go_x) & (~go_y)

    outs = []
    for ax, go, (i_c, tmax_c) in zip(
        range(3), (go_x, go_y, go_z),
        ((ix, tmaxx), (iy, tmaxy), (iz, tmaxz)),
    ):
        d_c = d[ax]
        step = jnp.where(d_c > 0, 1, jnp.where(d_c < 0, -1, 0)).astype(
            jnp.int32
        )
        flat = jnp.abs(d_c) < eps
        td = jnp.where(flat, big, jnp.abs(np.float32(gs.cell) / d_c))
        i2 = i_c + jnp.where(go, step, 0)
        tm2 = jnp.where(go, tmax_c + td, tmax_c)
        outs.append((i2, tm2))
    (ix2, tmx2), (iy2, tmy2), (iz2, tmz2) = outs
    in_grid = (
        (ix2 >= 0) & (ix2 < gs.nx)
        & (iy2 >= 0) & (iy2 < gs.ny)
        & (iz2 >= 0) & (iz2 < gs.nz)
    )
    still = act & in_grid & (t_next <= t_out) & (t_next < t_best)
    ix = jnp.where(act, ix2, ix)
    iy = jnp.where(act, iy2, iy)
    iz = jnp.where(act, iz2, iz)
    tmaxx = jnp.where(act, tmx2, tmaxx)
    tmaxy = jnp.where(act, tmy2, tmaxy)
    tmaxz = jnp.where(act, tmz2, tmaxz)
    return still, (ix, iy, iz, tmaxx, tmaxy, tmaxz, t_out)


def _compact_lookup(gs: TriGridStatic, dense_tab, walk, act):
    """Dense voxel id -> compact cell id planes. Inactive lanes fetch the
    dense pad entry.

    Flat layout (n_pages == 0): one [dense_pad, 128] one-hot against the
    2-row map — O(dense_pad/8) vector ops per row group, fine for small
    grids. Paged layout: voxel id = page * 128 + slot; a [pages, 128]
    one-hot gathers the whole 128-entry page (hi rows 0-127, lo rows
    128-255) through the MXU, then the slot entry is extracted with two
    128-row masked sums — fixed cost regardless of grid size (the 15k-face
    scaling fix, doc/PERF_NOTES)."""
    ix, iy, iz = walk[0], walk[1], walk[2]
    pad_dense = np.int32(gs.dense_pad - 1)
    dense_id = jnp.where(
        act, (ix * gs.ny + iy) * gs.nz + iz, pad_dense
    )
    if gs.n_pages == 0:
        dense_iota = jax.lax.broadcasted_iota(
            jnp.int32, (gs.dense_pad, TILE_LANES), 0
        )
        rows_hi = []
        rows_lo = []
        for g in range(TILE_ROWS):
            onehot = (
                dense_iota == dense_id[g : g + 1]
            ).astype(dense_tab.dtype)
            got = jax.lax.dot_general(
                dense_tab, onehot,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [2, 128]
            rows_hi.append(got[0:1])
            rows_lo.append(got[1:2])
        ci = (jnp.concatenate(rows_hi, axis=0)
              + jnp.concatenate(rows_lo, axis=0))
        return ci  # [8,128] f32 compact cell ids

    pages_pad = dense_tab.shape[1]
    page_id = dense_id >> 7  # // 128
    slot_id = dense_id & 127
    page_iota = jax.lax.broadcasted_iota(
        jnp.int32, (pages_pad, TILE_LANES), 0
    )
    slot_iota = jax.lax.broadcasted_iota(
        jnp.int32, (128, TILE_LANES), 0
    )
    rows = []
    for g in range(TILE_ROWS):
        onehot = (page_iota == page_id[g : g + 1]).astype(dense_tab.dtype)
        page = jax.lax.dot_general(
            dense_tab, onehot,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [256, 128]: the lane's whole page (hi 0-127, lo 128-255)
        sel = slot_iota == slot_id[g : g + 1]
        hi = jnp.sum(
            jnp.where(sel, page[0:128], 0.0), axis=0, keepdims=True
        )
        lo = jnp.sum(
            jnp.where(sel, page[128:256], 0.0), axis=0, keepdims=True
        )
        rows.append(hi + lo)
    return jnp.concatenate(rows, axis=0)  # [8,128] f32 compact cell ids


def _mt_slots(got, m, row_ctx, eps):
    """Möller-Trumbore over the gathered column's ``m`` slots; returns
    (tc_min [1,128], winner attr planes). Zero (padding / unserved)
    slots fail via the NaN route: det=0 -> inv_det=inf -> u=NaN ->
    valid False. ``row_ctx`` = (dxr, dyr, dzr, tox, toy, toz), the row
    group's direction and corner-relative-origin planes."""
    dxr, dyr, dzr, tox, toy, toz = row_ctx
    big = BIG

    def sect(i):
        return got[i * m : (i + 1) * m]

    # reconstruct slot geometry (hi+lo); v0 is voxel-corner-relative
    v0x = sect(0) + sect(1)
    v0y = sect(2) + sect(3)
    v0z = sect(4) + sect(5)
    e1x = sect(6) + sect(7)
    e1y = sect(8) + sect(9)
    e1z = sect(10) + sect(11)
    e2x = sect(12) + sect(13)
    e2y = sect(14) + sect(15)
    e2z = sect(16) + sect(17)
    mid = sect(18)

    tvx = tox - v0x
    tvy = toy - v0y
    tvz = toz - v0z
    # pvec = d x e2
    pvx = dyr * e2z - dzr * e2y
    pvy = dzr * e2x - dxr * e2z
    pvz = dxr * e2y - dyr * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = 1.0 / det  # inf/NaN on degenerate/padding -> rejected
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dxr * qvx + dyr * qvy + dzr * qvz) * inv_det
    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tt > eps)
    tc = jnp.where(valid, tt, big)
    tc_min = jnp.min(tc, axis=0, keepdims=True)  # [1,128]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (m, TILE_LANES), 0)
    winner = jnp.where(tc == tc_min, slot_iota, jnp.int32(m))
    w_min = jnp.min(winner, axis=0, keepdims=True)
    sel = slot_iota == w_min
    slot_attrs = (e1x, e1y, e1z, e2x, e2y, e2z, mid)
    a_tier = [
        jnp.min(jnp.where(sel, sa, big), axis=0, keepdims=True)
        for sa in slot_attrs
    ]
    return tc_min, a_tier


def _stream_sort_on():
    """Round-4 census knob: sublane page-sort binning for the stream
    service (CSGR_STREAM_SORT=1). Default off until measured."""
    import os as _os

    return _os.environ.get("CSGR_STREAM_SORT", "0") == "1"


def _stream_stub():
    """Round-5 census knob: CSGR_STUB=mt inside the STREAM service skips
    the per-serve Moller-Trumbore while keeping vote + slices + one-hot
    + dot + flag walk real. Output WRONG (no hits) — timing only; pairs
    with CSGR_STUB=gather (identical ray paths, zero service) so the
    difference prices the service scaffold."""
    import os as _os

    return _os.environ.get("CSGR_STUB", "")


def _stream_serve_mode():
    """Round-5 census knob: CSGR_STREAM_SERVE=dma serves VMEM-resident
    chunk tables through the phase-B DMA-staging path (per-(group,page)
    async copies into contiguous scratch, one wait, dots from STATIC
    scratch offsets) instead of inline dynamic slices + lane concat.
    Prices the vreg->sreg slice-start stalls vs DMA issue overhead."""
    import os as _os

    return _os.environ.get("CSGR_STREAM_SERVE", "")


def _stream_acc_on():
    """Round-5 census knob: CSGR_STREAM_ACC=1 serves each voted page
    with its OWN [rr, pw] @ [pw, 128] dot and ACCUMULATES the k results
    instead of concatenating the k slabs (+ their one-hots) into one
    wide [rr, k*pw] dot. Bit-exact: a lane's one-hot rows are nonzero
    in at most ONE page (its own), so the other k-1 dots contribute
    exact zeros — f32 x + 0.0 == x. Kills the per-serve lane-dim slab
    concat copies (~127 KB at k=4/pw=128) and the one-hot concat; the
    MAC volume is unchanged (tools/exp_dot_k priced the k-way dot split
    cost-neutral at equal MACs)."""
    import os as _os

    return _os.environ.get("CSGR_STREAM_ACC", "0") == "1"


def _hbm_vote_mode():
    """Phase-B (HBM table) vote mode: "global" = tile-global top-k, one
    shared DMA'd slab set, every group dots all k slabs (round 3b).
    "block" = per-group block vote with per-(group, page) DMAs — 8x the
    DMA starts but each group dots only its OWN k slabs; the 245k census
    measured the shared-set dots at ~92 of 141 us/iter (8 groups x 8
    pages x 5.8 trips). Measured (round 4g, no sort): 245k 1.0 -> 1.2
    Mrays/s at k=2 and k=4 — block is the default. (With the sublane
    sort it REGRESSED to 0.6-0.7: the sort starves row groups,
    doc/PERF_NOTES round 4f.)"""
    import os as _os

    return _os.environ.get("CSGR_HBM_VOTE", "block")


def _apply_row_perm(idx, planes):
    """Row gather: dst[r, c] = src[idx[r, c], c] for each [8,128] plane.

    A per-column permutation of the 8 sublane rows, applied as 8 static
    sublane rotates + masked selects (~16 VPU ops/plane) — no cross-lane
    traffic, Mosaic-friendly (static shifts only)."""
    riota = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    delta = (idx - riota) & 7
    outs = [None] * len(planes)
    for d8 in range(8):
        m = delta == d8
        for j, p in enumerate(planes):
            # shift-0 must bypass jnp.roll: its static lowering emits a
            # zero-size slice Mosaic rejects ("positive constant sizes")
            r = p if d8 == 0 else jnp.roll(p, -d8, axis=0)
            outs[j] = r if outs[j] is None else jnp.where(m, r, outs[j])
    return outs


def _undo_row_perm(idx, planes):
    """Row scatter (inverse of _apply_row_perm): out[idx[r, c], c] =
    src[r, c]. Uses the identity roll(idx, d)[r] == r  <=>  the value for
    output row r sits d rows up in the permuted layout — same 8 rotates +
    selects, no materialized inverse permutation."""
    riota = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    outs = [None] * len(planes)
    for d8 in range(8):
        m = (idx if d8 == 0 else jnp.roll(idx, d8, axis=0)) == riota
        for j, p in enumerate(planes):
            r = p if d8 == 0 else jnp.roll(p, d8, axis=0)
            outs[j] = r if outs[j] is None else jnp.where(m, r, outs[j])
    return outs


def _sublane_sort8(key, payloads):
    """Sort each lane column's 8 sublane rows ascending by ``key``
    ([8,128] f32), carrying ``payloads`` (list of [8,128] planes).

    WHY (round 4, doc/PERF_NOTES): the stream service's cost is the
    per-(row group, distinct page) MXU serve dots — measured ~87% of
    wall time at 15k faces, with only ~21 of each served page's 128
    lane-columns wanted. The tile-global experiment showed the TILE
    collectively wants only ~10 distinct pages/iteration, but they are
    scattered across all 8 row groups (bounced rays land anywhere), so
    per-group voting pays ~6 serves/group. Sorting each column's 8 lanes
    by chunk id re-bins like pages into the same row group (row r holds
    each column's rank-r page — order statistics concentrate), cutting
    distinct pages per group toward ~10/8 + 1. The service is
    lane-independent, so permuting its inputs and un-permuting its
    outputs is bit-exact; the sort itself is a bitonic sort-8 network of
    static sublane rotates + selects (~60 [8,128] VPU ops, ~0.2 us/iter
    against a multi-us serve saving).

    Returns (sorted key, sorted payloads, idx) with idx[r, c] = source
    row of sorted row r (int32), for _undo_row_perm on the outputs."""
    riota = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
    idx = riota
    for blk in (2, 4, 8):
        s = blk // 2
        while s >= 1:
            # bitonic XOR pairing: partner(r) = r ^ s, reached by a -s
            # rotate on bit-clear rows and a +s rotate on bit-set rows
            bit0 = (riota & s) == 0
            part = jnp.where(
                bit0, jnp.roll(key, -s, axis=0), jnp.roll(key, s, axis=0)
            )
            p_idx = jnp.where(
                bit0, jnp.roll(idx, -s, axis=0), jnp.roll(idx, s, axis=0)
            )
            # direction algebra in PURE int32 bit arithmetic: an i1==i1
            # formulation (even via astype-int32, which XLA folds back)
            # hits Mosaic's unlowerable vector<i1> cmpi/xor. take_min =
            # (bit_s(r) == bit_blk(r)): the CE keeps the min at r iff
            # its stride bit and its direction bit agree.
            sb, bb = int(np.log2(s)), int(np.log2(blk))
            tm_i = 1 - (((riota >> sb) ^ (riota >> bb)) & 1)
            # strict comparisons: ties keep self on both sides, so key
            # and carried idx stay consistent
            lt_i = (part < key).astype(jnp.int32)
            gt_i = (part > key).astype(jnp.int32)
            swap = (tm_i * lt_i + (1 - tm_i) * gt_i) > 0
            key = jnp.where(swap, part, key)
            idx = jnp.where(swap, p_idx, idx)
            s //= 2
    return key, _apply_row_perm(idx, payloads), idx


def _stream_service(gs: TriGridStatic, tab, ci, d, to, eps,
                    scratch=None, sem=None):
    """Chained demand-paged gather (stream mode): resolve EVERY lane's
    voxel in full. An inner while loop serves, per row group per trip,
    the MINIMUM pending 128-column table page (one dynamic [*,128] slab
    slice) and ONE chunk column of each served lane's cell chain; lanes
    whose page was not this trip's row minimum, or whose chain has more
    chunks, stay pending. The loop runs until no lane is pending, so
    the caller's DDA walk is identical to the tiered path's (one voxel
    per step, no deferral) while the gather cost per trip is ONE
    page-slab dot x 8 row groups — independent of mesh size.

    All mask/index/chain bookkeeping runs in FULL-BLOCK [8,128] form:
    the v1 service did it in [1,128] slices per row group (~400 ops at
    1/8 VPU occupancy per trip) and measured a pathological ~47 us/trip
    (doc/PERF_NOTES round-3 census); only the per-group slab dot + MT
    remain inside the row-group loop.

    ``ci``: [8,128] f32 FIRST-chunk ids (PAD_CI for empty/inactive).
    ``to``: corner-relative ray origins. Returns (t_cand, attr planes).

    ``gs.gather_pages`` = k pages served per trip, voted PER ROW GROUP
    (round 4): each group finds its own k SMALLEST distinct pending
    pages with k masked [1,128] mins, slices their [rr, 128] page-major
    slabs (8-aligned SUBLANE-dim dynamic slices, 2-4x cheaper than the
    lane-dim slice of the old [R, W] layout, tools/exp_slab.py),
    concatenates them into a [rr, k*128] operand and pays a single wide
    dot against its concatenated k-page one-hot — a lane's column is
    set in at most one page block (its own), so the MT / flag /
    bookkeeping cost stays that of a single serve. Trips with fewer
    than k distinct pending pages burn the spare slabs on a clamped
    repeat page with an all-(-1) local (zero one-hot). A TILE-GLOBAL
    top-k (one shared slab set) was measured WORSE — 2.53 trips/iter vs
    per-group's 1.56 at the same ~10 us/trip, 15k stream 11.6 -> 7.8
    Mrays/s (doc/PERF_NOTES round 4): BLOCK pixel assignment
    (trimesh_kernel.slot_pixel) keeps PRIMARY rays in few Morton pages,
    but bounced rays scatter and a global top-k starves most groups.

    ``gs.hbm_table`` (phase B): ``tab`` is an HBM (ANY-space) ref; each
    trip DMAs the k served slabs into ``scratch`` (VMEM, [k*rr_pad,
    128]) through ``sem`` — all k copies start before the first wait, so
    their latencies overlap. VMEM then only ever holds k slabs: table
    capacity is HBM-bound (a 245k-face mesh's 21 MB table streams fine).
    """
    (q_s, w_s, _), = gs.tiers
    k_pages = max(1, int(gs.gather_pages))
    rr = N_SECTIONS * q_s + 1
    rr_pad = int(np.ceil(rr / 8.0)) * 8  # packer's 8-aligned slab rows
    flag_row = N_SECTIONS * q_s  # continuation-flag row index
    page_w = int(getattr(gs, "page_w", 128) or 128)
    pbig = np.float32(w_s // page_w)  # sentinel > any real page
    inv128 = np.float32(1.0 / page_w)
    page_w_f = np.float32(page_w)

    def _narrow(slab):
        # narrow pages: real chunks live in lanes [0:page_w]; the STATIC
        # lane slice shrinks the serve dot's contraction dim to page_w
        return slab if page_w == 128 else slab[:, :page_w]
    pad_ci = np.float32(PAD_CI)
    big = BIG
    dx, dy, dz = d
    tox, toy, toz = to

    # value-dependent inits (a SPLAT-initialized while carry gets pinned
    # to a replicated Mosaic layout the body value can't relayout into)
    zerof = ci * 0.0
    t0 = zerof + big
    carry0 = (
        ci,  # chain cursor: starts at the cell's first chunk
        (ci < pad_ci).astype(jnp.int32),  # pending flag per lane
        t0,
        zerof,  # trip counter (census only, CSGR_DEBUG_TRIPS)
    ) + tuple(zerof for _ in range(N_ATTRS))

    def cond(c):
        return jnp.max(c[1]) > 0

    def body(c):
        cur, nd, t_c, trips = c[0], c[1], c[2], c[3]
        attrs_c = c[4:]
        ndb = nd > 0
        pg = jnp.where(ndb, jnp.floor(cur * inv128), pbig)  # [8,128]
        iota_f = jax.lax.broadcasted_iota(
            jnp.int32, (page_w, TILE_LANES), 0
        ).astype(jnp.float32)
        tc_rows = []
        flag_rows = []
        a_rows: list = [[] for _ in range(N_ATTRS)]

        def serve_dot(slabs_r, locals_g):
            # per-lane chunk-column extraction by one-hot MXU passes
            # over the k page slabs: a lane's one-hot rows are nonzero
            # only inside its own page's block. Default: concatenate
            # the k slabs lane-wise and pay ONE wide [rr, k*pw] dot.
            # CSGR_STREAM_ACC=1: k separate [rr, pw] dots ACCUMULATED
            # (exact — the k-1 foreign dots add exact zeros), killing
            # the slab + one-hot concat copies. (A tpu.dynamic_gather /
            # take_along_axis lane-shuffle was 5x faster in a
            # micro-bench (tools/exp_gather.py) but 30% SLOWER in the
            # real kernel — the shuffle serializes against the
            # surrounding vector work where the MXU pass overlaps it;
            # measured 4832 -> 6380 ms on the 15k scene. Keep the dot.)
            if _stream_acc_on() and k_pages > 1:
                out = None
                for sl, local in zip(slabs_r, locals_g):
                    oh = (iota_f == local).astype(sl.dtype)
                    dj = jax.lax.dot_general(
                        sl, oh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    out = dj if out is None else out + dj
                return out
            slab_cat = (
                slabs_r[0] if k_pages == 1
                else jnp.concatenate(slabs_r, axis=1)
            )
            onehot = jnp.concatenate(
                [
                    (iota_f == local).astype(slab_cat.dtype)
                    for local in locals_g
                ],
                axis=0,
            ) if k_pages > 1 else (
                iota_f == locals_g[0]
            ).astype(slab_cat.dtype)
            return jax.lax.dot_general(
                slab_cat, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def serve_group(g, slabs, locals_g):
            if _stream_stub() == "dot":
                # census only (CSGR_STUB=dot, round 5): vote + slices +
                # concat + one-hot stay real and the chain FLAGS come
                # from a thin [1,K] @ [K,128] dot (real chain walk), but
                # the big [rr,K] gather dot is skipped — (mt - dot)
                # prices the big dot's MACs exactly.
                fl = serve_dot(
                    [sl[flag_row : flag_row + 1] for sl in slabs],
                    locals_g,
                )
                flag_rows.append((fl > 0.0).astype(jnp.int32))
                tc_rows.append(jnp.where(fl > big, fl, big))
                for j in range(N_ATTRS):
                    a_rows[j].append(fl * 0.0)
                return
            got = serve_dot(slabs, locals_g)
            # flags travel as int32: Mosaic cannot select between i1
            # vectors ("Unsupported target bitwidth for truncation")
            flag_rows.append(
                (got[flag_row : flag_row + 1] > 0.0).astype(jnp.int32)
            )
            if _stream_stub() == "mt":
                # census only (CSGR_STUB=mt, round 5): real vote + slices
                # + one-hot + dot + flags (chains walk for real), but the
                # Moller-Trumbore math is skipped — tc=big keeps the ray
                # paths IDENTICAL to CSGR_STUB=gather, so (mt - gather)
                # prices the service scaffold exactly.
                tc_rows.append(jnp.where(got[0:1] > big, got[0:1], big))
                for j in range(N_ATTRS):
                    a_rows[j].append(got[j : j + 1] * 0.0)
                return
            row_ctx = (
                dx[g : g + 1], dy[g : g + 1], dz[g : g + 1],
                tox[g : g + 1], toy[g : g + 1], toz[g : g + 1],
            )
            tc_g, at_g = _mt_slots(got, q_s, row_ctx, eps)
            tc_rows.append(tc_g)
            for j in range(N_ATTRS):
                a_rows[j].append(at_g[j])

        def vote(pg_m, ndb_m, cur_m):
            """k smallest distinct pending pages of the [*,128] mask
            region: (locals rows, int32 page ids, last page). -1 locals
            park off-page lanes (one-hot matches nothing -> zero slots
            -> Moller-Trumbore rejects via the det=0 NaN route)."""
            rem = pg_m
            locals_v, p_is_v, p_last = [], [], None
            for _ in range(k_pages):
                p_j = jnp.min(rem)  # 0-d; stays in a vreg for compares
                rem = jnp.where(pg_m == p_j, pbig, rem)
                locals_v.append(jnp.where(
                    ndb_m & (pg_m == p_j),
                    cur_m - p_j * page_w_f, np.float32(-1.0),
                ))
                p_is_v.append(
                    jnp.minimum(p_j, pbig - 1.0).astype(jnp.int32)
                )
                p_last = p_j
            return locals_v, p_is_v, p_last

        if (scratch is not None
                and ((gs.hbm_table and _hbm_vote_mode() == "block")
                     or (not gs.hbm_table
                         and _stream_serve_mode() == "dma"))):
            # phase-B PER-GROUP voting (round 4, see _hbm_vote_mode):
            # block-form vote as in the VMEM path, then one DMA per
            # (group, page) into that group's scratch slots — all 8*k
            # copies start before the first wait so latencies overlap,
            # and each group dots only its own k slabs.
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            rem = pg
            locals_all, p_rows = [], []
            for _ in range(k_pages):
                p_j = jnp.min(rem, axis=1, keepdims=True)  # [8,1]
                sel = pg == p_j
                rem = jnp.where(sel, pbig, rem)
                locals_all.append(jnp.where(
                    ndb & sel, cur - p_j * page_w_f,
                    np.float32(-1.0),
                ))
                p_rows.append(jnp.minimum(p_j, pbig - 1.0))
            on_p = ndb & (pg <= p_rows[-1])
            copies = []
            for g in range(TILE_ROWS):
                for j in range(k_pages):
                    p_i = p_rows[j][g, 0].astype(jnp.int32)
                    s0 = (g * k_pages + j) * rr_pad
                    cp = pltpu.make_async_copy(
                        tab.at[pl.ds(p_i * rr_pad, rr_pad), :],
                        scratch.at[s0 : s0 + rr_pad, :],
                        sem,
                    )
                    cp.start()
                    copies.append(cp)
            for cp in copies:
                cp.wait()
            for g in range(TILE_ROWS):
                base = g * k_pages
                slabs = [
                    _narrow(scratch[
                        (base + j) * rr_pad : (base + j + 1) * rr_pad, :
                    ])
                    for j in range(k_pages)
                ]
                serve_group(
                    g, slabs, [loc[g : g + 1] for loc in locals_all]
                )
        elif gs.hbm_table and scratch is not None:
            # phase B default keeps TILE-GLOBAL voting: the k served
            # slabs are DMA'd HBM -> VMEM once per trip and shared by
            # all 8 row groups (per-group voting needs 8x the scratch
            # and DMA starts — see _hbm_vote_mode "block")
            locals_, p_is, p_last = vote(pg, ndb, cur)
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            # start every copy before the first wait: latencies overlap
            copies = []
            for j, p_i in enumerate(p_is):
                cp = pltpu.make_async_copy(
                    tab.at[pl.ds(p_i * rr_pad, rr_pad), :],
                    scratch.at[j * rr_pad : (j + 1) * rr_pad, :],
                    sem,
                )
                cp.start()
                copies.append(cp)
            for cp in copies:
                cp.wait()
            slabs = [
                _narrow(scratch[j * rr_pad : (j + 1) * rr_pad, :])
                for j in range(k_pages)
            ]
            # tile-served set = the k smallest pending pages, so a
            # pending lane is served this trip iff pg <= p_last
            on_p = ndb & (pg <= p_last)
            # slabs [rr_pad, pw] each, shared by all 8 row groups
            for g in range(TILE_ROWS):
                serve_group(
                    g, slabs, [loc[g : g + 1] for loc in locals_]
                )
        elif _vote_mode() == "block":
            # VMEM tables, BLOCK-FORM per-group voting (round 4): the
            # semantics are identical to the per-group loop below (each
            # row group serves its own k smallest distinct pending
            # pages), but the vote itself runs as k ROW-WISE lane
            # reductions over the full [8,128] plane (`min(axis=1)` ->
            # [8,1]) + full-block selects, instead of 8k separate
            # [1,128]-plane->scalar min reductions at 1/8 VPU occupancy
            # — the round-3 census's ~10.4 us/trip is dominated by
            # exactly those scalar-sync reductions (the cluster-culling
            # ablation measured the same plane->scalar cost class). Only
            # the slab dynamic-slice STARTS still need scalars: one
            # [8,1]-element vreg->sreg read per (group, page).
            rem = pg
            locals_all, p_rows = [], []
            for _ in range(k_pages):
                p_j = jnp.min(rem, axis=1, keepdims=True)  # [8,1]
                sel = pg == p_j
                rem = jnp.where(sel, pbig, rem)
                locals_all.append(jnp.where(
                    ndb & sel, cur - p_j * page_w_f,
                    np.float32(-1.0),
                ))
                p_rows.append(jnp.minimum(p_j, pbig - 1.0))
            on_p = ndb & (pg <= p_rows[-1])  # [8,128] block form
            for g in range(TILE_ROWS):
                slabs = [
                    _narrow(_page_slab(
                        tab, p_rows[j][g, 0].astype(jnp.int32), rr_pad
                    ))
                    for j in range(k_pages)
                ]
                serve_group(
                    g,
                    slabs,
                    [loc[g : g + 1] for loc in locals_all],
                )
        else:
            # VMEM tables vote PER ROW GROUP (round 4): each group
            # serves its own k smallest pending pages. The tile-global
            # restructure measured 2.53 trips/iter vs per-group's 1.56
            # (same ~10 us/trip) — 15k-face stream 11.6 -> 7.8 Mrays/s,
            # 61k 5.8 -> 2.9 (doc/PERF_NOTES round 4): after the first
            # bounce a tile's rays scatter across many Morton pages, so
            # a global top-k starves most groups. Per-group voting costs
            # 8x the [1,128] reductions + 8k sublane-dim slab slices,
            # which the measured trip cost absorbs.
            on_rows = []
            for g in range(TILE_ROWS):
                pg_g = pg[g : g + 1]
                locals_g, p_is_g, p_last = vote(
                    pg_g, ndb[g : g + 1], cur[g : g + 1]
                )
                slabs = [
                    _narrow(_page_slab(tab, p_i, rr_pad))
                    for p_i in p_is_g
                ]
                # int32 rows: Mosaic cannot concatenate i1 vregs
                # ("Invalid vector register cast", bitcast i1 -> i32)
                on_rows.append(
                    (ndb[g : g + 1] & (pg_g <= p_last)).astype(jnp.int32)
                )
                serve_group(g, slabs, locals_g)
            on_p = jnp.concatenate(on_rows, axis=0) > 0
        # merge + chain bookkeeping, all in [8,128] block form
        tc = jnp.where(on_p, jnp.concatenate(tc_rows, axis=0), big)
        flag = jnp.concatenate(flag_rows, axis=0)  # [8,128] int32
        better = tc < t_c
        t_new = jnp.where(better, tc, t_c)
        a_new = tuple(
            jnp.where(better, jnp.concatenate(rows, axis=0), old)
            for rows, old in zip(a_rows, attrs_c)
        )
        cur2 = jnp.where(on_p & (flag > 0), cur + 1.0, cur)
        nd2 = jnp.where(on_p & (flag == 0), 0, nd)
        return (cur2, nd2, t_new, trips + 1.0) + a_new

    res = jax.lax.while_loop(cond, body, carry0)
    return res[2], list(res[4:]), res[3]


def tri_grid_step(gs: TriGridStatic, dense_tab, tri_tabs, state, o, d,
                  skip_empty: int = 2, stream_scratch=None):
    """ONE DDA step for every lane: compact lookup (+ cheap empty-voxel
    skips) -> one-hot face gather (whole-tier tables, or the stream
    mode's chained page service) -> Moller-Trumbore over the slots ->
    advance.

    ``state`` = (march, walk, t_best, id_best, attrs) in the
    common.grid_wavefront layout. ``tri_tabs``: one table per occupancy
    tier (see TriGridStatic.tiers) — a lane's cell lives in exactly one
    tier; the other tiers' one-hots match nothing and their zero slots
    fail Moller-Trumbore via the NaN route, so no masking is needed.
    ``skip_empty``: number of extra dense-map-only advances taken when
    the current voxel is empty — the dense lookup is ~50x cheaper than
    the face gathers, so empty voxels shouldn't cost full iterations.
    """
    march, walk, t_best, id_best, attrs = state
    ox, oy, oz = o
    dx, dy, dz = d
    big = BIG
    eps = np.float32(1e-3)
    pad_ci = np.float32(PAD_CI)

    # cost-census stubs (doc/PERF_NOTES): CSGR_STUB=dense kills the
    # compact lookup (every voxel reads empty), =gather additionally
    # kills the face gather+MT, =mt kills only the MT math. Outputs are
    # WRONG under any stub — census timing only.
    import os as _os

    _stub = _os.environ.get("CSGR_STUB", "")

    stream = gs.gather_pages > 0
    act = march > 0

    def lookup(walk, act):
        if _stub == "dense":
            # value-dependent pad constant, no MXU lookup
            return jnp.where(act, pad_ci, pad_ci)
        return _compact_lookup(gs, dense_tab, walk, act)

    ci = lookup(walk, act)
    for _ in range(skip_empty):
        # advance lanes sitting in EMPTY voxels without paying the gathers
        empty = act & (ci >= pad_ci)
        still, walk = _dda_advance3(gs, walk, d, empty, t_best)
        # lanes that advanced out of the walk are done marching
        march = jnp.where(empty, still.astype(jnp.int32), march)
        act = march > 0
        ci = jnp.where(empty, lookup(walk, act), ci)

    ci = jnp.where(act, ci, pad_ci)

    ix, iy, iz = walk[0], walk[1], walk[2]
    cornx = np.float32(gs.x0) + ix.astype(jnp.float32) * np.float32(gs.cell)
    corny = np.float32(gs.y0) + iy.astype(jnp.float32) * np.float32(gs.cell)
    cornz = np.float32(gs.z0) + iz.astype(jnp.float32) * np.float32(gs.cell)
    # tvec = (o - corner) - v0_rel : the subtraction keeps the small
    # cell-relative magnitudes (precision) and costs one extra sub/row
    tox = ox - cornx
    toy = oy - corny
    toz = oz - cornz

    if _stub == "gather":
        t_cand = tox * 0.0 + big
        attr_pl = [tox * 0.0 for _ in range(N_ATTRS)]
    elif stream:
        scr, sem = stream_scratch if stream_scratch else (None, None)
        if _stream_sort_on():
            # sublane page-sort binning (see _sublane_sort8): permute
            # each column's 8 lanes so like chunk pages share a row
            # group, serve, un-permute the results. Bit-exact (the
            # service is lane-independent; PAD_CI keys sink done lanes
            # to the bottom rows). trips is uniform across lanes (the
            # counter increments unconditionally), so the census sum
            # needs no un-permute.
            ci_s, ctx_s, perm = _sublane_sort8(
                ci, [dx, dy, dz, tox, toy, toz]
            )
            t_cand, attr_pl, trips = _stream_service(
                gs, tri_tabs[0], ci_s, tuple(ctx_s[:3]),
                tuple(ctx_s[3:]), eps, scratch=scr, sem=sem,
            )
            unp = _undo_row_perm(perm, [t_cand] + list(attr_pl))
            t_cand, attr_pl = unp[0], unp[1:]
        else:
            t_cand, attr_pl, trips = _stream_service(
                gs, tri_tabs[0], ci, d, (tox, toy, toz), eps,
                scratch=scr, sem=sem,
            )
        if _os.environ.get("CSGR_DEBUG_TRIPS"):
            # census only (corrupts id_best): accumulate service-loop
            # trip counts; trimesh_kernel reports them via rays_ref
            id_best = id_best + trips
    else:
        t_rows = []
        attr_rows = [[] for _ in range(N_ATTRS)]
        for g in range(TILE_ROWS):
            row_ctx = (
                dx[g : g + 1], dy[g : g + 1], dz[g : g + 1],
                tox[g : g + 1], toy[g : g + 1], toz[g : g + 1],
            )
            t_row = None
            a_row = None
            for (m, w, toff), tab in zip(gs.tiers, tri_tabs):
                c_iota_f = jax.lax.broadcasted_iota(
                    jnp.int32, (w, TILE_LANES), 0
                ).astype(jnp.float32)
                onehot = (
                    c_iota_f == (ci[g : g + 1] - np.float32(toff))
                ).astype(tab.dtype)
                got = jax.lax.dot_general(
                    tab, onehot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [N_SECTIONS*m, 128]
                if _stub == "mt":
                    # keep the dot alive, skip the MT math
                    tc_min = jnp.where(got[0:1] > big, got[0:1], big)
                    a_tier = [got[j : j + 1] * 0.0 for j in range(N_ATTRS)]
                else:
                    tc_min, a_tier = _mt_slots(got, m, row_ctx, eps)
                if t_row is None:
                    t_row, a_row = tc_min, a_tier
                else:
                    better = tc_min < t_row
                    a_row = [
                        jnp.where(better, an, ao)
                        for an, ao in zip(a_tier, a_row)
                    ]
                    t_row = jnp.where(better, tc_min, t_row)
            t_rows.append(t_row)
            for j in range(N_ATTRS):
                attr_rows[j].append(a_row[j])
        t_cand = jnp.concatenate(t_rows, axis=0)  # [8,128]
        attr_pl = [
            jnp.concatenate(rows, axis=0) for rows in attr_rows
        ]

    improve = act & (t_cand < t_best)
    t_best = jnp.where(improve, t_cand, t_best)
    attrs = tuple(
        jnp.where(improve, new, old)
        for new, old in zip(attr_pl, attrs)
    )

    still, walk = _dda_advance3(gs, walk, d, act, t_best)
    march = jnp.where(act, still.astype(jnp.int32), march)
    return march, walk, t_best, id_best, attrs


def emit_tri_grid_walk(gs: TriGridStatic, dense_tab, tri_tabs, o, d,
                       t_best0):
    """Whole-walk wrapper (setup + while over tri_grid_step) for the fuzz
    tests — the production kernel fuses one step per wavefront iteration
    instead (common.grid_wavefront)."""
    march, walk = tri_grid_setup(gs, o, d, t_best0)
    attrs0 = tuple(jnp.zeros_like(t_best0) for _ in range(N_ATTRS))
    id0 = jnp.zeros_like(t_best0)

    def cond(st):
        return jnp.max(st[0]) > 0

    def body(st):
        return tuple(tri_grid_step(gs, dense_tab, tri_tabs, st, o, d))

    st = (march, walk, t_best0, id0, attrs0)
    st = jax.lax.while_loop(cond, body, st)
    return st[2], st[4]
