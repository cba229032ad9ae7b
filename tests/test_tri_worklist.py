"""Per-voxel triangle worklists (kernels/tri_worklist.py): packer
invariants, DDA-walk fuzz vs brute Möller-Trumbore, full-kernel parity,
and slab sharding of the grid path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgrenderer_tpu.camera import Camera
from csgrenderer_tpu.kernels import render_image_mesh_pallas
from csgrenderer_tpu.kernels.common import BIG
from csgrenderer_tpu.kernels.tri_worklist import (
    N_SECTIONS,
    PAD_CI,
    _tri_box_overlap,
    emit_tri_grid_walk,
    pack_tri_grid,
)
from csgrenderer_tpu.render import render_image
from csgrenderer_tpu.render.trimesh import concat_meshes, icosphere, quad
from csgrenderer_tpu.scene import Material


def demo_mesh(sub=2):
    return concat_meshes(
        icosphere((-1.1, 0.8, -3.2), 0.8,
                  Material.metal((0.9, 0.8, 0.6), 0.05), sub),
        icosphere((1.1, 0.8, -3.0), 0.8, Material.dielectric(1.5), sub),
        icosphere((0.0, 0.45, -1.9), 0.45,
                  Material.lambertian((0.2, 0.35, 0.7)), sub),
        quad((-6, 0, -9), (6, 0, -9), (6, 0, 2), (-6, 0, 2),
             Material.lambertian((0.55, 0.55, 0.5))),
    )


def bf16_tables(pack):
    import ml_dtypes

    dense = jnp.asarray(pack.dense_map.astype(ml_dtypes.bfloat16))
    tabs = tuple(
        jnp.asarray(t.astype(ml_dtypes.bfloat16)) for t in pack.tables
    )
    return dense, tabs


def test_sat_overlap_basics():
    # unit triangle in z=0 plane; boxes around/away from it
    v0 = np.array([0.0, 0.0, 0.0])
    v1 = np.array([1.0, 0.0, 0.0])
    v2 = np.array([0.0, 1.0, 0.0])
    centers = np.array([
        [0.25, 0.25, 0.0],   # on the triangle
        [5.0, 5.0, 0.0],     # far away in-plane
        [0.25, 0.25, 2.0],   # above the plane
        [0.9, 0.9, 0.0],     # near the hypotenuse, just outside
    ])
    got = _tri_box_overlap(v0, v1, v2, centers, 0.2)
    assert got.tolist() == [True, False, False, False]


def test_packer_invariants():
    mesh = demo_mesh()
    pack, glob_mesh, glob_mat = pack_tri_grid(mesh)
    gs = pack.static
    # the floor quad's huge faces must be brute-forced, not gridded
    assert glob_mesh.v0.shape[0] == pack.globals_idx.shape[0]
    assert pack.globals_idx.shape[0] >= 2
    # every face is accounted for: count slots with nonzero mat-or-geometry
    gridded = 0
    for (m, w, off), tab in zip(gs.tiers, pack.tables):
        geom = tab[: 18 * m].reshape(18, m, w)
        gridded += int((np.abs(geom).sum(axis=0) > 0).sum())
    # gridded counts (face, voxel) PAIRS >= number of gridded faces
    assert gridded >= mesh.num_faces - pack.globals_idx.shape[0]
    # dense map: every non-pad value decodes to a valid compact id
    assert gs.n_pages == 0  # the sub=2 mesh stays on the flat layout
    ci = pack.dense_map[0] + pack.dense_map[1]
    real = ci[ci < PAD_CI]
    assert real.size > 0 and real.max() < gs.n_compact


def test_paged_dense_map_roundtrip():
    """The page-major repack must decode back to the flat map: entry
    v = page*128 + slot lives at [slot, page] (hi) / [128+slot, page]
    (lo), padded page columns hold PAD_CI."""
    mesh = demo_mesh(3)
    pack, _, _ = pack_tri_grid(mesh)
    gs = pack.static
    assert gs.n_pages > 0
    paged = pack.dense_map
    assert paged.shape[0] == 256
    flat = (paged[0:128, : gs.n_pages]
            + paged[128:256, : gs.n_pages]).T.reshape(-1)
    real = flat[flat < PAD_CI]
    assert real.size > 0 and real.max() < gs.n_compact
    # padded page columns are pure PAD
    if paged.shape[1] > gs.n_pages:
        extra = paged[0:128, gs.n_pages:] + paged[128:256, gs.n_pages:]
        assert (extra == PAD_CI).all()
    # distinct decoded ids = the real (non-pad) compact cells
    assert np.unique(real).size <= gs.n_compact
    # tier offsets tile the compact id space
    off = 0
    for m, w, toff in gs.tiers:
        assert toff == off
        off += w
    assert off == gs.n_compact


@pytest.mark.parametrize("sub,stream", [(2, False), (3, False), (3, True)])
def test_walk_matches_brute_mt_fuzz(sub, stream):
    """sub=2 exercises the flat dense map, sub=3 (3842 faces) the
    two-level PAGED map (round 2b scaling fix); stream=True the
    demand-paged single-Morton-tier gather with lane deferral (round 3
    100k-face fix)."""
    mesh = demo_mesh(sub)
    pack, glob_mesh, _ = pack_tri_grid(mesh, stream=stream or "auto")
    gs = pack.static
    assert (gs.n_pages > 0) == (sub == 3)  # paged layout kicks in
    assert (gs.gather_pages > 0) == stream
    if stream:
        assert len(gs.tiers) == 1  # single Morton-ordered tier
    dense, tabs = bf16_tables(pack)

    rng = np.random.default_rng(0)
    n = 1024
    o = rng.uniform([-3, 0.1, -5], [3, 2.5, 1], (n, 3)).astype(np.float32)
    tgt = rng.uniform([-2, 0, -4], [2, 1.6, -1], (n, 3)).astype(np.float32)
    d = (tgt - o).astype(np.float32)

    gidx = set(pack.globals_idx.tolist())
    keep = np.asarray(
        [i for i in range(mesh.num_faces) if i not in gidx]
    )
    v0 = np.asarray(mesh.v0)[keep]
    e1 = np.asarray(mesh.e1)[keep]
    e2 = np.asarray(mesh.e2)[keep]
    pv = np.cross(d[:, None, :], e2[None])
    det = np.sum(e1[None] * pv, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tv = o[:, None, :] - v0[None]
        u = np.sum(tv * pv, axis=-1) * inv
        qv = np.cross(tv, e1[None])
        v = np.sum(d[:, None, :] * qv, axis=-1) * inv
        t = np.sum(e2[None] * qv, axis=-1) * inv
    ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-3)
    t_ref = np.where(ok, t, 1e30).min(axis=1)

    op = tuple(jnp.asarray(o[:, i].reshape(8, 128)) for i in range(3))
    dp = tuple(jnp.asarray(d[:, i].reshape(8, 128)) for i in range(3))
    t0 = jnp.full((8, 128), BIG)
    t_w, _ = jax.jit(
        lambda op, dp, t0: emit_tri_grid_walk(gs, dense, tabs, op, dp, t0)
    )(op, dp, t0)
    t_w = np.asarray(t_w).reshape(-1)

    hit_ref = t_ref < 1e29
    hit_w = t_w < 5e29
    # bf16 table reconstruction can flip razor-thin silhouette hits; allow
    # a tiny disagreement budget, require exact t's where both agree
    assert (hit_ref == hit_w).mean() > 0.999
    both = hit_ref & hit_w
    rel = np.abs(t_w[both] - t_ref[both]) / np.maximum(t_ref[both], 1e-6)
    assert rel.max() < 5e-3


@pytest.mark.parametrize("sub,worklist", [(2, True), (3, True), (3, "stream")])
def test_grid_kernel_matches_reference(sub, worklist):
    # sub=3 runs the PAGED dense map through the real kernel path
    # (interpret mode): table shapes, dense_ref plumbing, page decode.
    # worklist="stream" runs the demand-paged gather end to end: ref
    # page slicing, lane deferral, BLOCK slot assignment + no unstride
    mesh = demo_mesh(sub)
    cam = Camera.look_at(
        (0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
        vfov_degrees=45.0, aspect_ratio=64 / 36,
    )
    img_g, rays_g = render_image_mesh_pallas(
        mesh, cam, 64, 36, spp=4, max_bounces=4, seed=7,
        interpret=True, worklist=worklist,
    )
    img_j, rays_j = render_image(
        mesh.nearest_hit, cam, 64, 36, spp=4, max_bounces=4, seed=7
    )
    assert int(rays_g) == int(rays_j)  # same paths traced
    rmse = float(np.sqrt(np.mean((np.asarray(img_g) - np.asarray(img_j)) ** 2)))
    assert rmse < 1.5e-3  # bf16 table noise only


@pytest.mark.parametrize("worklist", [True, "stream"])
def test_grid_kernel_slab_sharding(worklist):
    """Rendering two half-height slabs == the full frame (the multi-chip
    row-sharding primitive), on the grid path (both gather modes)."""
    mesh = demo_mesh()
    cam = Camera.look_at(
        (0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
        vfov_degrees=45.0, aspect_ratio=64 / 32,
    )
    full, _ = render_image_mesh_pallas(
        mesh, cam, 64, 32, spp=2, max_bounces=3, seed=3,
        interpret=True, worklist=worklist,
    )
    top, _ = render_image_mesh_pallas(
        mesh, cam, 64, 32, spp=2, max_bounces=3, seed=3,
        interpret=True, worklist=worklist, rows=16, row_offset=0,
    )
    bot, _ = render_image_mesh_pallas(
        mesh, cam, 64, 32, spp=2, max_bounces=3, seed=3,
        interpret=True, worklist=worklist, rows=16, row_offset=16,
    )
    np.testing.assert_array_equal(
        np.asarray(full), np.concatenate([np.asarray(top), np.asarray(bot)])
    )


def test_small_mesh_declines_grid():
    mesh = icosphere((0, 0, -3), 1.0, Material.normal_map(), 1)  # 80 faces
    assert pack_tri_grid(mesh) is None
    with pytest.raises(ValueError):
        render_image_mesh_pallas(
            mesh,
            Camera.look_at((0, 0, 0), (0, 0, -1), vfov_degrees=60,
                           aspect_ratio=1.0),
            16, 16, spp=1, worklist=True,
        )


def test_sections_constant():
    # the kernel's section unpacking is hand-indexed; pin the layout
    assert N_SECTIONS == 19


def test_hbm_stream_kernel_matches_reference(monkeypatch):
    """Phase B: with the stream-table VMEM budget forced to ~0, the
    packer must choose the HBM-resident plan (hbm_table=1) and the
    kernel must DMA page slabs from the ANY-space table — output
    identical in distribution to the ordinary stream path (same chunk
    layout, same walk)."""
    from csgrenderer_tpu.kernels import tri_worklist as twl

    monkeypatch.setattr(twl, "_STREAM_TABLE_BYTES", 1)
    twl._PACK_CACHE.clear()
    mesh = demo_mesh(3)
    pack, _, _ = pack_tri_grid(mesh, stream=True)
    gs = pack.static
    assert gs.hbm_table == 1 and gs.gather_pages > 0
    cam = Camera.look_at(
        (0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
        vfov_degrees=45.0, aspect_ratio=64 / 36,
    )
    img_g, rays_g = render_image_mesh_pallas(
        mesh, cam, 64, 36, spp=2, max_bounces=4, seed=7,
        interpret=True, worklist="stream",
    )
    img_j, rays_j = render_image(
        mesh.nearest_hit, cam, 64, 36, spp=2, max_bounces=4, seed=7
    )
    assert int(rays_g) == int(rays_j)
    rmse = float(
        np.sqrt(np.mean((np.asarray(img_g) - np.asarray(img_j)) ** 2))
    )
    assert rmse < 1.5e-3
    twl._PACK_CACHE.clear()


def test_native_sat_parity_fuzz():
    """The C++ SAT pair test must agree BIT-EXACTLY with the numpy
    reference on random near-threshold pairs (same 13-axis math,
    -ffp-contract=off); skipped when no compiler is available."""
    from csgrenderer_tpu.kernels import tri_worklist as twl

    fn = twl._native_sat()
    if fn is None:
        pytest.skip("native scene core unavailable")
    rng = np.random.default_rng(3)
    n = 50000
    v0 = rng.normal(0, 1, (n, 3))
    v1 = v0 + rng.normal(0, 0.1, (n, 3))
    v2 = v0 + rng.normal(0, 0.1, (n, 3))
    centers = v0 + rng.normal(0, 0.08, (n, 3))
    for half in (0.03, 0.07, 0.2):
        a = twl._tri_box_overlap_pairs_native(
            v0, v1, v2, centers, half, fn
        )
        b = twl._tri_box_overlap_pairs.__wrapped__(
            v0, v1, v2, centers, half
        ) if hasattr(twl._tri_box_overlap_pairs, "__wrapped__") else None
        if b is None:
            saved = twl._SAT_NATIVE
            twl._SAT_NATIVE = False
            try:
                b = twl._tri_box_overlap_pairs(v0, v1, v2, centers, half)
            finally:
                twl._SAT_NATIVE = saved
        assert (a == b).all()


def test_sublane_sort8_helpers():
    """The page-sort binning primitives (round 4): per-column sort-8 is
    a real sort, idx is a permutation, and _apply/_undo round-trip."""
    from csgrenderer_tpu.kernels import tri_worklist as twl

    rng = np.random.default_rng(7)
    # keys with heavy duplication (page ids repeat across lanes)
    key = rng.integers(0, 5, (8, 128)).astype(np.float32)
    payloads = [rng.normal(0, 1, (8, 128)).astype(np.float32)
                for _ in range(3)]
    ks, ps, idx = jax.jit(
        lambda k, p: twl._sublane_sort8(k, p)
    )(jnp.asarray(key), [jnp.asarray(p) for p in payloads])
    ks, idx = np.asarray(ks), np.asarray(idx)
    # sorted ascending per column
    assert (np.diff(ks, axis=0) >= 0).all()
    # idx is a permutation of 0..7 per column
    assert (np.sort(idx, axis=0) == np.arange(8)[:, None]).all()
    # sorted key == gather(key, idx); payloads gathered consistently
    cols = np.arange(128)[None, :]
    assert (ks == key[idx, cols]).all()
    for p_in, p_out in zip(payloads, ps):
        assert (np.asarray(p_out) == p_in[idx, cols]).all()
    # undo(apply(x)) == x for arbitrary planes
    x = rng.normal(0, 1, (8, 128)).astype(np.float32)
    fwd = twl._apply_row_perm(jnp.asarray(idx), [jnp.asarray(x)])
    back = twl._undo_row_perm(jnp.asarray(idx), fwd)
    assert (np.asarray(back[0]) == x).all()


@pytest.mark.parametrize("knob,vals", [
    ("CSGR_STREAM_SORT", ("0", "1")),
])
def test_stream_sort_knob_bit_identity(monkeypatch, knob, vals):
    """The sublane page-sort (measured and rejected for speed, kept as a
    census knob) must stay BIT-IDENTICAL to the default path: the
    service is lane-independent and the sort only permutes its
    inputs/outputs. Hardware twin: tools/check_sort_identity.py."""
    mesh = demo_mesh(2)
    cam = Camera.look_at(
        (0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
        vfov_degrees=45.0, aspect_ratio=64 / 36,
    )
    outs = []
    for v in vals:
        monkeypatch.setenv(knob, v)
        # the knob is read at TRACE time and is not part of the jit key
        # (grid_static is unchanged) — clear the trace cache or the
        # second variant silently reuses the first kernel
        jax.clear_caches()
        img, rays = render_image_mesh_pallas(
            mesh, cam, 64, 36, spp=2, max_bounces=4, seed=7,
            interpret=True, worklist="stream", gather_pages=2,
        )
        outs.append((np.asarray(img), int(rays)))
    assert outs[0][1] == outs[1][1]
    assert (outs[0][0] == outs[1][0]).all()


@pytest.mark.parametrize("hbm", [False, True])
def test_stream_narrow_pages_bit_identity(monkeypatch, hbm):
    """Narrow logical pages (CSGR_STREAM_PW, round 5) repack the chunk
    table page-w chunks per slab and serve a STATIC lane slice — each
    lane's chunk chain is walked in the same order at any width, so
    images must be BIT-IDENTICAL to the 128-wide default, on both the
    VMEM-resident and HBM-DMA table paths."""
    from csgrenderer_tpu.kernels import tri_worklist as twl

    if hbm:
        monkeypatch.setattr(twl, "_STREAM_TABLE_BYTES", 1)
    mesh = demo_mesh(2)
    cam = Camera.look_at(
        (0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
        vfov_degrees=45.0, aspect_ratio=64 / 36,
    )
    outs = []
    for pw in ("128", "32", "8"):
        monkeypatch.setenv("CSGR_STREAM_PW", pw)
        twl._PACK_CACHE.clear()
        img, rays = render_image_mesh_pallas(
            mesh, cam, 64, 36, spp=2, max_bounces=4, seed=7,
            interpret=True, worklist="stream", gather_pages=2,
        )
        outs.append((np.asarray(img), int(rays)))
    twl._PACK_CACHE.clear()
    for img, rays in outs[1:]:
        assert rays == outs[0][1]
        assert (img == outs[0][0]).all()


def test_stream_page_width_auto_policy(monkeypatch):
    """With CSGR_STREAM_PW unset the packer prefers pw=64 (measured:
    15k 12.3 -> 14.4 Mrays/s) when the table fits VMEM, falls back to
    128 when the 2x table would bust the budget, and keeps 128 for
    HBM-resident tables (the DMA slab is physically 128 lanes wide)."""
    from csgrenderer_tpu.kernels import tri_worklist as twl

    monkeypatch.delenv("CSGR_STREAM_PW", raising=False)
    mesh = demo_mesh(3)
    twl._PACK_CACHE.clear()
    pack, _, _ = pack_tri_grid(mesh, stream=True, gather_pages=2)
    assert pack.static.page_w == 64
    bytes64 = sum(t.size * 2 for t in pack.tables)
    # budget below the pw=64 table but above the pw=128 one -> fallback
    twl._PACK_CACHE.clear()
    monkeypatch.setattr(twl, "_STREAM_TABLE_BYTES", bytes64 - 1)
    pack128, _, _ = pack_tri_grid(mesh, stream=True, gather_pages=2)
    assert pack128.static.page_w == 128
    assert pack128.static.hbm_table == 0
    # budget below both -> HBM residency at pw=128
    twl._PACK_CACHE.clear()
    monkeypatch.setattr(twl, "_STREAM_TABLE_BYTES", 1)
    packh, _, _ = pack_tri_grid(mesh, stream=True, gather_pages=2)
    assert packh.static.hbm_table == 1
    assert packh.static.page_w == 128
    twl._PACK_CACHE.clear()


def test_stream_dma_serve_bit_identity(monkeypatch):
    """CSGR_STREAM_SERVE=dma (round 5) stages the VMEM-resident chunk
    table through the phase-B DMA path (block vote + scratch slabs +
    static-offset dots). Same pages served in the same order per lane,
    so images must be BIT-IDENTICAL to the inline-slice default."""
    from csgrenderer_tpu.kernels import tri_worklist as twl

    mesh = demo_mesh(2)
    cam = Camera.look_at(
        (0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
        vfov_degrees=45.0, aspect_ratio=64 / 36,
    )
    outs = []
    for mode in ("", "dma"):
        monkeypatch.setenv("CSGR_STREAM_SERVE", mode)
        twl._PACK_CACHE.clear()
        jax.clear_caches()  # trace-time knob, same grid_static
        img, rays = render_image_mesh_pallas(
            mesh, cam, 64, 36, spp=2, max_bounces=4, seed=7,
            interpret=True, worklist="stream", gather_pages=2,
        )
        outs.append((np.asarray(img), int(rays)))
    twl._PACK_CACHE.clear()
    assert outs[0][1] == outs[1][1]
    assert (outs[0][0] == outs[1][0]).all()


@pytest.mark.parametrize("hbm", [False, True])
def test_stream_acc_dots_bit_identity(monkeypatch, hbm):
    """CSGR_STREAM_ACC=1 (round 5) serves each voted page with its own
    [rr,pw]@[pw,128] dot and sums the k results instead of one wide
    concat dot. A lane's one-hot is nonzero in at most one page, so the
    foreign dots add exact f32 zeros — images must be BIT-IDENTICAL on
    both the VMEM and HBM table paths."""
    from csgrenderer_tpu.kernels import tri_worklist as twl

    if hbm:
        monkeypatch.setattr(twl, "_STREAM_TABLE_BYTES", 1)
    mesh = demo_mesh(2)
    cam = Camera.look_at(
        (0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
        vfov_degrees=45.0, aspect_ratio=64 / 36,
    )
    outs = []
    for v in ("0", "1"):
        monkeypatch.setenv("CSGR_STREAM_ACC", v)
        twl._PACK_CACHE.clear()
        jax.clear_caches()  # trace-time knob, same grid_static
        img, rays = render_image_mesh_pallas(
            mesh, cam, 64, 36, spp=2, max_bounces=4, seed=7,
            interpret=True, worklist="stream", gather_pages=2,
        )
        outs.append((np.asarray(img), int(rays)))
    twl._PACK_CACHE.clear()
    assert outs[0][1] == outs[1][1]
    assert (outs[0][0] == outs[1][0]).all()


def test_hbm_vote_modes_bit_identity(monkeypatch):
    """HBM per-group block voting (the round-4 default, 245k 1.0 -> 1.2
    Mrays/s) serves pages in a different ORDER than tile-global voting
    but must deliver identical face data — bit-identical images."""
    from csgrenderer_tpu.kernels import tri_worklist as twl

    monkeypatch.setattr(twl, "_STREAM_TABLE_BYTES", 1)
    twl._PACK_CACHE.clear()
    mesh = demo_mesh(2)
    cam = Camera.look_at(
        (0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
        vfov_degrees=45.0, aspect_ratio=64 / 36,
    )
    outs = []
    for mode in ("global", "block"):
        monkeypatch.setenv("CSGR_HBM_VOTE", mode)
        jax.clear_caches()  # trace-time knob, same grid_static
        img, rays = render_image_mesh_pallas(
            mesh, cam, 64, 36, spp=2, max_bounces=4, seed=7,
            interpret=True, worklist="stream", gather_pages=2,
        )
        outs.append((np.asarray(img), int(rays)))
    twl._PACK_CACHE.clear()
    assert outs[0][1] == outs[1][1]
    assert (outs[0][0] == outs[1][0]).all()
