"""Pallas TPU kernel for CSG tapes — the north-star component.

Evaluates a CompiledTape (scene/tape.py) branch-free inside a fused
path-tracing kernel: per 1024-ray tile, each postfix instruction manipulates
a fixed-K interval list held as K pairs of [8,128] planes, so the whole CSG
stack machine is straight-line VPU code (BASELINE.json: "the CSG scene ...
compiles from the host-side scene graph into a flattened postfix instruction
tape evaluated branch-free per ray in a Pallas kernel").

Two evaluation algorithms share the leaf-interval math (which mirrors
render/intersect.py exactly):

- **Event-flip evaluation (production, round 2b).** The nearest CSG
  surface is the smallest leaf-boundary t where the root's boolean
  membership flips; membership immediately below/above a boundary is
  exact comparison algebra on the raw leaf intervals, folded through the
  postfix tape as one min/max per combine (int32 0/1 planes). O(L^2)
  plane-ops, NO interval capacity (never truncates regardless of tape.k),
  no epsilon probing; measured 226 -> 371 Mrays/s on the depth-8 config5
  tape. The ``entering`` flag (did membership go false->true?) is the
  solid-level front-face used by dielectrics — correct on subtracted
  surfaces where a dot-product test is not.
- **Interval-list evaluation (audit mode, ``with_overflow=True``)** — the
  value-twin of the jnp reference (render/interval.py, tape_eval.py):
  generalized Batcher odd-even merge of the operands' presorted endpoint
  streams, midpoint insideness, running-rank compaction into
  min(ka + kb, K) slots, plus the dropped-span counter that audits the
  K-capacity cliff the event path does not have.

Surface attribution is shared: every leaf scores |distance to its
surface| at the hit point and a running argmin keeps the owner's normal
and material.

The sample/bounce machinery (wavefront regeneration, PCG4D RNG, material
dispatch) is shared with the sphere megakernel via kernels/common.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera.pinhole import Camera
from ..scene.graph import NodeType
from ..scene.tape import OP_DIFF, OP_INTERSECT, OP_PUSH, OP_UNION, CompiledTape
from .common import (
    META_SIZE,
    TILE,
    TILE_LANES,
    TILE_ROWS,
    bsdf_mis_scale_table_planes,
    camera_ray_planes,
    classic_wavefront,
    dot3,
    nee_planes,
    pcg4d_planes,
    scatter_pdf_lam_planes,
    scatter_pdf_metal_planes,
    shade_and_advance,
)

T_FAR = np.float32(1e9)
_CUT = np.float32(5e8)

_TAPE_PREP_CACHE: dict = {}
_PARTITION_CACHE: dict = {}

# leaf table layout (f32 [L, 16] in SMEM):
#   0-3 leaf_rot (world->local quat wxyz), 4-6 leaf_pos, 7-10 params,
#   11 kind, 12 mat_param, 13-15 albedo
LEAF_ROW = 16


def _rotate_scal(qw, qx, qy, qz, vx, vy, vz):
    """Rotate plane-vector v by scalar quaternion q (v + 2 cross-form)."""
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    return (
        vx + qw * tx + (qy * tz - qz * ty),
        vy + qw * ty + (qz * tx - qx * tz),
        vz + qw * tz + (qx * ty - qy * tx),
    )


def _leaf_interval(ltype, c, o, d):
    """(enter, exit) planes for one leaf; empty encoded as enter > exit.

    ``c`` = list of 16 SMEM scalars for the leaf; o/d = world-ray planes.
    Semantics identical to render/intersect.py interval functions.
    """
    qw, qx, qy, qz = c[0], c[1], c[2], c[3]
    ox = o[0] - c[4]
    oy = o[1] - c[5]
    oz = o[2] - c[6]
    lox, loy, loz = _rotate_scal(qw, qx, qy, qz, ox, oy, oz)
    ldx, ldy, ldz = _rotate_scal(qw, qx, qy, qz, d[0], d[1], d[2])
    p0, p1, p2 = c[7], c[8], c[9]
    far = jnp.full_like(lox, T_FAR)
    neg = -far

    if ltype == NodeType.SPHERE:
        a = dot3(ldx, ldy, ldz, ldx, ldy, ldz)
        hb = dot3(lox, loy, loz, ldx, ldy, ldz)
        cc = dot3(lox, loy, loz, lox, loy, loz) - p0 * p0
        disc = hb * hb - a * cc
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_a = 1.0 / a
        return (
            jnp.where(ok, (-hb - sq) * inv_a, far),
            jnp.where(ok, (-hb + sq) * inv_a, neg),
        )
    if ltype == NodeType.INFINITE_PLANAR_PARTITION:
        dn = dot3(ldx, ldy, ldz, p0, p1, p2)
        on = dot3(lox, loy, loz, p0, p1, p2)
        t0 = -on / dn
        entering = dn < 0.0
        parallel = dn == 0.0
        inside = parallel & (on <= 0.0)
        enter = jnp.where(entering, t0, neg)
        exit_ = jnp.where(entering, far, t0)
        enter = jnp.where(parallel, jnp.where(inside, neg, far), enter)
        exit_ = jnp.where(parallel, jnp.where(inside, far, neg), exit_)
        return enter, exit_
    if ltype == NodeType.BOX:
        enter, exit_ = None, None
        for lo_, ld_, he in ((lox, ldx, p0), (loy, ldy, p1), (loz, ldz, p2)):
            safe = jnp.where(ld_ == 0.0, jnp.float32(1.0), ld_)
            inv = 1.0 / safe
            ta = (-he - lo_) * inv
            tb = (he - lo_) * inv
            t_lo = jnp.minimum(ta, tb)
            t_hi = jnp.maximum(ta, tb)
            in_slab = jnp.abs(lo_) <= he
            t_lo = jnp.where(ld_ == 0.0, jnp.where(in_slab, neg, far), t_lo)
            t_hi = jnp.where(ld_ == 0.0, jnp.where(in_slab, far, neg), t_hi)
            enter = t_lo if enter is None else jnp.maximum(enter, t_lo)
            exit_ = t_hi if exit_ is None else jnp.minimum(exit_, t_hi)
        return enter, exit_
    if ltype == NodeType.CYLINDER:
        a = ldx * ldx + ldz * ldz
        hb = lox * ldx + loz * ldz
        cc = lox * lox + loz * loz - p0 * p0
        disc = hb * hb - a * cc
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        degen = a == 0.0
        inv_a = 1.0 / jnp.where(degen, jnp.float32(1.0), a)
        s_enter = jnp.where(ok, (-hb - sq) * inv_a, far)
        s_exit = jnp.where(ok, (-hb + sq) * inv_a, neg)
        in_tube = cc <= 0.0
        s_enter = jnp.where(degen, jnp.where(in_tube, neg, far), s_enter)
        s_exit = jnp.where(degen, jnp.where(in_tube, far, neg), s_exit)
        safe = jnp.where(ldy == 0.0, jnp.float32(1.0), ldy)
        ta = (-p1 - loy) / safe
        tb = (p1 - loy) / safe
        c_lo = jnp.minimum(ta, tb)
        c_hi = jnp.maximum(ta, tb)
        in_y = jnp.abs(loy) <= p1
        c_lo = jnp.where(ldy == 0.0, jnp.where(in_y, neg, far), c_lo)
        c_hi = jnp.where(ldy == 0.0, jnp.where(in_y, far, neg), c_hi)
        return jnp.maximum(s_enter, c_lo), jnp.minimum(s_exit, c_hi)
    raise ValueError(f"bad leaf type {ltype}")  # pragma: no cover


def _single_to_list(enter, exit_, far_plane):
    enter_c = jnp.clip(enter, 0.0, T_FAR)
    exit_c = jnp.clip(exit_, 0.0, T_FAR)
    valid = enter_c < exit_c
    t_in = [jnp.where(valid, enter_c, far_plane)]
    t_out = [jnp.where(valid, exit_c, far_plane)]
    return t_in, t_out


def _merge_sorted_planes(a, b):
    """Batcher odd-even merge of two SORTED plane lists (per-lane),
    generalized to ARBITRARY (unequal, non-power-of-two) lengths.

    The inputs are presorted because a disjoint interval list's interleaved
    endpoints (in0 <= out0 <= in1 <= ...) are already ordered; the
    generalized network lets interval lists carry their exact per-node
    width (see tape_hit) instead of padding every operand to the tape cap.
    Validated against sorted() for all length combos 0..8 (fuzz in
    tests/test_tape_kernel.py).
    """
    a, b = list(a), list(b)
    if not a:
        return b
    if not b:
        return a
    if len(a) == 1 and len(b) == 1:
        return [jnp.minimum(a[0], b[0]), jnp.maximum(a[0], b[0])]
    even = _merge_sorted_planes(a[0::2], b[0::2])
    odd = _merge_sorted_planes(a[1::2], b[1::2])
    out = [even[0]]
    i = 0
    while i < len(odd) and i + 1 < len(even):
        out.append(jnp.minimum(odd[i], even[i + 1]))
        out.append(jnp.maximum(odd[i], even[i + 1]))
        i += 1
    out += odd[i:] + even[i + 1:]
    return out


def _combine(a, b, op, k_out, zero_plane, far_plane, count_dropped):
    """Boolean-combine two interval lists (lists of planes) into k_out
    slots. Operand widths are their actual list lengths — per-node exact
    widths min(ka + kb, cap) make deep-tape evaluation ~2x cheaper than
    all-cap lists with identical results (a combine cannot produce more
    spans than ka + kb)."""
    a_in, a_out = a
    b_in, b_out = b
    ka, kb = len(a_in), len(b_in)
    # interleaved endpoints of a sorted disjoint list are themselves sorted,
    # and the zero plane precedes everything (lists are clipped to [0, FAR])
    a_ev = [p for pair in zip(a_in, a_out) for p in pair]
    b_ev = [p for pair in zip(b_in, b_out) for p in pair]
    events = [zero_plane] + _merge_sorted_planes(a_ev, b_ev)
    n = len(events)  # 2(ka + kb) + 1

    def inside(l_in, l_out, m):
        acc = None
        for kk in range(len(l_in)):
            term = (l_in[kk] <= m) & (m < l_out[kk])
            acc = term if acc is None else (acc | term)
        return acc

    res = []
    for j in range(n):
        m = (
            0.5 * (events[j] + events[j + 1])
            if j < n - 1
            else events[j] + 1.0
        )
        ia = inside(a_in, a_out, m)
        ib = inside(b_in, b_out, m)
        if op == OP_UNION:
            res.append(ia | ib)
        elif op == OP_INTERSECT:
            res.append(ia & ib)
        else:  # OP_DIFF
            res.append(ia & ~ib)

    false_plane = zero_plane > 1.0  # all-False bool plane
    prev = [false_plane] + res[:-1]
    starts = [res[j] & ~prev[j] for j in range(n)]
    ends = [~res[j] & prev[j] for j in range(n)]

    # silent-truncation detector: result spans beyond the k_out slots are
    # dropped by the compaction; count them (real surfaces only). Only a
    # CAPPED node (ka + kb > k_out) can drop — uncapped nodes skip the
    # counting entirely. Compile-time optional (with_overflow=True): the
    # benchmark configs are PROVEN non-overflowing by
    # tests/test_interval_overflow.py.
    if count_dropped and ka + kb > k_out:
        n_spans = None
        for j in range(n):
            real = (starts[j] & (events[j] < _CUT)).astype(jnp.int32)
            n_spans = real if n_spans is None else n_spans + real
        dropped = jnp.maximum(n_spans - k_out, 0)
    else:
        dropped = None

    def compact(flags):
        out = []
        rank = None
        ranks = []
        for j in range(n):
            f = flags[j].astype(jnp.int32)
            rank = f if rank is None else rank + f
            ranks.append(rank)  # rank AFTER including j: slot = rank-1
        total = ranks[n - 1]
        for kk in range(k_out):
            val = None
            for j in range(n):
                pick = flags[j] & (ranks[j] == kk + 1)
                contrib = jnp.where(pick, events[j], 0.0)
                val = contrib if val is None else val + contrib
            # the (kk+1)-th flagged event exists iff the total count
            # reaches it — no second event loop needed
            out.append(jnp.where(total >= kk + 1, val, far_plane))
        return out

    return compact(starts), compact(ends), dropped


def _pack_program(tape: CompiledTape):
    """Static program tuple (hashable) + dynamic leaf table [L, 16]."""
    if tape.k < 1:
        raise ValueError(f"interval capacity k must be >= 1, got {tape.k}")
    program = (tuple(tape.ops), tuple(tape.leaf_types), int(tape.k))
    L = tape.n_leaves
    tab = jnp.zeros((L, LEAF_ROW), jnp.float32)
    tab = tab.at[:, 0:4].set(tape.leaf_rot)
    tab = tab.at[:, 4:7].set(tape.leaf_pos)
    tab = tab.at[:, 7:11].set(tape.leaf_params)
    tab = tab.at[:, 11].set(tape.mat_kind.astype(jnp.float32))
    tab = tab.at[:, 12].set(tape.mat_param)
    tab = tab.at[:, 13:16].set(tape.albedo)
    return program, tab


def _make_kernel(program, width, height, spp, max_bounces, lens, sky, n_pix,
                 count_dropped=False, nee_lamps=(), clusters=None):
    ops, leaf_types, k = program
    n_leaves = len(leaf_types)
    inv_w = np.float32(1.0 / width)
    inv_h = np.float32(1.0 / height)
    eps = np.float32(1e-3)

    def kernel(cam_ref, meta_ref, leaf_ref,
               out_r_ref, out_g_ref, out_b_ref, rays_ref, over_ref):
        tile_idx = pl.program_id(0)
        seed = meta_ref[0, 0]
        sample_offset = meta_ref[0, 1]
        pixel_offset = meta_ref[0, 2]  # global flat-pixel offset of this slab

        cam = [cam_ref[0, i] for i in range(19)]
        (cox, coy, coz, llx, lly, llz, hx, hy, hz, vx, vy, vz,
         ux, uy, uz, vvx, vvy, vvz, lens_radius) = cam
        leaf_scal = [
            [leaf_ref[l, j] for j in range(LEAF_ROW)] for l in range(n_leaves)
        ]

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 1)
        local_pix = tile_idx * TILE + row_ids * TILE_LANES + lane_ids
        in_image = local_pix < n_pix  # n_pix = pixels in THIS slab
        # global pixel ids keep RNG/camera sharding-invariant
        pix = local_pix + pixel_offset
        px = (pix % width).astype(jnp.float32)
        py = (pix // width).astype(jnp.float32)
        pix_u = pix.astype(jnp.uint32)

        zero = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.float32)
        far_plane = jnp.full((TILE_ROWS, TILE_LANES), T_FAR, jnp.float32)

        def tape_hit_lists(o, d):
            """Interval-list evaluation (the midpoint algorithm, value-twin
            of render/tape_eval) — kept as the overflow-audit path: its
            K-slot capacity is what the dropped-span counter measures.
            Returns (t, entering, dropped)."""
            stack = []
            zero_i32 = (zero > 1.0).astype(jnp.int32)  # non-splat zeros
            dropped = zero_i32
            for opcode, operand in ops:
                if opcode == OP_PUSH:
                    enter, exit_ = _leaf_interval(
                        leaf_types[operand], leaf_scal[operand], o, d
                    )
                    stack.append(_single_to_list(enter, exit_, far_plane))
                else:
                    right = stack.pop()
                    left = stack.pop()
                    # exact per-node width: a combine cannot produce more
                    # spans than its operands carry, so narrower
                    # intermediate lists are value-identical and ~2x
                    # cheaper on deep tapes than all-cap-width lists
                    k_out = min(len(left[0]) + len(right[0]), k)
                    t_in_, t_out_, d_ = _combine(
                        left, right, opcode, k_out, zero, far_plane,
                        count_dropped,
                    )
                    if d_ is not None:
                        dropped = dropped + d_
                    stack.append((t_in_, t_out_))
            t_in, t_out = stack[0]

            t_enter = far_plane
            t_exit = far_plane
            for kk in range(len(t_in)):
                cin = (t_in[kk] > eps) & (t_in[kk] < _CUT)
                t_enter = jnp.minimum(t_enter, jnp.where(cin, t_in[kk], T_FAR))
                cout = (t_out[kk] > eps) & (t_out[kk] < _CUT)
                t_exit = jnp.minimum(t_exit, jnp.where(cout, t_out[kk], T_FAR))
            t = jnp.minimum(t_enter, t_exit)
            entering = t_enter <= t_exit
            return t, entering, dropped

        def tape_hit_events(o, d):
            """Event-flip evaluation — the production path (round 2b).

            The interval lists built by tape_hit_lists are only ever
            reduced to the nearest boundary and its orientation, so the
            merge networks + midpoint insideness + rank compaction are
            wasted generality. Instead: the nearest CSG surface is the
            smallest LEAF BOUNDARY t where the root's boolean membership
            flips, and membership immediately below/above a boundary t is
            exact comparison algebra on the raw leaf intervals —
              below_i = (enter_i <  t) & (exit_i >= t)
              above_i = (enter_i <= t) & (exit_i >  t)
            — folded through the tape as one |/&/&~ per combine. O(L^2)
            plane-ops versus the lists' ~O(L^3) on chain tapes, NO K
            capacity (never truncates, regardless of tape.k), no epsilon
            probing (ties/coincident boundaries evaluate identically for
            every event at the same t). Value-identical to the list path
            away from capacity overflow: the candidate event values are
            the very floats the merge network would have routed into the
            lists. Returns (t, entering, dropped=0).

            ``clusters`` (round 3, scene/partition.py): when the root is
            a union of spatially-disjoint operand groups, each group's
            flips are evaluated against ITS OWN sub-ops and leaves only
            and the results min-combine — O(sum L_c^2) flip work instead
            of O(L^2), exact under disjoint bounds (a boundary of one
            cluster cannot lie inside another)."""
            l_enter, l_exit = [], []
            for l in range(n_leaves):
                e, x = _leaf_interval(leaf_types[l], leaf_scal[l], o, d)
                l_enter.append(e)
                l_exit.append(x)

            def events_for(sub_ops, sub_leaves, t, entering_i):
                def tree(mem):
                    # int32 0/1 algebra: Mosaic cannot lower i1 vector
                    # xor or != ("Unsupported target bitwidth for
                    # truncation"), so memberships travel as int32 and
                    # the flip test is sum==1
                    stack = []
                    for opcode, operand in sub_ops:
                        if opcode == OP_PUSH:
                            stack.append(mem[operand])
                        elif opcode == OP_UNION:
                            right = stack.pop()
                            stack.append(jnp.maximum(stack.pop(), right))
                        elif opcode == OP_INTERSECT:
                            right = stack.pop()
                            stack.append(jnp.minimum(stack.pop(), right))
                        else:  # OP_DIFF
                            right = stack.pop()
                            stack.append(jnp.minimum(stack.pop(), 1 - right))
                    return stack[0]

                for l in sub_leaves:
                    for tj in (l_enter[l], l_exit[l]):
                        below = {
                            i: ((l_enter[i] < tj) & (l_exit[i] >= tj))
                            .astype(jnp.int32)
                            for i in sub_leaves
                        }
                        above = {
                            i: ((l_enter[i] <= tj) & (l_exit[i] > tj))
                            .astype(jnp.int32)
                            for i in sub_leaves
                        }
                        ma = tree(above)
                        flip = (
                            (tree(below) + ma == 1)
                            & (tj > eps) & (tj < _CUT)
                        )
                        cand = jnp.where(flip, tj, T_FAR)
                        better = cand < t
                        t = jnp.where(better, cand, t)
                        entering_i = jnp.where(better, ma, entering_i)
                return t, entering_i

            t = far_plane
            entering_i = (zero > 1.0).astype(jnp.int32)  # non-splat zeros
            if clusters is None:
                t, entering_i = events_for(
                    ops, tuple(range(n_leaves)), t, entering_i
                )
            else:
                for c_ops, c_leaves in clusters:
                    t, entering_i = events_for(c_ops, c_leaves, t,
                                               entering_i)
            zero_i32 = (zero > 1.0).astype(jnp.int32)
            return t, entering_i > 0, zero_i32

        def tape_hit(o, d):
            """(t, hit, entering, n_shade, kind, param, alb, dropped)."""
            if count_dropped:
                t, entering, dropped = tape_hit_lists(o, d)
            else:
                t, entering, dropped = tape_hit_events(o, d)
            hit = t < _CUT

            # surface attribution: nearest leaf surface at the hit point
            t_safe = jnp.where(hit, t, 1.0)
            hpx = o[0] + t_safe * d[0]
            hpy = o[1] + t_safe * d[1]
            hpz = o[2] + t_safe * d[2]
            best = None
            for l in range(n_leaves):
                c = leaf_scal[l]
                qw, qx, qy, qz = c[0], c[1], c[2], c[3]
                rx, ry, rz = hpx - c[4], hpy - c[5], hpz - c[6]
                lx, ly, lz = _rotate_scal(qw, qx, qy, qz, rx, ry, rz)
                p0, p1, p2 = c[7], c[8], c[9]
                lt = leaf_types[l]
                if lt == NodeType.SPHERE:
                    rad = jnp.sqrt(dot3(lx, ly, lz, lx, ly, lz))
                    score = jnp.abs(rad - p0)
                    inv = 1.0 / jnp.maximum(rad, jnp.float32(1e-12))
                    nlx, nly, nlz = lx * inv, ly * inv, lz * inv
                elif lt == NodeType.INFINITE_PLANAR_PARTITION:
                    score = jnp.abs(dot3(lx, ly, lz, p0, p1, p2))
                    nlx = jnp.full_like(lx, 0.0) + p0
                    nly = jnp.full_like(ly, 0.0) + p1
                    nlz = jnp.full_like(lz, 0.0) + p2
                elif lt == NodeType.BOX:
                    gx = p0 - jnp.abs(lx)
                    gy = p1 - jnp.abs(ly)
                    gz = p2 - jnp.abs(lz)
                    # exact |SDF| to the finite surface (matches tape_eval):
                    # overshoot q = -gap; outside/inside terms are exclusive
                    mx = jnp.maximum(-gx, 0.0)
                    my = jnp.maximum(-gy, 0.0)
                    mz = jnp.maximum(-gz, 0.0)
                    outside = jnp.sqrt(mx * mx + my * my + mz * mz)
                    inside = jnp.minimum(
                        jnp.maximum(-gx, jnp.maximum(-gy, -gz)), 0.0
                    )
                    score = outside - inside
                    # outward normal: axis with the smallest gap
                    is_x = (jnp.abs(gx) <= jnp.abs(gy)) & (jnp.abs(gx) <= jnp.abs(gz))
                    is_y = ~is_x & (jnp.abs(gy) <= jnp.abs(gz))
                    sx = jnp.where(lx >= 0.0, 1.0, -1.0)
                    sy = jnp.where(ly >= 0.0, 1.0, -1.0)
                    sz = jnp.where(lz >= 0.0, 1.0, -1.0)
                    nlx = jnp.where(is_x, sx, 0.0)
                    nly = jnp.where(is_y, sy, 0.0)
                    nlz = jnp.where(is_x | is_y, 0.0, sz)
                elif lt == NodeType.CYLINDER:
                    srad = jnp.sqrt(lx * lx + lz * lz)
                    side = jnp.abs(srad - p0)
                    cap = jnp.abs(jnp.abs(ly) - p1)
                    # exact |SDF| in (radial, axial) coords (matches
                    # tape_eval). NB: sq* names — qx/qy/qz above are the
                    # leaf quaternion and must not be shadowed.
                    sqr = srad - p0
                    sqy = jnp.abs(ly) - p1
                    mr = jnp.maximum(sqr, 0.0)
                    mh = jnp.maximum(sqy, 0.0)
                    outside = jnp.sqrt(mr * mr + mh * mh)
                    inside = jnp.minimum(jnp.maximum(sqr, sqy), 0.0)
                    score = outside - inside
                    inv = 1.0 / jnp.maximum(srad, jnp.float32(1e-12))
                    use_side = side < cap
                    nlx = jnp.where(use_side, lx * inv, 0.0)
                    nly = jnp.where(use_side, 0.0, jnp.where(ly >= 0.0, 1.0, -1.0))
                    nlz = jnp.where(use_side, lz * inv, 0.0)
                else:  # pragma: no cover
                    raise ValueError(f"bad leaf type {lt}")
                # local -> world normal: rotate by conj(q)
                nwx, nwy, nwz = _rotate_scal(qw, -qx, -qy, -qz, nlx, nly, nlz)
                cand = (score, nwx, nwy, nwz, c[11], c[12], c[13], c[14], c[15])
                if best is None:
                    best = [jnp.broadcast_to(v, score.shape).astype(jnp.float32)
                            for v in cand]
                else:
                    better = cand[0] < best[0]
                    best = [
                        jnp.where(better, new, old)
                        for new, old in zip(cand, best)
                    ]
            (_, nwx, nwy, nwz, kind, param, ar, ag, ab) = best

            # face-forward the leaf normal against the ray
            flip = dot3(d[0], d[1], d[2], nwx, nwy, nwz) > 0.0
            sgn = jnp.where(flip, -1.0, 1.0)
            return (
                t, hit, entering,
                (nwx * sgn, nwy * sgn, nwz * sgn),
                kind, param, (ar, ag, ab), dropped,
            )

        def camera_rays(s_plane, px_=None, py_=None, pixu_=None):
            return camera_ray_planes(
                cam[:19],
                px if px_ is None else px_,
                py if py_ is None else py_,
                pix_u if pixu_ is None else pixu_,
                s_plane, seed, inv_w, inv_h, lens,
            )

        n_lights = len(nee_lamps)
        if n_lights:
            # lamp scalars straight from the SMEM leaf table (no separate
            # lights input): pos(4:7), radius(7), emitted radiance = albedo
            # (13:16); sphere_id = -1 (occlusion is by distance tolerance —
            # the tape has no per-surface id space)
            light_scal = [
                [
                    leaf_scal[l][4], leaf_scal[l][5], leaf_scal[l][6],
                    leaf_scal[l][7], leaf_scal[l][13], leaf_scal[l][14],
                    leaf_scal[l][15], np.float32(-1.0),
                ]
                for l in nee_lamps
            ]

            def occlusion_t(p, ld):
                """Shadow test = the event-flip evaluator along the shadow
                ray (nearest CSG surface distance, no attribution)."""
                t_occ, _, _ = tape_hit_events(p, ld)
                return t_occ

        def bounce_step(b, s, pu, o, d, thr, rad, active_i, rays, extra):
            """One bounce for the whole tile (classic_wavefront callback)."""
            over, prevpdf = extra
            active = active_i > 0
            t, hit, entering, n, kind, param, alb, dropped = tape_hit(o, d)
            emit_scale = None
            pu_cur = pix_u if pu is None else pu
            if n_lights:
                # MIS NEE, the tape realization of the megakernel's classic
                # path: direct light at lambertian vertices (shadow ray =
                # one extra event-flip evaluation), lamp emission found BY
                # a lambertian scatter carries the balance-heuristic
                # partner weight (lamp looked up from the light scalars —
                # the winner attrs carry no lamp geometry here)
                t_safe = jnp.where(hit, t, 1.0)
                hpx = o[0] + t_safe * d[0]
                hpy = o[1] + t_safe * d[1]
                hpz = o[2] + t_safe * d[2]
                w_b = bsdf_mis_scale_table_planes(
                    light_scal, n_lights, (hpx, hpy, hpz), o, prevpdf
                )
                emit_scale = jnp.where(
                    (kind == 4.0) & (prevpdf > 0.0) & (b > jnp.uint32(0)),
                    w_b, 1.0,
                )
                is_lam = kind == 1.0
                glossy = (kind == 2.0) & (param > jnp.float32(1e-4))

                def pdf_b_fn(ld, cos, d=d, n=n, param=param):
                    pdf_lam = jnp.maximum(cos, 0.0) * np.float32(1.0 / np.pi)
                    pdf_met = scatter_pdf_metal_planes(d, n, param, ld)
                    pdf_met = jnp.where(cos > 0.0, pdf_met, 0.0)
                    return jnp.where(
                        is_lam, pdf_lam, jnp.where(glossy, pdf_met, 0.0)
                    )

                dr, dg, db = nee_planes(
                    light_scal, n_lights, (hpx, hpy, hpz), n, alb,
                    occlusion_t, pu_cur, s, b, seed, pdf_b_fn=pdf_b_fn,
                )
                nee_mask = active & hit & (is_lam | glossy)
                rr, rg, rb = rad
                rr = rr + jnp.where(nee_mask, thr[0] * dr, 0.0)
                rg = rg + jnp.where(nee_mask, thr[1] * dg, 0.0)
                rb = rb + jnp.where(nee_mask, thr[2] * db, 0.0)
                rad = (rr, rg, rb)
            # ``entering`` is the solid-level front-face flag — correct on
            # subtracted surfaces where a dot-product test is not
            d_in = d  # incoming direction (pre-scatter), for the MIS pdf
            (o, d, thr, rad, term) = shade_and_advance(
                active, t, hit, n, entering, kind, param, alb,
                o, d, thr, rad, pu_cur, s, b, seed, sky,
                emit_scale=emit_scale,
            )
            rays = rays + active_i
            if count_dropped:
                over = over + jnp.where(active, dropped, 0)
            cont = active & hit & ~term
            if n_lights:
                # carried scatter pdf (the MIS pairing): cosine lobe for
                # lambertian, the metal lobe for glossy scatters
                prevpdf = jnp.where(
                    cont & is_lam,
                    scatter_pdf_lam_planes(n, d),
                    jnp.where(
                        cont & glossy,
                        scatter_pdf_metal_planes(d_in, n, param, d),
                        0.0,
                    ),
                )
            active_i = cont.astype(jnp.int32)
            return o, d, thr, rad, active_i, rays, (over, prevpdf)

        # NOTE: the rotating strided sample assignment (classic_wavefront's
        # rotate=...) was MEASURED SLOWER here (config5 167 -> 114 Mrays/s):
        # the tape evaluation runs for every lane every iteration, so CSG
        # scenes have little per-pixel load variance to average away and
        # the scatter/pixel-recompute overhead is pure cost. Sphere scenes
        # (megakernel) are the opposite case. Keep the plain loop.
        zero_i = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.int32)
        zero_f = jnp.zeros((TILE_ROWS, TILE_LANES), jnp.float32)
        # loop-boundary amortization (doc/PERF_NOTES round-4b): unroll=4
        # lifted config5 295 -> 386 Mrays/s at 16 spp, but the duplicated
        # body's live temporaries exceed the v5e 16 MB scoped-VMEM limit
        # on big tapes (99-leaf many-objects scene OOM'd by 80 KB at
        # unroll=4; unroll=2 fits and measured 45.6 -> 46.8). Small tapes
        # take 4, big ones 2; CSGR_WAVE_UNROLL overrides either way.
        # Round 5, the HEADLINE protocol (1080p/64spp): a 64-spp tile
        # runs 4x the wave steps, so the duplicated tail amortizes
        # further out — config5 measures u8 1081.6 vs u4 1031.0 vs the
        # 16-spp-tuned default 1029.8 Mrays/s; at 16 spp u8 measured
        # WORSE (396.9 vs 413.9), hence the spp tier. Off-TPU unroll
        # only multiplies XLA:CPU compile time (output is bit-identical
        # at any K), so it pays on the real target only.
        small_tape = len(leaf_scal) <= 24
        state = classic_wavefront(
            bounce_step, camera_rays, spp, max_bounces, in_image,
            sample_offset.astype(jnp.uint32), extra0=(zero_i, zero_f),
            unroll=((8 if spp >= 32 else 4) if small_tape else 2)
            if jax.default_backend() == "tpu" else 1,
        )
        out_r_ref[:] = state["rad"][0]
        out_g_ref[:] = state["rad"][1]
        out_b_ref[:] = state["rad"][2]
        rays_ref[:] = state["rays"]
        over_ref[:] = state["extra"][0]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "program", "width", "height", "spp", "max_bounces", "lens", "sky",
        "count_dropped", "nee_lamps", "clusters",
        "interpret", "rows",
    ),
)
def _render_tape_packed(
    program, leaf_tab, cam_row, width, height, spp, max_bounces,
    seed, sample_offset, lens, sky, interpret, rows, row_offset,
    count_dropped, nee_lamps=(), clusters=None,
):
    n_pix = width * rows  # this slab's pixel count (rows == height unsharded)
    n_tiles = pl.cdiv(n_pix, TILE)
    meta = jnp.zeros((1, META_SIZE), jnp.int32)
    meta = meta.at[0, 0].set(jnp.asarray(seed, jnp.int32))
    meta = meta.at[0, 1].set(jnp.asarray(sample_offset, jnp.int32))
    meta = meta.at[0, 2].set(jnp.asarray(row_offset, jnp.int32) * width)

    kernel = _make_kernel(
        program, width, height, spp, max_bounces, lens, sky, n_pix,
        count_dropped=count_dropped, nee_lamps=nee_lamps,
        clusters=clusters,
    )
    plane = jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.float32)
    plane_spec = pl.BlockSpec(
        (TILE_ROWS, TILE_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    iplane = jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, TILE_LANES), jnp.int32)
    r, g, b, rays, over = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # leaf table
        ],
        out_specs=(plane_spec, plane_spec, plane_spec, plane_spec, plane_spec),
        out_shape=(plane, plane, plane, iplane, iplane),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cam_row, meta, leaf_tab)

    flat = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    image = flat[:n_pix].reshape(rows, width, 3) / spp
    return image, jnp.sum(rays), jnp.sum(over)


def render_image_tape_pallas(
    tape: CompiledTape,
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
    with_overflow: bool = False,
    nee: bool = False,
    partition: bool | str = "auto",
):
    """Drop-in for ``integrator.render_image`` on a CompiledTape scene.

    ``rows``/``row_offset`` render a full-width horizontal slab (see
    megakernel.render_image_pallas). ``with_overflow=True`` additionally
    returns the total count of CSG interval spans silently truncated by the
    K-slot capacity over all traced segments (0 == every evaluation was
    exact; the interval-capacity correctness cliff is detected, not silent).

    ``nee=True`` enables MIS next-event estimation toward the tape's
    emissive SPHERE leaves (render/lights.extract_tape_lights): the shadow
    test is one extra event-flip evaluation per lambertian vertex, and
    lamp scalars are read from the leaf table itself — so animated lamps
    (``with_edges``) stay correct with no re-extraction.

    ``partition``: "auto" decomposes a root that unions spatially-disjoint
    solid groups into per-cluster event evaluation (scene/partition.py) —
    O(sum L_c^2) flip work instead of O(L^2), exact under disjoint bounds
    (single-cluster scenes like config5 are untouched). False forces the
    global evaluation. A TUPLE is a precomputed cluster tuple (exactly
    ``partition_tape``'s return value) used as-is — the animated path
    (app/renderers.py) re-clusters per frame on a host-side CPU twin of
    the tape and passes the result here; an equal tuple is the same
    static program (jit cache hit), a changed one recompiles once.
    An empty tuple means "reclustering ran and found nothing to split"
    (global evaluation).
    """
    if not jitter:
        raise NotImplementedError("tape kernel always jitters")
    from .common import device_cache
    from .megakernel import _CAM_CACHE, pack_camera

    nee_lamps = ()
    if nee:
        from ..render.lights import extract_tape_lights

        got = extract_tape_lights(tape, return_ids=True)
        lights, lamp_ids = got if got is not None else (None, None)
        if lights is None:
            raise ValueError(
                "nee=True but the tape has no emissive sphere leaves"
            )
        nee_lamps = tuple(int(i) for i in lamp_ids)
    # leaf-table upload cached for static tapes; animated tapes
    # (with_edges -> fresh leaf_rot/leaf_pos arrays) miss by id
    program, leaf_tab = device_cache(
        _TAPE_PREP_CACHE,
        (id(tape.leaf_rot), id(tape.leaf_pos), id(tape.leaf_params),
         id(tape.mat_kind)),
        tape.leaf_rot,
        lambda: _pack_program(tape),
    )
    cam_row = device_cache(
        _CAM_CACHE, id(camera.origin), camera.origin,
        lambda: pack_camera(camera),
    )
    clusters = None
    if isinstance(partition, tuple):
        clusters = partition if partition else None
    elif partition in (True, "auto"):
        from ..scene.partition import partition_tape

        clusters = device_cache(
            _PARTITION_CACHE,
            (id(tape.leaf_pos), id(tape.leaf_params), tape.ops),
            tape.leaf_pos,
            lambda: partition_tape(tape),
        )
        if partition is True and clusters is None:
            raise ValueError(
                "partition=True but the tape has no disjoint union "
                "operands to cluster"
            )
    image, rays, over = _render_tape_packed(
        program, leaf_tab, cam_row, width, height, spp, max_bounces,
        jnp.asarray(seed, jnp.int32), jnp.asarray(sample_offset, jnp.int32),
        lens, sky, interpret,
        height if rows is None else rows,
        jnp.asarray(row_offset, jnp.int32),
        with_overflow, nee_lamps, clusters,
    )
    if with_overflow:
        return image, rays, over
    return image, rays
