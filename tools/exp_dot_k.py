"""Micro-experiment: narrow-page serve cost — MAC scaling vs fixed cost.

The round-5 narrow-page stream serve replaces the per-group wide dot
[rr, k*128] @ [k*128, 128] with [rr, k*pw] @ [k*pw, 128] (pw = logical
page width; each slab narrowed by a STATIC lane slice). The census
(tools/census_stream_pw.py) shows demand locality keeps trips flat as
pages narrow, so the win is real iff the MXU dot's cost actually scales
with the contraction dim K = k*pw at these shapes (the repo's paged
dense-map lookup proves K=16 dots are Mosaic-legal; this measures their
COST, including the k slab slices + concat + one-hot builds).

Reports ns per serve (slice+concat+onehot+dot) for (rr, pw, k) combos
via slope timing (the ~48 ms dispatch floor swamps single calls).

Run: python tools/exp_dot_k.py            (on the TPU)
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N_PAGES = 32
N_ITER = 2000


def kernel(tab_ref, idx_ref, out_ref, rr_pad: int, pw: int, k: int,
           n_iter: int, variant: str):
    idx0 = idx_ref[:]  # [8, 128] i32

    # variant="hoist_onehot": build the one-hot ONCE outside the loop
    # (isolates the per-serve one-hot build cost)
    hoisted = None
    if variant == "hoist_onehot":
        locs = [
            (jax.lax.broadcasted_iota(jnp.int32, (pw, 128), 0)
             == (idx0[0:1] * 0 + j)).astype(jnp.bfloat16)
            for j in range(k)
        ]
        hoisted = locs[0] if k == 1 else jnp.concatenate(locs, axis=0)

    def body(i, acc):
        if variant == "vote":
            # ADD the block-form vote (k row-wise min-reductions +
            # selects over [8,128], as in tri_worklist's block mode) to
            # the base body — the slope DELTA vs "base" prices the vote
            pg = (idx0.astype(jnp.float32)
                  + jnp.broadcast_to(acc[0:1, 0:1] * 0.0, (8, 128)))
            rem = pg
            extra = None
            for _ in range(k):
                p_j = jnp.min(rem, axis=1, keepdims=True)  # [8,1]
                sel = pg == p_j
                rem = jnp.where(sel, np.float32(1e9), rem)
                loc = jnp.where(sel, pg - p_j, np.float32(-1.0))
                extra = loc if extra is None else extra + loc
            acc = acc + extra[0:1] * np.float32(1e-20)
        # k dynamic sublane-dim slab slices at data-dependent pages
        # (carry-scalar reads, like the real service), each narrowed to
        # [rr_pad, pw], concatenated, one wide dot per "group"
        slabs = []
        locs = []
        for j in range(k):
            p = jax.lax.rem(
                (acc[0, 0] * 0.0).astype(jnp.int32) + i * k + j, N_PAGES
            )
            if variant == "static_slab":
                # compile-time page index (isolates the dynamic-slice
                # relayout cost)
                s = tab_ref[(j % N_PAGES) * rr_pad:
                            (j % N_PAGES) * rr_pad + rr_pad, :]
            else:
                s = tab_ref[pl.ds(p * rr_pad, rr_pad), :]
            slabs.append(s if pw == 128 else s[:, :pw])
            if variant != "hoist_onehot":
                locs.append(
                    (jax.lax.broadcasted_iota(jnp.int32, (pw, 128), 0)
                     == (idx0[0:1] * 0 + j)).astype(s.dtype)
                )
        if variant == "kdots":
            # k accumulating K=pw dots — no lane-dim concat copy
            got = None
            for j in range(k):
                g = jax.lax.dot_general(
                    slabs[j], locs[j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                got = g if got is None else got + g
        else:
            slab_cat = (slabs[0] if k == 1
                        else jnp.concatenate(slabs, axis=1))
            onehot = hoisted if hoisted is not None else (
                locs[0] if k == 1 else jnp.concatenate(locs, axis=0))
            got = jax.lax.dot_general(
                slab_cat, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc + jnp.sum(got, axis=0, keepdims=True)

    r = jax.lax.fori_loop(
        0, n_iter, body, idx0[0:1].astype(jnp.float32) * 0.0
    )
    out_ref[:] = jnp.broadcast_to(r, (8, 128))


@functools.partial(
    jax.jit, static_argnames=("rr_pad", "pw", "k", "n_iter", "variant"))
def run(tab, idx, rr_pad, pw, k, n_iter, variant="base"):
    return pl.pallas_call(
        functools.partial(kernel, rr_pad=rr_pad, pw=pw, k=k,
                          n_iter=n_iter, variant=variant),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(tab, idx)


def main():
    import ml_dtypes

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N_PAGES, (8, 128)).astype(np.int32))
    combos = [
        # (rr_pad, pw, k, variant): rr 248 = q13, 120 = q6, 64 = q3
        # Round-5 finding #1: cost is k-dominated (slice+concat+onehot
        # fixed cost per slab), NOT MAC-dominated — pw=64/k=8 (359 ns)
        # and pw=32/k=16 (599 ns) LOSE to pw=128/k=4 (295 ns) at equal
        # MAC volume.
        # Finding #2 (fixed k=4): 128 -> 301 ns, 64 -> 210, 32 -> 212,
        # 16 -> 270: a ~210 ns non-MAC floor. Decompose it:
        (248, 64, 4, "base"),
        (248, 64, 4, "kdots"),         # no lane-dim concat copy
        (248, 64, 4, "hoist_onehot"),  # no per-serve one-hot build
        (248, 64, 4, "static_slab"),   # no dynamic-slice relayout
        (248, 32, 4, "kdots"),
        (248, 32, 4, "hoist_onehot"),
        (248, 64, 8, "kdots"),         # trips win (census 1.83 vs 2.22)
        (248, 64, 4, "vote"),          # base + block vote: delta = vote
        (248, 32, 8, "vote"),
        (64, 32, 8, "base"),           # q3 serve shape (rr 58 pad 64)
        (64, 32, 8, "vote"),
    ]
    for rr_pad, pw, k, variant in combos:
        tab = jnp.asarray(
            rng.standard_normal((N_PAGES * rr_pad, 128))
            .astype(ml_dtypes.bfloat16)
        )
        n1, n2 = N_ITER, N_ITER * 21
        try:
            ts = {n1: [], n2: []}
            for n in (n1, n2):
                out = run(tab, idx, rr_pad, pw, k, n, variant)
                float(out[0, 0])  # compile + warm
            for _ in range(5):
                for n in (n1, n2):
                    t0 = time.perf_counter()
                    out = run(tab, idx, rr_pad, pw, k, n, variant)
                    float(out[0, 0])
                    ts[n].append(time.perf_counter() - t0)
        except Exception as e:
            print(f"rr={rr_pad} pw={pw} k={k} {variant}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        import statistics
        slope = (statistics.median(ts[n2]) - statistics.median(ts[n1])) \
            / (n2 - n1)
        macs = rr_pad * pw * k * 128
        print(f"rr={rr_pad} pw={pw} k={k} {variant:>12}: "
              f"{slope * 1e9:7.0f} ns/serve  ({macs/1e6:5.2f} MMAC, "
              f"{macs / max(slope, 1e-12) / 1e12:6.1f} TMAC/s)")


if __name__ == "__main__":
    main()
