"""Micro-experiment: dynamic page-slab extraction, lane-dim vs sublane-dim.

The stream service slices a [R, 128] slab out of the chunk table at a
dynamic page offset. Two layouts:
  - "lane":    table [R, W],          slab = tab[:, pl.ds(p*128, 128)]
               (dynamic offset on the MINOR dim — Mosaic can't prove
               the 128-alignment of p*128, suspicion: unaligned shift)
  - "sublane": table [W/128 * R, 128], slab = tab[pl.ds(p*R, R), :]
               (dynamic offset on the sublane dim, R multiple of 8)

Run: python tools/exp_slab.py            (on the TPU)
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

R = 248  # 2-block chunk slab rows (19 sections x 13 slots + flag)
W = 3584  # 28 pages
N_PAGES = W // 128
N_ITER = 2000


def kernel(tab_ref, idx_ref, out_ref, mode: str, n_iter: int):
    idx0 = idx_ref[:]  # [8, 128] i32, page ids in [0, N_PAGES)

    def body(i, acc):
        if mode == "carryscalar":
            # page id read from the LOOP-CARRIED vector: forces a fresh
            # vreg -> sreg move (scalar-unit sync) every iteration, the
            # way the real service reads p_r[g, 0] every trip
            p = jax.lax.rem(
                (acc[0, 0] * 0.0).astype(jnp.int32) + i, N_PAGES
            )
            slab = tab_ref[pl.ds(p * R, R), :]
        elif mode == "loopscalar":
            # page id from the scalar loop counter only: no
            # vector-register -> scalar read in the loop
            p = jax.lax.rem(i, N_PAGES)
            slab = tab_ref[pl.ds(p * R, R), :]
        elif mode == "lane":
            p = jax.lax.rem(idx0[0, 0] + i, N_PAGES)
            slab = tab_ref[:, pl.ds(p * 128, 128)]
        else:
            p = jax.lax.rem(idx0[0, 0] + i, N_PAGES)
            slab = tab_ref[pl.ds(p * R, R), :]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            == (idx0[0:1] * 0 + 7)
        ).astype(slab.dtype)
        got = jax.lax.dot_general(
            slab, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + jnp.sum(got, axis=0, keepdims=True)

    r = jax.lax.fori_loop(
        0, n_iter, body, idx0[0:1].astype(jnp.float32) * 0.0
    )
    out_ref[:] = jnp.broadcast_to(r, (8, 128))


@functools.partial(jax.jit, static_argnames=("mode", "n_iter"))
def run(tab, idx, mode, n_iter):
    return pl.pallas_call(
        functools.partial(kernel, mode=mode, n_iter=n_iter),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(tab, idx)


def main():
    rng = np.random.default_rng(0)
    tab_lane = jnp.asarray(
        rng.standard_normal((R, W)).astype(np.float32)
    )
    tab_sub = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(tab_lane).reshape(R, N_PAGES, 128)
            .transpose(1, 0, 2).reshape(N_PAGES * R, 128)
        )
    )
    idx = jnp.asarray(rng.integers(0, N_PAGES, (8, 128)).astype(np.int32))
    # SLOPE timing: the ~48 ms tunnel dispatch floor (CLAUDE.md)
    # swamps a single-call measurement; cost = (t(N2) - t(N1))/(N2 - N1)
    n1, n2 = N_ITER, N_ITER * 21
    for mode, tab in (("lane", tab_lane), ("sublane", tab_sub),
                      ("loopscalar", tab_sub), ("carryscalar", tab_sub)):
        ts = {}
        for n in (n1, n2):
            out = run(tab, idx, mode, n)
            float(out[0, 0])  # compile + sync
            t0 = time.perf_counter()
            out = run(tab, idx, mode, n)
            float(out[0, 0])
            ts[n] = time.perf_counter() - t0
        slope = (ts[n2] - ts[n1]) / (n2 - n1)
        print(f"{mode}: {slope * 1e9:.0f} ns/slab-dot "
              f"(t{n1}={ts[n1]*1e3:.1f}ms t{n2}={ts[n2]*1e3:.1f}ms)")


if __name__ == "__main__":
    main()
