"""Micro-experiment: tpu.dynamic_gather (jnp.take_along_axis on 2D
operands inside Pallas) vs the one-hot MXU gather.

Question: can a [R, 128] slab's per-lane column extraction
(out[i, j] = slab[i, idx[j]]) use the VPU lane-shuffle instead of
building a [128, 128] one-hot and paying an MXU pass? If yes (and
cheap), every gather in the worklist kernels gets faster.

Run: python tools/exp_gather.py            (on the TPU)
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
from jax.experimental.pallas import tpu as pltpu

R = 115  # chunk slab rows (19 sections x 6 slots + flag)
N_ITER = 2000


def kernel_gather(tab_ref, idx_ref, out_ref, mode: str):
    tab = tab_ref[:]  # [R, 128] f32
    idx0 = idx_ref[:]  # [8, 128] i32 in [0, 128)

    def body(i, acc):
        # vary the index so the loop can't be hoisted
        idx = (idx0 + i) & 127
        got_rows = []
        for g in range(8):
            row_idx = jnp.broadcast_to(idx[g : g + 1], (R, 128))
            if mode == "shuffle":
                got = jnp.take_along_axis(
                    tab, row_idx, axis=1, mode="promise_in_bounds"
                )[:, :128]
            else:
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                    == idx[g : g + 1]
                ).astype(tab.dtype)
                got = jax.lax.dot_general(
                    tab, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            got_rows.append(jnp.sum(got, axis=0, keepdims=True))
        return acc + jnp.concatenate(got_rows, axis=0)

    out_ref[:] = jax.lax.fori_loop(
        0, N_ITER, body, idx0.astype(jnp.float32) * 0.0
    )


@functools.partial(jax.jit, static_argnames=("mode",))
def run(tab, idx, mode):
    return pl.pallas_call(
        functools.partial(kernel_gather, mode=mode),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(np.int32))

    for mode in ("onehot", "shuffle"):
        try:
            out = run(tab, idx, mode)
            ref = None
            if mode == "onehot":
                ref = np.asarray(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = run(tab, idx, mode)
                float(out[0, 0])
            dt = (time.perf_counter() - t0) / 5
            per = dt / N_ITER / 8 * 1e9
            print(f"[{mode}] {dt * 1e3:.2f} ms / {N_ITER} iters "
                  f"-> {per:.0f} ns per row-gather; out[0,0]={float(out[0,0]):.3f}")
        except Exception as e:
            print(f"[{mode}] FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
