"""Sphere-megakernel wavefront census driver (doc/PERF_NOTES remainder).

Times ONE configuration of the headline RTIOW config (1080p, 16 spp by
default) and prints ms + rays. Env knobs are read at TRACE time, so each
variant must run in its OWN process — this script is the per-process
unit; tools/tpu_round3_batch.sh sequences the variants:

  python tools/census_sphere.py                 # baseline
  CSGR_WAVE_UNROLL=2 python tools/census_sphere.py
  CSGR_WAVE_PAD=8    python tools/census_sphere.py
  CSGR_DEBUG_ITERS=1 python tools/census_sphere.py   # rays = iters x 1024

Timing rule: scalar readback inside the window (CLAUDE.md), best of
--frames. ONE TPU process at a time.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args(argv)

    from csgrenderer_tpu.camera import Camera
    from csgrenderer_tpu.kernels import render_image_pallas
    from csgrenderer_tpu.models import rtiow_final_scene

    scene = rtiow_final_scene()
    cam = Camera.look_at(
        (13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov_degrees=20.0,
        aspect_ratio=args.width / args.height,
        aperture=0.1, focus_dist=10.0,
    )
    knobs = {
        k: os.environ.get(k, "")
        for k in ("CSGR_WAVE_UNROLL", "CSGR_WAVE_PAD", "CSGR_DEBUG_ITERS")
        if os.environ.get(k)
    }

    t0 = time.perf_counter()
    img, rays = render_image_pallas(
        scene, cam, args.width, args.height, spp=args.spp,
        max_bounces=args.bounces, seed=0, lens=True,
    )
    r0 = int(rays)  # scalar readback = hard sync
    print(f"compile+first {time.perf_counter() - t0:.1f}s rays={r0} "
          f"knobs={knobs}", flush=True)
    times = []
    for i in range(args.frames):
        t0 = time.perf_counter()
        img, rays = render_image_pallas(
            scene, cam, args.width, args.height, spp=args.spp,
            max_bounces=args.bounces, seed=0, lens=True,
            sample_offset=i * args.spp,
        )
        r = int(rays)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"best {best * 1e3:.1f} ms  rays={r}  "
          f"{r / best / 1e6:.1f} Mrays/s  (times: "
          + ", ".join(f"{t * 1e3:.0f}" for t in times) + " ms)", flush=True)


if __name__ == "__main__":
    main()
