"""CSG tape-kernel bench/census driver (the config5 throughput number).

Times the BASELINE config5 scene (depth-8 animated CSG at t=1.0) and the
many-objects cluster scene through render_image_tape_pallas. Env knobs
(CSGR_WAVE_UNROLL, CSGR_DEBUG_ITERS) are read at trace time — one variant
per process, like tools/census_sphere.py:

  python tools/bench_tape.py                      # config5, global eval
  python tools/bench_tape.py --scene many         # 100-leaf cluster scene
  CSGR_WAVE_UNROLL=2 python tools/bench_tape.py

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
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--scene", default="config5", choices=["config5", "many"])
    ap.add_argument("--partition", default="auto")
    args = ap.parse_args(argv)

    from csgrenderer_tpu.camera import Camera
    from csgrenderer_tpu.kernels import render_image_tape_pallas
    from csgrenderer_tpu.models import animated_csg_scene, many_objects_scene

    if args.scene == "config5":
        g5, animate5 = animated_csg_scene(n_levels=8)
        tape = animate5(g5.compile(k=4), 1.0)
        cam = Camera.look_at((0, 2.0, 7.0), (0.5, 0, 0), vfov_degrees=40.0,
                             aspect_ratio=args.width / args.height)
        bounces = min(args.bounces, 5)
    else:
        tape = many_objects_scene(99).compile(k=4)
        cam = Camera.look_at((0, 7.0, 9.0), (0, 0.4, 0), vfov_degrees=45.0,
                             aspect_ratio=args.width / args.height)
        bounces = args.bounces

    part = {"auto": "auto", "true": True, "false": False}.get(
        str(args.partition).lower(), "auto")
    knobs = {
        k: os.environ.get(k, "")
        for k in ("CSGR_WAVE_UNROLL", "CSGR_DEBUG_ITERS")
        if os.environ.get(k)
    }

    t0 = time.perf_counter()
    img, rays = render_image_tape_pallas(
        tape, cam, args.width, args.height, spp=args.spp,
        max_bounces=bounces, seed=0, partition=part,
    )
    r0 = int(rays)  # scalar readback = hard sync
    print(f"[tape {args.scene}] compile+first "
          f"{time.perf_counter() - t0:.1f}s rays={r0} knobs={knobs}",
          flush=True)

    times = []
    for i in range(args.frames):
        t0 = time.perf_counter()
        img, rays = render_image_tape_pallas(
            tape, cam, args.width, args.height, spp=args.spp,
            max_bounces=bounces, seed=0, sample_offset=(i + 1) * args.spp,
            partition=part,
        )
        r = int(rays)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"[tape {args.scene}] best {best * 1e3:.1f} ms  rays={r}  "
          f"{r / best / 1e6:.1f} Mrays/s   "
          f"(times: {', '.join(f'{t * 1e3:.0f}' for t in times)} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
