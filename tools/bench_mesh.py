"""Mesh-kernel throughput measurement (the PERF_NOTES scaling curve).

Times render_image_mesh_pallas on the demo7 scene at chosen subdivision
levels, tiered vs stream gather, with the scalar-readback timing rule
(CLAUDE.md: block_until_ready alone is unreliable under the tunnel).

Run ONE AT A TIME on the TPU:
    python tools/bench_mesh.py --subdiv 4 --modes stream,tiered
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "demos"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=4)
    ap.add_argument("--spheres", type=int, default=3,
                    help="icospheres in the scene (5 at subdiv 5 = 102k faces)")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--bounces", type=int, default=6)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--modes", default="stream,tiered",
                    help="comma list of: stream, tiered, auto")
    ap.add_argument("--gather-pages", type=int, default=2)
    ap.add_argument("--obj", default=None,
                    help="time an OBJ file instead of the demo7 scene")
    args = ap.parse_args(argv)

    from demo7_mesh import build_scene

    from csgrenderer_tpu.kernels import render_image_mesh_pallas
    from csgrenderer_tpu.kernels.tri_worklist import pack_tri_grid
    from csgrenderer_tpu.scene import Material

    if args.obj:
        from csgrenderer_tpu.io.obj import load_mesh

        mesh = load_mesh(args.obj, Material.lambertian((0.6, 0.6, 0.6)))
    else:
        mesh = build_scene(args.subdiv, spheres=args.spheres)
    from csgrenderer_tpu.camera import Camera

    cam = Camera.look_at((0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
                         vfov_degrees=45.0,
                         aspect_ratio=args.width / args.height)

    mode_to_worklist = {"stream": "stream", "tiered": "tiered",
                        "auto": "auto"}
    for mode in args.modes.split(","):
        wl = mode_to_worklist[mode.strip()]
        res = pack_tri_grid(mesh, stream={"stream": True}.get(mode, "auto")
                            if mode != "tiered" else False,
                            gather_pages=args.gather_pages)
        if res is not None:
            gs = res[0].static
            tb = sum(t.size * 2 for t in res[0].tables) / 1e6
            print(f"[{mode}] faces={mesh.num_faces} tiers={gs.tiers} "
                  f"gather_pages={gs.gather_pages} dense_pad={gs.dense_pad} "
                  f"table={tb:.2f}MB")
        t0 = time.perf_counter()
        img, rays = render_image_mesh_pallas(
            mesh, cam, args.width, args.height, spp=args.spp,
            max_bounces=args.bounces, seed=7, worklist=wl,
            gather_pages=args.gather_pages)
        r0 = int(rays)  # scalar readback = hard sync
        print(f"[{mode}] compile+first: {time.perf_counter() - t0:.1f}s "
              f"rays={r0}")
        times = []
        for i in range(args.frames):
            t0 = time.perf_counter()
            img, rays = render_image_mesh_pallas(
                mesh, cam, args.width, args.height, spp=args.spp,
                max_bounces=args.bounces, seed=7 + i, worklist=wl,
                gather_pages=args.gather_pages)
            r = int(rays)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"[{mode}] best {best * 1e3:.0f} ms -> "
              f"{r / best / 1e6:.1f} Mrays/s   (times: "
              + ", ".join(f"{t * 1e3:.0f}" for t in times) + " ms)")


if __name__ == "__main__":
    main()
