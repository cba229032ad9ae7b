"""Narrow-page stream-serve census (round 5) — CPU interpret mode.

The round-4f roofline: the stream service's serve dots are ~87% of wall
at 15k faces, and each dot's MAC volume is rr x (k*page_w) x 128
REGARDLESS of how many of the page's lane-columns are wanted (measured
column efficiency ~21/128). Narrow logical pages (CSGR_STREAM_PW) cut
the contraction dim proportionally; the question is how fast TRIPS grow
as pages narrow (demand locality: Morton-local demand keeps distinct
pages per group sublinear in 128/page_w).

This census runs the REAL kernel in interpret mode at reduced size and
reports, per (q, page_w, k) config: service trips, wavefront tile-iters,
and the serve MAC volume model trips x 8 groups x rr_pad x (k*page_w) x
128. Relative MAC volume + trip growth decide the TPU measurement
ladder (narrow-page demand locality is RESOLUTION-CONSERVATIVE here:
fewer pixels per voxel at low res scatters demand MORE than 1280x720).

Usage: python tools/census_stream_pw.py [--subdiv 4] [--w 320 --h 180]
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))


def run_config(scene, cam, width, height, spp, bounces, pw, k, q, ns,
               mode):
    os.environ["CSGR_STREAM_PW"] = str(pw)
    os.environ["CSGR_STREAM_NSIDE"] = str(ns)
    if q:
        os.environ["CSGR_STREAM_Q"] = str(q)
    else:
        os.environ.pop("CSGR_STREAM_Q", None)
    for v in ("CSGR_DEBUG_TRIPS", "CSGR_DEBUG_ITERS"):
        os.environ.pop(v, None)
    if mode:
        os.environ[mode] = "1"
    jax.clear_caches()
    from csgrenderer_tpu.kernels import tri_worklist
    from csgrenderer_tpu.kernels.trimesh_kernel import (
        render_image_mesh_pallas,
    )

    tri_worklist._PACK_CACHE.clear()
    img, rays = render_image_mesh_pallas(
        scene, cam, width, height, spp=spp, max_bounces=bounces, seed=7,
        worklist="stream", gather_pages=k, interpret=True,
    )
    return float(np.asarray(rays))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=4)
    ap.add_argument("--w", type=int, default=320)
    ap.add_argument("--h", type=int, default=180)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--bounces", type=int, default=6)
    ap.add_argument("--ns", type=int, default=40)
    ap.add_argument("--configs", default=(
        "13:128:4,13:64:4,13:64:8,13:32:8,13:32:16,13:16:16,"
        "6:32:8,3:32:8,3:16:16"
    ), help="comma list of q:page_w:k")
    args = ap.parse_args()

    from demo7_mesh import build_scene

    from csgrenderer_tpu.camera.pinhole import Camera

    scene = build_scene(subdiv=args.subdiv)
    faces = int(np.asarray(scene.v0).shape[0])
    cam = Camera.look_at(
        (0.0, 1.6, 2.2), (0.0, 0.7, -2.6), vfov_degrees=45.0,
        aspect_ratio=args.w / args.h,
    )
    print(f"faces={faces} {args.w}x{args.h} spp={args.spp} "
          f"bounces={args.bounces} ns={args.ns}")
    print(f"{'q':>3} {'pw':>4} {'k':>3} {'trips':>12} {'iters':>12} "
          f"{'trips/iter':>10} {'serveMAC(G)':>12} {'rel':>6}")
    base_mac = None
    for cfg in args.configs.split(","):
        q, pw, k = (int(x) for x in cfg.split(":"))
        try:
            trips = run_config(scene, cam, args.w, args.h, args.spp,
                               args.bounces, pw, k, q, args.ns,
                               "CSGR_DEBUG_TRIPS") / 1024.0
            iters = run_config(scene, cam, args.w, args.h, args.spp,
                               args.bounces, pw, k, q, args.ns,
                               "CSGR_DEBUG_ITERS") / 1024.0
        except Exception as e:  # plan may not exist (VMEM) etc.
            print(f"{q:>3} {pw:>4} {k:>3}   FAILED: {e}")
            continue
        rr = 19 * q + 1
        rr_pad = int(np.ceil(rr / 8.0)) * 8
        mac = trips * 8 * rr_pad * (k * pw) * 128 / 1e9
        if base_mac is None:
            base_mac = mac
        print(f"{q:>3} {pw:>4} {k:>3} {trips:>12.0f} {iters:>12.0f} "
              f"{trips / max(iters, 1):>10.2f} {mac:>12.2f} "
              f"{mac / base_mac:>6.2f}")


if __name__ == "__main__":
    main()
