"""Benchmark harness: Mrays/sec/chip on the RTIOW final scene (BASELINE.json).

Prints ONE JSON line:
  {"metric": "Mrays/sec/chip", "value": N, "unit": "Mrays/s",
   "vs_baseline": N/500, ...}

Rays are counted as actually-traced path segments (sum of active rays over
every bounce of every sample), matching SURVEY §5's accounting. The p50
frame time at 16 spp is reported alongside as a secondary metric.

Protocol (round 5): ``value`` is the MEDIAN-frame throughput over
``--frames`` identical frames (fresh sample offsets each) — the
reproducible statistic under the axon tunnel's timing noise; the
mean-of-N is reported as ``value_mean`` with the raw frame times.

Usage:
  python bench.py              # full: 1080p, 64 spp (the BASELINE config)
  python bench.py --quick      # small sanity run (CPU-friendly)
  python bench.py --backend jnp|pallas   # force a backend (default: auto)
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS = 500.0


def build_renderer(width, height, spp, max_bounces, backend):
    from csgrenderer_tpu.camera import Camera
    from csgrenderer_tpu.models import rtiow_final_scene
    from csgrenderer_tpu.render.integrator import render_image

    scene = rtiow_final_scene()
    camera = Camera.look_at(
        (13.0, 2.0, 3.0),
        (0.0, 0.0, 0.0),
        vfov_degrees=20.0,
        aspect_ratio=width / height,
        aperture=0.1,
        focus_dist=10.0,
    )

    if backend == "pallas":
        from csgrenderer_tpu.kernels import render_image_pallas

        def run(sample_offset):
            return render_image_pallas(
                scene,
                camera,
                width,
                height,
                spp=spp,
                max_bounces=max_bounces,
                seed=0,
                lens=True,
                sample_offset=sample_offset,
            )

    else:

        def run(sample_offset):
            return render_image(
                scene.nearest_hit,
                camera,
                width,
                height,
                spp=spp,
                max_bounces=max_bounces,
                seed=0,
                lens=True,
                sample_offset=sample_offset,
            )

    return jax.jit(run)


def pick_backend(requested: str) -> str:
    if requested != "auto":
        return requested
    try:
        from csgrenderer_tpu.kernels import render_image_pallas  # noqa: F401

        return "pallas" if jax.devices()[0].platform != "cpu" else "jnp"
    except Exception:
        return "jnp"


def time_frames(fn, n_frames, spp_note=""):
    times = []
    total_rays = 0
    for i in range(n_frames):
        t0 = time.perf_counter()
        img, rays = fn(jnp.uint32(i + 1))
        # The forcing scalar readback MUST be inside the timed window:
        # under the axon tunnel block_until_ready() can return before the
        # device work drains (CLAUDE.md / PERF_NOTES measurement rule), and
        # int(rays) is the only reliable fence. Reading the ray counter
        # also transfers the image's sibling output, so no work escapes.
        r = int(rays)
        dt = time.perf_counter() - t0
        times.append(dt)
        total_rays += r
    return times, total_rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--backend", default="auto", choices=["auto", "jnp", "pallas"])
    # 5 frames: each 64-spp frame is ~1.5 s wall under the tunnel, well
    # under its 2-min execution kill, and the MEDIAN frame is robust to
    # the tunnel's occasional multi-hundred-ms hiccups (round-5
    # reproducibility protocol — the round-4 mean-of-3 read 721 vs the
    # builder's 750 for the same kernel)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument(
        "--p50", default=True,
        action=argparse.BooleanOptionalAction,
        help="measure p50 frame time at 16 spp (second compile); "
        "--no-p50 estimates it from the throughput run instead",
    )
    ap.add_argument(
        "--p50-chunks", type=int, default=1,
        help="split the 16-spp p50 frame into this many spp-chunked "
        "dispatches enqueued back-to-back before the single fence "
        "readback (exact under sample_offset composition). MEASURED "
        "NEGATIVE on the tunneled v5e (doc/PERF_NOTES round 4): 4 "
        "chunks = 280 ms vs ~205 single-launch — per-dispatch queue "
        "overhead exceeds any floor overlap, so the default stays 1.",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (JAX_PLATFORMS is ignored under the "
        "axon plugin — this is the safe way to sanity-run bench while a "
        "TPU process is active; pairs with --quick)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # Device liveness watchdog: the axon tunnel can wedge for HOURS
    # (CLAUDE.md round-3b outage) and a dead tunnel makes jax.devices()
    # block forever — emit one honest JSON error line instead of hanging
    # the driver. The probe runs in a daemon thread; on timeout the
    # process exits (the hung thread dies with it).
    import threading

    probe_ok = threading.Event()

    def _probe():
        try:
            jax.devices()
            probe_ok.set()
        except Exception:
            pass

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    if not probe_ok.wait(timeout=180.0):
        print(json.dumps({
            "metric": "Mrays/sec/chip", "value": 0.0, "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "error": "device backend unreachable (init timed out after "
                     "180 s — axon tunnel outage, not a kernel "
                     "regression; last good: BENCH_r02.json 525.97)",
        }))
        sys.exit(3)

    backend = pick_backend(args.backend)
    platform = jax.devices()[0].platform

    if args.quick:
        width, height, spp, bounces = 320, 180, 4, 8
    else:
        width, height, spp, bounces = 1920, 1080, 64, 8

    # --- main throughput config ---
    fn = build_renderer(width, height, spp, bounces, backend)
    int(fn(jnp.uint32(0))[1])  # compile + warm up (scalar readback = fence)
    times, rays = time_frames(fn, args.frames)
    # MEDIAN-frame throughput (round 5): rays/frame is identical across
    # frames (same shape, fresh sample offsets), so per-frame Mrays/s =
    # (rays/frames)/t_i; the median is the reproducible statistic under
    # tunnel timing noise (mean-of-N regressed 4% on a single slow
    # frame in BENCH_r04). doc/PERF_NOTES "Measurement hygiene".
    rays_per_frame = rays / len(times)
    mrays = rays_per_frame / statistics.median(times) / 1e6
    mrays_mean = rays / sum(times) / 1e6

    # --- secondary: p50 frame time at 16 spp (opt-in: costs a 2nd compile) ---
    if args.p50:
        spp16 = 16 if not args.quick else 2
        chunks = max(1, min(args.p50_chunks, spp16))
        while spp16 % chunks:
            chunks -= 1
        spp_c = spp16 // chunks
        fn16 = build_renderer(width, height, spp_c, bounces, backend)

        def frame16(base):
            # enqueue ALL chunks, then accumulate on device; the ONE
            # scalar fence below depends on every chunk, so nothing
            # escapes the timed window. Equal-spp chunk means compose
            # exactly: mean of chunk means == the 16-spp mean, and the
            # counter-based RNG makes disjoint sample_offsets disjoint
            # sample sets (tools/validate_tpu.py composes the same way).
            outs = [
                fn16(base + jnp.uint32(c * spp_c)) for c in range(chunks)
            ]
            img = outs[0][0]
            rays = outs[0][1]
            for o in outs[1:]:
                img = img + o[0]
                rays = rays + o[1]
            return img / chunks, rays

        int(frame16(jnp.uint32(0))[1])  # compile + warm up
        t16, _ = time_frames(frame16, max(args.frames, 3))
        p50_ms = round(statistics.median(t16) * 1e3, 2)
    else:
        # estimate from the throughput config (spp-proportional workload)
        p50_ms = round(statistics.median(times) * 1e3 * 16.0 / spp, 2)

    result = {
        "metric": "Mrays/sec/chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "config": f"RTIOW-final {width}x{height} spp={spp} bounces={bounces}",
        "p50_frame_ms_16spp": p50_ms,
        "p50_measured": bool(args.p50),
        "backend": backend,
        "platform": platform,
        "frames": args.frames,
        "rays": rays,
        "value_mean": round(mrays_mean, 2),
        "frame_times_s": [round(t, 4) for t in times],
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
