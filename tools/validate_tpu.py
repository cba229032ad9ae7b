"""Hardware fidelity validation: the BASELINE 1e-3 RMSE criterion, proven.

BASELINE.json's north star: production (Pallas kernel) renders must match
the reference implementation within 1e-3 RMSE. At golden-image sample
counts that is unprovable — kernel-vs-reference float-grouping flips a few
sample PATHS, and at low spp each flipped path leaves a visible divergent
pixel that is pure Monte-Carlo noise, not bias (round-1 verdict item 3).
This tool runs the CONVERGED-comparison protocol instead:

1. **Noise certificate**: render each config twice through the kernel with
   independent seeds and raise spp until the per-image MC noise
   (rmse(seedA, seedB)/sqrt(2), gamma-2 tonemapped floats, no uint8
   quantization — uint8 alone injects ~1.1e-3) is <= 3e-4, well under the
   1e-3 budget.
2. **Fidelity**: at that spp, assert rmse(kernel, jnp reference) <= 1e-3
   with the SAME seed — the strictest reading of "matching reference
   renders": identical RNG streams, so the only differences are the
   tie-flipped paths and table quantization, which must be MC-insignificant.

Both sides run on the attached accelerator (the jnp reference is the same
algorithm on any backend; the committed CPU goldens remain the regression
net in tests/test_golden.py). Resolutions are reduced — RMSE is per-pixel
and resolution-independent — so the jnp side stays affordable.

Run: python tools/validate_tpu.py           (~10-15 min on the TPU)
     python tools/validate_tpu.py --quick   (golden regression only, loose)
"""

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

NOISE_TARGET = 3e-4  # spp doubles until the MC noise reaches this...
NOISE_BUDGET = 1e-3  # ...and must at least fit the 1e-3 budget to pass
RMSE_TOL = 1e-3  # the BASELINE criterion
MAX_SEGMENTS = 1.8e9  # int32 ray-counter headroom per kernel call


def _tonemapped(radiance):
    from csgrenderer_tpu.render import tonemap

    return np.asarray(tonemap.tonemap(radiance, gamma=2.0), np.float64)


def _rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


class Config:
    def __init__(self, name, kernel_fn, ref_fn, w, h, spp0, max_spp,
                 bounces, ref_chunk=4096):
        """kernel_fn/ref_fn: (seed, spp, sample_offset) -> linear radiance.

        ``ref_chunk``: max spp per reference call — the slow jnp reference
        must be split into bounded device executions (the axon tunnel kills
        single executions running for minutes), accumulated host-side via
        disjoint sample_offsets (which composes exactly: counter-based RNG).
        """
        self.name = name
        self.kernel_fn = kernel_fn
        self.ref_fn = ref_fn
        self.w, self.h = w, h
        self.spp0, self.max_spp = spp0, max_spp
        self.bounces = bounces
        self.ref_chunk = ref_chunk


def _chunked(fn, seed, spp, chunk):
    if spp <= chunk:
        return np.asarray(fn(seed, spp), np.float64)
    acc = None
    off = 0
    while off < spp:
        n = min(chunk, spp - off)
        img = np.asarray(fn(seed, n, off), np.float64) * (n / spp)
        acc = img if acc is None else acc + img
        off += n
    return acc


def build_configs():
    from csgrenderer_tpu.camera import Camera
    from csgrenderer_tpu.kernels import (
        render_image_pallas,
        render_image_tape_pallas,
    )
    from csgrenderer_tpu.models import (
        animated_csg_scene,
        config3_csg_scene,
        rtiow_final_scene,
        two_spheres_scene,
    )
    from csgrenderer_tpu.render import render_image, tape_hit_adapter

    cfgs = []

    # config 2: two diffuse spheres (brute megakernel path)
    s2 = two_spheres_scene()
    cam2 = Camera.look_at((0, 0, 0), (0, 0, -1), vfov_degrees=90.0,
                          aspect_ratio=96 / 54)
    def c2_kernel(seed, spp, off=0):
        img, _ = render_image_pallas(
            s2, cam2, 96, 54, spp=spp, max_bounces=8, seed=seed,
            sample_offset=off)
        return img

    def c2_ref(seed, spp, off=0):
        img, _ = render_image(
            s2.nearest_hit, cam2, 96, 54, spp=spp, max_bounces=8,
            seed=seed, sample_offset=off)
        return img

    cfgs.append(Config("config2_two_spheres", c2_kernel, c2_ref,
                       96, 54, 4096, 65536, 8, ref_chunk=65536))

    # config 3: CSG boolean (tape kernel)
    t3 = config3_csg_scene().compile(k=2)
    cam3 = Camera.look_at((3, 2.5, 4), (0.1, 0, 0), vfov_degrees=35.0,
                          aspect_ratio=1.0)
    def c3_kernel(seed, spp, off=0):
        img, _ = render_image_tape_pallas(
            t3, cam3, 96, 96, spp=spp, max_bounces=6, seed=seed,
            sample_offset=off)
        return img

    def c3_ref(seed, spp, off=0):
        hit = functools.partial(tape_hit_adapter, t3)
        img, _ = render_image(
            hit, cam3, 96, 96, spp=spp, max_bounces=6, seed=seed,
            sample_offset=off)
        return img

    cfgs.append(Config("config3_csg_boolean", c3_kernel, c3_ref,
                       96, 96, 2048, 32768, 6, ref_chunk=4096))

    # config 4: RTIOW final scene (grid-worklist megakernel — the headline)
    s4 = rtiow_final_scene()
    cam4 = Camera.look_at((13, 2, 3), (0, 0, 0), vfov_degrees=20.0,
                          aspect_ratio=128 / 72, aperture=0.1,
                          focus_dist=10.0)
    def c4_kernel(seed, spp, off=0):
        img, _ = render_image_pallas(
            s4, cam4, 128, 72, spp=spp, max_bounces=8, seed=seed,
            lens=True, sample_offset=off)
        return img

    def c4_ref(seed, spp, off=0):
        img, _ = render_image(
            s4.nearest_hit, cam4, 128, 72, spp=spp, max_bounces=8,
            seed=seed, lens=True, sample_offset=off)
        return img

    cfgs.append(Config("config4_rtiow_final", c4_kernel, c4_ref,
                       128, 72, 8192, 32768, 8, ref_chunk=2048))

    # config 5: deep animated CSG at t=1.0 (tape kernel)
    g5, animate5 = animated_csg_scene(n_levels=8)
    t5 = animate5(g5.compile(k=4), 1.0)
    cam5 = Camera.look_at((0, 2.0, 7.0), (0.5, 0, 0), vfov_degrees=40.0,
                          aspect_ratio=1.0)
    def c5_kernel(seed, spp, off=0):
        img, _ = render_image_tape_pallas(
            t5, cam5, 96, 96, spp=spp, max_bounces=5, seed=seed,
            sample_offset=off)
        return img

    def c5_ref(seed, spp, off=0):
        hit = functools.partial(tape_hit_adapter, t5)
        img, _ = render_image(
            hit, cam5, 96, 96, spp=spp, max_bounces=5, seed=seed,
            sample_offset=off)
        return img

    cfgs.append(Config("config5_animated_csg", c5_kernel, c5_ref,
                       96, 96, 4096, 32768, 5, ref_chunk=2048))

    # config 6 (round 3, beyond the reference): triangle meshes through the
    # voxel-worklist kernel — demo7's scene (3 icospheres + floor, 962
    # faces, grid path), same converged protocol as configs 2-5
    from csgrenderer_tpu.kernels import render_image_mesh_pallas

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "demos"))
    from demo7_mesh import build_scene as _mesh_scene

    m6 = _mesh_scene(subdiv=2)
    cam6 = Camera.look_at((0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
                          vfov_degrees=45.0, aspect_ratio=96 / 54)

    def c6_kernel(seed, spp, off=0):
        img, _ = render_image_mesh_pallas(
            m6, cam6, 96, 54, spp=spp, max_bounces=6, seed=seed,
            sample_offset=off)
        return img

    def c6_ref(seed, spp, off=0):
        img, _ = render_image(
            m6.nearest_hit, cam6, 96, 54, spp=spp, max_bounces=6,
            seed=seed, sample_offset=off)
        return img

    cfgs.append(Config("config6_mesh", c6_kernel, c6_ref,
                       96, 54, 2048, 32768, 6, ref_chunk=1024))

    # config 7 (round 3b): mesh NEE — emissive-face TriLights lamps with
    # MIS through the tri-grid shadow walk (models.mesh_night_scene),
    # black sky. Covers nee_sample_tri_planes + tri_bsdf_mis_planes +
    # the shadow-segment machinery on the mesh kernel.
    from csgrenderer_tpu.models import mesh_night_scene
    from csgrenderer_tpu.render.lights import extract_mesh_lights

    m7 = mesh_night_scene()
    l7 = extract_mesh_lights(m7)
    cam7 = Camera.look_at((0.0, 1.8, 2.4), (0.0, 0.7, -2.6),
                          vfov_degrees=45.0, aspect_ratio=96 / 54)

    def c7_kernel(seed, spp, off=0):
        img, _ = render_image_mesh_pallas(
            m7, cam7, 96, 54, spp=spp, max_bounces=6, seed=seed,
            sky="black", nee=True, sample_offset=off)
        return img

    def c7_ref(seed, spp, off=0):
        img, _ = render_image(
            m7.nearest_hit, cam7, 96, 54, spp=spp, max_bounces=6,
            seed=seed, sky="black", lights=l7, sample_offset=off)
        return img

    cfgs.append(Config("config7_meshnight", c7_kernel, c7_ref,
                       96, 54, 2048, 65536, 6, ref_chunk=1024))
    # ^ max_spp 65536: at 32768 the night scene's glossy-MIS noise plateaus
    # at ~1.15e-3, just over the 1e-3 budget (round-4 batch run); one more
    # doubling brings it to ~8e-4, inside budget (MAX_SEGMENTS still holds:
    # 96*54*65536*3.6 = 1.2e9 < 1.8e9)

    # config 8 (round 4): the 15k-face STREAM demand-paged gather vs the
    # jnp reference directly — the round-3 verdict's gap: stream mode had
    # only interpret-mode certificates, never the converged hardware proof.
    # 64x36 keeps the brute-force jnp oracle affordable at 15k faces
    # (RMSE is per-pixel, resolution-independent).
    m8 = _mesh_scene(subdiv=4)  # 3 icospheres @5120 faces + floor = 15364
    cam8 = Camera.look_at((0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
                          vfov_degrees=45.0, aspect_ratio=64 / 36)

    def c8_kernel(seed, spp, off=0):
        img, _ = render_image_mesh_pallas(
            m8, cam8, 64, 36, spp=spp, max_bounces=6, seed=seed,
            sample_offset=off, worklist="stream", gather_pages=4)
        return img

    def c8_ref(seed, spp, off=0):
        img, _ = render_image(
            m8.nearest_hit, cam8, 64, 36, spp=spp, max_bounces=6,
            seed=seed, sample_offset=off)
        return img

    cfgs.append(Config("config8_meshstream15k", c8_kernel, c8_ref,
                       64, 36, 2048, 32768, 6, ref_chunk=512))

    # config 9 (round 4): the HBM-resident table + per-trip page DMA vs
    # the jnp reference. 245k faces have NO affordable second
    # implementation (that's why HBM mode exists), so the DMA service is
    # anchored to the true reference HERE, on a 3.8k-face mesh with the
    # VMEM budget forced to ~0 (exactly tests/test_tri_worklist.py's
    # phase-B recipe) — the paging/DMA indexing under test is
    # face-count-independent; validate_hbm_245k() then certifies full
    # scale by noise + cross-schedule agreement.
    from csgrenderer_tpu.kernels import tri_worklist as twl

    m9 = _mesh_scene(subdiv=3)  # 3852 faces
    saved_budget = twl._STREAM_TABLE_BYTES
    twl._STREAM_TABLE_BYTES = 1
    try:
        pack9, _, _ = twl.pack_tri_grid(m9, stream=True, gather_pages=4)
    finally:
        twl._STREAM_TABLE_BYTES = saved_budget
    assert pack9.static.hbm_table == 1, "HBM plan not chosen"
    # the memoized pack above is what the kernel's _prepare will reuse
    cam9 = cam8

    def c9_kernel(seed, spp, off=0):
        img, _ = render_image_mesh_pallas(
            m9, cam9, 64, 36, spp=spp, max_bounces=6, seed=seed,
            sample_offset=off, worklist="stream", gather_pages=4)
        return img

    def c9_ref(seed, spp, off=0):
        img, _ = render_image(
            m9.nearest_hit, cam9, 64, 36, spp=spp, max_bounces=6,
            seed=seed, sample_offset=off)
        return img

    cfgs.append(Config("config9_meshhbm", c9_kernel, c9_ref,
                       64, 36, 2048, 32768, 6, ref_chunk=2048))

    return cfgs


def validate_hbm_245k() -> bool:
    """config10: the 245k-face HBM table at FULL scale. No second
    implementation can run 245k faces (tiered: past its capacity wall;
    jnp brute: ~10^13 face tests), so the certificate is (a) the same
    two-seed noise bound as every other config, and (b) same-seed
    agreement across two different PAGE SCHEDULES (gather_pages 8 vs 2)
    — the k-page service order is the fresh, subtle machinery; serving
    identical images under different schedules proves the DMA chain
    walks deliver the same face data. The indexing logic itself is
    anchored to the jnp reference at 3.8k faces by config9."""
    import pathlib as _p
    import sys as _sys

    _sys.path.insert(0, str(_p.Path(__file__).resolve().parent.parent
                            / "demos"))
    from demo7_mesh import build_scene as _mesh_scene

    from csgrenderer_tpu.camera import Camera
    from csgrenderer_tpu.kernels import render_image_mesh_pallas

    m = _mesh_scene(subdiv=6)  # ~245k faces: HBM is the only plan
    cam = Camera.look_at((0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
                         vfov_degrees=45.0, aspect_ratio=48 / 28)

    def k(pages):
        def fn(seed, spp, off=0):
            img, _ = render_image_mesh_pallas(
                m, cam, 48, 28, spp=spp, max_bounces=6, seed=seed,
                sample_offset=off, worklist="stream", gather_pages=pages)
            return img
        return fn

    # every device execution is bounded to 1024 spp (~4 s at the measured
    # ~1 Mrays/s): the tunnel KILLS single executions past ~2 min, and the
    # original unchunked doubling loop crashed the worker here (r4d log) —
    # sample_offset composition is exact under the counter-based RNG
    spp, chunk = 1024, 1024
    while True:
        a = _tonemapped(_chunked(k(8), 11, spp, chunk))
        b = _tonemapped(_chunked(k(8), 1211, spp, chunk))
        noise = _rmse(a, b) / np.sqrt(2.0)
        print(f"[csgr] config10_meshhbm245k: spp={spp} "
              f"noise={noise:.2e} ...", flush=True)
        if noise <= NOISE_TARGET or spp * 2 > 16384:
            break
        spp *= 2
    # same seed, different page schedule
    x = _tonemapped(_chunked(k(2), 11, spp, chunk))
    err = _rmse(a, x)
    ok = noise <= NOISE_BUDGET and err <= RMSE_TOL
    print(
        f"[csgr] config10_meshhbm245k: spp={spp} noise={noise:.2e} "
        f"rmse_k8_vs_k2={err:.2e} {'OK' if ok else 'FAIL'}"
    )
    return ok


def validate_denoise() -> bool:
    """config11 (round 5): the a-trous/SVGF denoiser as a hardware-proven
    citizen (VERDICT r4 item 2). Protocol: the PRODUCTION 2-spp frame
    (grid megakernel, the same call `--scene rtiow --spp 2 --denoise`
    makes) denoised against the deterministic AOV G-buffer, judged on
    gamma-2 tonemapped floats against a CONVERGED kernel render:

    - the filter must remove >= 28% of the 2-spp error (rmse_den <
      0.72 x rmse_raw), and
    - land within an absolute budget rmse_den <= 0.08.

    Calibration (CPU, same math): raw 0.093, denoised 0.060 (a 36% cut;
    the deliberately-pinhole guides under-filter this scene's DEFOCUSED
    regions — the standard SVGF trade, render/aov.py docstring — and the
    lattice's 1-2 px spheres bound what any guided filter can remove).
    The thresholds leave ~30% headroom on both.
    """
    from csgrenderer_tpu.camera import Camera
    from csgrenderer_tpu.kernels import render_image_pallas
    from csgrenderer_tpu.models import rtiow_final_scene
    from csgrenderer_tpu.render import atrous_denoise, render_aovs

    s = rtiow_final_scene()
    cam = Camera.look_at((13, 2, 3), (0, 0, 0), vfov_degrees=20.0,
                         aspect_ratio=128 / 72, aperture=0.1,
                         focus_dist=10.0)

    def kernel(seed, spp, off=0):
        img, _ = render_image_pallas(
            s, cam, 128, 72, spp=spp, max_bounces=8, seed=seed,
            lens=True, sample_offset=off)
        return img

    import jax.numpy as _jnp

    raw_lin = kernel(11, 2)
    aovs = render_aovs(s.nearest_hit, cam, 128, 72, sky="rtiow")
    den_lin = atrous_denoise(_jnp.asarray(raw_lin, _jnp.float32), aovs)
    conv = _tonemapped(_chunked(kernel, 907, 4096, 2048))
    raw_t = _tonemapped(raw_lin)
    den_t = _tonemapped(den_lin)
    rmse_raw = _rmse(raw_t, conv)
    rmse_den = _rmse(den_t, conv)
    ok = rmse_den < 0.72 * rmse_raw and rmse_den <= 0.08
    print(
        f"[csgr] config11_denoise2spp: rmse_raw={rmse_raw:.3f} "
        f"rmse_denoised={rmse_den:.3f} (budget 0.08, and < 0.72x raw) "
        f"{'OK' if ok else 'FAIL'}"
    )
    return ok


def validate_milestone01() -> bool:
    """Config 1 is DETERMINISTIC (spp=1, fixed raygen): its production
    path is the bit-faithful jnp milestone-01 shader re-expression, so the
    1e-3 criterion is provable directly against the committed golden with
    zero MC noise."""
    from csgrenderer_tpu.app.renderers import WololoRenderer
    from csgrenderer_tpu.io import image as image_io
    from csgrenderer_tpu.utils.config import RenderConfig

    golden_dir = (
        pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
    )
    r = WololoRenderer(RenderConfig(width=320, height=240, spp=1, sky="wololo"))
    fresh = np.asarray(r.draw_frame(0.25)).astype(np.float64) / 255
    golden = (
        image_io.read_png(golden_dir / "config1_milestone01.png").astype(
            np.float64
        )
        / 255
    )
    err = _rmse(fresh, golden)
    ok = err <= RMSE_TOL
    print(
        f"[csgr] config1_milestone01: deterministic, "
        f"rmse_vs_reference={err:.2e} {'OK' if ok else 'FAIL'}"
    )
    return ok


def validate_converged(cfg: Config) -> bool:
    # phase 1: noise certificate (kernel, two independent seeds)
    spp = cfg.spp0
    while True:
        a = _tonemapped(cfg.kernel_fn(11, spp))
        b = _tonemapped(cfg.kernel_fn(1211, spp))
        noise = _rmse(a, b) / np.sqrt(2.0)
        next_spp = spp * 2
        over_budget = (
            cfg.w * cfg.h * next_spp * (cfg.bounces * 0.6) > MAX_SEGMENTS
        )
        if noise <= NOISE_TARGET or next_spp > cfg.max_spp or over_budget:
            break
        spp = next_spp
    # phase 2: fidelity vs the jnp reference, same seed/spp
    t0 = time.time()
    from csgrenderer_tpu.render import tonemap as _tm
    import jax.numpy as _jnp

    ref_lin = _chunked(cfg.ref_fn, 11, spp, cfg.ref_chunk)
    ref = np.asarray(_tm.tonemap(_jnp.asarray(ref_lin, _jnp.float32),
                                 gamma=2.0), np.float64)
    ref_sec = time.time() - t0
    err = _rmse(a, ref)
    # same-seed comparison: identical RNG streams, so MC noise largely
    # cancels and err directly measures implementation divergence; noise
    # must still fit the 1e-3 budget for the images to count as converged
    ok = noise <= NOISE_BUDGET and err <= RMSE_TOL
    print(
        f"[csgr] {cfg.name}: spp={spp} noise={noise:.2e} "
        f"rmse_vs_reference={err:.2e} (ref render {ref_sec:.0f}s) "
        f"{'OK' if ok else 'FAIL'}"
    )
    return ok


def validate_goldens() -> bool:
    """Quick regression vs the committed CPU goldens (low spp: bounded by
    MC path-flip noise, NOT the fidelity criterion — see module docstring).
    """
    from csgrenderer_tpu.io import image as image_io

    golden_dir = (
        pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
    )
    from csgrenderer_tpu.app.renderers import PathTraceRenderer, WololoRenderer
    from csgrenderer_tpu.camera import Camera
    from csgrenderer_tpu.models import (
        animated_csg_scene,
        config3_csg_scene,
        rtiow_final_scene,
        two_spheres_scene,
    )
    from csgrenderer_tpu.utils.config import RenderConfig

    def c1():
        r = WololoRenderer(RenderConfig(width=320, height=240, spp=1, sky="wololo"))
        return np.asarray(r.draw_frame(0.25))

    def c2():
        cam = Camera.look_at((0, 0, 0), (0, 0, -1), vfov_degrees=90.0,
                             aspect_ratio=200 / 112)
        r = PathTraceRenderer(
            two_spheres_scene(), cam,
            RenderConfig(width=200, height=112, spp=8, max_bounces=8, seed=2),
        )
        return np.asarray(r.draw_frame(0.0))

    def c3():
        cam = Camera.look_at((3, 2.5, 4), (0.1, 0, 0), vfov_degrees=35.0,
                             aspect_ratio=1.0)
        r = PathTraceRenderer(
            config3_csg_scene().compile(), cam,
            RenderConfig(width=128, height=128, spp=8, max_bounces=6, seed=3),
        )
        return np.asarray(r.draw_frame(0.0))

    def c4():
        cam = Camera.look_at((13, 2, 3), (0, 0, 0), vfov_degrees=20.0,
                             aspect_ratio=160 / 90, aperture=0.1,
                             focus_dist=10.0)
        r = PathTraceRenderer(
            rtiow_final_scene(), cam,
            RenderConfig(width=160, height=90, spp=4, max_bounces=8, seed=4,
                         lens=True),
        )
        return np.asarray(r.draw_frame(0.0))

    def c5():
        graph, animate = animated_csg_scene(n_levels=8)
        cam = Camera.look_at((0, 2.0, 7.0), (0.5, 0, 0), vfov_degrees=40.0,
                             aspect_ratio=1.0)
        r = PathTraceRenderer(
            graph.compile(), cam,
            RenderConfig(width=128, height=128, spp=2, max_bounces=5, seed=5),
            animate=animate,
        )
        return np.asarray(r.draw_frame(1.0))

    ok = True
    for name, fn in {
        "config1_milestone01": c1, "config2_two_spheres": c2,
        "config3_csg_boolean": c3, "config4_rtiow_final": c4,
        "config5_animated_csg": c5,
    }.items():
        golden = (
            image_io.read_png(golden_dir / f"{name}.png").astype(np.float64)
            / 255
        )
        fresh = fn().astype(np.float64) / 255
        err = _rmse(fresh, golden)
        frac = float((np.abs(fresh - golden).max(axis=-1) > 0.1).mean())
        good = err <= 0.02 and frac <= 0.015
        ok &= good
        print(f"[csgr] golden {name}: rmse={err:.4f} divergent={frac:.3%} "
              f"{'OK' if good else 'FAIL'}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="golden regression only (loose, fast)")
    ap.add_argument("--only", default=None,
                    help="comma list of config substrings to run")
    args = ap.parse_args()

    import jax

    platform = jax.devices()[0].platform
    print(f"[csgr] validating on {jax.devices()} (platform={platform})")

    def selected(name):
        return args.only is None or any(
            s in name for s in args.only.split(",")
        )

    if args.quick:
        ok = validate_goldens()
    else:
        ok = validate_milestone01() if selected("config1") else True
        for cfg in build_configs():
            if not selected(cfg.name):
                continue
            try:
                ok &= validate_converged(cfg)
            except Exception as e:  # keep going: tunnel hiccups happen
                print(f"[csgr] {cfg.name}: CRASH {type(e).__name__}: "
                      f"{str(e)[:200]}")
                ok = False
        if selected("config10"):
            try:
                ok &= validate_hbm_245k()
            except Exception as e:
                print(f"[csgr] config10_meshhbm245k: CRASH "
                      f"{type(e).__name__}: {str(e)[:200]}")
                ok = False
        if selected("config11"):
            try:
                ok &= validate_denoise()
            except Exception as e:
                print(f"[csgr] config11_denoise2spp: CRASH "
                      f"{type(e).__name__}: {str(e)[:200]}")
                ok = False
    print(f"[csgr] hardware validation {'PASSED' if ok else 'FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
