"""One-command hardware validation: all five configs on the real TPU.

Renders each golden config through the production path (Pallas kernels where
applicable) on the attached accelerator and compares against the committed
CPU-rendered goldens. Pass criteria are looser than the CPU golden tests
(1e-3): kernel-vs-reference float-grouping and TPU transcendental-ulp
differences flip a small fraction of sample paths, bounded here at
RMSE <= 0.02 with <= 1.5% strongly-divergent pixels.

Run: python tools/validate_tpu.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from csgrenderer_tpu.app.renderers import PathTraceRenderer, WololoRenderer
from csgrenderer_tpu.camera import Camera
from csgrenderer_tpu.io import image
from csgrenderer_tpu.models import (
    animated_csg_scene,
    config3_csg_scene,
    rtiow_final_scene,
    two_spheres_scene,
)
from csgrenderer_tpu.utils.config import RenderConfig

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"

RMSE_TOL = 0.02
FRAC_TOL = 0.015


def configs():
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
            config3_csg_scene().compile(),
            cam,
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

    return {
        "config1_milestone01": c1,
        "config2_two_spheres": c2,
        "config3_csg_boolean": c3,
        "config4_rtiow_final": c4,
        "config5_animated_csg": c5,
    }


def main():
    import jax

    platform = jax.devices()[0].platform
    print(f"[csgr] validating on {jax.devices()} (platform={platform})")
    failures = 0
    for name, fn in configs().items():
        golden = image.read_png(GOLDEN_DIR / f"{name}.png").astype(np.float64) / 255
        fresh = fn().astype(np.float64) / 255
        err = float(np.sqrt(np.mean((fresh - golden) ** 2)))
        frac = float((np.abs(fresh - golden).max(axis=-1) > 0.1).mean())
        ok = err <= RMSE_TOL and frac <= FRAC_TOL
        failures += 0 if ok else 1
        print(
            f"[csgr] {name}: rmse={err:.4f} divergent={frac:.3%} "
            f"{'OK' if ok else 'FAIL'}"
        )
    print(f"[csgr] hardware validation {'PASSED' if not failures else 'FAILED'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
