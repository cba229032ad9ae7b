"""Hardware bit-identity check for the stream-service permutation knobs.

The sublane page-sort (CSGR_STREAM_SORT) and the per-group HBM vote
(CSGR_HBM_VOTE=block) claim BIT-IDENTICAL images — the service is
lane-independent and the sort only permutes its inputs/outputs (page
SCHEDULES differ, face data must not). This renders the config8-class
15k stream scene and the config9-class forced-HBM scene twice on the
attached device and asserts exact float equality, which is both stronger
and ~100x cheaper than the converged-noise protocol (tools/validate_tpu
config8-10 prove fidelity; this proves the knobs change nothing at all).

The knobs are read at TRACE time, so each variant runs in a subprocess.

Run: python tools/check_sort_identity.py
"""

import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

_CHILD = r"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path('.').resolve()))
import numpy as np
sys.path.insert(0, 'demos')
from demo7_mesh import build_scene
from csgrenderer_tpu.camera import Camera
from csgrenderer_tpu.kernels import render_image_mesh_pallas

which = sys.argv[1]
if which == 'stream15k':
    m = build_scene(subdiv=4)
else:  # hbm (forced on the 3.8k mesh, the config9 recipe)
    from csgrenderer_tpu.kernels import tri_worklist as twl
    m = build_scene(subdiv=3)
    twl._STREAM_TABLE_BYTES = 1
cam = Camera.look_at((0.0, 1.6, 2.2), (0.0, 0.7, -2.6),
                     vfov_degrees=45.0, aspect_ratio=64 / 36)
img, _ = render_image_mesh_pallas(
    m, cam, 64, 36, spp=256, max_bounces=6, seed=11,
    worklist='stream', gather_pages=2)
np.save(sys.argv[2], np.asarray(img, np.float32))
"""


def run(which, out, env_extra):
    env = dict(os.environ)
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, "-u", "-c", _CHILD, which, out],
        env=env, capture_output=True, text=True, timeout=900,
    )
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        raise SystemExit(f"child failed: {which} {env_extra}")


def main():
    import numpy as np

    ok = True
    for which, envs in (
        ("stream15k", [{"CSGR_STREAM_SORT": "0"},
                       {"CSGR_STREAM_SORT": "1"}]),
        ("hbm", [{"CSGR_STREAM_SORT": "0", "CSGR_HBM_VOTE": "global"},
                 {"CSGR_STREAM_SORT": "1", "CSGR_HBM_VOTE": "block"}]),
    ):
        outs = []
        for i, e in enumerate(envs):
            out = f"/tmp/sortid_{which}_{i}.npy"
            run(which, out, e)
            outs.append(np.load(out))
        same = bool((outs[0] == outs[1]).all())
        print(f"[csgr] sort-identity {which}: "
              f"{'BIT-IDENTICAL' if same else 'MISMATCH'} "
              f"(max abs diff {np.abs(outs[0] - outs[1]).max():.3e})")
        ok &= same
    print(f"[csgr] sort-identity {'PASSED' if ok else 'FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
