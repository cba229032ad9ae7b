"""Adaptive samples-per-pixel for the realtime loop — render to a noise
budget instead of a fixed spp (round 5; extends app/renderers.py
``render_to_noise`` from the offline path to the live one).

Because the realtime renderer draws FRESH noise every frame (advancing
``sample_offset`` under the counter-based RNG), two consecutive frames of a
static view are already an independent A/B pair at the current spp: their
rms difference on tonemapped floats estimates sqrt(2) x the per-frame
noise, for free — no extra render. Monte-Carlo noise scales as
1/sqrt(spp), so the controller steps the spp ladder by
``spp * (noise / target)^2``, clamped to powers of two (each rung is a
separate compiled program; the ladder keeps the set small and every rung's
compile is a one-time cost that the kernel wrappers' internal jit caches
retain across rung switches).

The controller gates each probe on (camera unchanged, spp unchanged)
between the pair's two frames — an orbit drag (app/controls.py) or a rung
switch invalidates the independence assumption, and the probe just waits
for the next stride.
"""

from __future__ import annotations

import numpy as np

from ..utils.config import RenderConfig
from .renderers import PathTraceRenderer


def next_pow2_spp(
    spp: int, noise: float, target: float,
    min_spp: int = 1, max_spp: int = 64,
) -> int:
    """Next spp rung for a measured per-frame ``noise`` vs ``target``.

    Pure ladder logic (unit-tested on CPU): ideal = spp*(noise/target)^2,
    rounded to the nearest power of two, moved at most ONE rung per probe
    (the estimate is a single-pair sample — damping beats oscillation),
    and held when within +-20% of target (hysteresis: a recompile-class
    change needs a real error signal).
    """
    if not np.isfinite(noise) or noise <= 0.0:
        return spp
    if 0.8 * target <= noise <= 1.2 * target:
        return spp
    ideal = spp * (noise / target) ** 2
    want = 1 << max(0, int(round(np.log2(max(ideal, 1e-9)))))
    if want > spp:
        nxt = spp * 2
    elif want < spp:
        nxt = spp // 2
    else:
        nxt = spp
    return int(min(max(nxt, min_spp), max_spp))


class AdaptiveSppRenderer:
    """Drop-in App renderer wrapping one ``PathTraceRenderer`` per spp rung.

    All rungs share one global sample offset, so the sample stream stays
    disjoint across rung switches (exact under the counter RNG — the same
    composition property render_to_noise and the sharded path rely on).
    """

    def __init__(
        self,
        scene,
        camera,
        config: RenderConfig,
        target: float = 0.02,
        probe_stride: int = 16,
        min_spp: int = 1,
        max_spp: int = 64,
        **renderer_kwargs,
    ):
        import dataclasses

        self._scene = scene
        self._camera = camera
        self._base_cfg = config
        self._kwargs = dict(renderer_kwargs)
        self._kwargs.setdefault("backend", "auto")
        self.target = float(target)
        self.probe_stride = max(2, int(probe_stride))
        self.min_spp = int(min_spp)
        self.max_spp = int(max_spp)
        self._rungs: dict[int, PathTraceRenderer] = {}
        self._offset = 0
        self._frame_idx = 0
        self._prev = None  # (np float image /255, spp, camera id)
        self.spp = int(config.spp)
        self.noise = float("nan")  # last measured per-frame noise
        self._replace = dataclasses.replace
        self.last_frame_rays = 0

    def _renderer(self, spp: int) -> PathTraceRenderer:
        r = self._rungs.get(spp)
        if r is None:
            cfg = self._replace(self._base_cfg, spp=spp)
            r = PathTraceRenderer(
                self._scene, self._camera, cfg, advance_samples=True,
                **self._kwargs,
            )
            self._rungs[spp] = r
        r.set_camera(self._camera)
        r._sample_offset = self._offset
        return r

    @property
    def config(self) -> RenderConfig:
        return self._replace(self._base_cfg, spp=self.spp)

    def set_camera(self, camera) -> None:
        self._camera = camera

    def reset_accumulation(self) -> None:  # orbit controller hook parity
        pass

    def _observe(self, img) -> None:
        """Feed the displayed frame to the probe; adjust spp on a pair."""
        self._frame_idx += 1
        probe_phase = self._frame_idx % self.probe_stride
        if probe_phase == 0:
            self._prev = (
                np.asarray(img, np.float32) / 255.0, self.spp,
                id(self._camera),
            )
            return
        if probe_phase == 1 and self._prev is not None:
            prev_img, prev_spp, prev_cam = self._prev
            self._prev = None
            if prev_spp != self.spp or prev_cam != id(self._camera):
                return  # pair not independent-identical; skip this probe
            cur = np.asarray(img, np.float32) / 255.0
            self.noise = float(
                np.sqrt(np.mean((cur - prev_img) ** 2))
            ) / np.sqrt(2.0)
            self.spp = next_pow2_spp(
                self.spp, self.noise, self.target,
                self.min_spp, self.max_spp,
            )

    def draw_frame(self, time_sec: float):
        r = self._renderer(self.spp)
        img = r.draw_frame(time_sec)
        self._offset = r._sample_offset
        self.last_frame_rays = r.last_frame_rays
        self._observe(img)
        return img

    def draw_frame_async(self, time_sec: float):
        # the probe needs host pixels: on probe frames fall back to a
        # synchronous draw (2 of every probe_stride frames); all others
        # stay fully async
        phase = (self._frame_idx + 1) % self.probe_stride
        r = self._renderer(self.spp)
        if phase in (0, 1):
            img = r.draw_frame(time_sec)
            self._offset = r._sample_offset
            self.last_frame_rays = r.last_frame_rays
            self._observe(img)
            return img, r.last_frame_rays
        img, rays = r.draw_frame_async(time_sec)
        self._offset = r._sample_offset
        self._frame_idx += 1
        return img, rays
