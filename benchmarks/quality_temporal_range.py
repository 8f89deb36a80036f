"""CPU quality probe: temporal sweep radius 8 vs 4 under camera motion.

The windowed temporal kernel resolves footprint-base residuals in
[0, range); pixels outside fall back to "no history". range=4 quarters
the candidate sweep — this probe measures what it costs: the AO image
after FRAMES orbiting frames vs the exact per-pixel gather reference,
at a typical orbit speed and a fast one.

Run: python - < benchmarks/quality_temporal_range.py   (CPU backend)
"""
import json
import sys
import os

sys.path.insert(0, os.getcwd())

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import (DisplayMode, RenderFlags,
                                           RenderPathType)
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

W = H = 128
FRAMES = 12
host = scenes.stress_scene(num_objects=24)
data = host.build()
cam_kw = dict(distance=22.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

FLAGS = (RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
         | RenderFlags.AO | RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
         | RenderFlags.SVGF_SPATIAL)


def run(gather, rng, orbit_step):
    s = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                       flags=FLAGS, display_mode=DisplayMode.AO,
                       svgf_temporal_gather=gather,
                       svgf_temporal_range=rng)
    r = Renderer.for_scene(s, data)
    cam = OrbitCamera(width=W, height=H, **cam_kw)
    img = None
    for _ in range(FRAMES):
        img = r.render_np(cam.step(taa_enabled=False))
        cam.orbit(orbit_step, 0.0)
    return img


for speed, orbit in (("typical", 0.01), ("fast", 0.05)):
    ref = run("pixel", 8, orbit)
    for rng in (8, 4):
        img = run("tile_interpret", rng, orbit)
        err = float(np.abs(img - ref).mean())
        mx = float(np.abs(img - ref).max())
        print(json.dumps({"probe": f"{speed}_range{rng}",
                          "mean_abs_err_vs_pixel": round(err, 5),
                          "max_abs_err": round(mx, 4)}), flush=True)
print("EXIT=0", flush=True)
