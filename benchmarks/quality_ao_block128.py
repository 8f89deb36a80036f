"""CPU quality probe: interleave block 64 vs 128 at 512² (the r5 TPU
sweep measured ao_block=128 at −2.0 ms on the 1080p headline; 512²
holds the full 4×4 pattern grid at block 128). Converged-AO error vs
the per-pixel blue-noise estimator + post-convergence flicker, static
camera, 16 frames — the same method as quality_ao_block64.py.

Run: python - < benchmarks/quality_ao_block128.py   (CPU backend)
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

W = H = 512
FRAMES = 16
host = scenes.stress_scene(num_objects=24)
data = host.build()
cam_kw = dict(distance=22.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

FLAGS = (RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
         | RenderFlags.AO | RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
         | RenderFlags.SVGF_SPATIAL)


def converged(ao_interleaved, block):
    s = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                       flags=FLAGS, display_mode=DisplayMode.AO,
                       ao_interleaved=ao_interleaved, ao_block=block)
    r = Renderer.for_scene(s, data)
    cam = OrbitCamera(width=W, height=H, **cam_kw)
    c = cam.step(taa_enabled=False)
    prev = None
    for _ in range(FRAMES):
        img = r.render_np(c)
        flick = float(np.abs(img - prev).mean()) if prev is not None else 0.0
        prev = img
    return prev, flick


ref, ref_flick = converged(False, 8)
print(json.dumps({"probe": "ref_perpixel", "flicker": round(ref_flick, 5)}),
      flush=True)
for b in (64, 128):
    img, flick = converged(True, b)
    err = float(np.abs(img - ref).mean())
    p99 = float(np.percentile(np.abs(img - ref), 99))
    print(json.dumps({"probe": f"block{b}",
                      "mean_abs_err_vs_perpixel": round(err, 5),
                      "p99": round(p99, 5),
                      "flicker": round(flick, 5)}), flush=True)
print("EXIT=0", flush=True)
