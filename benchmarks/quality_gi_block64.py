"""CPU quality probe: GI interleave block 32 vs 64 vs per-pixel at 256².

Mirror of quality_ao_block64.py for the diffuse-GI signal (the gi_block
default shares ao_block's interleaving machinery but bounces radiance,
so its block-size error profile needs its own measurement). Converged
GI display-mode error vs the per-pixel cosine estimator
(gi_interleaved=False) + post-convergence flicker, static camera, 16
frames.

Run: python - < benchmarks/quality_gi_block64.py   (CPU backend)
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

W = H = 256
FRAMES = 16
host = scenes.stress_scene(num_objects=24)
data = host.build()
cam_kw = dict(distance=22.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

FLAGS = (RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
         | RenderFlags.GI | RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
         | RenderFlags.SVGF_SPATIAL)


def converged(gi_interleaved, block):
    s = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                       flags=FLAGS, display_mode=DisplayMode.GI,
                       gi_interleaved=gi_interleaved, gi_block=block)
    r = Renderer.for_scene(s, data)
    cam = OrbitCamera(width=W, height=H, **cam_kw)
    c = cam.step(taa_enabled=False)  # static camera: pure accumulation
    prev = None
    for _ in range(FRAMES):
        img = r.render_np(c)
        flick = float(np.abs(img - prev).mean()) if prev is not None else 0.0
        prev = img
    return prev, flick


ref, ref_flick = converged(False, 8)
print(json.dumps({"probe": "ref_perpixel", "flicker": round(ref_flick, 5)}),
      flush=True)
for b in (32, 64):
    img, flick = converged(True, b)
    err = float(np.abs(img - ref).mean())
    print(json.dumps({"probe": f"block{b}",
                      "mean_abs_err_vs_perpixel": round(err, 5),
                      "flicker": round(flick, 5)}), flush=True)
print("EXIT=0", flush=True)
