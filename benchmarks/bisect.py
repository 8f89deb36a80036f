"""Fused flag-bisect: ms/frame for a ladder of flag combos in ONE process
(one compile each), attributing frame cost to passes. Env:
BISECT_WIDTH/HEIGHT/SCENE/OBJECTS/FRAMES.
"""
import json
import os
import time

import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

W = int(os.environ.get("BISECT_WIDTH", "1920"))
H = int(os.environ.get("BISECT_HEIGHT", "1080"))
FRAMES = int(os.environ.get("BISECT_FRAMES", "8"))
scene_name = os.environ.get("BISECT_SCENE", "stress")
n_obj = int(os.environ.get("BISECT_OBJECTS", "250"))

if scene_name == "stress":
    host = scenes.stress_scene(num_objects=n_obj)
elif scene_name == "cornell":
    host = scenes.cornell_scene()
else:
    host = scenes.cube_scene()
data = host.build()

SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL | RenderFlags.SVGF_SPATIAL)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
LADDER = [
    ("raster_only", BASE),
    ("+shadow", BASE | RenderFlags.SHADOW),
    ("+shadow+ao", BASE | RenderFlags.SHADOW | RenderFlags.AO),
    ("+shadow+ao+svgf", BASE | RenderFlags.SHADOW | RenderFlags.AO | SV),
]

for name, flags in LADDER:
    settings = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                              flags=flags)
    r = Renderer.for_scene(settings, data)
    cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                      focal_point=(0, 2.0, 0))
    out = r.render(cam.step())
    out = r.render(cam.step())
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        cam.orbit(0.01, 0.0)
        out = r.render(cam.step())
    _ = np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / FRAMES
    print(json.dumps({"cfg": name, "ms": round(dt * 1000, 1)}), flush=True)
