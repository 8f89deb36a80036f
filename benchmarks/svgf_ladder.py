"""Fine-grained in-frame SVGF cost attribution at 1080p stress: ladder
over temporal-only / spatial-only / both, plus a jitter-only rung (the
SVGF flag also enables raster jitter)."""
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

host = scenes.stress_scene(num_objects=250)
data = host.build()

BASE = (RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
        | RenderFlags.SHADOW | RenderFlags.AO)
LADDER = [
    ("shadow_ao", BASE),
    ("+taa_jitter_only", BASE | RenderFlags.TAA),
    ("+svgf_temporal", BASE | RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL),
    ("+svgf_spatial", BASE | RenderFlags.SVGF | RenderFlags.SVGF_SPATIAL),
    ("+svgf_both", BASE | RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
     | RenderFlags.SVGF_SPATIAL),
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
