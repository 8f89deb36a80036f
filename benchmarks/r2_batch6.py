"""Round-2 TPU batch 6, ONE process:

  1. 64^2 floor attribution rungs (the ~50 ms in-executable floor).
  2. AO packet layout A/B at 1080p: pattern vs tile (host sim says tile
     unions are 1.19x smaller even for interleaved AO).
  3. Capacity row: ~1M-tri stress scene on the wide kernel (bf16
     quantization auto-kicks when f32 exceeds the VMEM budget) —
     VERDICT #1 "arbitrary scene size" evidence.

Run from the repo dir: python - < benchmarks/r2_batch6.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
HYB = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))


def frame_ms(settings, dat=None, frames=16):
    r = Renderer.for_scene(settings, dat if dat is not None else data)
    cam = OrbitCamera(width=settings.width, height=settings.height, **cam_kw)
    out = r.render(cam.step(taa_enabled=True))
    out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        cam.orbit(0.01, 0.0)
        out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / frames


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def S(w, h, path, flags, **kw):
    return RenderSettings(width=w, height=h, path=path, flags=flags, **kw)


print("=== part 1: floor attribution at 64^2 ===", flush=True)
report("fwd64", frame_ms(S(64, 64, RenderPathType.FORWARD,
                           RenderFlags.LIGHT | RenderFlags.IBL
                           | RenderFlags.TAA)))
report("base64", frame_ms(S(64, 64, RenderPathType.HYBRID, BASE)))
report("base64_jnp_raster", frame_ms(
    S(64, 64, RenderPathType.HYBRID, BASE, raster_backend="jnp")))
report("base64_shadow", frame_ms(
    S(64, 64, RenderPathType.HYBRID, BASE | RenderFlags.SHADOW)))
report("base64_shadow_ao", frame_ms(
    S(64, 64, RenderPathType.HYBRID,
      BASE | RenderFlags.SHADOW | RenderFlags.AO)))
report("hybrid64_full", frame_ms(S(64, 64, RenderPathType.HYBRID, HYB)))

print("=== part 2: AO layout pattern vs tile (1080p) ===", flush=True)
report("ao_rung_pattern", frame_ms(
    S(1920, 1080, RenderPathType.HYBRID,
      BASE | RenderFlags.SHADOW | RenderFlags.AO), frames=8))
report("ao_rung_tile", frame_ms(
    S(1920, 1080, RenderPathType.HYBRID,
      BASE | RenderFlags.SHADOW | RenderFlags.AO, ao_layout="tile"),
    frames=8))

print("=== part 3: ~1M-tri capacity (bf16 auto-quantize) ===", flush=True)
big = scenes.stress_scene(num_objects=4000).build()
print(json.dumps({"probe": "big_tris", "value": int(big.num_triangles)}),
      flush=True)
t0 = time.time()
ms = frame_ms(S(1920, 1080, RenderPathType.HYBRID,
                BASE | RenderFlags.SHADOW | RenderFlags.AO), dat=big,
              frames=4)
report("big_shadow_ao_1080p", ms)
