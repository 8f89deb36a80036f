"""Round-2 TPU batch 47, ONE process: traversal knob re-sweep IN-FRAME
under the v4-era headline (rays are now ~56 of the 102 ms frame).

WIDE_CHUNK_STEPS=8 / WIDE_NPK=2 were tuned in isolated probes
(batches 14/26) before the raster-side landings; both are resolved at
call time outside the jit, so frame-level A/Bs just retrace.

  head_cs8_npk2   control (expect ~102)
  head_cs4_npk2 / head_cs16_npk2 / head_cs8_npk1 / head_cs8_npk4

Run from the repo dir: python - < benchmarks/r2_batch47.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

data = scenes.stress_scene(num_objects=250).build()
W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV


def burst_ms(k=8, bursts=2):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=HEAD)
    r = Renderer.for_scene(st, data)
    c = OrbitCamera(width=W, height=H, **cam_kw)

    def steps(n):
        out = []
        for _ in range(n):
            out.append(c.step(taa_enabled=True))
            c.orbit(0.01, 0.0)
        return out

    out = r.render_burst(steps(k))
    out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    t0 = time.perf_counter()
    for _ in range(bursts):
        out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    return round(1000.0 * (time.perf_counter() - t0) / (bursts * k), 2)


def probe(cs, npk):
    os.environ["WIDE_CHUNK_STEPS"] = str(cs)
    os.environ["WIDE_NPK"] = str(npk)
    name = f"head_cs{cs}_npk{npk}"
    try:
        print(json.dumps({"probe": name, "val": burst_ms()}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


probe(8, 2)    # control
probe(4, 2)
probe(16, 2)
probe(8, 1)
probe(8, 4)
print("EXIT=0", flush=True)
