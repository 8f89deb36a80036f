"""Round-2 TPU batch 46, ONE process: round-end config refresh under the
v4 (transposed) raster kernel default — batch 45 accepted v4 with base
57.9->39.2 and headline 122.3->102.0; this stamps the other contract
configs.

  fwd1080      forward path + TAA (was 100.0, batch 39)
  fullg        REFLECTION|GI full graph (was 344.6, batch 42)
  sponza_head  1000-object (261k tris) headline (was 224.5, batch 42)

Run from the repo dir: python - < benchmarks/r2_batch46.py
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


def report(name, val):
    print(json.dumps({"probe": name, "val": val}), flush=True)


BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI
FWD = BASE | RenderFlags.SHADOW | RenderFlags.TAA


def burst_ms(flags, path, sc=None, k=8, bursts=2):
    st = RenderSettings(width=W, height=H, path=path, flags=flags)
    r = Renderer.for_scene(st, sc if sc is not None else data)
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


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


guard("head_ctl", lambda: burst_ms(HEAD, RenderPathType.HYBRID))
guard("fwd1080", lambda: burst_ms(FWD, RenderPathType.FORWARD))
guard("fullg", lambda: burst_ms(FULL, RenderPathType.HYBRID, k=4, bursts=1))
big = scenes.stress_scene(num_objects=1000).build()
guard("sponza_head",
      lambda: burst_ms(HEAD, RenderPathType.HYBRID, sc=big, k=4, bursts=1))
print("EXIT=0", flush=True)
