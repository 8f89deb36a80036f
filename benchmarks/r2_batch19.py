"""Round-2 TPU batch 19, ONE process: dispatch-overhead attribution.

Batch 18: fused BASE math = 88.8 ms but the Renderer BASE rung = 127.3
(graph knobs ~1 ms) — suspect: per-dispatch overhead paid by each
single render() call in the probe harness (the batch frame_ms probes
dispatch 8 separate frames; bench.py defaults to burst-8). A/B single
vs burst-8 at 1080p for BASE and headline, same process.

Run from the repo dir: python - < benchmarks/r2_batch19.py
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

host = scenes.stress_scene(num_objects=250)
data = host.build()
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def single_ms(settings, frames=8):
    r = Renderer.for_scene(settings, data)
    c = OrbitCamera(width=settings.width, height=settings.height, **cam_kw)
    out = r.render(c.step(taa_enabled=True))
    out = r.render(c.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        c.orbit(0.01, 0.0)
        out = r.render(c.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / frames


def burst_ms(settings, k=8, bursts=2):
    r = Renderer.for_scene(settings, data)
    c = OrbitCamera(width=settings.width, height=settings.height, **cam_kw)

    def steps(n):
        out = []
        for _ in range(n):
            out.append(c.step(taa_enabled=True))
            c.orbit(0.01, 0.0)
        return out

    out = r.render_burst(steps(k))      # cold (history invalid variant)
    out = r.render_burst(steps(k))      # warm variant
    _ = np.asarray(out[-1, 0, 0])
    t0 = time.perf_counter()
    for _ in range(bursts):
        out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    return 1000.0 * (time.perf_counter() - t0) / (bursts * k)


for name, flags in (("base", BASE), ("head", HEAD)):
    st = RenderSettings(width=1920, height=1080, path=RenderPathType.HYBRID,
                        flags=flags)
    for mode, fn in (("single", single_ms), ("burst8", burst_ms)):
        try:
            report(f"{name}1080_{mode}", fn(st))
        except Exception as e:
            print(json.dumps({"probe": f"{name}1080_{mode}",
                              "error": repr(e)[:250]}), flush=True)
            time.sleep(120)
