"""Round-2 TPU batch 29, ONE process: G-buffer attribute ride-along.

The raster kernel now streams each candidate's 72-float attribute row
with the record (one-hot MXU picks + numerator-lerp matmuls, transposed
(C, P) so outputs land channel-major) and emits the winner's
interpolated G-buffer attributes directly — replacing the ~48 ms
per-pixel attr_rows gather (batch 20/22) with in-kernel work.

Rungs (1080p stress, in-process A/B):
  base_join     BASE flags, GBUFFER_FETCH=join (the batch-23 default)
  base_kernel   BASE flags, ride-along
  head_join     headline hybrid flags, join
  head_kernel   headline, ride-along
  head_kb32     headline, ride-along + ao_block=32 (batch-27 winner)
  fullg_kb32    full graph (REFLECTION|GI), ride-along + blocks=32

Run from the repo dir: python - < benchmarks/r2_batch29.py
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
W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def burst_ms(settings, fetch, k=8, bursts=2):
    os.environ["GBUFFER_FETCH"] = fetch
    r = Renderer.for_scene(settings, data)
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
    return 1000.0 * (time.perf_counter() - t0) / (bursts * k)


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def st(flags, **kw):
    return RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                          flags=flags, **kw)


guard("base_join", lambda: burst_ms(st(BASE), "join"))
guard("base_kernel", lambda: burst_ms(st(BASE), "kernel"))
guard("head_join", lambda: burst_ms(st(HEAD), "join"))
guard("head_kernel", lambda: burst_ms(st(HEAD), "kernel"))
guard("head_kb32", lambda: burst_ms(st(HEAD, ao_block=32), "kernel"))
guard("fullg_kb32", lambda: burst_ms(
    st(FULL, ao_block=32, gi_block=32), "kernel", k=4, bursts=1))
print("EXIT=0", flush=True)
