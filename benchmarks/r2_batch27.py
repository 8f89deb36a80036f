"""Round-2 TPU batch 27, ONE process: interleave block-size sweep.

A 32×32-pixel traversal packet spans (32/block)² interleave patterns:
block=8 (current default) mixes 16 directions per packet, block=32
gives each packet ONE direction AND a compact origin — the combination
pattern-major layout could not deliver (batch 26: pattern 518 vs tile
472). Frame-level A/B, in-process baselines first:

  head_b8 / head_b16 / head_b32      ao_block sweep (headline)
  fullg_b8 / fullg_b16 / fullg_b32   ao_block+gi_block sweep (full graph)

Run from the repo dir: python - < benchmarks/r2_batch27.py
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


def burst_ms(settings, k=8, bursts=2):
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


for b in (8, 16, 32):
    guard(f"head_b{b}", lambda b=b: burst_ms(st(HEAD, ao_block=b)))
for b in (8, 16, 32):
    guard(f"fullg_b{b}", lambda b=b: burst_ms(
        st(FULL, ao_block=b, gi_block=b), k=4, bursts=1))
print("EXIT=0", flush=True)
