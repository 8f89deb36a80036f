"""Round-2 TPU batch 34, ONE process: where do the radiance passes'
IN-FRAME costs live?

Batch 33 measured trace_radiance isolated at ~77 ms (reflection) /
~75 ms (interleaved GI), yet the frame adds ~122/~126 ms per pass
(batch 31). Candidates for the ~45-50 ms gap: the per-signal SVGF
chains (2 more full chains with history saves), composition reads, or
reduced in-frame overlap. Bisect by toggling the SVGF flags around the
radiance flags (all frame rungs, same process):

  head_sv      HEAD (control, ~139-141)
  head_nosv    HEAD without SVGF flags (raw signals to composition)
  headr_nosv   + REFLECTION, no SVGF  → raw reflection in-frame add
  headg_nosv   + GI, no SVGF          → raw GI in-frame add
  headr_sv     + REFLECTION, with SVGF (control vs batch 31's 261.1)
  fullg_sv     FULL control

Run from the repo dir: python - < benchmarks/r2_batch34.py
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
HEAD_RAW = BASE | RenderFlags.SHADOW | RenderFlags.AO
HEAD = HEAD_RAW | SV


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def burst_ms(flags, k=4, bursts=1):
    s = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                       flags=flags)
    r = Renderer.for_scene(s, data)
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


guard("head_sv", lambda: burst_ms(HEAD))
guard("head_nosv", lambda: burst_ms(HEAD_RAW))
guard("headr_nosv", lambda: burst_ms(HEAD_RAW | RenderFlags.REFLECTION))
guard("headg_nosv", lambda: burst_ms(HEAD_RAW | RenderFlags.GI))
guard("headr_sv", lambda: burst_ms(HEAD | RenderFlags.REFLECTION))
guard("fullg_sv", lambda: burst_ms(
    HEAD | RenderFlags.REFLECTION | RenderFlags.GI))
print("EXIT=0", flush=True)
