"""Round-2 TPU batch 26, ONE process: npk2 + interleaved GI in-frame.

Batch 25 (isolated): npk2 beats npk4 on every ray type (+13..23%);
random cosine GI rays run 2.5 Mrays/s vs interleaved-AO's in-frame ~32.
This batch lands both in-frame:

  head1080          headline (npk2 default; shadow+AO+SVGF)
  fullg1080         full graph, gi_interleaved=True (new default), tile
  fullg1080_pat     same with gi_layout="pattern" (direction > origin?)
  fullg1080_pp      gi_interleaved=False (per-pixel reference draw) —
                    the regression guard number

Prior session baselines: head 177.3, fullg 1218 (per-pixel GI, npk4).
Run from the repo dir: python - < benchmarks/r2_batch26.py
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


guard("head1080", lambda: burst_ms(st(HEAD)))
guard("fullg1080", lambda: burst_ms(st(FULL), k=4, bursts=1))
guard("fullg1080_pat", lambda: burst_ms(st(FULL, gi_layout="pattern"),
                                        k=4, bursts=1))
guard("fullg1080_pp", lambda: burst_ms(st(FULL, gi_interleaved=False),
                                       k=4, bursts=1))
print("EXIT=0", flush=True)
