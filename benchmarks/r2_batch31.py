"""Round-2 TPU batch 31, ONE process: occlusion gating + config refresh.

_shade_hit now skips sun/NEE occlusion traversals for hits facing away
from the light (zero-BRDF rays; SHADE_OCC_GATE=0 restores the
trace-everything reference behavior). A/B that on the full graph, then
refresh the secondary configs with the round's accumulated defaults
(ride-along kernel attrs + soup clip + block32 pending quality gate):

  fullg_nogate / fullg_gate   full graph (REFLECTION|GI), b32
  refl_only / gi_only         HEAD|REFLECTION vs HEAD|GI (b32) split
  fwd1080                     forward path + TAA
  sponza_head                 headline flags @1000 objects (~261k tris)

Run from the repo dir: python - < benchmarks/r2_batch31.py
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
FWD = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.TAA


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def burst_ms(settings, sc=None, k=8, bursts=2, gate="1"):
    os.environ["SHADE_OCC_GATE"] = gate
    r = Renderer.for_scene(settings, sc if sc is not None else data)
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
    kw.setdefault("ao_block", 32)
    kw.setdefault("gi_block", 32)
    return RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                          flags=flags, **kw)


guard("fullg_nogate", lambda: burst_ms(st(FULL), k=4, bursts=1, gate="0"))
guard("fullg_gate", lambda: burst_ms(st(FULL), k=4, bursts=1))
guard("refl_only", lambda: burst_ms(st(HEAD | RenderFlags.REFLECTION),
                                    k=4, bursts=1))
guard("gi_only", lambda: burst_ms(st(HEAD | RenderFlags.GI),
                                  k=4, bursts=1))
guard("fwd1080", lambda: burst_ms(
    RenderSettings(width=W, height=H, path=RenderPathType.FORWARD,
                   flags=FWD)))
big = scenes.stress_scene(num_objects=1000).build()
guard("sponza_head", lambda: burst_ms(st(HEAD), sc=big, k=4, bursts=1))
print("EXIT=0", flush=True)
