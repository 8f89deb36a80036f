"""Round-2 TPU batch 28, ONE process: textured-scene cost ladder.

The texture path was the last unmeasured gather cliff (BENCH.md ledger
item 4): every textured pixel paid 16 row gathers in get_material_point
+ apply_normal_map (4 slots x 4 bilinear taps), even for slots no
material binds (clamped-id gathers). Two fixes to price:

  - STATIC slot gating (TextureStack.slot_usage): unused slots skip
    their gathers entirely (stress_textured binds colour only: 16 -> 4)
  - quad-texel layout (TextureStack.quads): bilinear = ONE gather of a
    baked 2x2-footprint row (4 -> 1)

Rungs (headline hybrid flags, 1080p, in-process A/B):
  head_plain   untextured stress scene (reference point)
  tex_old      textured, all-slot 4-tap (round-1 behavior, forced)
  tex_gate     textured, slot gating only (no quads)
  tex_quad     textured, gating + quads (new default)

Run from the repo dir: python - < benchmarks/r2_batch28.py
"""
import dataclasses
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

W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV

plain = scenes.stress_scene(num_objects=250).build()

host_tex = scenes.stress_scene(num_objects=250, textured=True)
host_tex.texture_quads = False
tex_gate = host_tex.build()
# round-1 behavior: every slot gathered, 4-tap bilinear
tex_old = dataclasses.replace(
    tex_gate, textures=dataclasses.replace(
        tex_gate.textures, slot_usage=(True, True, True, True)))
host_tex.texture_quads = True
tex_quad = host_tex.build()


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def burst_ms(data, k=8, bursts=2):
    settings = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                              flags=HEAD)
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


guard("head_plain", lambda: burst_ms(plain))
guard("tex_old", lambda: burst_ms(tex_old))
guard("tex_gate", lambda: burst_ms(tex_gate))
guard("tex_quad", lambda: burst_ms(tex_quad))
print("EXIT=0", flush=True)
