"""Round-4 TPU batch 10, ONE process: textured-frame overhead bisect.

Batch 8 left ~52 ms of textured-head overhead at 128² textures (table
4 MB, isolated 2M-sample cost 9.5 ms) unexplained. Split it:
  head_plain        — untextured anchor
  headtex_noslots   — textured scene, HR_SLOT_MASK=0000 compiles out
                      every sample site (structural cost only: scene
                      layout, material ids, XLA scheduling shifts)
  headtex_ctl       — textured default (structural + sample sites)
If ctl − noslots >> 9.5 ms the albedo gather's IN-FRAME cost exceeds
its isolated cost (fusion/materialization fallout around the gather),
and the fix is scheduling-shaped, not table-shaped.

Run from the repo dir: python benchmarks/r4_batch10.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes


def chip_health(max_waits=6):
    a = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def mm(x):
        def body(_, c):
            return c @ c * 1e-9 + a
        return jax.lax.fori_loop(0, 8, body, x)

    for attempt in range(max_waits):
        r = mm(a)
        _ = np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = mm(a)
        _ = np.asarray(r[0, 0])
        ms = (time.perf_counter() - t0) * 1e3
        print(json.dumps({"info": "chip_health_ms", "value": round(ms, 1),
                          "attempt": attempt}), flush=True)
        if ms < 60.0:
            return
        time.sleep(600)


chip_health()

W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV


def burst_ms(data, flags, k=4, **skw):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags, **skw)
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
    out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    return 1000.0 * (time.perf_counter() - t0) / k


def guard(name, fn):
    try:
        print(json.dumps({"probe": name, "ms": round(fn(), 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


data_plain = scenes.stress_scene(num_objects=250).build()
guard("head_plain", lambda: burst_ms(data_plain, HEAD))

os.environ["HR_SLOT_MASK"] = "0000"
data_tex_ns = scenes.stress_scene(num_objects=250, textured=True).build()
assert data_tex_ns.textures.slot_usage == (False, False, False, False)
guard("headtex_noslots", lambda: burst_ms(data_tex_ns, HEAD))
del os.environ["HR_SLOT_MASK"]

data_tex = scenes.stress_scene(num_objects=250, textured=True).build()
guard("headtex_ctl", lambda: burst_ms(data_tex, HEAD))
guard("head_plain2", lambda: burst_ms(data_plain, HEAD))
print("EXIT=0", flush=True)
