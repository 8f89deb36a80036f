"""Round-3 TPU batch 9b, ONE process: the 16-bit image-plane ladder.

head/fullg at: ctl (all f32) / svgf_bits=16 (bf16 SVGF history +
split-window temporal) / raster_attr_bits=16 (bf16 kernel attr planes)
/ both. Plus the bits16 quality bound (4-frame converged delta).
Reference formats: every SVGF image RGBA16F (SVGFPass.cpp:24-164),
G-buffer MRTs R8G8B8A8/RGBA16F (GBufferPass.cpp:24-56).
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

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI


def report(name, val, **kw):
    print(json.dumps({"probe": name, "ms": round(val, 2), **kw}),
          flush=True)


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def burst_ms(flags, k=4, **skw):
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


guard("head_ctl", lambda: burst_ms(HEAD))
guard("head_svgf16", lambda: burst_ms(HEAD, svgf_bits=16))
guard("head_attr16", lambda: burst_ms(HEAD, raster_attr_bits=16))
guard("head_both16", lambda: burst_ms(HEAD, svgf_bits=16,
                                      raster_attr_bits=16))
guard("base_ctl", lambda: burst_ms(BASE))
guard("base_attr16", lambda: burst_ms(BASE, raster_attr_bits=16))
guard("fullg_ctl", lambda: burst_ms(FULL, k=2))
guard("fullg_both16", lambda: burst_ms(FULL, k=2, svgf_bits=16,
                                       raster_attr_bits=16))


def quality(skw, name):
    outs = {}
    for tag, kw in (("ctl", {}), ("b16", skw)):
        st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                            flags=HEAD, **kw)
        r = Renderer.for_scene(st, data)
        c = OrbitCamera(width=W, height=H, **cam_kw)
        img = None
        for _ in range(4):
            img = r.render(c.step(taa_enabled=True))
            c.orbit(0.01, 0.0)
        outs[tag] = np.asarray(img)
    d = np.abs(outs["b16"] - outs["ctl"])
    print(json.dumps({"probe": name, "mean": round(float(d.mean()), 6),
                      "max": round(float(d.max()), 4)}), flush=True)


try:
    quality(dict(svgf_bits=16, raster_attr_bits=16), "both16_err")
except Exception as e:
    print(json.dumps({"probe": "both16_err", "error": repr(e)[:250]}),
          flush=True)
print("EXIT=0", flush=True)
