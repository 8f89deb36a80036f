"""Round-4 TPU batch 9, ONE process: column-chunked stream gather A/B.

The bin stage's biggest piece is the cap-sized stream gather (~8.5 ms,
batch 41): ~110k rows from the joined (T2, 120) f32 record table
(~71 MB at stress) — far above the ~16 MB fast-gather gate (r3 batch 4:
table bytes ≲ 16 MB gathers at ~4 ns/row, above it ~29-57 ns/row).
RASTER_STREAM_GATHER=split gathers in column chunks whose
barrier-materialized table slice each fits the gate (bit-identical,
test-pinned tests/test_raster_pallas.py). Frame rungs decide (batch-30
lesson: isolated gather probes lie).

Run from the repo dir: python benchmarks/r4_batch9.py
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


data65 = scenes.stress_scene(num_objects=250).build()
data262 = scenes.stress_scene(num_objects=1000).build()

os.environ["RASTER_STREAM_GATHER"] = "whole"
guard("base_whole", lambda: burst_ms(data65, BASE))
os.environ["RASTER_STREAM_GATHER"] = "split"
guard("base_split", lambda: burst_ms(data65, BASE))
os.environ["RASTER_STREAM_GATHER"] = "whole"
guard("head_whole", lambda: burst_ms(data65, HEAD))
os.environ["RASTER_STREAM_GATHER"] = "split"
guard("head_split", lambda: burst_ms(data65, HEAD))
os.environ["RASTER_STREAM_GATHER"] = "whole"
guard("sponza_whole", lambda: burst_ms(data262, HEAD, k=2))
os.environ["RASTER_STREAM_GATHER"] = "split"
guard("sponza_split", lambda: burst_ms(data262, HEAD, k=2))
# drift anchor
os.environ["RASTER_STREAM_GATHER"] = "whole"
guard("base_whole2", lambda: burst_ms(data65, BASE))
print("EXIT=0", flush=True)
