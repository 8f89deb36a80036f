"""Round-4 TPU batch 6, ONE process: (A) interleave block 64 + packet
height — at ao_block=64 a 32-row packet (4096 rays, tile layout) covers
exactly ONE 64x64 block = ONE direction, so the pr32 union growth that
killed plain pr32 (r4 batch 5: head 114.8) should vanish for AO; same
bet for GI on the full graph. (B) config refresh under the round-4
defaults (svgf_bits=16 + pkt_rows=16 + rankv): head / fullg / fwd+TAA /
sponza-scale / sponza-textured / dynamic — the BENCH_r04 preview.

Run from the repo dir: python benchmarks/r4_batch6.py
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
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI
FWD = (BASE | RenderFlags.SHADOW | RenderFlags.TAA)


def burst_ms(data, flags, k=4, path=RenderPathType.HYBRID, **skw):
    st = RenderSettings(width=W, height=H, path=path, flags=flags, **skw)
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

# ---- (A) interleave block 64 x packet height ---------------------------
guard("head_ctl", lambda: burst_ms(data65, HEAD))
guard("head_ao64", lambda: burst_ms(data65, HEAD, ao_block=64))
os.environ["WIDE_PKT_ROWS"] = "32"
guard("head_ao64_pr32", lambda: burst_ms(data65, HEAD, ao_block=64))
os.environ["WIDE_PKT_ROWS"] = "16"
guard("fullg_ctl", lambda: burst_ms(data65, FULL, k=2))
guard("fullg_b64", lambda: burst_ms(data65, FULL, k=2,
                                    ao_block=64, gi_block=64))
os.environ["WIDE_PKT_ROWS"] = "32"
guard("fullg_b64_pr32", lambda: burst_ms(data65, FULL, k=2,
                                         ao_block=64, gi_block=64))
os.environ["WIDE_PKT_ROWS"] = "16"

# ---- (B) config refresh under round-4 defaults --------------------------
guard("fwdtaa", lambda: burst_ms(data65, FWD, path=RenderPathType.FORWARD))
data262 = scenes.stress_scene(num_objects=1000).build()
guard("sponza_head", lambda: burst_ms(data262, HEAD, k=2))
data262t = scenes.stress_scene(num_objects=1000, textured=True).build()
guard("sponzatex_head", lambda: burst_ms(data262t, HEAD, k=2))


def dynamic_ms():
    from hybridrenderer_tpu.scene.dynamic import DynamicScene

    host = scenes.stress_scene(num_objects=250)
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=HEAD)
    dr = Renderer.for_scene(st, host.build())
    dyn = DynamicScene(host, dr)
    c = OrbitCamera(width=W, height=H, **cam_kw)

    def rot_y(a):
        cs, sn = float(np.cos(a)), float(np.sin(a))
        return np.array([[cs, 0, sn, 0], [0, 1, 0, 0],
                         [-sn, 0, cs, 0], [0, 0, 0, 1]], np.float32)

    def dframe(a):
        dyn.set_entity_transform(0, rot_y(a))
        dyn.commit()
        return dr.render(c.step(taa_enabled=True))

    out = dframe(0.05)
    out = dframe(0.10)
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    nd = 4
    for i in range(nd):
        out = dframe(0.15 + 0.05 * i)
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / nd


guard("dynamic", dynamic_ms)
print("EXIT=0", flush=True)
