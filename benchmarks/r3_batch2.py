"""Round-3 TPU batch 2, ONE process: (a) shade-stage sub-bisect of the
in-frame radiance cost (batch 1 decomposed REFLECTION's +106 ms add into
traversal 46 / shade 39 / occlusion 20; this splits the 39 ms shade into
attr-gather vs NEE vs residual math), and (b) dynamic-update A/B: the
dirty-only update_transforms_subset vs the full re-bake at stress scale
(VERDICT r2 task 6).

Rungs (same burst harness as batch 1):
  headR_no       control re-measure (noocc)
  headR_noattr   noocc + constant attrs  → delta = attr-row gather
  headR_nonee    noocc + no NEE block    → delta = sample_lights et al.

Run from the repo dir: python - < benchmarks/r3_batch2.py
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
from hybridrenderer_tpu.scene import dynamic, scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV


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


def burst_ms(flags, stage="full", k=4, bursts=1, **skw):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags, debug_radiance_stage=stage, **skw)
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


R_, G_ = RenderFlags.REFLECTION, RenderFlags.GI
guard("headR_no2", lambda: burst_ms(HEAD | R_, "noocc"))
guard("headR_noattr", lambda: burst_ms(HEAD | R_, "noattr"))
guard("headR_nonee", lambda: burst_ms(HEAD | R_, "nonee"))

# ---- GI-SVGF marginal anomaly (batch 1: GI chain marginal 42.4 ms vs
# reflection's 15.3, configs identical). Reproduce + scale probes.
guard("headG_rep", lambda: burst_ms(HEAD | G_))
guard("headG_at1", lambda: burst_ms(HEAD | G_, svgf_atrous_iterations=1))
guard("fullg_nosv", lambda: burst_ms(
    (BASE | RenderFlags.SHADOW | RenderFlags.AO) | R_ | G_))

# ---- dynamic-update A/B: subset vs full re-bake ---------------------------
# one moving entity out of ~250 at stress scale; measure the UPDATE +
# refit + one rendered frame, chained (the bench dynamic rung's shape).


def dyn_ms(mode):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=HEAD)
    r = Renderer.for_scene(st, data)
    dyn = dynamic.DynamicScene(host, r)
    cam = OrbitCamera(width=W, height=H, **cam_kw)
    eid = len(host.entities) - 1
    base_tf = np.asarray(host.entities[eid].transform, np.float32).copy()

    def frame(i):
        t = base_tf.copy()
        t[0, 3] += 0.05 * i
        dyn.set_entity_transform(eid, t)
        if mode == "full":
            # force the full path by inflating the dirty set check
            dyn._dirty_entities = set(range(len(host.entities)))
            # transforms array only has eid actually changed; full
            # re-bake of everything — the old update_transforms path
        dyn.commit()
        return r.render(cam.step(taa_enabled=True))

    out = frame(0)
    _ = np.asarray(out[0, 0])
    out = frame(1)
    _ = np.asarray(out[0, 0])
    N = 4
    t0 = time.perf_counter()
    for i in range(2, 2 + N):
        out = frame(i)
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / N


guard("dyn_subset", lambda: dyn_ms("subset"))
guard("dyn_full", lambda: dyn_ms("full"))
guard("static_ctrl", lambda: burst_ms(HEAD))
print("EXIT=0", flush=True)
