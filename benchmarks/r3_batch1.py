"""Round-3 TPU batch 1, ONE process: per-stage DCE-proof bisect of a
radiance pass IN the frame (VERDICT r2 task 1) + closest-hit tmax-clamp
probes (task 2's cheapest lever).

Round-2 end state: headline 102.0, full graph 324.0 — the refl+GI add
is ~222 ms while isolated trace_radiance is ~77/75 ms per pass. Batch
34 put ~100 ms in the (since fused) SVGF chains; this batch splits the
REMAINING per-pass in-frame cost into trace / shade-math / shade-
occlusion / SVGF-marginal stages using the new
settings.debug_radiance_stage knob (trace.py):

  head          HEAD control (shadow+AO+SVGF)
  head_nosv     HEAD without SVGF
  headR_tr      +REFLECTION, stage=noshade  → in-frame closest-hit add
  headR_no      +REFLECTION, stage=noocc    → + shade math (attrs/PBR/IBL/NEE)
  headR         +REFLECTION full            → + sun/NEE occlusion traversals
  headR_nosv    +REFLECTION, no SVGF        → SVGF marginal = (headR-head)-(headR_nosv-head_nosv)
  headG_tr/no/full/nosv   same ladder for interleaved GI
  fullg         control (REFLECTION|GI)

Isolated probes (fori-chained, DCE-proof): closest-hit with tmax 1e6 vs
the scene diameter (the reference traces GI unbounded but the scene
bounds any real hit; a tight tmax can prune slab tests), and sun
occlusion tmax 1000 vs diameter.

Run from the repo dir: python - < benchmarks/r3_batch1.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core import maths
from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.graph.params import FrameParams
from hybridrenderer_tpu.ops import image as img_ops
from hybridrenderer_tpu.ops import sampling
from hybridrenderer_tpu.ops.trace import SceneTracer
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
ITERS = 4
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
tracer = SceneTracer.build(data)

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD_RAW = BASE | RenderFlags.SHADOW | RenderFlags.AO
HEAD = HEAD_RAW | SV

settings = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                          flags=BASE)
params = FrameParams(
    sun_direction=data.sun.direction, sun_color=data.sun.color,
    sun_intensity=data.sun.intensity, ambient_strength=data.sun.ambient,
    exposure=jnp.float32(1.0),
    svgf_phi=jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32),
    frame_index=jnp.uint32(3))


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


# ---- 1. isolated tmax-clamp probes (fast compiles first) ------------------

v0 = np.asarray(data.triangles.v0)
dia = float(np.linalg.norm(v0.max(0) - v0.min(0)))
print(json.dumps({"info": "scene_diameter", "value": round(dia, 2)}),
      flush=True)

yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
wpos = jnp.stack([(xx - W / 2) * 0.02, jnp.zeros_like(xx),
                  (yy - H / 2) * 0.02], -1)
n_up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), wpos.shape)
view = maths.normalize(wpos - jnp.asarray(list(cam.position)))
refl = maths.reflect(view, n_up)
gi_dir = sampling.interleaved_cos_hemisphere(
    params.frame_index, n_up, block=32, salt=0x7D1E6100)
origin = sampling.offset_ray(wpos, n_up)
sun_dir = maths.normalize(-params.sun_direction)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def prep(o_img, d_img):
    o, _ = img_ops.to_tile_major(o_img)
    d, _ = img_ops.to_tile_major(d_img)
    return o, d


def timed(name, step):
    @jax.jit
    def loop(z):
        def body(_, carry):
            return carry + step(carry)
        return jax.lax.fori_loop(0, ITERS, body, z)

    try:
        r = loop(jnp.float32(0.0))
        _ = float(r)
        t0 = time.perf_counter()
        r = loop(jnp.float32(0.0))
        _ = float(r)
        report(name, (time.perf_counter() - t0) / ITERS * 1e3)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def make_ch(dirs, tmax):
    def step(bump):
        o, d = prep(origin + bump, dirs)
        t, tri, u, v = tracer._intersect(data, o, d, 0.01, tmax,
                                         any_hit=False)
        return s(t) + s(tri) + s(u) + s(v)
    return step


def make_occ(tmax):
    def step(bump):
        o, d = prep(origin + bump, jnp.broadcast_to(sun_dir, wpos.shape))
        t, tri, _, _ = tracer._intersect(data, o, d, 0.01, tmax,
                                         any_hit=True)
        return s(tri)
    return step


timed("ch_refl_1e6", make_ch(refl, 1e6))
timed("ch_refl_dia", make_ch(refl, dia))
timed("ch_gi_1e6", make_ch(gi_dir, 1e6))
timed("ch_gi_dia", make_ch(gi_dir, dia))
timed("occ_sun_1e3", make_occ(1000.0))
timed("occ_sun_dia", make_occ(dia))


# ---- 2. frame rungs: radiance-stage bisect ---------------------------------

def burst_ms(flags, stage="full", k=4, bursts=1):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags, debug_radiance_stage=stage)
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
    for _ in range(bursts):
        out = r.render_burst(steps(k))
    _ = np.asarray(out[-1, 0, 0])
    return 1000.0 * (time.perf_counter() - t0) / (bursts * k)


R_, G_ = RenderFlags.REFLECTION, RenderFlags.GI
guard("head", lambda: burst_ms(HEAD))
guard("headR_tr", lambda: burst_ms(HEAD | R_, "noshade"))
guard("headR_no", lambda: burst_ms(HEAD | R_, "noocc"))
guard("headR", lambda: burst_ms(HEAD | R_))
guard("headG_tr", lambda: burst_ms(HEAD | G_, "noshade"))
guard("headG_no", lambda: burst_ms(HEAD | G_, "noocc"))
guard("headG", lambda: burst_ms(HEAD | G_))
guard("fullg", lambda: burst_ms(HEAD | R_ | G_))
guard("head_nosv", lambda: burst_ms(HEAD_RAW))
guard("headR_nosv", lambda: burst_ms(HEAD_RAW | R_))
guard("headG_nosv", lambda: burst_ms(HEAD_RAW | G_))
print("EXIT=0", flush=True)
