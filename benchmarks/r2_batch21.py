"""Round-2 TPU batch 21, ONE process: trace_radiance attribution at 1080p.

Full graph (REFLECTION|GI) is ~1550 ms vs headline 220 — each radiance
pass costs ~650-800 ms. Candidate costs per pass: closest-hit traversal
(~200 ms at ~10 Mrays/s), two occlusion traversals (~60 ms), _shade_hit
attribute gathers (~15 row-gathers x 2M rays), and up to 3 equirect
sky gathers. Ladder (reflection-style rays off the G-buffer):

  ch     closest-hit intersect only
  ch_sun + sun occlusion (active=hit)
  ch_nee + NEE sample + occlusion
  rad    full trace_radiance (shade + sky)

Run: python - < benchmarks/r2_batch21.py
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
from hybridrenderer_tpu.graph.params import FrameParams
from hybridrenderer_tpu.ops import image as img_ops
from hybridrenderer_tpu.core import maths
from hybridrenderer_tpu.ops import sampling
from hybridrenderer_tpu.ops.trace import SceneTracer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
ITERS = 4
cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                  focal_point=(0, 2.0, 0)).step()
tracer = SceneTracer.build(data)

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
settings = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                          flags=BASE)
params = FrameParams(
    sun_direction=data.sun.direction, sun_color=data.sun.color,
    sun_intensity=data.sun.intensity, ambient_strength=data.sun.ambient,
    exposure=jnp.float32(1.0),
    svgf_phi=jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32),
    frame_index=jnp.uint32(3))


class Ctx:
    pass


ctx = Ctx()
ctx.settings = settings
ctx.params = params

# reflection-style rays off a synthetic G-buffer plane (world pos from
# unprojected depth ramp; normals up) — representative incoherence
yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
wpos = jnp.stack([(xx - W / 2) * 0.02, jnp.zeros_like(xx),
                  (yy - H / 2) * 0.02], -1)
n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), wpos.shape)
view = maths.normalize(wpos - jnp.asarray(list(cam.position)))
refl = maths.reflect(view, n)
origin = sampling.offset_ray(wpos, n)


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def s(x):
    # clip per-term: miss distances can be inf/1e6-scale; an inf bump
    # would turn iterations 2..N into all-inf-origin rays (fast misses)
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def prep(o_img, d_img):
    o, _ = img_ops.to_tile_major(o_img)
    d, _ = img_ops.to_tile_major(d_img)
    return o, d


def ch_step(bump):
    o, d = prep(origin + bump, refl)
    t, tri, u, v = tracer._intersect(data, o, d, 0.01, 1e6, any_hit=False)
    return s(t) + s(tri) + s(u) + s(v)


def ch_sun_step(bump):
    o, d = prep(origin + bump, refl)
    t, tri, u, v = tracer._intersect(data, o, d, 0.01, 1e6, any_hit=False)
    hit = (tri >= 0) & (tri < (1 << 29))
    wp = o + d * t[..., None]
    sun_dir = maths.normalize(-params.sun_direction)
    so = sampling.offset_ray(wp, jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0]), wp.shape))
    vis = tracer.occluded(data, so, jnp.broadcast_to(sun_dir, d.shape),
                          1000.0, active=hit)
    return s(t) + s(tri) + s(vis)


def ch_nee_step(bump):
    o, d = prep(origin + bump, refl)
    t, tri, u, v = tracer._intersect(data, o, d, 0.01, 1e6, any_hit=False)
    hit = (tri >= 0) & (tri < (1 << 29))
    wp = o + d * t[..., None]
    sun_dir = maths.normalize(-params.sun_direction)
    so = sampling.offset_ray(wp, jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0]), wp.shape))
    vis = tracer.occluded(data, so, jnp.broadcast_to(sun_dir, d.shape),
                          1000.0, active=hit)
    idx = jnp.arange(o.shape[0], dtype=jnp.uint32)
    seed = sampling.init_random_seed(idx, params.frame_index)
    ldir, sinst, seed = sampling.sample_lights(data, wp, seed)
    has = maths.length(ldir) > 0.001
    lvis = tracer.occluded(data, so, ldir, 1000.0, active=has & hit)
    return s(t) + s(tri) + s(vis) + s(lvis) + s(sinst)


def rad_step(bump):
    rgb, dist = tracer.trace_radiance(data, origin + bump, refl, ctx, 0)
    return s(rgb) + s(dist)


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


timed("ch1080", ch_step)
timed("ch_sun1080", ch_sun_step)
timed("ch_nee1080", ch_nee_step)
timed("rad1080", rad_step)
print("EXIT=0", flush=True)
