"""Round-4 TPU batch 2, ONE process: 16-wide nodes + rank push A/B
(VERDICT r3 task 4 — the untried step-cost lever).

Isolated fori-chained rungs per ray type (65k stress, SAH, cs8/npk2):
  ctl  = width 8, sort-network push (round-3 default)
  r8   = width 8, rank push (vectorized all-pairs rank — bit-identical
         traversal, cheaper push arithmetic)
  r16  = width 16, rank push (half the steps, 2x slab math per visit)
plus a WIDE_CHUNK_STEPS sweep at width 16 (its steps do ~2x the work,
so the cs8 tune may be wrong) and headline/full-graph frame rungs for
whichever isolated config wins.

Run from the repo dir: python benchmarks/r4_batch2.py
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
ITERS = 4
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
cam = OrbitCamera(width=W, height=H, **cam_kw).step()

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI

params = FrameParams(
    sun_direction=data.sun.direction, sun_color=data.sun.color,
    sun_intensity=data.sun.intensity, ambient_strength=data.sun.ambient,
    exposure=jnp.float32(1.0),
    svgf_phi=jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32),
    frame_index=jnp.uint32(3))

yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
wpos = jnp.stack([(xx - W / 2) * 0.02, jnp.zeros_like(xx),
                  (yy - H / 2) * 0.02], -1)
n_up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), wpos.shape)
view = maths.normalize(wpos - jnp.asarray(list(cam.position)))
refl = maths.reflect(view, n_up)
ao_dir = sampling.interleaved_cos_hemisphere(
    params.frame_index, n_up, block=32, salt=0xA0A0)
origin = sampling.offset_ray(wpos, n_up)
sun_dir = maths.normalize(-params.sun_direction)
sun_img = jnp.broadcast_to(sun_dir, wpos.shape)
NRAYS = W * H


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def prep(o_img, d_img):
    o, _ = img_ops.to_tile_major(o_img)
    d, _ = img_ops.to_tile_major(d_img)
    return o, d


def timed(name, step, mrays=True):
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
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        out = {"probe": name, "ms": round(ms, 2)}
        if mrays:
            out["mrays"] = round(NRAYS / ms / 1e3, 2)
        print(json.dumps(out), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def mk_shadow(tr):
    def step(bump):
        o, d = prep(origin + bump, sun_img)
        vis = tr.occluded(data, o, d, 1e4)
        return s(vis)
    return step


def mk_ao(tr):
    def step(bump):
        o, d = prep(origin + bump, ao_dir)
        vis = tr.occluded(data, o, d, 10.0)
        return s(vis)
    return step


def mk_closest(tr):
    def step(bump):
        o, d = prep(origin + bump, refl)
        t, tri, u, v = tr._intersect(data, o, d, 0.01, 1e6, any_hit=False)
        return s(t) + s(u)
    return step


CFGS = [("ctl", 8, "sort"), ("r8", 8, "rank"), ("r16", 16, "rank")]
tracers = {}
for tag, width, push in CFGS:
    os.environ["WIDE_PUSH"] = push
    st = RenderSettings(width=W, height=H, bvh_width=width)
    tracer = SceneTracer.build(data, st)
    tracers[tag] = tracer
    print(json.dumps({"info": f"tracer_{tag}",
                      "nodes_shape": list(tracer.wide_nodes.shape)}),
          flush=True)
    timed(f"shadow_{tag}", mk_shadow(tracer))
    timed(f"ao_{tag}", mk_ao(tracer))
    timed(f"closest_{tag}", mk_closest(tracer))

# chunk_steps sweep at width 16 (shadow + ao)
os.environ["WIDE_PUSH"] = "rank"
for cs in (4, 16):
    os.environ["WIDE_CHUNK_STEPS"] = str(cs)
    timed(f"shadow_r16_cs{cs}", mk_shadow(tracers["r16"]))
    timed(f"ao_r16_cs{cs}", mk_ao(tracers["r16"]))
os.environ.pop("WIDE_CHUNK_STEPS", None)


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


def guard(name, fn):
    try:
        print(json.dumps({"probe": name, "ms": round(fn(), 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


# frame rungs: within-process A/B (env resolved at jit-cache key time via
# settings; WIDE_PUSH read at trace time)
os.environ["WIDE_PUSH"] = "sort"
guard("head_ctl", lambda: burst_ms(HEAD))
os.environ["WIDE_PUSH"] = "rank"
guard("head_r8", lambda: burst_ms(HEAD))
guard("head_r16", lambda: burst_ms(HEAD, bvh_width=16))
guard("fullg_ctl_rank8", lambda: burst_ms(FULL, k=2))
guard("fullg_r16", lambda: burst_ms(FULL, k=2, bvh_width=16))
print("EXIT=0", flush=True)
