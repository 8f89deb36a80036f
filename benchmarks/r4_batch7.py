"""Round-4 TPU batch 7, ONE process: retune chunk_steps x npk under the
new pkt_rows=16 default. cs8/npk2 was tuned at pkt_rows=8 (r2 batches
14/25); 2048-ray packets take ~half the steps per packet, so the
termination-overshoot optimum may sit lower (cs4/6) and the
packets-per-program optimum may shift (npk1 = same rays/program as the
old npk2). Isolated shadow/AO/closest + head rungs for the best cell.

Run from the repo dir: python benchmarks/r4_batch7.py
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

W, H = 1920, 1080
ITERS = 4
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
NRAYS = W * H

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV

params = FrameParams(
    sun_direction=jnp.asarray([-0.35, -0.9, -0.25], jnp.float32),
    sun_color=jnp.ones(3, jnp.float32), sun_intensity=jnp.float32(4.0),
    ambient_strength=jnp.float32(0.2), exposure=jnp.float32(1.0),
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
    params.frame_index, n_up, block=64, salt=0xA0A0)
origin = sampling.offset_ray(wpos, n_up)
sun_dir = maths.normalize(-params.sun_direction)
sun_img = jnp.broadcast_to(sun_dir, wpos.shape)


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
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(json.dumps({"probe": name, "ms": round(ms, 2),
                          "mrays": round(NRAYS / ms / 1e3, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def mk_shadow(tr, data):
    def step(bump):
        o, d = prep(origin + bump, sun_img)
        return s(tr.occluded(data, o, d, 1e4))
    return step


def mk_ao(tr, data):
    def step(bump):
        o, d = prep(origin + bump, ao_dir)
        return s(tr.occluded(data, o, d, 10.0))
    return step


def mk_closest(tr, data):
    def step(bump):
        o, d = prep(origin + bump, refl)
        t, tri, u, v = tr._intersect(data, o, d, 0.01, 1e6, any_hit=False)
        return s(t) + s(u)
    return step


data65 = scenes.stress_scene(num_objects=250).build()
st = RenderSettings(width=W, height=H)
tr = SceneTracer.build(data65, st)
mk = {"sh": mk_shadow, "ao": mk_ao, "cl": mk_closest}


def cell(cs, npk, kinds=("sh", "ao", "cl")):
    os.environ["WIDE_CHUNK_STEPS"] = str(cs)
    os.environ["WIDE_NPK"] = str(npk)
    for kind in kinds:
        timed(f"{kind}_cs{cs}n{npk}", mk[kind](tr, data65))


cell(8, 2)            # control (current defaults)
cell(4, 2)
cell(6, 2)
cell(12, 2, kinds=("sh",))
cell(8, 1)
cell(4, 1, kinds=("sh", "ao"))
cell(8, 2, kinds=("sh",))   # drift anchor


def burst_ms(data, flags, k=4, **skw):
    stt = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                         flags=flags, **skw)
    r = Renderer.for_scene(stt, data)
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


os.environ["WIDE_CHUNK_STEPS"] = "8"
os.environ["WIDE_NPK"] = "2"
guard("head_ctl", lambda: burst_ms(data65, HEAD))
# head rungs for the most promising alternates (filled by eye from the
# isolated grid — cheap to run both)
os.environ["WIDE_CHUNK_STEPS"] = "6"
guard("head_cs6", lambda: burst_ms(data65, HEAD))
os.environ["WIDE_CHUNK_STEPS"] = "4"
guard("head_cs4", lambda: burst_ms(data65, HEAD))
os.environ["WIDE_CHUNK_STEPS"] = "8"
os.environ["WIDE_NPK"] = "1"
guard("head_n1", lambda: burst_ms(data65, HEAD))
os.environ["WIDE_NPK"] = "2"
print("EXIT=0", flush=True)
