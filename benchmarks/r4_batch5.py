"""Round-4 TPU batch 5, ONE process: (A) packet-HEIGHT sweep on the
ordered direct kernel (WIDE_PKT_ROWS 8/16/32) — taller packets amortize
the fixed per-step cost (pops, one-hot extracts, rankv rolls, meta
fetch) over 2-4x the rays; the bet is that direction-coherent sets (sun
shadow; pattern-major interleaved AO keeps ONE direction per packet at
any height) gain more from amortization than they lose to wider
traversal unions. (B) head rung at the winning height. (C) Sponza-scale
quantized shade-row A/B (shade_fetch auto-quant vs attr) on the
full-graph and textured-head rungs — the r4 landing that was never
frame-measured (VERDICT r4 task 3).

Run from the repo dir: python benchmarks/r4_batch5.py
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
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI

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
    params.frame_index, n_up, block=32, salt=0xA0A0)
origin = sampling.offset_ray(wpos, n_up)
sun_dir = maths.normalize(-params.sun_direction)
sun_img = jnp.broadcast_to(sun_dir, wpos.shape)


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


def probe_set(tag, data, rows, kinds=("shadow", "ao", "closest")):
    os.environ["WIDE_PKT_ROWS"] = str(rows)
    st = RenderSettings(width=W, height=H)
    tr = SceneTracer.build(data, st)
    mk = {"shadow": mk_shadow, "ao": mk_ao, "closest": mk_closest}
    for kind in kinds:
        timed(f"{kind}_{tag}", mk[kind](tr, data))


data65 = scenes.stress_scene(num_objects=250).build()
probe_set("pr8", data65, 8)
probe_set("pr16", data65, 16)
probe_set("pr32", data65, 32)
probe_set("pr8b", data65, 8, kinds=("shadow",))  # session drift anchor
os.environ["WIDE_PKT_ROWS"] = "8"


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


# (B) head rungs: ctl vs the candidate heights (knob applies to both
# shadow and AO passes in-frame)
guard("head_pr8", lambda: burst_ms(data65, HEAD))
os.environ["WIDE_PKT_ROWS"] = "16"
guard("head_pr16", lambda: burst_ms(data65, HEAD))
os.environ["WIDE_PKT_ROWS"] = "32"
guard("head_pr32", lambda: burst_ms(data65, HEAD))
os.environ["WIDE_PKT_ROWS"] = "8"

# (C) Sponza-scale quantized shade rows: auto (quantized table at 284k)
# vs attr (the 84-col joined row, no fast gather at this scale)
data262 = scenes.stress_scene(num_objects=1000).build()
print(json.dumps({"info": "scale_tris",
                  "tris": int(data262.num_triangles)}), flush=True)
guard("sponza_fullg_attr", lambda: burst_ms(data262, FULL, k=2,
                                            shade_fetch="attr"))
guard("sponza_fullg_auto", lambda: burst_ms(data262, FULL, k=2))

data262t = scenes.stress_scene(num_objects=1000, textured=True,
                               tex_size=512).build()
guard("sponzatex_head_attr", lambda: burst_ms(data262t, HEAD, k=2,
                                              shade_fetch="attr"))
guard("sponzatex_head_auto", lambda: burst_ms(data262t, HEAD, k=2))
print("EXIT=0", flush=True)
