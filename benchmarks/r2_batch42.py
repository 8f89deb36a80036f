"""Round-2 TPU batch 42, ONE process: adaptive bin caps.

The stream gather is cap-sized (batch 41: ~8.5 ms of the 14.5 ms bin
stage at the fixed 294912-row cap). Caps now scale with the candidate
count (stress: 131072+16384 vs the old 262144+32768); bins carries
n_dropped for spill observability.

  eq_maxdiff    BASE G-buffer ladder output, adaptive vs old caps —
                must be 0.0 (live entries ≪ both caps at stress)
  n_dropped     at adaptive caps (expect 0)
  bin           ladder rung (batch 41: 20.63 at old caps)
  base1080 / head1080 / fullg / sponza_head   frame rungs

Run from the repo dir: python - < benchmarks/r2_batch42.py
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
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
ITERS = 8
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
cam = OrbitCamera(width=W, height=H, **cam_kw).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))


def report(name, val):
    print(json.dumps({"probe": name, "val": val}), flush=True)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def clip_pack():
    corners = jnp.stack(
        [raster_ops.transform_to_clip(data.triangles.v0, vp),
         raster_ops.transform_to_clip(data.triangles.v1, vp),
         raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
    tris = raster_ops.clip_triangles(
        None, None, None, None, W, H, None,
        data.triangles.single_sided, corners=corners)
    return raster_pallas.pack_candidates(tris, attr_table=data.raster_rows)


import functools


@functools.partial(jax.jit, static_argnums=(0, 1))
def render_vis(cap_a, cap_b):
    packed, bbox, valid = clip_pack()
    bins = raster_pallas.bin_candidates(
        packed, bbox, valid, W, H, 8, 128,
        cap_a=cap_a, cap_b=cap_b)
    vis, kattrs = raster_pallas.raster_tiles(bins, W, H)
    return vis, kattrs, bins["n_dropped"]


va, ka, nd = render_vis(None, None)
vb, kb, _ = render_vis(262144, 32768)
diff = max(float(jnp.max(jnp.abs(ka - kb))),
           float(jnp.max(jnp.abs(va.depth - vb.depth))),
           float(jnp.max(jnp.abs((va.tri_id - vb.tri_id))).astype(jnp.float32)))
report("eq_maxdiff", diff)
report("n_dropped", int(nd))


def bin_step(carry):
    eps = carry * 1e-20
    corners = jnp.stack(
        [raster_ops.transform_to_clip(data.triangles.v0 + eps, vp),
         raster_ops.transform_to_clip(data.triangles.v1, vp),
         raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
    tris = raster_ops.clip_triangles(
        None, None, None, None, W, H, None,
        data.triangles.single_sided, corners=corners)
    packed, bbox, valid = raster_pallas.pack_candidates(
        tris, attr_table=data.raster_rows)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    return sum(s(v) for v in bins.values())


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
        report(name, round((time.perf_counter() - t0) / ITERS * 1e3, 2))
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


timed("bin", bin_step)

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI


def burst_ms(flags, sc=None, k=8, bursts=2):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags)
    r = Renderer.for_scene(st, sc if sc is not None else data)
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
    return round(1000.0 * (time.perf_counter() - t0) / (bursts * k), 2)


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


guard("base1080", lambda: burst_ms(BASE))
guard("head1080", lambda: burst_ms(HEAD))
guard("fullg", lambda: burst_ms(FULL, k=4, bursts=1))
big = scenes.stress_scene(num_objects=1000).build()
guard("sponza_head", lambda: burst_ms(HEAD, sc=big, k=4, bursts=1))
print("EXIT=0", flush=True)
