"""Round-2 TPU batch 41, ONE process: bin-block decomposition + the
gather-free clip permutation.

clip_triangles' take_along_axis corner permutation (2 × T-row gathers)
is now a one-hot contraction. Decompose the ~23 ms bin block
(DCE-proof cumulative ladder) and re-run the frame rungs:

  floor      harness floor (reductions + loop only, on the corner tables)
  xform      + transform_to_clip ×3
  clip       + clip_triangles (one-hot permutation)
  pack       + pack_candidates (records + attr join)
  bin        + bin_candidates (combined sort + stream gather)
  base1080 / head1080 / fullg   frame rungs

Run from the repo dir: python - < benchmarks/r2_batch41.py
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
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def ladder(stage):
    def step(carry):
        eps = carry * 1e-20
        v0 = data.triangles.v0 + eps
        if stage == "floor":
            return s(v0) + s(data.triangles.v1)
        corners = jnp.stack(
            [raster_ops.transform_to_clip(v0, vp),
             raster_ops.transform_to_clip(data.triangles.v1, vp),
             raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
        if stage == "xform":
            return s(corners)
        tris = raster_ops.clip_triangles(
            None, None, None, None, W, H, None,
            data.triangles.single_sided, corners=corners)
        acc = sum(s(v) for v in (tris.sxy, tris.z, tris.inv_w,
                                 tris.bary, tris.tri_id, tris.valid))
        if stage == "clip":
            return acc
        packed, bbox, valid = raster_pallas.pack_candidates(
            tris, attr_table=data.raster_rows)
        acc = acc + s(packed) + s(bbox) + s(valid)
        if stage == "pack":
            return acc
        bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H,
                                            8, 128)
        return acc + sum(s(v) for v in bins.values())

    return step


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


for stage in ("floor", "xform", "clip", "pack", "bin"):
    timed(stage, ladder(stage))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI


def burst_ms(flags, k=8, bursts=2):
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=flags)
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
print("EXIT=0", flush=True)
