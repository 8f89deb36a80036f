"""Round-2 TPU batch 30, ONE process: attr ride-along stage attribution.

Batch 29 frame rungs measured the ride-along ~NEUTRAL at BASE
(join 68.1 vs kernel 67.9) — the saved per-pixel gather must be offset
somewhere (wider 120-row streams? the (ntiles,40,P) unflatten
transpose? the T2 attr join gather at pack time?). DCE-proof cumulative
ladder (every leaf reduced into the fori carry, batch-20 methodology):

  clip_g / clip_s     shared-vertex gather clip vs soup-corner clip
  bin_plain/bin_attr  + pack + bin (attr = 120-row records, T2 join)
  rt_plain / rt_attr  + raster_tiles (attr = in-kernel picks + unflatten)
  rb_join / rb_kernel + build_gbuffer (join gather vs kernel attrs)

Run from the repo dir: python - < benchmarks/r2_batch30.py
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
from hybridrenderer_tpu.ops import gbuffer as gb_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                  focal_point=(0, 2.0, 0)).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))
ITERS = 8


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def clip_stage(carry, soup_clip):
    eps = carry[0, 0] * 1e-20
    if soup_clip:
        corners = jnp.stack(
            [raster_ops.transform_to_clip(data.triangles.v0 + eps, vp),
             raster_ops.transform_to_clip(data.triangles.v1, vp),
             raster_ops.transform_to_clip(data.triangles.v2, vp)], axis=1)
        return raster_ops.clip_triangles(
            None, None, None, None, W, H, None,
            data.triangles.single_sided, corners=corners)
    clip = raster_ops.transform_to_clip(
        data.vertices.world_position + eps, vp)
    return raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W, H, None, data.triangles.single_sided)


def ladder_step(carry, stage, soup_clip=True, attrs=False):
    tris = clip_stage(carry, soup_clip)
    acc = sum(s(v) for v in (tris.sxy, tris.z, tris.inv_w,
                             tris.bary, tris.tri_id, tris.valid))
    if stage == "clip":
        return acc
    packed, bbox, valid = raster_pallas.pack_candidates(
        tris, attr_table=data.raster_rows if attrs else None)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    acc = acc + sum(s(v) for v in bins.values())
    if stage == "bin":
        return acc
    out = raster_pallas.raster_tiles(bins, W, H)
    vis, kattrs = out if attrs else (out, None)
    acc = acc + sum(s(v) for v in jax.tree_util.tree_leaves(vis))
    if attrs:
        acc = acc + s(kattrs)
    if stage == "raster":
        return acc
    gb = gb_ops.build_gbuffer(vis, data, cam, kernel_attrs=kattrs)
    return acc + sum(s(v) for v in jax.tree_util.tree_leaves(gb))


def run(stage, soup_clip=True, attrs=False):
    wp = data.vertices.world_position

    @jax.jit
    def loop(w0):
        def body(_, carry):
            return carry + ladder_step(carry, stage, soup_clip, attrs)
        return jax.lax.fori_loop(0, ITERS, body, w0)

    r = loop(wp)
    _ = np.asarray(r[0, 0])
    t0 = time.perf_counter()
    r = loop(wp)
    _ = np.asarray(r[0, 0])
    return (time.perf_counter() - t0) / ITERS * 1e3


guard("clip_g", lambda: run("clip", soup_clip=False))
guard("clip_s", lambda: run("clip", soup_clip=True))
guard("bin_plain", lambda: run("bin", attrs=False))
guard("bin_attr", lambda: run("bin", attrs=True))
guard("rt_plain", lambda: run("raster", attrs=False))
guard("rt_attr", lambda: run("raster", attrs=True))
guard("rb_join", lambda: run("gb", attrs=False))
guard("rb_kernel", lambda: run("gb", attrs=True))
print("EXIT=0", flush=True)
