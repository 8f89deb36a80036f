"""Round-2 TPU batch 20, ONE process: raster-block internal attribution.

Batch 18/19 resolved the BASE rung: 96.5 ms after the sky gate, with the
raster block (rb ~83 ms chained) now ~86% of BASE — but the isolated
stages only sum to ~53, and the clipbin probe was partially DCE'd.
This ladder measures CUMULATIVE in-frame rungs where every rung reduces
ALL of its leaf outputs into the carry (no DCE window):

  t    transform_to_clip + clip_triangles
  tp   + pack_candidates
  tpb  + bin_candidates           (streams + starts/counts consumed)
  tpbk + raster_tiles             (z/tri/b1/b2 consumed)
  rb   + build_gbuffer            (ALL planes consumed — batch 18's rb
                                   consumed gb.normal only)

Deltas = true in-frame stage costs. Run: python - < benchmarks/r2_batch20.py
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
from hybridrenderer_tpu.graph.params import FrameParams
from hybridrenderer_tpu.ops import gbuffer as gb_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
cam = OrbitCamera(width=1920, height=1080, distance=30.0, pitch=0.5,
                  yaw=0.8, focal_point=(0, 2.0, 0)).step()
vp = jnp.asarray(np.asarray(cam.proj) @ np.asarray(cam.view))
W, H = 1920, 1080
ITERS = 8


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def s(x):
    return jnp.sum(x.astype(jnp.float32)) * 1e-12


def t_step(wpos):
    clip = raster_ops.transform_to_clip(wpos, vp)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
        W, H, None, data.triangles.single_sided)
    return tris, sum(s(v) for v in (tris.sxy, tris.z, tris.inv_w,
                                    tris.bary, tris.tri_id, tris.valid))


def tp_step(wpos):
    tris, acc = t_step(wpos)
    packed, bbox, valid = raster_pallas.pack_candidates(tris)
    return (packed, bbox, valid), acc + s(packed) + s(bbox) + s(valid)


def tpb_step(wpos):
    (packed, bbox, valid), acc = tp_step(wpos)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    return bins, acc + sum(s(v) for v in bins.values())


def tpbk_step(wpos):
    bins, acc = tpb_step(wpos)
    vis = raster_pallas.raster_tiles(bins, W, H)
    return vis, acc + sum(s(v) for v in jax.tree_util.tree_leaves(vis))


def rb_step(wpos):
    vis, acc = tpbk_step(wpos)
    gb = gb_ops.build_gbuffer(vis, data, cam)
    return acc + sum(s(v) for v in jax.tree_util.tree_leaves(gb))


def timed(name, step, leaf_is_acc):
    wp = data.vertices.world_position

    @jax.jit
    def loop(w0):
        def body(_, carry):
            out = step(carry)
            bump = out if leaf_is_acc else out[1]
            return carry + bump
        return jax.lax.fori_loop(0, ITERS, body, w0)

    try:
        r = loop(wp)
        _ = np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = loop(wp)
        _ = np.asarray(r[0, 0])
        report(name, (time.perf_counter() - t0) / ITERS * 1e3)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


timed("t1080", t_step, False)
timed("tp1080", tp_step, False)
timed("tpb1080", tpb_step, False)
timed("tpbk1080", tpbk_step, False)
timed("rb1080_full", rb_step, True)
print("EXIT=0", flush=True)
