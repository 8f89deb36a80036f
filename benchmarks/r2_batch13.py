"""Round-2 TPU batch 13: attribute the BASE rung's ~32 ms
renderer-vs-fused-math gap (batch 2: base1080 149.6 vs fused_rgcp
117.5), ONE process.

Probes (all 1080p stress, BASE flags, within-process):
  base_multi    — real Renderer, graph_barriers="multi" (reference)
  base_none     — graph_barriers="none"
  base_nohist   — GRAPH_NO_HISTORY=1 (no history saves / state copies)
  base_nohist_none — both off
  gbuffer_iso_a/b — isolated G-buffer twice (bimodality check: batch-1
                  measured 17 vs 54 ms across runs)

Run from the repo dir: python - < benchmarks/r2_batch13.py
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
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def frame_ms(settings, frames=8):
    r = Renderer.for_scene(settings, data)
    c = OrbitCamera(width=settings.width, height=settings.height, **cam_kw)
    out = r.render(c.step(taa_enabled=True))
    out = r.render(c.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        c.orbit(0.01, 0.0)
        out = r.render(c.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / frames


def probe(name, **kw):
    env = kw.pop("env", {})
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        st = RenderSettings(width=1920, height=1080,
                            path=RenderPathType.HYBRID, flags=BASE, **kw)
        report(name, frame_ms(st))
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


print("=== part 1: graph-layer bisect at BASE 1080p ===", flush=True)
probe("base_multi")
probe("base_none", graph_barriers="none")
probe("base_nohist", env={"GRAPH_NO_HISTORY": "1"})
probe("base_nohist_none", graph_barriers="none",
      env={"GRAPH_NO_HISTORY": "1"})

print("=== part 2: G-buffer isolation bimodality ===", flush=True)
from hybridrenderer_tpu.ops import gbuffer as gbuffer_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas

W, H = 1920, 1080
cam = OrbitCamera(width=W, height=H, **cam_kw)
st = cam.step()
vp = jnp.asarray(np.asarray(st.proj) @ np.asarray(st.view))
wp = data.vertices.world_position


def make_vis():
    clip = raster_ops.transform_to_clip(wp, vp)
    tris = raster_ops.clip_triangles(
        clip, data.triangles.i0, data.triangles.i1, data.triangles.i2, W, H)
    packed, bbox, valid = raster_pallas.pack_candidates(tris)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    return raster_pallas.raster_tiles(bins, W, H)


vis = jax.jit(make_vis)()
vis = jax.tree_util.tree_map(jnp.asarray, vis)


import dataclasses


def gb(depth):
    v = dataclasses.replace(vis, depth=depth)
    g = gbuffer_ops.build_gbuffer(v, data, st)
    return g.normal


@jax.jit
def gb_loop(d0):
    def body(_, carry):
        out = gb(carry)
        return carry + (out.ravel()[0] * 1e-12).astype(carry.dtype)
    return jax.lax.fori_loop(0, 8, body, d0)


for tag in ("a", "b"):
    try:
        r = gb_loop(vis.depth)
        _ = np.asarray(r.ravel()[0])
        t0 = time.perf_counter()
        r = gb_loop(vis.depth)
        _ = np.asarray(r.ravel()[0])
        report(f"gbuffer_iso_{tag}",
               (time.perf_counter() - t0) / 8 * 1e3)
    except Exception as e:
        print(json.dumps({"probe": f"gbuffer_iso_{tag}",
                          "error": repr(e)[:250]}), flush=True)

print("=== part 3: bin-internal pieces at 1080p ===", flush=True)
# where do clip_pack_bin's ~19.5 ms go: the two argsorts or the two
# record gathers?
clip = jax.jit(lambda w: raster_ops.transform_to_clip(w, vp))(wp)
tris = jax.jit(lambda c: raster_ops.clip_triangles(
    c, data.triangles.i0, data.triangles.i1, data.triangles.i2, W, H))(clip)
packed, bbox, valid = jax.jit(raster_pallas.pack_candidates)(tris)
packed = jnp.asarray(packed)
T2 = packed.shape[0]
print(json.dumps({"probe": "T2", "value": int(T2)}), flush=True)
ntx, nty = -(-W // 128), -(-H // 8)
ntiles = ntx * nty
rng = np.random.default_rng(0)
# new-binning sizes: A = (T2/2)*4 entries, B = T2 compaction + 16384*16
keys_a = jnp.asarray(rng.integers(0, ntiles + 1, (T2 // 2) * 4,
                                  dtype=np.int32))
keys_cmp = jnp.asarray(rng.integers(0, T2 + 1, T2, dtype=np.int32))
keys_b = jnp.asarray(rng.integers(0, nty + 1, 16384 * 16, dtype=np.int32))
# old-binning sizes for reference
keys_a8 = jnp.asarray(rng.integers(0, ntiles + 1, T2 * 8, dtype=np.int32))
keys_b16 = jnp.asarray(rng.integers(0, nty + 1, T2 * 16, dtype=np.int32))
idx_a = jnp.asarray(rng.integers(0, T2, 262144, dtype=np.int32))
idx_b = jnp.asarray(rng.integers(0, T2, 32768, dtype=np.int32))


def piece_ms(fn, arg, iters=8):
    loop = jax.jit(lambda a: jax.lax.fori_loop(
        0, iters,
        lambda _, c: c + (fn(c).ravel()[0].astype(c.dtype) % jnp.array(
            3, c.dtype)) * jnp.array(0, c.dtype),
        a))
    r = loop(arg)
    _ = np.asarray(r.ravel()[0])
    t0 = time.perf_counter()
    r = loop(arg)
    _ = np.asarray(r.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


try:
    report("sort_a_new_261k", piece_ms(lambda k: jnp.argsort(k), keys_a))
    report("sort_cmp_130k", piece_ms(lambda k: jnp.argsort(k), keys_cmp))
    report("sort_b_new_262k", piece_ms(lambda k: jnp.argsort(k), keys_b))
    report("sort_a_old_1M", piece_ms(lambda k: jnp.argsort(k), keys_a8))
    report("sort_b_old_2M", piece_ms(lambda k: jnp.argsort(k), keys_b16))
    report("gather_a_262k", piece_ms(lambda i: packed[i].astype(
        jnp.int32), idx_a))
    report("gather_b_32k", piece_ms(lambda i: packed[i].astype(
        jnp.int32), idx_b))
except Exception as e:
    print(json.dumps({"probe": "part3", "error": repr(e)[:250]}),
          flush=True)
print("DONE", flush=True)
