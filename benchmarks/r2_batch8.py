"""Round-2 TPU batch 8, ONE process:

  1. Direct-stack vs compressed-entry packet traversal rates (isolated,
     65k stress, SAH build): the direct pop drops 2 SMEM reads + the
     popcount decode from the serial chain, the push adds ~8 cheap
     lane-selects; A/B decides the default below the SMEM ceiling.
  2. ~1M-tri capacity row (batch-6 retry): the direct kernel removes
     the SMEM meta ceiling that killed the compressed kernel's compile.

Run from the repo dir: python - < benchmarks/r2_batch8.py
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
from hybridrenderer_tpu.ops import bvh as bvh_mod
from hybridrenderer_tpu.ops import bvh_wide, trace_pallas
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
s = data.triangles


def pack(builder):
    b = bvh_mod.build_bvh_host(s.v0, s.v1, s.v2, builder=builder)
    wide = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)
    return (jnp.asarray(wide.nodes), jnp.asarray(wide.leaves),
            jnp.asarray(wide.meta), trace_pallas.pack_meta_tiles(wide.meta))


nodes, leaves, meta, mtiles = pack("lbvh")
nodes_s, leaves_s, meta_s, mtiles_s = pack("sah")

R = 1 << 21
n = int(np.sqrt(R))
amin = np.asarray(s.v0).min(0)
amax = np.asarray(s.v0).max(0)
xs = np.linspace(amin[0], amax[0], n, dtype=np.float32)
zs = np.linspace(amin[2], amax[2], n, dtype=np.float32)
X, Z = np.meshgrid(xs, zs)
o = jnp.asarray(np.stack([X, np.full_like(X, amin[1] + 0.1), Z], -1)
                .reshape(-1, 3))
R = o.shape[0]
rng = np.random.default_rng(1)
sun = np.array([0.4, 1.0, 0.3], np.float32)
d_shadow = jnp.asarray(np.broadcast_to(sun / np.linalg.norm(sun), (R, 3)))
d_ao = rng.normal(size=(R, 3)).astype(np.float32)
d_ao[:, 1] = np.abs(d_ao[:, 1])
d_ao /= np.linalg.norm(d_ao, axis=-1, keepdims=True)
d_ao = jnp.asarray(d_ao)

ITERS = 4


def rate(name, fn, d, tmax, any_hit):
    @jax.jit
    def loop(o_in):
        def body(_, carry):
            t, tri, _, _ = fn(carry, d, 1e-3, tmax, any_hit=any_hit)
            bump = jnp.where(jnp.isfinite(t[:1]), t[:1] * 1e-12, 0.0)
            return carry + bump[:, None]
        return jax.lax.fori_loop(0, ITERS, body, o_in)

    try:
        r = loop(o)
        _ = np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = loop(o)
        _ = np.asarray(r[0, 0])
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"probe": name, "mrays": round(R / dt / 1e6, 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:200]}),
              flush=True)
        time.sleep(150)


def compressed(o_, d_, tmin, tmax, **kw):
    return trace_pallas.intersect_wide(nodes, leaves, meta, o_, d_,
                                       tmin, tmax, **kw)


def direct_ord(o_, d_, tmin, tmax, **kw):
    return trace_pallas.intersect_wide_direct(nodes, leaves, mtiles,
                                              o_, d_, tmin, tmax, **kw)


def direct_plain(o_, d_, tmin, tmax, **kw):
    return trace_pallas.intersect_wide_direct(nodes, leaves, mtiles,
                                              o_, d_, tmin, tmax,
                                              ordered=False, **kw)


def direct_sah(o_, d_, tmin, tmax, **kw):
    return trace_pallas.intersect_wide_direct(nodes_s, leaves_s, mtiles_s,
                                              o_, d_, tmin, tmax, **kw)


print("=== part 1: stack/order A/B (LBVH) ===", flush=True)
rate("shadow_compressed", compressed, d_shadow, 1e4, True)
rate("shadow_direct_ord", direct_ord, d_shadow, 1e4, True)
rate("ao_compressed", compressed, d_ao, 10.0, True)
rate("ao_direct_ord", direct_ord, d_ao, 10.0, True)
rate("closest_compressed", compressed, d_ao, 1e4, False)
rate("closest_direct_ord", direct_ord, d_ao, 1e4, False)
rate("ao_direct_plain", direct_plain, d_ao, 10.0, True)
rate("closest_direct_plain", direct_plain, d_ao, 1e4, False)

print("=== part 1b: ordered direct on the SAH tree ===", flush=True)
rate("shadow_sah_direct_ord", direct_sah, d_shadow, 1e4, True)
rate("ao_sah_direct_ord", direct_sah, d_ao, 10.0, True)
rate("closest_sah_direct_ord", direct_sah, d_ao, 1e4, False)

SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

print("=== part 1c: headline (lbvh + tile AO defaults) ===", flush=True)


def frame_ms(settings, dat, frames=8):
    r = Renderer.for_scene(settings, dat)
    cam = OrbitCamera(width=settings.width, height=settings.height, **cam_kw)
    out = r.render(cam.step(taa_enabled=True))
    out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(frames):
        cam.orbit(0.01, 0.0)
        out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / frames


try:
    ms = frame_ms(RenderSettings(width=1920, height=1080,
                                 path=RenderPathType.HYBRID,
                                 flags=BASE | RenderFlags.SHADOW
                                 | RenderFlags.AO | SV), data)
    print(json.dumps({"probe": "headline_default", "ms": round(ms, 2)}),
          flush=True)
except Exception as e:
    print(json.dumps({"probe": "headline_default",
                      "error": repr(e)[:200]}), flush=True)

print("=== part 2: ~1M-tri capacity (direct stacks) ===", flush=True)

big = scenes.stress_scene(num_objects=4000).build()
print(json.dumps({"probe": "big_tris", "value": int(big.num_triangles)}),
      flush=True)
try:
    r = Renderer.for_scene(
        RenderSettings(width=1920, height=1080, path=RenderPathType.HYBRID,
                       flags=BASE | RenderFlags.SHADOW | RenderFlags.AO),
        big)
    print(json.dumps({"probe": "big_backend",
                      "value": r.tracer.backend,
                      "direct": r.tracer.wide_meta_tiles is not None,
                      "dtype": str(r.tracer.wide_nodes.dtype)
                      if r.tracer.wide_nodes is not None else None}),
          flush=True)
    cam = OrbitCamera(width=1920, height=1080, **cam_kw)
    out = r.render(cam.step(taa_enabled=True))
    out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(4):
        cam.orbit(0.01, 0.0)
        out = r.render(cam.step(taa_enabled=True))
    _ = np.asarray(out[0, 0])
    print(json.dumps({"probe": "big_shadow_ao_1080p",
                      "ms": round(1000.0 * (time.perf_counter() - t0) / 4,
                                  2)}), flush=True)
except Exception as e:
    print(json.dumps({"probe": "big_shadow_ao_1080p",
                      "error": repr(e)[:300]}), flush=True)
