"""Round-2 TPU batch 5, ONE process:

  1. MIMT vs packet traversal rates (isolated, 65k stress, 2M rays):
     shadow (coherent any-hit) + AO (incoherent short) + chunk/npk
     sensitivity. Host-sim step-count ceiling: 2.2x / 2.6x.
  2. 64^2 floor attribution: batch-4 showed the ~50 ms per-frame floor
     is IN-EXECUTABLE (burst=8 did not amortize it). Rungs isolate the
     resolution-independent cost: forward vs hybrid BASE vs jnp-raster
     BASE vs +SHADOW/+AO/+SVGF.
  3. If MIMT wins: 1080p hybrid headline with WIDE_KERNEL=mimt.

Run from the repo dir: python - < benchmarks/r2_batch5.py
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.ops import bvh_wide, trace_pallas
from hybridrenderer_tpu.ops.bvh import build_bvh_host
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
s = data.triangles
b = build_bvh_host(s.v0, s.v1, s.v2)
wide = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)
nodes = jnp.asarray(wide.nodes)
leaves = jnp.asarray(wide.leaves)
meta = jnp.asarray(wide.meta)
nodes_p8 = trace_pallas.pack_p8(jnp.asarray(wide.nodes_flat))
leaves_p8 = trace_pallas.pack_p8(jnp.asarray(wide.leaves_flat))

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


def rate(name, fn, d, tmax, any_hit, **kw):
    @jax.jit
    def loop(o_in):
        def body(_, carry):
            t, tri, _, _ = fn(carry, d, 1e-3, tmax, any_hit=any_hit, **kw)
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
        return True
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:200]}),
              flush=True)
        traceback.print_exc()
        time.sleep(150)   # let a poisoned lease recover
        return False


def packet(o_, d_, tmin, tmax, **kw):
    return trace_pallas.intersect_wide(nodes, leaves, meta, o_, d_,
                                       tmin, tmax, **kw)


def mimt(o_, d_, tmin, tmax, **kw):
    return trace_pallas.intersect_mimt(nodes_p8, leaves_p8, meta, o_, d_,
                                       tmin, tmax, **kw)


print("=== part 1: MIMT vs packet rates ===", flush=True)
rate("shadow_packet", packet, d_shadow, 1e4, True)
ok = rate("shadow_mimt", mimt, d_shadow, 1e4, True)
if ok:
    rate("ao_mimt", mimt, d_ao, 10.0, True)
rate("ao_packet", packet, d_ao, 10.0, True)
if ok:
    rate("shadow_mimt_chunk8", mimt, d_shadow, 1e4, True, chunk_steps=8,
         chunk_unroll=8)
    rate("ao_mimt_chunk8", mimt, d_ao, 10.0, True, chunk_steps=8,
         chunk_unroll=8)
    rate("ao_mimt_npk2", mimt, d_ao, 10.0, True, packets_per_program=2)
    rate("closest_mimt", mimt, d_ao, 1e4, False)
    rate("closest_packet", packet, d_ao, 1e4, False)

print("=== part 2: 64^2 floor attribution ===", flush=True)
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))


def frame_ms(settings, frames=16):
    r = Renderer.for_scene(settings, data)
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


def S64(path, flags, **kw):
    return RenderSettings(width=64, height=64, path=path, flags=flags, **kw)


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


try:
    report("fwd64", frame_ms(S64(RenderPathType.FORWARD,
                                 RenderFlags.LIGHT | RenderFlags.IBL
                                 | RenderFlags.TAA)))
    report("base64", frame_ms(S64(RenderPathType.HYBRID, BASE)))
    report("base64_jnp_raster", frame_ms(
        S64(RenderPathType.HYBRID, BASE, raster_backend="jnp")))
    report("base64_shadow", frame_ms(
        S64(RenderPathType.HYBRID, BASE | RenderFlags.SHADOW)))
    report("base64_shadow_ao", frame_ms(
        S64(RenderPathType.HYBRID,
            BASE | RenderFlags.SHADOW | RenderFlags.AO)))
    report("hybrid64_full", frame_ms(
        S64(RenderPathType.HYBRID,
            BASE | RenderFlags.SHADOW | RenderFlags.AO | SV)))
except Exception as e:
    print(json.dumps({"probe": "floor64", "error": repr(e)[:200]}),
          flush=True)

if ok:
    print("=== part 3: 1080p headline with MIMT ===", flush=True)
    trace_pallas.WIDE_KERNEL = "mimt"
    try:
        hyb = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
        ms = frame_ms(RenderSettings(width=1920, height=1080,
                                     path=RenderPathType.HYBRID,
                                     flags=hyb), frames=8)
        report("headline_mimt", ms)
    except Exception as e:
        print(json.dumps({"probe": "headline_mimt",
                          "error": repr(e)[:200]}), flush=True)
