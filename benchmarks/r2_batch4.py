"""Round-2 TPU batch 4, ONE process:

  1. graph-barrier scoping A/B ("all" vs "multi") on the BASE rung and
     the hybrid headline — batch 2 measured the fully-barriered BASE
     rung ~32 ms slower than the hand-fused equivalent (fused_rgcp);
     "multi" barriers only fan-out resources so XLA can fuse
     single-consumer producer→consumer chains.
  2. full-graph (REFLECTION|GI) rung with active-masked trace_radiance
     (miss/cutoff rays skip the nested NEE occlusion traversals) —
     batch 3 measured 3074 ms before masking; plus the half-res
     secondary-ray variant.
  3. 64² floor with burst=8 — splits the ~50 ms floor into dispatch
     (amortized by burst) vs in-executable fixed work.
  4. shard_map(mesh=1) equality on the real chip — proves the Pallas
     kernels execute correctly inside shard_map where hardware exists
     (VERDICT round-1 item 4 done-criterion).
  5. bf16-record traversal (after the Mosaic id-decode fix) — LAST:
     a failed Pallas compile poisons the chip lease for ~2 min.

Run from the repo dir: python - < benchmarks/r2_batch4.py
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

W, H = 1920, 1080
FRAMES = 8

SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
HYBRID = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV
FULL = HYBRID | RenderFlags.REFLECTION | RenderFlags.GI

host = scenes.stress_scene(num_objects=250)
data = host.build()
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))


def frame_ms(settings, frames=FRAMES, burst=0):
    r = Renderer.for_scene(settings, data)
    cam = OrbitCamera(width=settings.width, height=settings.height, **cam_kw)

    def steps(n):
        out = []
        for _ in range(n):
            out.append(cam.step(taa_enabled=True))
            cam.orbit(0.01, 0.0)
        return out

    if burst > 1:
        out = r.render_burst(steps(burst))
        out = r.render_burst(steps(burst))
        _ = np.asarray(out[-1, 0, 0])
        n_bursts = max(1, frames // burst)
        t0 = time.perf_counter()
        for _ in range(n_bursts):
            out = r.render_burst(steps(burst))
        _ = np.asarray(out[-1, 0, 0])
        return 1000.0 * (time.perf_counter() - t0) / (n_bursts * burst)
    out = r.render(steps(1)[0])
    out = r.render(steps(1)[0])
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for c in steps(frames):
        out = r.render(c)
    _ = np.asarray(out[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / frames


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)


def S(flags, **kw):
    return RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                          flags=flags, **kw)


print("=== part 1: barrier scoping A/B ===", flush=True)
report("base_all", frame_ms(S(BASE, graph_barriers="all")))
report("base_multi", frame_ms(S(BASE, graph_barriers="multi")))
report("headline_all", frame_ms(S(HYBRID, graph_barriers="all")))
report("headline_multi", frame_ms(S(HYBRID, graph_barriers="multi")))

print("=== part 2: full graph (masked radiance) ===", flush=True)
report("fullgraph_masked", frame_ms(S(FULL), frames=4))
report("fullgraph_halfres",
       frame_ms(S(FULL, reflection_half_res=True, gi_half_res=True),
                frames=4))

print("=== part 3: 64^2 floor, burst ===", flush=True)
s64 = RenderSettings(width=64, height=64, path=RenderPathType.HYBRID,
                     flags=HYBRID)
report("floor64_single", frame_ms(s64, frames=16))
report("floor64_burst8", frame_ms(s64, frames=16, burst=8))

print("=== part 4: shard_map(mesh=1) equality on TPU ===", flush=True)
try:
    from jax.sharding import Mesh

    from hybridrenderer_tpu.parallel.sharded import ShardedRenderer

    s256 = RenderSettings(width=256, height=256,
                          path=RenderPathType.HYBRID, flags=HYBRID)
    mesh = Mesh(np.array(jax.devices()[:1]), ("y",))
    sr = ShardedRenderer.for_scene(s256, data, mesh, shard_rays=True)
    pr = Renderer.for_scene(s256, data)
    cam1 = OrbitCamera(width=256, height=256, **cam_kw)
    cam2 = OrbitCamera(width=256, height=256, **cam_kw)
    a = b = None
    for _ in range(3):
        a = sr.render(cam1.step(taa_enabled=True))
        b = pr.render(cam2.step(taa_enabled=True))
        cam1.orbit(0.01, 0.0)
        cam2.orbit(0.01, 0.0)
    diff = float(np.abs(np.asarray(a) - np.asarray(b)).max())
    print(json.dumps({"probe": "shardmap1_maxdiff", "value": diff}),
          flush=True)
except Exception as e:  # report, don't kill the batch
    print(json.dumps({"probe": "shardmap1_maxdiff",
                      "error": repr(e)[:300]}), flush=True)

print("=== part 5: bf16 records (id-decode fix) ===", flush=True)
from hybridrenderer_tpu.ops import bvh_wide, trace_pallas
from hybridrenderer_tpu.ops.bvh import build_bvh_host

s = data.triangles
b = build_bvh_host(s.v0, s.v1, s.v2)
wide = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)
wq = bvh_wide.quantize_bf16(wide)

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


def rate(name, w, d, tmax, any_hit):
    nodes = jnp.asarray(w.nodes)
    leaves = jnp.asarray(w.leaves)
    meta = jnp.asarray(w.meta)

    @jax.jit
    def loop(o_in):
        def body(_, carry):
            t, tri, _, _ = trace_pallas.intersect_wide(
                nodes, leaves, meta, carry, d, 1e-3, tmax, any_hit=any_hit)
            bump = jnp.where(jnp.isfinite(t[:1]), t[:1] * 1e-12, 0.0)
            return carry + bump[:, None]
        return jax.lax.fori_loop(0, ITERS, body, o_in)

    r = loop(o)
    _ = np.asarray(r[0, 0])
    t0 = time.perf_counter()
    r = loop(o)
    _ = np.asarray(r[0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"probe": name, "mrays": round(R / dt / 1e6, 2)}),
          flush=True)


rate("shadow_f32", wide, d_shadow, 1e4, True)
rate("shadow_bf16", wq, d_shadow, 1e4, True)
rate("ao_f32", wide, d_ao, 10.0, True)
rate("ao_bf16", wq, d_ao, 10.0, True)
