"""Round-2 TPU batch 14, ONE process:

  1. G-buffer fetch A/B at 1080p: pre-joined per-triangle row (ONE
     per-pixel gather) vs the 5-gather per-pixel form, synthetic
     visibility buffer (gather cost is layout-, not content-dependent).
  2. Traversal chunk_steps retune for the ordered direct-stack kernel
     on the SAH tree (ledger item 1 leftover): 8/16/24/32, full unroll.
  3. BASE + headline hybrid rungs at 1080p with the current defaults
     (compacted binning + eval v2 if accepted + joined G-buffer).

Run from the repo dir: python - < benchmarks/r2_batch14.py
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
from hybridrenderer_tpu.ops import bvh_wide, gbuffer, raster, trace_pallas
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))
ITERS = 8


def report(name, val, unit="ms"):
    print(json.dumps({"probe": name, unit: round(val, 2)}), flush=True)


print("=== part 1: gbuffer fetch join vs pixel (1080p) ===", flush=True)
W, H = 1920, 1080
T = int(data.triangles.count)
rng = np.random.default_rng(0)
vis = raster.VisibilityBuffer(
    depth=jnp.asarray(rng.uniform(0.1, 1.0, (H, W)).astype(np.float32)),
    tri_id=jnp.asarray(rng.integers(-1, T, (H, W), dtype=np.int32)),
    bary1=jnp.asarray(rng.uniform(0, 0.5, (H, W)).astype(np.float32)),
    bary2=jnp.asarray(rng.uniform(0, 0.5, (H, W)).astype(np.float32)),
)
cam = OrbitCamera(width=W, height=H, **cam_kw).step()


def gb_ms(mode):
    os.environ["GBUFFER_FETCH"] = mode

    @jax.jit
    def loop(d0):
        def body(_, carry):
            v = raster.VisibilityBuffer(depth=carry, tri_id=vis.tri_id,
                                        bary1=vis.bary1, bary2=vis.bary2)
            gb = gbuffer.build_gbuffer(v, data, cam)
            return carry + gb.normal[..., 0] * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, d0)

    r = loop(vis.depth)
    _ = np.asarray(r[0, 0])
    t0 = time.perf_counter()
    r = loop(vis.depth)
    _ = np.asarray(r[0, 0])
    return (time.perf_counter() - t0) / ITERS * 1e3


for mode in ("pixel", "join"):
    try:
        report(f"gbuffer1080_{mode}", gb_ms(mode))
    except Exception as e:
        print(json.dumps({"probe": f"gbuffer1080_{mode}",
                          "error": repr(e)[:250]}), flush=True)
        time.sleep(120)
os.environ["GBUFFER_FETCH"] = "auto"

print("=== part 2: direct-ordered chunk_steps retune (SAH) ===", flush=True)
s = data.triangles
b = bvh_mod.build_bvh_host(s.v0, s.v1, s.v2, builder="sah")
wide = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)
nodes = jnp.asarray(wide.nodes)
leaves = jnp.asarray(wide.leaves)
mtiles = trace_pallas.pack_meta_tiles(wide.meta)

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
rngr = np.random.default_rng(1)
sun = np.array([0.4, 1.0, 0.3], np.float32)
d_shadow = jnp.asarray(np.broadcast_to(sun / np.linalg.norm(sun), (R, 3)))
d_ao = rngr.normal(size=(R, 3)).astype(np.float32)
d_ao[:, 1] = np.abs(d_ao[:, 1])
d_ao /= np.linalg.norm(d_ao, axis=-1, keepdims=True)
d_ao = jnp.asarray(d_ao)


def rate(name, d, tmax, any_hit, cs, cu):
    @jax.jit
    def loop(o_in):
        def body(_, carry):
            t, tri, _, _ = trace_pallas.intersect_wide_direct(
                nodes, leaves, mtiles, carry, d, 1e-3, tmax,
                any_hit=any_hit, chunk_steps=cs, chunk_unroll=cu)
            bump = jnp.where(jnp.isfinite(t[:1]), t[:1] * 1e-12, 0.0)
            return carry + bump[:, None]
        return jax.lax.fori_loop(0, 4, body, o_in)

    try:
        r = loop(o)
        _ = np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = loop(o)
        _ = np.asarray(r[0, 0])
        dt = (time.perf_counter() - t0) / 4
        print(json.dumps({"probe": name, "mrays": round(R / dt / 1e6, 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:200]}),
              flush=True)
        time.sleep(150)


for cs in (8, 16, 24, 32):
    rate(f"shadow_cs{cs}", d_shadow, 1e4, True, cs, cs)
rate("ao_cs8", d_ao, 10.0, True, 8, 8)
rate("ao_cs24", d_ao, 10.0, True, 24, 24)
rate("closest_cs8", d_ao, 1e4, False, 8, 8)
rate("closest_cs24", d_ao, 1e4, False, 24, 24)

print("=== part 3: frame rungs with current defaults ===", flush=True)
BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV


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


for name, flags in (("base1080", BASE), ("headline1080", HEAD)):
    try:
        report(name, frame_ms(RenderSettings(
            width=1920, height=1080, path=RenderPathType.HYBRID,
            flags=flags)))
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)
