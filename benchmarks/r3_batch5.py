"""Round-3 TPU batch 5, ONE process: raster tile-shape re-sweep under
the transposed v4 kernel (VERDICT r2 task 3: raster block 39.2 -> <=25).

Batch 40 rejected wider tiles — but that was the (P,1)-carry era where
the per-program floor scaled with P (128 vregs per carry). v4 carries
are (1,P) lane-major (8 vregs at P=1024), so doubling P now costs ~8
vregs while HALVING the program count (2025 programs x ~6-8 us floor =
most of the 16.7 ms kernel rung). Binning granularity moves with the
tile, so the bin stage is re-measured too (fewer, fatter tiles = fewer
class-A dup entries but more candidates per tile).

Rungs (same burst harness as batch 1/2; BASE flags, 1080p stress):
  base_8x128   control (today's default)
  base_8x256   P=2048, 1013 programs
  base_16x128  P=2048, 1020 programs (squarer: fewer B-row dups)
  base_16x256  P=4096, 510 programs
  base_8x512   P=4096, 510 programs (flattest)
  base_32x128  P=4096, 510 programs (squarest)
then headline (HEAD flags) at the control + best shape.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
cam_kw = dict(distance=30.0, pitch=0.5, yaw=0.8, focal_point=(0, 2.0, 0))

BASE = RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE
SV = (RenderFlags.SVGF | RenderFlags.SVGF_TEMPORAL
      | RenderFlags.SVGF_SPATIAL)
HEAD = BASE | RenderFlags.SHADOW | RenderFlags.AO | SV


def report(name, val, **kw):
    print(json.dumps({"probe": name, "ms": round(val, 2), **kw}),
          flush=True)


def guard(name, fn):
    try:
        report(name, fn())
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


def burst_ms(flags, k=4, **skw):
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


guard("base_8x128", lambda: burst_ms(BASE))
guard("base_8x256", lambda: burst_ms(BASE, tile_h=8, tile_w=256))
guard("base_16x128", lambda: burst_ms(BASE, tile_h=16, tile_w=128))
guard("base_16x256", lambda: burst_ms(BASE, tile_h=16, tile_w=256))
guard("base_8x512", lambda: burst_ms(BASE, tile_h=8, tile_w=512))
guard("base_32x128", lambda: burst_ms(BASE, tile_h=32, tile_w=128))
guard("head_8x128", lambda: burst_ms(HEAD))
# headline at the two most promising shapes (report-time pick would
# need dynamic compiles anyway; 16x256 + 16x128 cover both P tiers)
guard("head_16x128", lambda: burst_ms(HEAD, tile_h=16, tile_w=128))
guard("head_16x256", lambda: burst_ms(HEAD, tile_h=16, tile_w=256))


# ---- dynamic-residual attribution: is the 55 ms dyn-vs-static gap the
# full-tree refit chain (refit_bvh + build_packed + refit_wide +
# requantize, all T-sized every commit)? Time the pieces alone.
def refit_ms():
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=HEAD)
    r = Renderer.for_scene(st, data)
    tr = r.tracer
    tr2 = tr.refit(r.scene)
    _ = np.asarray(tr2.bvh.node_min[0, 0])
    N = 4
    t0 = time.perf_counter()
    for _ in range(N):
        tr2 = tr2.refit(r.scene)
    _ = np.asarray(tr2.bvh.node_min[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / N


def upd_subset_ms():
    from hybridrenderer_tpu.scene import dynamic
    st = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                        flags=HEAD)
    r = Renderer.for_scene(st, data)
    dyn = dynamic.DynamicScene(host, r)
    eid = len(host.entities) - 1
    base_tf = np.asarray(host.entities[eid].transform, np.float32).copy()
    key = frozenset([eid])
    vert_idx, tri_idx, lights_dirty, _n = dyn._dirty_indices(key)
    import jax.numpy as jnp
    d = dynamic.update_transforms_subset(
        r.scene, dyn.maps, jnp.asarray(dyn._transforms), vert_idx,
        tri_idx, update_lights=lights_dirty)
    _ = np.asarray(d.triangles.v0[0, 0])
    N = 4
    t0 = time.perf_counter()
    for _ in range(N):
        d = dynamic.update_transforms_subset(
            d, dyn.maps, jnp.asarray(dyn._transforms), vert_idx,
            tri_idx, update_lights=lights_dirty)
    _ = np.asarray(d.triangles.v0[0, 0])
    return 1000.0 * (time.perf_counter() - t0) / N


guard("refit_full", refit_ms)
guard("upd_subset", upd_subset_ms)

# ---- shade_rows u16 fast-gather in-frame A/B (batch 3/4 follow-up):
# the radiance passes' _shade_hit fetch rides scene.shade_rows when
# shade_fetch="auto"; "attr" is the old f32 wide-row path. Full graph
# is where the ~2x per-pass shade gather lives (batch 2: attr gather
# = 32.1 ms of the 39.4 ms shade stage per pass).
FULL = HEAD | RenderFlags.REFLECTION | RenderFlags.GI
guard("fullg_attr", lambda: burst_ms(FULL, k=2, shade_fetch="attr"))
guard("fullg_shade", lambda: burst_ms(FULL, k=2, shade_fetch="auto"))
print("EXIT=0", flush=True)
