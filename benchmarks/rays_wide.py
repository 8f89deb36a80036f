"""Wide-BVH traversal throughput bench (Mrays/s) + variant bisection.

Prints one JSON line per config. Methodology per CLAUDE.md: chained
executions with one host-readback fence; first post-compile execution
discarded. Env knobs:

  RAYS_SCENE   stress|cube|cornell   (default stress)
  RAYS_OBJECTS stress object count   (default 250)
  RAYS_N       ray count             (default 1<<21, ~1080p)
  RAYS_NPK     packets/program       (default kernel default)
  RAYS_KINDS   comma list: shadow,ao,closest (default shadow,ao)
  RAYS_ITERS   chained executions    (default 4)
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.ops import bvh as bvh_mod
from hybridrenderer_tpu.ops import bvh_wide
from hybridrenderer_tpu.ops import trace_pallas as tp
from hybridrenderer_tpu.scene import scene as scenes


def main():
    scene_name = os.environ.get("RAYS_SCENE", "stress")
    n_obj = int(os.environ.get("RAYS_OBJECTS", "250"))
    R = int(os.environ.get("RAYS_N", str(1 << 21)))
    npk = int(os.environ.get("RAYS_NPK", str(tp.WIDE_PACKETS_PER_PROGRAM)))
    kinds = os.environ.get("RAYS_KINDS", "shadow,ao").split(",")
    iters = int(os.environ.get("RAYS_ITERS", "4"))

    if scene_name == "stress":
        data = scenes.stress_scene(num_objects=n_obj).build()
    elif scene_name == "cornell":
        data = scenes.cornell_scene().build()
    else:
        data = scenes.cube_scene().build()
    s = data.triangles
    T = int(s.instance.shape[0])
    b = bvh_mod.build_bvh(s.v0, s.v1, s.v2)
    wide = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)
    nodes = jnp.asarray(wide.nodes)
    leaves = jnp.asarray(wide.leaves)
    meta = jnp.asarray(wide.meta)

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
    sun /= np.linalg.norm(sun)
    d_shadow = np.tile(sun, (R, 1)) + rng.normal(0, 0.03, (R, 3)).astype(np.float32)
    d_shadow /= np.linalg.norm(d_shadow, axis=-1, keepdims=True)
    d_ao = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d_ao[:, 1] = np.abs(d_ao[:, 1])
    d_ao /= np.linalg.norm(d_ao, axis=-1, keepdims=True)

    cfgs = {
        "shadow": (jnp.asarray(d_shadow), 1e4, True),
        "ao": (jnp.asarray(d_ao), 10.0, True),
        "closest": (jnp.asarray(d_ao), 1e4, False),
    }
    for kind in kinds:
        dirs, tmax, any_hit = cfgs[kind]

        def f(oo, dd=dirs, tm=tmax, ah=any_hit):
            t, tri, u, v = tp.intersect_wide(
                nodes, leaves, meta, oo, dd, 1e-3, tm, any_hit=ah,
                packets_per_program=npk)
            return tri

        fj = jax.jit(f)
        tri = fj(o)
        _ = np.asarray(tri[0])  # compile + first-exec discarded
        t0 = time.perf_counter()
        for _i in range(iters):
            tri = fj(o)
        _ = np.asarray(tri[0])
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "metric": f"wide_{scene_name}{T}_{kind}_npk{npk}",
            "value": round(R / dt / 1e6, 2),
            "unit": "Mrays/s",
            "extra": {"rays": R, "ms": round(dt * 1000, 2), "tris": T,
                      "occl": round(float(np.asarray((tri >= 0)).mean()), 3)},
        }), flush=True)


if __name__ == "__main__":
    main()
