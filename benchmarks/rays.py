"""Ray-throughput benchmark (Mrays/s) for the packet traversal kernel.

Prints one JSON line per config. Methodology: median of per-execution
wall times with host-readback fences (the axon tunnel's
block_until_ready returns early; first executions after compile carry a
1-2s one-time cost and are discarded).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.ops import bvh as bvh_mod
from hybridrenderer_tpu.ops import trace_pallas as tp
from hybridrenderer_tpu.scene import scene as scenes


def bench_rays(tag, data, rays=1 << 20, iters=8):
    s = data.triangles
    T = int(s.instance.shape[0])
    if not tp.fits_vmem(T):
        print(json.dumps({"metric": f"mrays_{tag}", "skipped": "bvh>vmem"}))
        return
    b = bvh_mod.build_bvh(s.v0, s.v1, s.v2)
    it, lt = tp.build_packed(b, s.v0, s.v1, s.v2)

    # screen-coherent origins: grid over the scene extent
    n = int(np.sqrt(rays))
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

    for dirs, tmax, kind in ((jnp.asarray(d_shadow), 1e4, "shadow"),
                             (jnp.asarray(d_ao), 10.0, "ao")):
        f = jax.jit(lambda oo, dd=dirs, tm=tmax: tp.intersect_packed(
            it, lt, T, oo, dd, 1e-3, tm, any_hit=True))
        out = f(o)
        _ = np.asarray(out[1][0])  # compile + first-exec cost discarded
        times = []
        for _i in range(iters):
            t0 = time.perf_counter()
            out = f(o)
            _ = np.asarray(out[1][0])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(json.dumps({
            "metric": f"mrays_{tag}_{kind}",
            "value": round(R / med / 1e6, 2),
            "unit": "Mrays/s",
            "extra": {"rays": R, "ms": round(med * 1000, 2),
                      "tris": T,
                      "occlusion": round(float((out[1] >= 0).mean()), 3)},
        }), flush=True)


if __name__ == "__main__":
    bench_rays("cube", scenes.cube_scene().build())
    bench_rays("cornell", scenes.cornell_scene().build())
    bench_rays("stress65k", scenes.stress_scene(num_objects=250).build())
