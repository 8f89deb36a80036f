"""Round-2 TPU batch 3: burst-dispatch headline + bf16-record traversal
A/B, one process.

  1. bench.py with BENCH_BURST=8 (frames-in-flight dispatch — amortizes
     the ~50 ms per-dispatch tunnel floor measured in batch 2).
  2. bf16 vs f32 wide-record traversal, same process, 65k-tri stress:
     shadow (coherent any-hit) + AO (incoherent short) rates.

Run from the repo dir: python - < benchmarks/r2_batch3.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

os.environ.setdefault("BENCH_FRAMES", "16")
os.environ.setdefault("BENCH_BURST", "8")

print("=== part 1: bench.py (burst=8) ===", flush=True)
import bench

bench.main()

print("=== part 2: bf16 vs f32 traversal ===", flush=True)
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.ops import bvh_wide, trace_pallas
from hybridrenderer_tpu.ops.bvh import build_bvh_host
from hybridrenderer_tpu.scene import scene as scenes

data = scenes.stress_scene(num_objects=250).build()
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

    import jax

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
