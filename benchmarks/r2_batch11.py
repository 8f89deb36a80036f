"""Round-2 TPU batch 11: chunk_steps retune for the ordered
direct-stack kernel (termination overshoot profile differs from the
compressed kernel: near-first order finds hits sooner, so smaller
chunks may pay; the while-loop per-iteration overhead argues larger).
One process, SAH tree, 65k stress, 2M rays.

Run from the repo dir: python - < benchmarks/r2_batch11.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.ops import bvh as bvh_mod
from hybridrenderer_tpu.ops import bvh_wide, trace_pallas
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
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
rng = np.random.default_rng(1)
sun = np.array([0.4, 1.0, 0.3], np.float32)
d_shadow = jnp.asarray(np.broadcast_to(sun / np.linalg.norm(sun), (R, 3)))
d_ao = rng.normal(size=(R, 3)).astype(np.float32)
d_ao[:, 1] = np.abs(d_ao[:, 1])
d_ao /= np.linalg.norm(d_ao, axis=-1, keepdims=True)
d_ao = jnp.asarray(d_ao)

ITERS = 4


def rate(name, d, tmax, any_hit, **kw):
    @jax.jit
    def loop(o_in):
        def body(_, carry):
            t, tri, _, _ = trace_pallas.intersect_wide_direct(
                nodes, leaves, mtiles, carry, d, 1e-3, tmax,
                any_hit=any_hit, **kw)
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
        time.sleep(120)


print("=== chunk retune (ordered direct, SAH) ===", flush=True)
rate("shadow_c16", d_shadow, 1e4, True)
rate("shadow_c8", d_shadow, 1e4, True, chunk_steps=8, chunk_unroll=8)
rate("shadow_c32", d_shadow, 1e4, True, chunk_steps=32, chunk_unroll=32)
rate("ao_c16", d_ao, 10.0, True)
rate("ao_c8", d_ao, 10.0, True, chunk_steps=8, chunk_unroll=8)
rate("ao_c32", d_ao, 10.0, True, chunk_steps=32, chunk_unroll=32)
rate("closest_c16", d_ao, 1e4, False)
rate("closest_c32", d_ao, 1e4, False, chunk_steps=32, chunk_unroll=32)
rate("closest_npk2", d_ao, 1e4, False, packets_per_program=2)
rate("shadow_npk8", d_shadow, 1e4, True, packets_per_program=8)
