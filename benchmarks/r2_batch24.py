"""Round-2 TPU batch 24, ONE process: ray sorting for incoherent rays.

Full-graph reflection/GI rays traverse at ~9.5 Mrays/s (closest-hit,
incoherent) while coherent shadow rays do ~60 — the packet kernel's
per-packet node-visit UNION explodes when a (8,128) packet mixes
directions. XLA argsort is latency-bound (~4 ms for 2M keys, batch 13)
and a packed 2M-row gather is ~25 ms, so regrouping rays into
direction-coherent packets costs ~50-75 ms round trip. Worth it iff the
traversal saves more. Rungs (65k stress, 2M GI-style cosine rays):

  gi_unsorted      closest-hit as-is (tile-major pixel order)
  gi_tax           sort + gather + scatter-back with traversal REPLACED
                   by a trivial consume — the pure relayout tax
  gi_sort_oct      key = direction octant (3b) . pixel packet id
  gi_sort_dir16    key = theta/phi 4x4 bins  . pixel packet id
  ao_sort_oct      same as gi_sort_oct but for short AO rays (tmax 1.5)

Run from the repo dir: python - < benchmarks/r2_batch24.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core import maths
from hybridrenderer_tpu.ops import image as img_ops
from hybridrenderer_tpu.ops import sampling
from hybridrenderer_tpu.ops.trace import SceneTracer
from hybridrenderer_tpu.scene import scene as scenes

host = scenes.stress_scene(num_objects=250)
data = host.build()
W, H = 1920, 1080
ITERS = 4
tracer = SceneTracer.build(data)

# GI-style rays: cosine hemisphere off a ground plane, per-pixel TEA rng
yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
wpos = jnp.stack([(xx - W / 2) * 0.02, jnp.zeros_like(xx),
                  (yy - H / 2) * 0.02], -1)
nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), wpos.shape)
idx = jnp.arange(H * W, dtype=jnp.uint32).reshape(H, W)
seed = sampling.init_random_seed(idx, jnp.uint32(3))
r1, seed = sampling.random_float(seed)
r2, seed = sampling.random_float(seed)
gi_dir = sampling._cosine_dir(r1, r2, nrm)
origin_img = sampling.offset_ray(wpos, nrm)

o_flat, _ = img_ops.to_tile_major(origin_img)
d_flat, _ = img_ops.to_tile_major(gi_dir)
R = o_flat.shape[0]


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def _key(d, bits):
    """Direction-coherence sort key. bits='oct': 3-bit octant;
    bits='dir16': 2 bits per spherical axis (4x4). Packet id (ray//1024)
    is the low field so same-direction rays stay pixel-local."""
    pkt = (jnp.arange(R, dtype=jnp.uint32) >> 10)
    if bits == "oct":
        code = ((d[:, 0] > 0).astype(jnp.uint32)
                | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
                | ((d[:, 2] > 0).astype(jnp.uint32) << 2))
        return (code << 21) | pkt
    t4 = jnp.clip(((d[:, 1] * 0.5 + 0.5) * 4).astype(jnp.uint32), 0, 3)
    p4 = jnp.clip(((jnp.arctan2(d[:, 2], d[:, 0]) / (2 * np.pi) + 0.5)
                   * 4).astype(jnp.uint32), 0, 3)
    return (((t4 << 2) | p4) << 21) | pkt


def _traverse(o, d, tmax):
    t, tri, u, v = tracer._intersect(data, o, d, 0.01, tmax, any_hit=False)
    return t, tri, u, v


def step_unsorted(bump, tmax=1e6):
    t, tri, u, v = _traverse(o_flat + bump, d_flat, tmax)
    return s(t) + s(tri) + s(u) + s(v)


def _sorted_step(bump, bits, tmax, trivial=False):
    o = o_flat + bump
    d = d_flat
    packed = jnp.concatenate([o, d], axis=-1)            # (R, 6)
    order = jnp.argsort(_key(d, bits))
    rows = packed[order]                                 # ONE wide gather
    if trivial:
        res = rows[:, 0:4] * 2.0                         # stand-in result
    else:
        t, tri, u, v = _traverse(rows[:, 0:3], rows[:, 3:6], tmax)
        res = jnp.stack([t, tri.astype(jnp.float32),
                         u, v], axis=-1)                 # (R, 4)
    # scatter back to pixel order: ONE wide scatter
    unsorted = jnp.zeros_like(res).at[order].set(res)
    return s(unsorted)


def timed(name, step):
    @jax.jit
    def loop(z):
        def body(_, carry):
            return carry + step(carry)
        return jax.lax.fori_loop(0, ITERS, body, z)

    try:
        r = loop(jnp.float32(0.0))
        _ = float(r)
        t0 = time.perf_counter()
        r = loop(jnp.float32(0.0))
        _ = float(r)
        report(name, (time.perf_counter() - t0) / ITERS * 1e3)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(120)


timed("gi_unsorted", step_unsorted)
timed("gi_tax", lambda b: _sorted_step(b, "oct", 1e6, trivial=True))
timed("gi_sort_oct", lambda b: _sorted_step(b, "oct", 1e6))
timed("gi_sort_dir16", lambda b: _sorted_step(b, "dir16", 1e6))
timed("ao_unsorted", lambda b: step_unsorted(b, tmax=1.5))
timed("ao_sort_oct", lambda b: _sorted_step(b, "oct", 1.5))
print("EXIT=0", flush=True)
