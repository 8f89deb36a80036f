"""Round-2 TPU batch 25, ONE process: npk sweep for the ordered direct
kernel + scale-rung re-measure.

WIDE_PACKETS_PER_PROGRAM=4 was tuned on the r1 compressed kernel; the
ordered direct-stack kernel (new default) was never swept. npk trades
per-step latency hiding (more interleaved packets overlap their
VMEM/VPU dependencies) against register/scratch pressure. Sweep 2/4/8
on all three ray types at 1080p (2.07M rays, 65k stress), then
re-measure the 284k-tri scale rung under the CURRENT kernel (the 10.3
Mrays/s number predates ordered pushes + bf16 autoselect).

  shadow_npk{2,4,8}   coherent sun rays, any_hit, tmax 1000
  ao_npk{2,4,8}       cosine rays, any_hit, tmax 10 (the pass radius)
  gi_npk{2,4,8}       cosine rays, closest-hit, tmax 1e6
  shadow284k / gi284k at the winning npk (284k-tri stress)

Run from the repo dir: python - < benchmarks/r2_batch25.py
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

W, H = 1920, 1080
ITERS = 4
MRAYS = W * H / 1e6

host = scenes.stress_scene(num_objects=250)
data = host.build()
tracer = SceneTracer.build(data)

yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")
wpos = jnp.stack([(xx - W / 2) * 0.02, jnp.zeros_like(xx),
                  (yy - H / 2) * 0.02], -1)
nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), wpos.shape)
idx = jnp.arange(H * W, dtype=jnp.uint32).reshape(H, W)
seed = sampling.init_random_seed(idx, jnp.uint32(3))
r1, seed = sampling.random_float(seed)
r2, seed = sampling.random_float(seed)
cos_dir = sampling._cosine_dir(r1, r2, nrm)
sun_dir = maths.normalize(-data.sun.direction)

o_flat, _ = img_ops.to_tile_major(sampling.offset_ray(wpos, nrm))
cos_flat, _ = img_ops.to_tile_major(cos_dir)
sun_flat = jnp.broadcast_to(sun_dir, o_flat.shape)


def report(name, ms):
    print(json.dumps({"probe": name, "ms": round(ms, 2),
                      "mrays": round(MRAYS / ms * 1000.0, 1)}), flush=True)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


def make_step(tr, dat, o0, d0, tmax, any_hit):
    def step(bump):
        t, tri, u, v = tr._intersect(dat, o0 + bump, d0, 0.01, tmax,
                                     any_hit=any_hit)
        return s(t) + s(tri) + s(u) + s(v)
    return step


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


for npk in (4, 2, 8):
    os.environ["WIDE_NPK"] = str(npk)
    timed(f"shadow_npk{npk}",
          make_step(tracer, data, o_flat, sun_flat, 1000.0, True))
    timed(f"ao_npk{npk}",
          make_step(tracer, data, o_flat, cos_flat, 10.0, True))
    timed(f"gi_npk{npk}",
          make_step(tracer, data, o_flat, cos_flat, 1e6, False))

os.environ.pop("WIDE_NPK", None)

big = scenes.stress_scene(num_objects=1000).build()
big_tracer = SceneTracer.build(big)
timed("shadow284k", make_step(big_tracer, big, o_flat, sun_flat,
                              1000.0, True))
timed("gi284k", make_step(big_tracer, big, o_flat, cos_flat, 1e6, False))
print("EXIT=0", flush=True)
