"""Round-2 TPU batch 36, ONE process: SVGF chain decomposition at 1080p.

Batch 35 found the 5-kernel stencil stack is only ~5-7 ms of the
21-23 ms chain — the temporal reprojection path dominates. Decompose
it (all isolated, fori-loop DCE-proof, svgf_tile=(32,384)):

  temporal        svgf.temporal only (hpack + windows + kernel + merge)
  hpack_only      the (H,W,12) concat + plane-major moveaxis alone
  reproject_only  temporal_pallas.reproject on a pre-packed hpack_pm
  moments / blur / atrous1  individual stencil stages
  chain           full denoise (control; batch-35: 21.29)

If hpack+moveaxis and the validation sweep dominate, the fix is a
fused 3-signal temporal kernel (validation weights are chain-invariant:
same motion, same prev geometry) + persistent plane-major history.

Run from the repo dir: python - < benchmarks/r2_batch36.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.ops import svgf as svgf_ops
from hybridrenderer_tpu.ops import temporal_pallas

W, H = 1920, 1080
ITERS = 8
TILE = (32, 384)

rng = np.random.default_rng(0)
sig0 = jnp.asarray(rng.random((H, W, 4), dtype=np.float32))
alb = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
mp = jnp.asarray(rng.random((H, W, 4), dtype=np.float32) + 0.5)
nrm = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
oid = jnp.zeros((H, W), jnp.int32)
phi = jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32)
hist = svgf_ops.SVGFSignalHistory.create(H, W)
mom0 = jnp.asarray(rng.random((H, W, 4), dtype=np.float32) + 0.5)
oid_f = oid.astype(jnp.float32)


def report(name, val):
    print(json.dumps({"probe": name, "ms": round(val, 2)}), flush=True)


def s(x):
    return jnp.minimum(jnp.sum(x.astype(jnp.float32)) * 1e-12, 1e-7)


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


cfg = svgf_ops.SVGFConfig(prefix="p", temporal_enabled=True,
                          spatial_enabled=True, tile=TILE)


def chain_step(bump):
    out, nh, var = svgf_ops.denoise(
        sig0 + bump, alb, mp, nrm, oid, hist, nrm, mp[..., 2], oid,
        cfg, phi, history_valid=True)
    return s(out) + s(nh.signal) + s(nh.moments) + s(var)


def temporal_step(bump):
    sig, mom = svgf_ops.temporal(
        sig0 + bump, alb, mp, nrm, oid, hist, nrm, mp[..., 2], oid,
        False, True, gather="tile")
    return s(sig) + s(mom)


def hpack_step(bump):
    hpack = jnp.concatenate([
        hist.signal + bump, hist.moments[..., :2], hist.moments[..., 3:4],
        nrm, mp[..., 2:3], oid_f[..., None]], axis=-1)
    return s(jnp.moveaxis(hpack, -1, 0))


# pre-packed plane-major history (outside the loop; bump keeps it live)
hpack_pm0 = jnp.moveaxis(jnp.concatenate([
    hist.signal, hist.moments[..., :2], hist.moments[..., 3:4],
    nrm, mp[..., 2:3], oid_f[..., None]], axis=-1), -1, 0)
by0 = jnp.clip((rng.random((H, W)) * 4).astype(np.int32), 0, H - 2)
bx0 = jnp.clip((rng.random((H, W)) * 4).astype(np.int32), 0, W - 2)
fy0 = jnp.asarray(rng.random((H, W), dtype=np.float32))
fx0 = jnp.asarray(rng.random((H, W), dtype=np.float32))
okm = jnp.ones((H, W), bool)


def reproject_step(bump):
    hs, hm, hl, ws = temporal_pallas.reproject(
        hpack_pm0 + bump, by0, bx0, fy0, fx0, okm, nrm, mp[..., 2], oid_f)
    return s(hs) + s(hm) + s(hl) + s(ws)


def moments_step(bump):
    from hybridrenderer_tpu.ops import stencil_pallas
    sg, mo = stencil_pallas.filter_moments(sig0 + bump, mom0, nrm, mp, phi,
                                           tile=TILE)
    return s(sg) + s(mo)


def blur_step(bump):
    from hybridrenderer_tpu.ops import stencil_pallas
    return s(stencil_pallas.variance_blur(mom0 + bump, tile=TILE))


def atrous_step(bump):
    from hybridrenderer_tpu.ops import stencil_pallas
    return s(stencil_pallas.atrous(sig0 + bump, nrm, mp, 1, phi, tile=TILE))


timed("chain", chain_step)
timed("temporal", temporal_step)
timed("hpack_only", hpack_step)
timed("reproject_only", reproject_step)
timed("moments", moments_step)
timed("blur", blur_step)
timed("atrous1", atrous_step)
print("EXIT=0", flush=True)
