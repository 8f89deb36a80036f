"""Microbench: per-step primitives of the wide-BVH traversal kernel.

Times each candidate building block in isolation inside a fori_loop whose
carry forces the dependency chain, ONE pallas program, one readback fence
(CLAUDE.md methodology). Prints ns/step per primitive. Used to decide the
round-2 traversal redesign (scalar-read extraction vs one-hot, batched
hitmask reduce, AABB/MT vector cost floors).

Primitives:
  onehot48    — (48,128)*one-hot multiply + lane-reduce → (48,1) column
  scalar48    — 48 dynamic-sublane scalar VMEM reads [dyn, static_lane]
  reduce8     — 8 × (8,128)→(1,1) max-reduces (current hitmask)
  reduce1     — packed per-lane bitmask + 1 reduce + decode
  aabb8       — 8-child slab test, vector ops only (scalars prebound)
  mt4         — 4-triangle Moller-Trumbore, vector ops only
  step        — aabb8 + mt4 + onehot48 ×2 + reduce8 (current kernel shape)
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_STEPS = 2000
N_TILES = 64          # fake BVH: 64 tiles = 8192 nodes


K_CHAINS = 8   # independent interleaved chains (the kernel's npk analog):
#                a single chain is latency-bound (~2 us/step measured) and
#                hides the throughput differences between primitives


def _mk_kernel(prim: str):
    def kernel(tiles_ref, flat_ref, o_ref, acc_ref):
        ox = o_ref[0:8, :]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def chain_step(carry):
            acc, idx = carry
            i = idx & (N_TILES * 128 - 1)
            out = acc
            if prim == "onehot48":
                tile = tiles_ref[i >> 7]
                oh = (lane_iota == (i & 127)).astype(jnp.float32)
                col = jnp.sum(tile * oh, axis=1, keepdims=True)  # (48,1)
                out = acc + jnp.sum(col[0:1] + col[47:48])
            elif prim == "scalar48":
                s = jnp.float32(0)
                for r in range(48):
                    s = s + flat_ref[i, r]
                out = acc + s
            elif prim in ("reduce8", "reduce1"):
                x = ox + acc
                oks = [(x * (0.1 * (c + 1)) > 0.5) for c in range(8)]
                if prim == "reduce8":
                    hm = jnp.zeros((1, 1), jnp.int32)
                    for c, okc in enumerate(oks):
                        af = jnp.max(okc.astype(jnp.int32), axis=(0, 1),
                                     keepdims=True)
                        hm = hm | (af << c)
                else:
                    bits = jnp.zeros((8, 128), jnp.int32)
                    for c, okc in enumerate(oks):
                        bits = bits | (okc.astype(jnp.int32) << c)
                    # OR-reduce emulation: max works because we only need
                    # per-bit any; decompose via two stages
                    m = jnp.max(bits, axis=(0, 1), keepdims=True)  # NOT an OR
                    hm = m  # placeholder cost-model: 1 reduce + 8 ops
                out = acc + hm.astype(jnp.float32)[0, 0]
            elif prim == "aabb8":
                fi = idx.astype(jnp.float32)
                hm = jnp.zeros((1, 1), jnp.float32)
                for c in range(8):
                    bmn = fi * 0.001 + c
                    bmx = bmn + 1.0
                    t0 = (bmn - ox) * 0.5
                    t1 = (bmx - ox) * 0.5
                    t0y = (bmn - ox) * 0.25
                    t1y = (bmx - ox) * 0.25
                    t0z = (bmn - ox) * 0.125
                    t1z = (bmx - ox) * 0.125
                    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0, t1),
                                                 jnp.minimum(t0y, t1y)),
                                     jnp.minimum(t0z, t1z))
                    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0, t1),
                                                 jnp.maximum(t0y, t1y)),
                                     jnp.maximum(t0z, t1z))
                    okc = (tn <= tf) & (tf >= 0.0)
                    hm = hm + jnp.max(okc.astype(jnp.float32), axis=(0, 1),
                                      keepdims=True)
                out = acc + hm[0, 0]
            elif prim == "mt4":
                fi = idx.astype(jnp.float32)
                t_best = acc + ox
                for t in range(4):
                    p0 = fi * 0.001 + t
                    e1 = p0 + 1.0
                    e2 = p0 + 2.0
                    pv = ox * e2 - ox * e1
                    det = e1 * pv + e1 * pv + e1 * pv
                    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
                    tv = ox - p0
                    uu = (tv * pv * 3.0) * inv
                    qv = tv * e1 - tv * e2
                    vv = (ox * qv * 3.0) * inv
                    tt = (e2 * qv * 3.0) * inv
                    hit = (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt >= 0) \
                        & (tt <= t_best)
                    t_best = jnp.where(hit, tt, t_best)
                out = acc + jnp.max(t_best, axis=(0, 1), keepdims=True)[0, 0]
            elif prim == "vs2":
                # vector->scalar extraction chain (the pop path)
                oh = lane_iota == (i & 127)
                e = jnp.sum(jnp.where(oh, (ox[0:1] * 0).astype(jnp.int32) + i,
                                      0))
                e2 = jnp.sum(jnp.where(oh, e + lane_iota * 0, 0))
                out = acc + (e2 & 1).astype(jnp.float32)
            if prim == "nop":
                out = acc + idx.astype(jnp.float32) * 1e-9
            return (out, idx + 1)

        def body(k, state):
            return tuple(x for c in range(K_CHAINS)
                         for x in chain_step(state[2 * c:2 * c + 2]))

        acc0 = jnp.zeros((1, 1), jnp.float32)
        init = tuple(x for c in range(K_CHAINS)
                     for x in (acc0, jnp.int32(c * 37)))
        import os
        unroll = int(os.environ.get("UNROLL", "1"))
        state = jax.lax.fori_loop(0, N_STEPS, body, init, unroll=unroll)
        tot = sum(jnp.sum(state[2 * c]) for c in range(K_CHAINS))
        acc_ref[...] = jnp.broadcast_to(tot.reshape(1, 1), (8, 128))

    return kernel


def run(prim: str) -> float:
    tiles = jnp.asarray(np.random.rand(N_TILES, 48, 128).astype(np.float32))
    flat = jnp.asarray(
        np.random.rand(N_TILES * 128, 128).astype(np.float32))
    o = jnp.asarray(np.random.rand(8, 128).astype(np.float32))

    f = pl.pallas_call(
        _mk_kernel(prim),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    fj = jax.jit(lambda a, b, c: f(a, b, c))
    out = fj(tiles, flat, o)
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        out = fj(tiles, flat, out)
    _ = np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    return dt / N_STEPS * 1e9


if __name__ == "__main__":
    import os
    prims = os.environ.get(
        "PRIMS", "nop,onehot48,scalar48,reduce8,reduce1,aabb8,mt4,vs2").split(",")
    for p in prims:
        ns = run(p)
        print(json.dumps({"prim": p, "ns_per_step": round(ns, 1)}),
              flush=True)
