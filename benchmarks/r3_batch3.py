"""Round-3 TPU batch 3, ONE process: XLA row-gather cost model for the
shade attr fetch (batch 2: the attr_rows gather is 32.1 ms of the
39.4 ms in-frame shade stage per radiance pass).

What drives per-ray row-gather cost — row COUNT alone (r1 model:
26-55 ns/row), table SIZE (cache residency), row WIDTH, or dtype?
DCE-proof fori-chained probes: gather R=2.07M random rows from tables
of T rows x Wd floats (f32/bf16), every input depending on the loop
carry. Also: a compaction round trip at 50% density (the
"shade only hit rays" alternative) and an optimization_barrier'd
gather (fusion-stability control for the batch-2 nonee paradox).

Run from the repo dir: python - < benchmarks/r3_batch3.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8
R = 1920 * 1080


def report(name, val, **kw):
    print(json.dumps({"probe": name, "ms": round(val, 3), **kw}),
          flush=True)


def timed(name, step, iters=ITERS):
    @jax.jit
    def loop(z):
        def body(_, carry):
            return carry + step(carry)
        return jax.lax.fori_loop(0, iters, body, z)

    try:
        r = loop(jnp.float32(0.0))
        _ = float(r)
        t0 = time.perf_counter()
        r = loop(jnp.float32(0.0))
        _ = float(r)
        report(name, (time.perf_counter() - t0) / iters * 1e3)
    except Exception as e:
        print(json.dumps({"probe": name, "error": repr(e)[:250]}),
              flush=True)
        time.sleep(60)


rng = np.random.default_rng(7)


def make_gather(T, Wd, dtype, barrier=False):
    table = jnp.asarray(rng.standard_normal((T, Wd)), dtype)
    idx0 = jnp.asarray(rng.integers(0, T, size=(R,)), jnp.int32)

    def step(bump):
        # idx depends on the carry so the gather can't hoist
        idx = jnp.clip(idx0 + bump.astype(jnp.int32), 0, T - 1)
        row = table[idx]
        if barrier:
            row = jax.lax.optimization_barrier(row)
        return jnp.minimum(jnp.sum(row.astype(jnp.float32)) * 1e-12, 1e-7)

    return step


# table-size / width / dtype sweep at 2.07M rows
for T in (65536, 262144, 1048576):
    for Wd, dt, tag in ((84, jnp.float32, "f32w84"),
                        (32, jnp.float32, "f32w32"),
                        (8, jnp.float32, "f32w8"),
                        (32, jnp.bfloat16, "bf16w32"),
                        (84, jnp.bfloat16, "bf16w84")):
        timed(f"g_T{T//1024}k_{tag}", make_gather(T, Wd, dt))

# barrier'd control (fusion stability)
timed("g_T64k_f32w84_bar", make_gather(65536, 84, jnp.float32,
                                       barrier=True))

# row-count scaling: quarter and half the rows at the widest table
for frac, rr in (("half", R // 2), ("quarter", R // 4)):
    table = jnp.asarray(rng.standard_normal((65536, 84)), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, 65536, size=(rr,)), jnp.int32)

    def mk(table=table, idx0=idx0, rr=rr):
        def step(bump):
            idx = jnp.clip(idx0 + bump.astype(jnp.int32), 0, 65535)
            return jnp.minimum(
                jnp.sum(table[idx].astype(jnp.float32)) * 1e-12, 1e-7)
        return step

    timed(f"g_T64k_f32w84_{frac}", mk())

# compaction round trip at ~50% density: mask -> indices (cumsum
# scatter) -> gather half the rows -> scatter results back
mask0 = jnp.asarray(rng.random((R,)) < 0.5)
table = jnp.asarray(rng.standard_normal((65536, 84)), jnp.float32)
idxA = jnp.asarray(rng.integers(0, 65536, size=(R,)), jnp.int32)
CAP = R // 2 + 4096


def compact_step(bump):
    mask = mask0 ^ (bump.astype(jnp.int32) % 2 == 1)
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask, jnp.minimum(rank, CAP - 1), CAP)
    packed_idx = jnp.zeros((CAP,), jnp.int32).at[slot].set(
        idxA, mode="drop")                         # compact hit rows
    rows = table[packed_idx]                       # (CAP, 84) gather
    val = jnp.sum(rows, axis=-1)                   # (CAP,) "shade"
    # un-compact: R-row width-1 gather back to image order
    back = jnp.where(mask, val[jnp.minimum(rank, CAP - 1)], 0.0)
    return jnp.minimum(jnp.sum(back) * 1e-12, 1e-7)


timed("compact_roundtrip_50", compact_step)

# control: plain full-R gather in the same process
timed("g_ctrl_T64k_f32w84", make_gather(65536, 84, jnp.float32))
print("EXIT=0", flush=True)
