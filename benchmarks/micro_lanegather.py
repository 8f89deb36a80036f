"""Microbench: per-lane dynamic gather (take_along_axis on the lane dim)
inside a Pallas TPU kernel — the primitive a windowed SVGF temporal
reprojection kernel would lean on. Measures cost per (32, 128) gathered
tile with source width 384 (one lane-tile halo each side), chained
through data dependencies, one readback fence.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW, SW = 32, 128, 384
P = 12          # planes gathered per candidate step
REPS = 64       # gathers per kernel invocation


def kernel(src_ref, idx_ref, out_ref):
    idx = idx_ref[...]  # (TH, TW) int32 in [0, SW)
    acc = jnp.zeros((TH, TW), jnp.float32)
    for p in range(P):
        rows = src_ref[p]            # (TH, SW)
        for r in range(REPS // P):
            g = jnp.take_along_axis(
                rows, (idx + r) % SW, axis=1)  # varying idx defeats CSE
            acc = acc + g[:, :TW]
    out_ref[...] = acc


@jax.jit
def run(src, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((TH, TW), jnp.float32),
    )(src, idx)


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(P, TH, SW)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, SW, size=(TH, TW)).astype(np.int32))

    out = run(src, idx)
    _ = np.asarray(out[0, 0])  # compile + first-exec discard
    out = run(src, idx)
    _ = np.asarray(out[0, 0])

    N = 200
    t0 = time.perf_counter()
    o = src
    for i in range(N):
        r = run(o[:1, :, :TW].sum() * 0 + src, idx)  # data-dep chain
        o = o.at[0, 0, 0].set(r[0, 0])
    _ = np.asarray(o[0, 0, 0])
    dt = time.perf_counter() - t0
    per_gather_us = dt / N / REPS * 1e6
    print({"us_per_tile_gather": round(per_gather_us, 3),
           "total_s": round(dt, 3)})
    # ref: a (32,128) tile of f32 = 16 KB; 1080p needs 510 tiles x
    # 17 dy-candidates x ~24 plane-gathers ~= 208k tile-gathers/frame.
    print({"est_1080p_temporal_ms": round(per_gather_us * 510 * 17 * 24
                                          / 1e3, 1)})


if __name__ == "__main__":
    main()
