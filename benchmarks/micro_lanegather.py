"""Microbench: per-lane dynamic gather (take_along_axis on the lane dim)
inside a Pallas TPU kernel — the primitive a windowed SVGF temporal
reprojection kernel would lean on.

Mosaic constraints found on the way:
  * the index array must have the same shape as the gathered source
    (take_along_axis with matching dims; output = full source width),
  * the source may span only ONE vreg along the gather dim (width
    <= 128 lanes) — "Multiple source vregs along gather dimension".

So a windowed reprojection kernel must gather per 128-lane tile and
handle x-halo by gathering the (up to 3) neighboring lane-tiles
separately and selecting. This measures the per-(32,128)-tile gather
cost; the whole iteration loop runs inside one jit to avoid tunnel
dispatch overhead.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TH, TW = 32, 128
P = 12           # planes gathered per candidate step
REPS = 60        # gathers per kernel invocation
ITERS = 50       # kernel invocations chained in one jit


def kernel(src_ref, idx_ref, out_ref):
    idx = idx_ref[...]  # (TH, TW) int32 in [0, TW)
    acc = jnp.zeros((TH, TW), jnp.float32)
    for p in range(P):
        rows = src_ref[p]            # (TH, TW)
        for r in range(REPS // P):
            g = jnp.take_along_axis(rows, (idx + r) % TW, axis=1)
            acc = acc + g
    out_ref[...] = acc


@jax.jit
def run(src, idx):
    def body(_, carry):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((TH, TW), jnp.float32),
        )(carry, idx)
        # feed the result back so iterations are serially dependent
        return carry.at[0].set(carry[0] * 0.999 + out * 1e-9)

    return jax.lax.fori_loop(0, ITERS, body, src)


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(P, TH, TW)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, TW, size=(TH, TW)).astype(np.int32))

    out = run(src, idx)
    _ = np.asarray(out[0, 0, 0])  # compile + first-exec discard
    t0 = time.perf_counter()
    out = run(src, idx)
    _ = np.asarray(out[0, 0, 0])
    dt = time.perf_counter() - t0
    per_gather_us = dt / ITERS / REPS * 1e6
    print({"us_per_tile_gather": round(per_gather_us, 3),
           "total_s": round(dt, 3)})
    # 1080p temporal estimate: 510 tiles x 17 dy-candidates x 24
    # plane-gathers (12 planes x 2 x-taps)
    print({"est_1080p_temporal_gather_ms":
           round(per_gather_us * 510 * 17 * 24 / 1e3, 1)})


if __name__ == "__main__":
    main()
