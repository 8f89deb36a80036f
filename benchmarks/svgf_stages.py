"""Stage-level SVGF timing at 1080p on the live backend: temporal
reprojection, filter_moments, variance_blur, atrous, and a bare 2M-row
gather for reference. Each stage is iterated inside one jit via fori_loop
(serial data dependence), one readback fence, first execution discarded.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.ops import stencil_pallas, svgf

H, W = 1080, 1920
ITERS = 8


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, carry):
            out = fn(carry, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = (leaf.astype(jnp.float32).ravel()[0] * 1e-9).astype(
                carry.dtype)
            return carry + bump
        return jax.lax.fori_loop(0, ITERS, body, a[0])

    r = loop(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    r = loop(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print({"stage": name, "ms": round(ms, 2)}, flush=True)


def main():
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    signal = jnp.abs(arr(H, W, 4))
    albedo = jnp.abs(arr(H, W, 3))
    motion = arr(H, W, 4) * 0.01
    motion = motion.at[..., 2].set(jnp.abs(motion[..., 2]) * 100 + 1.0)
    normal = motion[..., :3] / jnp.linalg.norm(
        motion[..., :3], axis=-1, keepdims=True)
    oid = jnp.zeros((H, W), jnp.int32)
    hist = svgf.SVGFSignalHistory(signal=signal, moments=signal)
    phi = jnp.asarray([4.0, 128.0, 0.02, 0.0], jnp.float32)

    # bare row gather reference: 2M rows of 48 floats
    table = arr(H * W, 48)
    idx = jnp.asarray(rng.integers(0, H * W, size=(H * W,)).astype(np.int32))

    # gather at quarter rows (2x2-block granularity estimate)
    table4 = arr(H * W // 4, 192)
    idx4 = jnp.asarray(rng.integers(0, H * W // 4,
                                    size=(H * W // 4,)).astype(np.int32))


    def temporal_fn(sig, alb, mot, nrm, o, hi, pn, pz, po):
        acc, mom = svgf.temporal(sig, alb, mot, nrm, o, hi, pn, pz, po,
                                 False, True)
        return acc + mom

    timed("temporal", temporal_fn, signal, albedo, motion, normal, oid,
          hist, normal, motion[..., 2], oid)

    def moments_fn(sig, *a):
        s, m = stencil_pallas.filter_moments(sig, *a)
        return s + m
    timed("filter_moments_pallas", moments_fn, signal, signal, normal,
          motion, phi)
    timed("variance_blur_pallas",
          lambda m: stencil_pallas.variance_blur(m), signal)
    timed("atrous1_pallas",
          lambda s: stencil_pallas.atrous(s, normal, motion, 1, phi), signal)
    timed("atrous4_pallas",
          lambda s: stencil_pallas.atrous(s, normal, motion, 4, phi), signal)

    def denoise_fn(sig):
        out, _, _ = svgf.denoise(
            sig, albedo, motion, normal, oid, hist, normal, motion[..., 2],
            oid, svgf.SVGFConfig(), phi, True)
        return out
    timed("denoise_full", denoise_fn, signal)


if __name__ == "__main__":
    main()
