"""Pinpoint the SVGF temporal cost at 1080p. Every stage input is
perturbed from the loop carry so NOTHING is loop-invariant (an earlier
version measured 21 ms for the pixel path because XLA hoisted the
loop-invariant gather out of the timing loop)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.ops import image as img_ops
from hybridrenderer_tpu.ops import svgf

H, W = 1080, 1920
ITERS = 8


def timed(name, fn, *args):
    """fn(bump_scalar, *args) -> pytree; bump is carry-derived."""
    @jax.jit
    def loop(*a):
        def body(_, carry):
            out = fn(carry, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (leaf.astype(jnp.float32).ravel()[0] * 1e-12 + carry)
        return jax.lax.fori_loop(0, ITERS, body, a[0])

    z = jnp.float32(0.0)
    r = loop(z, *args)
    _ = np.asarray(r)
    t0 = time.perf_counter()
    r = loop(z, *args)
    _ = np.asarray(r)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print({"stage": name, "ms": round(ms, 2)}, flush=True)


def main():
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    signal = jnp.abs(arr(H, W, 4))
    albedo = jnp.abs(arr(H, W, 3))
    motion = arr(H, W, 4) * 0.003
    motion = motion.at[..., 2].set(jnp.abs(motion[..., 2]) * 100 + 1.0)
    normal = motion[..., :3] / jnp.linalg.norm(
        motion[..., :3], axis=-1, keepdims=True)
    oid = jnp.zeros((H, W), jnp.int32)
    hs, hm = signal, signal
    hpack = arr(H, W, 12)

    def temporal_g(g):
        def fn(bump, sig, alb, mot, nrm, o, s_, m_, pn, pz, po):
            mot = mot + bump
            acc, mom = svgf.temporal(
                sig + bump, alb, mot, nrm, o,
                svgf.SVGFSignalHistory(signal=s_ + bump, moments=m_), pn,
                pz, po, False, True, gather=g)
            return acc + mom
        return fn

    for g in ("pixel", "block"):
        timed(f"temporal_{g}", temporal_g(g), signal, albedo, motion,
              normal, oid, hs, hm, normal, motion[..., 2], oid)

    def table_build(bump, hp):
        hp = hp + bump
        taps16 = [img_ops.shift(hp, ty - 1, tx - 1).astype(jnp.float16)
                  for ty in range(4) for tx in range(4)]
        return jnp.concatenate(taps16, axis=-1).reshape(H * W, 192)

    timed("table_build_16shift_f16", table_build, hpack)

    table16 = jax.jit(lambda h: table_build(jnp.float32(0), h))(hpack)
    ry = jnp.asarray(rng.integers(1, H - 3, size=(H // 2, W // 2))
                     .astype(np.int32))
    rx = jnp.asarray(rng.integers(1, W - 3, size=(H // 2, W // 2))
                     .astype(np.int32))

    def gather_f16(bump, t):
        idx = ry * W + rx + bump.astype(jnp.int32)
        return t[idx]

    timed("gather_518k_rows192_f16", gather_f16, table16)

    win = jax.jit(lambda t: gather_f16(jnp.float32(0), t))(table16)
    bx = jnp.asarray(rng.integers(0, 3, size=(H, W)).astype(np.int32))
    f2 = jnp.abs(arr(H, W, 2)) % 1.0

    def phases_accum(bump, w_in):
        w_in = w_in + bump.astype(jnp.float16)

        def phase(x, py, px):
            return x[py::2, px::2]
        outs = []
        for py in (0, 1):
            for px in (0, 1):
                dxp = phase(bx, py, px) - rx
                fxp = phase(f2[..., 0], py, px)
                acc = jnp.zeros(rx.shape + (8,), jnp.float32)
                for t in range(16):
                    wx = jnp.where(dxp + 1 == t % 4, 1.0 - fxp, fxp)
                    row = w_in[..., 12 * t:12 * t + 8].astype(jnp.float32)
                    acc = acc + wx[..., None] * row
                outs.append(acc)
        return outs

    timed("phase_accum_16tap", phases_accum,
          win.reshape(H // 2, W // 2, 192))

    def interleave_only(bump, outs0):
        outs = [o + bump for o in outs0]

        def dil(x, py, px):
            cfg = [(py, 1 - py, 1), (px, 1 - px, 1), (0, 0, 0)]
            return jax.lax.pad(x, jnp.float32(0), cfg)
        return dil(outs[0], 0, 0) + dil(outs[1], 0, 1) \
            + dil(outs[2], 1, 0) + dil(outs[3], 1, 1)

    outs = jax.jit(lambda w: phases_accum(jnp.float32(0), w))(
        win.reshape(H // 2, W // 2, 192))
    timed("interleave_only", interleave_only, outs)


if __name__ == "__main__":
    main()
