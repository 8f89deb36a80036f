"""Stage costs of temporal_pallas.reproject at 1080p: window batched
dynamic-slice vs the Pallas kernel vs the whole function. All inputs are
perturbed from the loop carry (no invariant hoisting)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hybridrenderer_tpu.ops import temporal_pallas as tp

H, W = 1080, 1920
ITERS = 8


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, carry):
            out = fn(carry, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.astype(jnp.float32).ravel()[0] * 1e-12 + carry
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
    nty = -(-H // tp.TILE_H)
    ntx = -(-W // tp.TILE_W)
    nt = nty * ntx
    Hp, Wp = nty * tp.TILE_H, ntx * tp.TILE_W

    hpack_pm = jnp.asarray(
        rng.normal(size=(tp.NP, H, W)).astype(np.float32))
    by = jnp.asarray(rng.integers(0, H - 2, size=(H, W)).astype(np.int32))
    # smooth: base = own position + small offset
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    by = jnp.asarray(np.clip(ys - 2, 0, H - 2).astype(np.int32))
    bx = jnp.asarray(np.clip(xs - 3, 0, W - 2).astype(np.int32))
    fy = jnp.asarray(rng.random((H, W)).astype(np.float32))
    fx = jnp.asarray(rng.random((H, W)).astype(np.float32))
    ok = jnp.ones((H, W), bool)
    normal = jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32), (H, W, 1))
    z = jnp.full((H, W), 5.0)
    oid = jnp.zeros((H, W), jnp.int32)

    def full(bump, hp):
        return tp.reproject(hp + bump, by, bx, fy, fx, ok, normal, z, oid)

    timed("reproject_full", full, hpack_pm)

    # windows slice only
    y0 = jnp.asarray(rng.integers(-31, Hp, size=(nt,)).astype(np.int32))
    x0 = jnp.asarray(rng.integers(-127, Wp, size=(nt,)).astype(np.int32))

    def win_only(bump, hp):
        hq = jnp.pad(hp + bump, ((0, 0),
                                 (tp.TILE_H, Hp + tp.WIN_H - H),
                                 (tp.TILE_W, Wp + tp.WIN_W - W)),
                     mode="edge")
        return jax.vmap(
            lambda y, x: jax.lax.dynamic_slice(
                hq, (0, y + tp.TILE_H, x + tp.TILE_W),
                (tp.NP, tp.WIN_H, tp.WIN_W)))(y0, x0)

    timed("windows_slice_only", win_only, hpack_pm)

    windows = jax.jit(lambda hp: win_only(jnp.float32(0), hp))(hpack_pm)
    fields = jnp.asarray(rng.random((1, 10, Hp, Wp)).astype(np.float32))

    import functools
    def kernel_only(bump, win):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, tp.NP, tp.WIN_H, tp.WIN_W),
                             lambda t, *_: (t, 0, 0, 0)),
                pl.BlockSpec((1, 10, tp.TILE_H, tp.TILE_W),
                             lambda t, *_: (0, 0, t // ntx, t % ntx)),
            ],
            out_specs=[pl.BlockSpec((tp.TILE_H, tp.TILE_W),
                                    lambda t, *_: (t // ntx, t % ntx))] * 8,
        )
        outs = pl.pallas_call(
            functools.partial(tp._kernel, ntx),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * 8,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(y0, x0, win + bump, fields)
        return outs[0]

    timed("kernel_only", kernel_only, windows)

    def moveaxis_only(bump, hp):
        return jnp.moveaxis(
            jnp.moveaxis(hp + bump, 0, -1), -1, 0) * 0.5

    timed("double_moveaxis", moveaxis_only, hpack_pm)


if __name__ == "__main__":
    main()


def temporal_full():
    """Append-mode stage: the whole svgf.temporal (tile + pixel) and
    denoise at 1080p with carry-dependent inputs."""
    from hybridrenderer_tpu.ops import svgf
    rng = np.random.default_rng(1)

    def arr(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32))

    signal = jnp.abs(arr(H, W, 4))
    albedo = jnp.abs(arr(H, W, 3))
    motion = arr(H, W, 4) * 0.003
    motion = motion.at[..., 2].set(jnp.abs(motion[..., 2]) * 100 + 1.0)
    normal = motion[..., :3] / jnp.linalg.norm(
        motion[..., :3], axis=-1, keepdims=True)
    oid = jnp.zeros((H, W), jnp.int32)

    def t_fn(g):
        def fn(bump, sig, alb, mot, nrm, o):
            h = svgf.SVGFSignalHistory(signal=sig + bump, moments=sig)
            acc, mom = svgf.temporal(sig + bump, alb, mot + bump, nrm, o,
                                     h, nrm, mot[..., 2], o,
                                     False, True, gather=g)
            return acc + mom
        return fn

    for g in ("tile", "pixel"):
        timed(f"svgf_temporal_{g}", t_fn(g), signal, albedo, motion,
              normal, oid)

    def d_fn(bump, sig, alb, mot, nrm, o):
        h = svgf.SVGFSignalHistory(signal=sig + bump, moments=sig)
        out, nh, var = svgf.denoise(sig + bump, alb, mot + bump, nrm, o,
                                    h, nrm, mot[..., 2], o,
                                    svgf.SVGFConfig(), 
                                    jnp.asarray([4.0, 128.0, 0.02, 0.0]),
                                    True)
        return out

    timed("svgf_denoise_full", d_fn, signal, albedo, motion, normal, oid)


if __name__ == "__main__":
    temporal_full()
