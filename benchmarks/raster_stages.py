"""Stage-level raster-path timing at 1080p stress: clip+pack+bin, the
Pallas tile kernel, G-buffer build, and the full raster-only frame for
cross-checking. Each stage loops inside one jit (serial dependence via
an input perturbation), one readback fence, first execution discarded.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.ops import gbuffer as gb_ops
from hybridrenderer_tpu.ops import raster as raster_ops
from hybridrenderer_tpu.ops import raster_pallas
from hybridrenderer_tpu.scene import scene as scenes

W, H = 1920, 1080
ITERS = 8


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, carry):
            out = fn(carry, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = (leaf.astype(jnp.float32).ravel()[0] * 1e-12).astype(
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
    host = scenes.stress_scene(num_objects=250)
    data = host.build()
    cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                      focal_point=(0, 2.0, 0))
    state = cam.step()
    vp = jnp.asarray(np.asarray(state.proj) @ np.asarray(state.view))

    wp = data.vertices.world_position

    def clip_pack_bin(wpos, viewproj):
        clip = raster_ops.transform_to_clip(wpos, viewproj)
        tris = raster_ops.clip_triangles(
            clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
            W, H)
        packed, bbox, valid = raster_pallas.pack_candidates(tris)
        bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
        return bins

    timed("clip_pack_bin", clip_pack_bin, wp, vp)

    bins = jax.jit(clip_pack_bin)(wp, vp)
    bins = jax.tree_util.tree_map(jnp.asarray, bins)

    def kernel_only(stream_a, *_):
        b = dict(bins)
        b["stream_a"] = stream_a
        vis = raster_pallas.raster_tiles(b, W, H)
        return vis.depth

    timed("raster_kernel", kernel_only, bins["stream_a"])

    def full_vis(wpos, viewproj):
        clip = raster_ops.transform_to_clip(wpos, viewproj)
        tris = raster_ops.clip_triangles(
            clip, data.triangles.i0, data.triangles.i1, data.triangles.i2,
            W, H)
        return raster_pallas.rasterize_binned(tris, W, H)

    vis = jax.jit(full_vis)(wp, vp)
    vis = jax.tree_util.tree_map(jnp.asarray, vis)

    def gbuf(depth, *_):
        v = raster_ops.VisibilityBuffer(
            tri_id=vis.tri_id, bary1=vis.bary1, bary2=vis.bary2, depth=depth)
        g = gb_ops.build_gbuffer(v, data, state)
        return g.albedo

    timed("build_gbuffer", gbuf, vis.depth)


if __name__ == "__main__":
    main()
