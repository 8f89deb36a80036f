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


def composition_stage():
    """Append: composition+postprocess+sky over a fake registry."""
    from hybridrenderer_tpu.core.config import RenderSettings
    from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
    from hybridrenderer_tpu.graph import passes as gpasses
    from hybridrenderer_tpu.graph.params import FrameParams, FrameState, RS
    from hybridrenderer_tpu.ops import sky as sky_ops
    from hybridrenderer_tpu.ops.gbuffer import GBuffer

    host = scenes.stress_scene(num_objects=250)
    data = host.build()
    cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                      focal_point=(0, 2.0, 0))
    state = cam.step()
    rng = np.random.default_rng(0)

    def arr(*s):
        return jnp.asarray(rng.random(s).astype(np.float32))

    flags = (RenderFlags.LIGHT | RenderFlags.IBL | RenderFlags.EMISSIVE)
    settings = RenderSettings(width=W, height=H, path=RenderPathType.HYBRID,
                              flags=flags)
    gb = GBuffer(
        albedo=arr(H, W, 3), normal=arr(H, W, 3), material=arr(H, W, 4),
        object_id=jnp.zeros((H, W), jnp.int32), motion=arr(H, W, 2) * 0.01,
        linear_depth=arr(H, W) * 50 + 1, depth_grad=arr(H, W, 2),
        emissive=arr(H, W, 3), depth=arr(H, W) * 0.5 + 0.2,
        world_pos=arr(H, W, 3) * 20, uv=arr(H, W, 2))
    params = FrameParams(
        sun_direction=jnp.asarray([-0.5, -1.0, -0.3], jnp.float32),
        sun_color=jnp.ones(3, jnp.float32),
        sun_intensity=jnp.float32(1.0), ambient_strength=jnp.float32(0.1),
        exposure=jnp.float32(1.0),
        svgf_phi=jnp.asarray([4.0, 128.0, 0.02, 0.0]),
        frame_index=jnp.uint32(3))
    comp_fn = gpasses.make_composition_pass(
        settings, "__none__", "__none__", "__none__", None)[0]
    post_fn = gpasses.make_postprocess_pass(settings, RS.FINAL_COLOR)[0]
    ctx = gpasses.FrameContext(
        scene=data, cam=state, params=params, settings=settings,
        state=FrameState.empty(), history_valid=True,
        shadow_query=None, trace_radiance=None)

    def comp(alb, *_):
        g = GBuffer(**{**gb.__dict__, "albedo": alb})
        reg = {"_GBuffer": g}
        out = comp_fn(reg, ctx)
        reg.update(out)
        out2 = post_fn(reg, ctx)
        return out2[RS.RENDER_OUTPUT]

    timed("composition_post", comp, gb.albedo)

    def sky_only(d, *_):
        v = d
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        return sky_ops.sample_environment(
            v, data.sky_texture, data.textures, True)

    timed("sky_sample_env", sky_only, arr(H, W, 3) - 0.5)


if __name__ == "__main__":
    composition_stage()
