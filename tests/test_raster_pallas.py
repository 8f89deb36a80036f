"""Binned Pallas rasterizer vs jnp reference resolve (interpret mode)."""
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.core import maths
from hybridrenderer_tpu.core.camera import CameraState, OrbitCamera
from hybridrenderer_tpu.ops import raster, raster_pallas
from hybridrenderer_tpu.scene import scene as scene_mod

W, H = 128, 64


def _vis_pair(data, cam):
    clip = raster.transform_to_clip(
        data.vertices.world_position,
        jnp.asarray(cam.proj) @ jnp.asarray(cam.view))
    tris = raster.clip_triangles(clip, data.triangles.i0, data.triangles.i1,
                                 data.triangles.i2, W, H)
    ref = raster.rasterize(tris, W, H)
    binned = raster_pallas.rasterize_binned(tris, W, H, tile_h=8,
                                            tile_w=128, interpret=True)
    return ref, binned


def test_binned_matches_reference_cube():
    data = scene_mod.cube_scene().build()
    cam = OrbitCamera(width=W, height=H, distance=6.0, pitch=0.5,
                      focal_point=(0, 0.75, 0)).step()
    ref, binned = _vis_pair(data, cam)
    tri_ref = np.asarray(ref.tri_id)
    tri_bin = np.asarray(binned.tri_id)
    # identical triangle ids except possible edge-tie pixels
    assert (tri_ref != tri_bin).mean() < 0.005
    same = tri_ref == tri_bin
    np.testing.assert_allclose(np.asarray(binned.depth)[same],
                               np.asarray(ref.depth)[same], atol=5e-4)
    np.testing.assert_allclose(np.asarray(binned.bary1)[same],
                               np.asarray(ref.bary1)[same], atol=2e-2)
    np.testing.assert_allclose(np.asarray(binned.bary2)[same],
                               np.asarray(ref.bary2)[same], atol=2e-2)


def test_binned_overflow_path():
    """A screen-filling triangle must land in the overflow list and still
    raster correctly."""
    view = maths.look_at(jnp.array([0.0, 0.0, 5.0]), jnp.zeros(3),
                         jnp.array([0.0, 1.0, 0.0]))
    proj = maths.perspective_reversed_z(60.0, W / H, 0.1, 100.0)
    cam = CameraState.create(view, proj)
    verts = jnp.array([[-50.0, -50.0, 0.0], [50.0, -50.0, 0.0],
                       [0.0, 60.0, 0.0]])
    clip = raster.transform_to_clip(verts, jnp.asarray(cam.proj) @ jnp.asarray(cam.view))
    tris = raster.clip_triangles(clip, jnp.array([0]), jnp.array([1]),
                                 jnp.array([2]), W, H)
    ref = raster.rasterize(tris, W, H)
    binned = raster_pallas.rasterize_binned(tris, W, H, tile_h=8,
                                            tile_w=128, max_span=2,
                                            interpret=True)
    # the whole screen is covered in both
    assert (np.asarray(ref.tri_id) == 0).all()
    assert (np.asarray(binned.tri_id) == 0).all()
    np.testing.assert_allclose(np.asarray(binned.depth),
                               np.asarray(ref.depth), atol=1e-4)


def test_binned_b_spill_to_overflow():
    """Wides beyond the class-B compaction cap spill to the class-C
    global list (previously they were silently dropped): with
    b_cand_cap=1 and several wide triangles, the image must still match
    the reference."""
    data = scene_mod.stress_scene(num_objects=10, seed=3).build()
    cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                      focal_point=(0, 2, 0)).step()
    clip = raster.transform_to_clip(
        data.vertices.world_position,
        jnp.asarray(cam.proj) @ jnp.asarray(cam.view))
    tris = raster.clip_triangles(clip, data.triangles.i0, data.triangles.i1,
                                 data.triangles.i2, W, H)
    ref = raster.rasterize(tris, W, H)
    packed, bbox, valid = raster_pallas.pack_candidates(tris)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128,
                                        max_span=1, b_cand_cap=1)
    assert int(np.asarray(bins["n_overflow"])) > 0  # spill actually hit
    out = raster_pallas.raster_tiles(bins, W, H, interpret=True)
    assert (np.asarray(ref.tri_id) != np.asarray(out.tri_id)).mean() < 0.01


def test_binned_stress_scene():
    data = scene_mod.stress_scene(num_objects=10, seed=3).build()
    cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                      focal_point=(0, 2, 0)).step()
    ref, binned = _vis_pair(data, cam)
    tri_ref = np.asarray(ref.tri_id)
    tri_bin = np.asarray(binned.tri_id)
    assert (tri_ref != tri_bin).mean() < 0.01
    cov_ref = (tri_ref >= 0).mean()
    cov_bin = (tri_bin >= 0).mean()
    assert abs(cov_ref - cov_bin) < 0.005


def test_eval_modes_match():
    """Block-eval variants (v1 lane-reduce / v2 integer-key one-hot /
    v3 two-matmul) resolve the same visibility buffer. v2/v3 quantize
    the winner KEY to 17-bit depth (stored depth stays exact), so ids
    may differ only where two triangles land within 2^-17 reversed-Z of
    each other — none in this scene."""
    data = scene_mod.stress_scene(num_objects=10, seed=3).build()
    cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                      focal_point=(0, 2, 0)).step()
    clip = raster.transform_to_clip(
        data.vertices.world_position,
        jnp.asarray(cam.proj) @ jnp.asarray(cam.view))
    tris = raster.clip_triangles(clip, data.triangles.i0, data.triangles.i1,
                                 data.triangles.i2, W, H)
    packed, bbox, valid = raster_pallas.pack_candidates(tris)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    outs = {m: raster_pallas.raster_tiles(bins, W, H, interpret=True,
                                          eval_mode=m)
            for m in ("v1", "v2", "v3")}
    v1, v2, v3 = outs["v1"], outs["v2"], outs["v3"]
    assert (np.asarray(v1.tri_id) >= 0).mean() > 0.1  # non-trivial image
    # v2 and v3 share the integer winner key → bit-identical
    np.testing.assert_array_equal(np.asarray(v2.tri_id),
                                  np.asarray(v3.tri_id))
    np.testing.assert_array_equal(np.asarray(v2.depth),
                                  np.asarray(v3.depth))
    np.testing.assert_array_equal(np.asarray(v2.bary1),
                                  np.asarray(v3.bary1))
    # v1 (exact-float argmax) vs v2 (17-bit quantized key): ids may flip
    # only on near-depth-tie pixels — a small fraction; where ids agree
    # the attributes are the same exact affine evals
    same = np.asarray(v1.tri_id) == np.asarray(v2.tri_id)
    assert (~same).mean() < 0.005
    np.testing.assert_allclose(np.asarray(v1.depth)[same],
                               np.asarray(v2.depth)[same], atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1.bary1)[same],
                               np.asarray(v2.bary1)[same], atol=1e-4)


def test_eval_v4_transposed_matches():
    """v4 (fully transposed kernel: pixels on lanes everywhere) shares
    v2's integer winner key, so tri ids must match v2 exactly; depths/
    barys are the same affine evals through a transposed matmul, so
    allow float-association slack. With the attr table riding, v4's
    channel-major attrs must match v1's on id-agreeing pixels."""
    data = scene_mod.stress_scene(num_objects=10, seed=3).build()
    cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5, yaw=0.8,
                      focal_point=(0, 2, 0)).step()
    clip = raster.transform_to_clip(
        data.vertices.world_position,
        jnp.asarray(cam.proj) @ jnp.asarray(cam.view))
    tris = raster.clip_triangles(clip, data.triangles.i0, data.triangles.i1,
                                 data.triangles.i2, W, H)
    packed, bbox, valid = raster_pallas.pack_candidates(tris)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    v2 = raster_pallas.raster_tiles(bins, W, H, interpret=True,
                                    eval_mode="v2")
    v4 = raster_pallas.raster_tiles(bins, W, H, interpret=True,
                                    eval_mode="v4")
    assert (np.asarray(v4.tri_id) >= 0).mean() > 0.1
    np.testing.assert_array_equal(np.asarray(v4.tri_id),
                                  np.asarray(v2.tri_id))
    np.testing.assert_allclose(np.asarray(v4.depth), np.asarray(v2.depth),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v4.bary1), np.asarray(v2.bary1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(v4.bary2), np.asarray(v2.bary2),
                               atol=1e-4)

    # attr ride-along: v4 vs v1 on id-agreeing pixels
    packed_a, bbox_a, valid_a = raster_pallas.pack_candidates(
        tris, attr_table=data.raster_rows)
    bins_a = raster_pallas.bin_candidates(packed_a, bbox_a, valid_a,
                                          W, H, 8, 128)
    v1v, v1a = raster_pallas.raster_tiles(bins_a, W, H, interpret=True,
                                          eval_mode="v1")
    v4v, v4a = raster_pallas.raster_tiles(bins_a, W, H, interpret=True,
                                          eval_mode="v4")
    np.testing.assert_array_equal(np.asarray(v4v.tri_id),
                                  np.asarray(v2.tri_id))
    same = np.asarray(v1v.tri_id) == np.asarray(v4v.tri_id)
    assert (~same).mean() < 0.005
    np.testing.assert_allclose(np.asarray(v4a)[same], np.asarray(v1a)[same],
                               atol=1e-3)


def test_bucket_order_groups_like_argsort():
    """Chunked counting-sort grouping == argsort grouping: same
    starts/counts, and each segment's slots hold exactly that segment's
    entries (order within a segment is free)."""
    import numpy as np
    import jax.numpy as jnp
    from hybridrenderer_tpu.ops.raster_pallas import _bucket_order

    rng = np.random.default_rng(5)
    K = 37
    E = 3001
    keys = rng.integers(0, K + 1, E).astype(np.int32)  # K == dead
    cap = 2048
    order, starts, counts = _bucket_order(jnp.asarray(keys), K, cap,
                                          chunk=256)
    order, starts, counts = map(np.asarray, (order, starts, counts))

    ref = np.argsort(keys, kind="stable")
    ref_sorted = keys[ref]
    ref_bounds = np.searchsorted(ref_sorted, np.arange(K + 1))
    ref_starts = np.minimum(ref_bounds[:-1], cap)
    ref_counts = np.minimum(ref_bounds[1:], cap) - ref_starts
    np.testing.assert_array_equal(starts, ref_starts)
    np.testing.assert_array_equal(counts, ref_counts)
    for k in range(K):
        seg = order[starts[k]:starts[k] + counts[k]]
        assert (keys[seg] == k).all(), f"segment {k} polluted"
    # all entries of each (uncapped) segment appear exactly once
    for k in range(K):
        if ref_bounds[k + 1] <= cap:
            expect = np.sort(np.flatnonzero(keys == k))
            got = np.sort(order[starts[k]:starts[k] + counts[k]])
            np.testing.assert_array_equal(got, expect)


def test_binned_raster_chunked_sort_matches():
    """rasterize_binned with the chunked binning sort == argsort path."""
    import os

    data = scene_mod.cube_scene().build()
    cam = OrbitCamera(width=W, height=H, distance=6.0, pitch=0.5,
                      focal_point=(0, 0.75, 0)).step()
    clip = raster.transform_to_clip(
        data.vertices.world_position,
        jnp.asarray(cam.proj) @ jnp.asarray(cam.view))
    tris = raster.clip_triangles(clip, data.triangles.i0, data.triangles.i1,
                                 data.triangles.i2, W, H)
    a = raster_pallas.rasterize_binned(tris, W, H, tile_h=8, tile_w=128,
                                       interpret=True)
    os.environ["RASTER_BIN_SORT"] = "chunked"
    try:
        b = raster_pallas.rasterize_binned(tris, W, H, tile_h=8, tile_w=128,
                                           interpret=True)
    finally:
        os.environ.pop("RASTER_BIN_SORT")
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=1e-6)


def test_binned_near_plane_crosser_matches():
    """A triangle crossing the near plane emits a valid clip slot-B
    candidate, which rides the compacted class-B row path in the binned
    rasterizer — must match the jnp reference resolve exactly."""
    from hybridrenderer_tpu.core import maths
    from hybridrenderer_tpu.core.camera import CameraState

    view = maths.look_at(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                         jnp.array([0.0, 1.0, 0.0]))
    proj = maths.perspective_reversed_z(60.0, 1.0, 0.1, 100.0)
    cam = CameraState.create(view, proj)
    # one vertex behind the camera: splits into 2 clipped slots
    verts = jnp.array([[-2.0, -1.5, 0.0], [2.0, -1.5, 0.0],
                       [0.0, 1.0, 5.0]])
    clip = raster.transform_to_clip(
        verts, jnp.asarray(cam.proj) @ jnp.asarray(cam.view))
    tris = raster.clip_triangles(clip, jnp.array([0]), jnp.array([1]),
                                 jnp.array([2]), 64, 64)
    assert int(np.asarray(tris.valid).sum()) == 2  # both slots live
    ref = raster.rasterize(tris, 64, 64)
    out = raster_pallas.rasterize_binned(tris, 64, 64, interpret=True)
    assert np.array_equal(np.asarray(ref.tri_id), np.asarray(out.tri_id))
    assert np.allclose(np.asarray(ref.depth), np.asarray(out.depth),
                       atol=1e-5)


def test_stream_gather_split_matches_whole():
    """RASTER_STREAM_GATHER=split (column-chunked fast-path gather,
    r4 batch 9) must be bit-identical to the whole-table gather."""
    rng = np.random.default_rng(7)
    packed = jnp.asarray(rng.standard_normal((512, 120)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 512, 300), jnp.int32)
    whole = raster_pallas._gather_stream_rows(packed, idx, "whole")
    # tiny budget forces many column chunks (including a ragged tail)
    split = raster_pallas._gather_stream_rows(packed, idx, "split",
                                              budget=512 * 4 * 16)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(split))


def test_merged_walk_matches_split():
    """The merged single-loop stream walk (RASTER_WALK=merged, r5) must
    be bit-identical to the split per-class walk: same blocks, same
    order (A then B then overflow), one loop construct."""
    data = scene_mod.stress_scene(num_objects=12).build()
    cam = OrbitCamera(width=W, height=H, distance=30.0, pitch=0.5,
                      yaw=0.8, focal_point=(0, 2.0, 0)).step()
    clip = raster.transform_to_clip(
        data.vertices.world_position,
        jnp.asarray(cam.proj) @ jnp.asarray(cam.view))
    tris = raster.clip_triangles(clip, data.triangles.i0, data.triangles.i1,
                                 data.triangles.i2, W, H)
    packed, bbox, valid = raster_pallas.pack_candidates(
        tris, attr_table=data.raster_rows)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, W, H, 8, 128)
    vis_m, att_m = raster_pallas.raster_tiles(bins, W, H, interpret=True,
                                              walk="merged")
    vis_s, att_s = raster_pallas.raster_tiles(bins, W, H, interpret=True,
                                              walk="split")
    for a, b in zip([vis_m.tri_id, vis_m.depth, vis_m.bary1, vis_m.bary2,
                     att_m],
                    [vis_s.tri_id, vis_s.depth, vis_s.bary1, vis_s.bary2,
                     att_s]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tiles_per_program_matches():
    """tiles_pp=K (K sequential tiles per grid program, r5) is
    bit-identical to the one-tile kernel, including the padded tail."""
    data = scene_mod.stress_scene(num_objects=12).build()
    cam = OrbitCamera(width=256, height=72, distance=30.0, pitch=0.5,
                      yaw=0.8, focal_point=(0, 2.0, 0)).step()
    clip = raster.transform_to_clip(
        data.vertices.world_position,
        jnp.asarray(cam.proj) @ jnp.asarray(cam.view))
    tris = raster.clip_triangles(clip, data.triangles.i0, data.triangles.i1,
                                 data.triangles.i2, 256, 72)
    packed, bbox, valid = raster_pallas.pack_candidates(
        tris, attr_table=data.raster_rows)
    bins = raster_pallas.bin_candidates(packed, bbox, valid, 256, 72, 8, 128)
    ref = raster_pallas.raster_tiles(bins, 256, 72, interpret=True,
                                     tiles_pp=1)
    out = raster_pallas.raster_tiles(bins, 256, 72, interpret=True,
                                     tiles_pp=4)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
