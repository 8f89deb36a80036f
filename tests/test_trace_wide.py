"""Wide-BVH (8-wide, 4-tri leaves) build + packet traversal tests.

The Pallas kernel runs in interpret mode on the CPU backend and is
checked against the jnp reference traversal (ops/trace.intersect_bvh).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hybridrenderer_tpu.ops import bvh as bvh_mod
from hybridrenderer_tpu.ops import bvh_wide, trace
from hybridrenderer_tpu.ops import trace_pallas as tp
from hybridrenderer_tpu.scene import scene as scenes


def _build(data):
    s = data.triangles
    b = bvh_mod.build_bvh(s.v0, s.v1, s.v2)
    w = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)
    return s, b, w


@pytest.mark.parametrize("scene_fn", [scenes.cube_scene,
                                      scenes.cornell_scene])
def test_every_triangle_in_exactly_one_cluster(scene_fn):
    s, b, w = _build(scene_fn().build())
    assert bvh_wide.validate_wide(w, s.v0, s.v1, s.v2)


def test_super_root_bootstrap_entry():
    s, b, w = _build(scenes.cube_scene().build())
    meta = np.asarray(w.meta)
    # super-root: single internal child (the real root) in slot 0
    assert meta[0, 0] == (1 << 8) | 1
    assert meta[0, 1] == 0


@pytest.mark.parametrize("any_hit", [False, True])
def test_wide_kernel_matches_jnp_reference(any_hit):
    data = scenes.cornell_scene().build()
    s, b, w = _build(data)
    rng = np.random.default_rng(7)
    R = 4096
    v0 = np.asarray(s.v0)
    c = v0.mean(0)
    ext = v0.max(0) - v0.min(0)
    o = jnp.asarray((c + rng.normal(0, 0.5, (R, 3)) * ext)
                    .astype(np.float32))
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    t_ref, tri_ref, u_ref, v_ref = trace.intersect_bvh(
        b, s.v0, s.v1, s.v2, o, d, 1e-3, 1e6)
    t, tri, u, v = tp.intersect_wide(
        jnp.asarray(w.nodes), jnp.asarray(w.leaves), jnp.asarray(w.meta),
        o, d, 1e-3, 1e6, any_hit=any_hit, interpret=True)

    hit_ref = np.asarray(tri_ref) >= 0
    hit = np.asarray(tri) >= 0
    np.testing.assert_array_equal(hit, hit_ref)
    if not any_hit:
        # closest-hit t must match; triangle ids may differ only on
        # exact-tie hits (shared edges) where traversal order decides
        np.testing.assert_allclose(
            np.where(hit_ref, np.asarray(t), 0.0),
            np.where(hit_ref, np.asarray(t_ref), 0.0), atol=1e-4)
        differing = hit_ref & (np.asarray(tri) != np.asarray(tri_ref))
        assert differing.mean() < 0.005


def test_tiny_scene_single_cluster():
    # 2 triangles: whole scene collapses to super-root + one node
    v0 = jnp.asarray([[0.0, 0, 0], [0, 0, 1]])
    v1 = jnp.asarray([[1.0, 0, 0], [1, 0, 1]])
    v2 = jnp.asarray([[0.0, 1, 0], [0, 1, 1]])
    b = bvh_mod.build_bvh(v0, v1, v2)
    w = bvh_wide.build_wide(b, v0, v1, v2)
    assert bvh_wide.validate_wide(w, v0, v1, v2)
    o = jnp.asarray([[0.2, 0.2, -1.0], [0.2, 0.2, 2.0], [5.0, 5.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    t, tri, u, v = tp.intersect_wide(
        jnp.asarray(w.nodes), jnp.asarray(w.leaves), jnp.asarray(w.meta),
        o, d, 1e-3, 1e6, interpret=True)
    assert np.asarray(tri)[0] >= 0
    assert np.asarray(tri)[1] >= 0
    assert np.asarray(tri)[2] < 0
    np.testing.assert_allclose(np.asarray(t)[0], 1.0, atol=1e-5)


def test_wide_scalar_extraction_matches_onehot():
    """extract="scalar" (flat records + dynamic-sublane scalar reads) ==
    extract="onehot" (tile records + lane reductions), interpret mode."""
    s = scenes.cornell_scene().build().triangles
    b = bvh_mod.build_bvh(s.v0, s.v1, s.v2)
    w = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)
    rng = np.random.default_rng(3)
    R = 256
    lo = np.asarray(s.v0).min(0)
    hi = np.asarray(s.v0).max(0)
    o = jnp.asarray(
        (lo + rng.random((R, 3)) * (hi - lo)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    for any_hit in (False, True):
        a = tp.intersect_wide(
            jnp.asarray(w.nodes), jnp.asarray(w.leaves),
            jnp.asarray(w.meta), o, d, 1e-3, 1e4, any_hit=any_hit,
            interpret=True)
        c = tp.intersect_wide(
            jnp.asarray(w.nodes_flat), jnp.asarray(w.leaves_flat),
            jnp.asarray(w.meta), o, d, 1e-3, 1e4, any_hit=any_hit,
            interpret=True, extract="scalar")
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(c[1]))
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(c[0]),
                                   atol=1e-6)
