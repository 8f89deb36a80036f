"""MIMT (per-sublane-row stack) wide traversal vs the jnp reference.

Interpret mode on the CPU backend, mirroring test_trace_wide. The MIMT
kernel must agree with intersect_bvh on hit masks and closest-hit
distances for random incoherent rays — per-row stacks change traversal
ORDER, never the result set."""
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


def _p8(w):
    return (tp.pack_p8(jnp.asarray(w.nodes_flat)),
            tp.pack_p8(jnp.asarray(w.leaves_flat)))


@pytest.mark.parametrize("any_hit", [False, True])
def test_mimt_matches_jnp_reference(any_hit):
    data = scenes.cornell_scene().build()
    s, b, w = _build(data)
    nodes_p8, leaves_p8 = _p8(w)
    rng = np.random.default_rng(11)
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
    t, tri, u, v = tp.intersect_mimt(
        nodes_p8, leaves_p8, jnp.asarray(w.meta),
        o, d, 1e-3, 1e6, any_hit=any_hit, interpret=True)

    hit_ref = np.asarray(tri_ref) >= 0
    hit = np.asarray(tri) >= 0
    np.testing.assert_array_equal(hit, hit_ref)
    if not any_hit:
        np.testing.assert_allclose(
            np.where(hit_ref, np.asarray(t), 0.0),
            np.where(hit_ref, np.asarray(t_ref), 0.0), atol=1e-4)
        differing = hit_ref & (np.asarray(tri) != np.asarray(tri_ref))
        assert differing.mean() < 0.005


def test_mimt_active_mask_and_tmax():
    """Inactive rays come back with the sentinel id; tmax caps hits."""
    data = scenes.cube_scene().build()
    s, b, w = _build(data)
    nodes_p8, leaves_p8 = _p8(w)
    o = jnp.asarray(np.tile([[0.0, 5.0, 0.0]], (64, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([[0.0, -1.0, 0.0]], (64, 1)).astype(np.float32))
    act = jnp.asarray(np.arange(64) % 2 == 0)
    t, tri, u, v = tp.intersect_mimt(
        nodes_p8, leaves_p8, jnp.asarray(w.meta), o, d, 1e-3, 1e6,
        any_hit=True, active=act, interpret=True)
    tri = np.asarray(tri)
    assert (tri[::2] >= 0).all()              # active straight-down rays hit
    assert (tri[1::2] == tp.INACTIVE_TRI).all()
    # tmax shorter than the gap to the ground: no hits
    t2, tri2, _, _ = tp.intersect_mimt(
        nodes_p8, leaves_p8, jnp.asarray(w.meta), o, d, 1e-3, 0.5,
        any_hit=True, interpret=True)
    assert (np.asarray(tri2) < 0).all()


def test_mimt_tiny_scene():
    v0 = jnp.asarray([[0.0, 0, 0], [0, 0, 1]])
    v1 = jnp.asarray([[1.0, 0, 0], [1, 0, 1]])
    v2 = jnp.asarray([[0.0, 1, 0], [0, 1, 1]])
    b = bvh_mod.build_bvh(v0, v1, v2)
    w = bvh_wide.build_wide(b, v0, v1, v2)
    nodes_p8, leaves_p8 = _p8(w)
    o = jnp.asarray([[0.2, 0.2, -1.0], [0.2, 0.2, 2.0], [5.0, 5.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    t, tri, u, v = tp.intersect_mimt(
        nodes_p8, leaves_p8, jnp.asarray(w.meta), o, d, 1e-3, 1e6,
        interpret=True)
    tri = np.asarray(tri)
    assert tri[0] >= 0 and tri[1] < 0 and tri[2] < 0
