"""Direct-stack wide traversal (child-id entries + VMEM meta tiles) vs
the jnp reference — interpret mode on the CPU backend. This variant
removes the SMEM meta table, lifting the ~1.05M-tri capacity ceiling of
the compressed-entry kernel."""
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


@pytest.mark.parametrize("any_hit", [False, True])
def test_direct_matches_jnp_reference(any_hit):
    data = scenes.cornell_scene().build()
    s, b, w = _build(data)
    mt = tp.pack_meta_tiles(w.meta)
    rng = np.random.default_rng(23)
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
    t, tri, u, v = tp.intersect_wide_direct(
        jnp.asarray(w.nodes), jnp.asarray(w.leaves), mt,
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


def test_direct_leaf8_matches_leaf4():
    """leaf_tris=8 clusters (96-row records) trace the same closest hits
    as the default 4-tri clusters."""
    data = scenes.cornell_scene().build()
    s = data.triangles
    b = bvh_mod.build_bvh(s.v0, s.v1, s.v2)
    w4 = bvh_wide.build_wide(b, s.v0, s.v1, s.v2, leaf_tris=4)
    w8 = bvh_wide.build_wide(b, s.v0, s.v1, s.v2, leaf_tris=8)
    assert w8.leaves.shape[1] == 96
    assert bvh_wide.validate_wide(w8, s.v0, s.v1, s.v2)
    rng = np.random.default_rng(7)
    R = 2048
    v0 = np.asarray(s.v0)
    c = v0.mean(0)
    ext = v0.max(0) - v0.min(0)
    o = jnp.asarray((c + rng.normal(0, 0.5, (R, 3)) * ext)
                    .astype(np.float32))
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    t4, tri4, _, _ = tp.intersect_wide_direct(
        jnp.asarray(w4.nodes), jnp.asarray(w4.leaves),
        tp.pack_meta_tiles(w4.meta), o, d, 1e-3, 1e6, interpret=True)
    t8, tri8, _, _ = tp.intersect_wide_direct(
        jnp.asarray(w8.nodes), jnp.asarray(w8.leaves),
        tp.pack_meta_tiles(w8.meta), o, d, 1e-3, 1e6, interpret=True)
    hit4 = np.asarray(tri4) >= 0
    hit8 = np.asarray(tri8) >= 0
    np.testing.assert_array_equal(hit8, hit4)
    np.testing.assert_allclose(np.where(hit4, np.asarray(t8), 0.0),
                               np.where(hit4, np.asarray(t4), 0.0),
                               atol=1e-4)


def test_direct_bf16_agrees_with_f32():
    """bf16 records under direct stacks: conservative boxes may only ADD
    occlusion hits on exact silhouettes, never lose them."""
    data = scenes.cornell_scene().build()
    s, b, w = _build(data)
    q = bvh_wide.quantize_bf16(w)
    mt = tp.pack_meta_tiles(w.meta)
    rng = np.random.default_rng(5)
    R = 2048
    v0 = np.asarray(s.v0)
    c = v0.mean(0)
    ext = v0.max(0) - v0.min(0)
    o = jnp.asarray((c + rng.normal(0, 0.4, (R, 3)) * ext)
                    .astype(np.float32))
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    _, tri_f, _, _ = tp.intersect_wide_direct(
        jnp.asarray(w.nodes), jnp.asarray(w.leaves), mt,
        o, d, 1e-3, 1e6, any_hit=True, interpret=True)
    _, tri_q, _, _ = tp.intersect_wide_direct(
        jnp.asarray(q.nodes), jnp.asarray(q.leaves), mt,
        o, d, 1e-3, 1e6, any_hit=True, interpret=True)
    hf = np.asarray(tri_f) >= 0
    hq = np.asarray(tri_q) >= 0
    # geometry moves by <= 1 bf16 ulp: occlusion flips only near
    # silhouettes / exact grazing — bound the disagreement
    assert (hf != hq).mean() < 0.02


@pytest.mark.parametrize("any_hit", [False, True])
def test_direct_leaf_streaming_matches_resident(any_hit):
    """stream_leaves=True (HBM leaf tiles behind one-step lookahead
    DMAs) returns exactly what the VMEM-resident kernel returns."""
    data = scenes.cornell_scene().build()
    s, b, w = _build(data)
    mt = tp.pack_meta_tiles(w.meta)
    rng = np.random.default_rng(11)
    R = 2048
    v0 = np.asarray(s.v0)
    c = v0.mean(0)
    ext = v0.max(0) - v0.min(0)
    o = jnp.asarray((c + rng.normal(0, 0.5, (R, 3)) * ext)
                    .astype(np.float32))
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    nodes, leaves = jnp.asarray(w.nodes), jnp.asarray(w.leaves)
    res = tp.intersect_wide_direct(nodes, leaves, mt, o, d, 1e-3, 1e6,
                                   any_hit=any_hit, interpret=True)
    strm = tp.intersect_wide_direct(nodes, leaves, mt, o, d, 1e-3, 1e6,
                                    any_hit=any_hit, interpret=True,
                                    stream_leaves=True)
    for a, bb in zip(res, strm):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_scene_tracer_leaf_stream_flag():
    """A scene whose leaves exceed the budget but whose nodes fit gets
    the streaming wide backend instead of the jnp fallback."""
    data = scenes.stress_scene(num_objects=25).build()
    tracer_budget = tp.VMEM_SCENE_BUDGET
    try:
        s = data.triangles
        b = bvh_mod.build_bvh_host(s.v0, s.v1, s.v2, builder="sah")
        from hybridrenderer_tpu.ops import bvh_wide as bw
        w = bw.build_wide(b, s.v0, s.v1, s.v2)
        nodes_bytes = int(np.prod(w.nodes.shape)) * 4
        # budget between bf16 nodes and bf16 nodes+leaves → streaming
        tp.VMEM_SCENE_BUDGET = nodes_bytes  # bf16 halves both
        from hybridrenderer_tpu.core.config import RenderSettings
        tracer = trace.SceneTracer.build(
            data, RenderSettings(trace_backend="pallas-wide"))
        assert tracer.backend == "pallas-wide"
        assert tracer.leaf_stream
        assert tracer.wide_meta_tiles is not None
        assert tracer.wide_nodes.dtype == jnp.bfloat16
    finally:
        tp.VMEM_SCENE_BUDGET = tracer_budget


def test_direct_active_mask():
    data = scenes.cube_scene().build()
    s, b, w = _build(data)
    mt = tp.pack_meta_tiles(w.meta)
    o = jnp.asarray(np.tile([[0.0, 5.0, 0.0]], (64, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([[0.0, -1.0, 0.0]], (64, 1)).astype(np.float32))
    act = jnp.asarray(np.arange(64) % 2 == 0)
    t, tri, _, _ = tp.intersect_wide_direct(
        jnp.asarray(w.nodes), jnp.asarray(w.leaves), mt, o, d, 1e-3, 1e6,
        any_hit=True, active=act, interpret=True)
    tri = np.asarray(tri)
    assert (tri[::2] >= 0).all()
    assert (tri[1::2] == tp.INACTIVE_TRI).all()


def test_scene_tracer_auto_selects_direct(monkeypatch):
    """WIDE_STACK=direct wires the direct kernel through SceneTracer."""
    monkeypatch.setattr(tp, "WIDE_STACK", "direct")
    data = scenes.cube_scene().build()
    tracer = trace.SceneTracer.build(data)
    if tracer.backend != "pallas-wide":
        pytest.skip("wide backend unavailable")
    assert tracer.wide_meta_tiles is not None
    o = jnp.asarray([[0.0, 5.0, 0.0]] * 8)
    d = jnp.asarray([[0.0, -1.0, 0.0]] * 8)
    vis = tracer.occluded(data, o, d, 100.0)
    assert (np.asarray(vis) == 0.0).all()


@pytest.mark.parametrize("any_hit", [False, True])
def test_direct16_matches_jnp_reference(any_hit):
    """16-wide nodes (4-level collapse, unpacked meta, rank push) trace
    the same hits as the binary jnp reference (VERDICT r3 task 4)."""
    data = scenes.cornell_scene().build()
    s = data.triangles
    b = bvh_mod.build_bvh(s.v0, s.v1, s.v2)
    w = bvh_wide.build_wide(b, s.v0, s.v1, s.v2, width=16)
    assert w.meta.shape[1] == 4
    assert w.nodes.shape[1] == 96
    assert bvh_wide.validate_wide(w, s.v0, s.v1, s.v2)
    mt = tp.pack_meta_tiles(w.meta)
    rng = np.random.default_rng(31)
    R = 4096
    v0 = np.asarray(s.v0)
    c = v0.mean(0)
    ext = v0.max(0) - v0.min(0)
    o = jnp.asarray((c + rng.normal(0, 0.5, (R, 3)) * ext)
                    .astype(np.float32))
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    t_ref, tri_ref, _, _ = trace.intersect_bvh(
        b, s.v0, s.v1, s.v2, o, d, 1e-3, 1e6)
    t, tri, u, v = tp.intersect_wide_direct(
        jnp.asarray(w.nodes), jnp.asarray(w.leaves), mt,
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


@pytest.mark.parametrize("any_hit", [False, True])
def test_rank_push_matches_sort_push(any_hit):
    """The vectorized rank push (all-pairs compare + one-hot scatter)
    produces EXACTLY the sort-network push's traversal results at
    width 8 — same keys, same tie-break-by-slot order."""
    data = scenes.cornell_scene().build()
    s, b, w = _build(data)
    mt = tp.pack_meta_tiles(w.meta)
    rng = np.random.default_rng(41)
    R = 2048
    v0 = np.asarray(s.v0)
    c = v0.mean(0)
    ext = v0.max(0) - v0.min(0)
    o = jnp.asarray((c + rng.normal(0, 0.5, (R, 3)) * ext)
                    .astype(np.float32))
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    nodes, leaves = jnp.asarray(w.nodes), jnp.asarray(w.leaves)
    a = tp.intersect_wide_direct(nodes, leaves, mt, o, d, 1e-3, 1e6,
                                 any_hit=any_hit, interpret=True,
                                 push_mode="sort")
    for mode in ("rank", "rankv"):
        r = tp.intersect_wide_direct(nodes, leaves, mt, o, d, 1e-3, 1e6,
                                     any_hit=any_hit, interpret=True,
                                     push_mode=mode)
        for x, y in zip(a, r):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("any_hit", [False, True])
def test_direct_mxu_extract_matches_vpu(any_hit):
    """extract_mode="mxu" (one-hot column extracts as K=128 MXU
    contractions) is bit-identical to the VPU lane-reduce extracts:
    a one-hot contraction has exactly one nonzero product per output."""
    data = scenes.cornell_scene().build()
    s, b, w = _build(data)
    mt = tp.pack_meta_tiles(w.meta)
    rng = np.random.default_rng(13)
    R = 2048
    v0 = np.asarray(s.v0)
    c = v0.mean(0)
    ext = v0.max(0) - v0.min(0)
    o = jnp.asarray((c + rng.normal(0, 0.5, (R, 3)) * ext)
                    .astype(np.float32))
    d = rng.normal(0, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    nodes, leaves = jnp.asarray(w.nodes), jnp.asarray(w.leaves)
    ref = tp.intersect_wide_direct(nodes, leaves, mt, o, d, 1e-3, 1e6,
                                   any_hit=any_hit, interpret=True)
    mxu = tp.intersect_wide_direct(nodes, leaves, mt, o, d, 1e-3, 1e6,
                                   any_hit=any_hit, interpret=True,
                                   extract_mode="mxu")
    for a, bb in zip(ref, mxu):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
