"""bf16 wide-BVH records (bvh_wide.quantize_bf16): conservative
rounding, exact id split, kernel agreement in interpret mode.

The bf16 variant doubles the VMEM scene budget; SceneTracer auto-picks
it only when f32 records don't fit (ops/trace.py build()).
"""
import ml_dtypes
import numpy as np
import jax.numpy as jnp

from hybridrenderer_tpu.ops import bvh_wide, trace_pallas
from hybridrenderer_tpu.ops.bvh import build_bvh_host
from hybridrenderer_tpu.scene import scene as scenes


def test_conservative_rounding_props():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.normal(size=1000).astype(np.float32) * 10 ** rng.integers(
            -6, 6, 1000).astype(np.float32),
        np.float32([0.0, -0.0, 1.0, -1.0, 3e38, -3e38, 255.0, 256.0]),
    ])
    dn = bvh_wide._bf16_down(x).astype(np.float32)
    up = bvh_wide._bf16_up(x).astype(np.float32)
    assert (dn <= x).all() and (up >= x).all()
    # representable values stay fixed
    rep = x.astype(ml_dtypes.bfloat16).astype(np.float32)
    exact = rep == x
    assert (dn[exact] == x[exact]).all() and (up[exact] == x[exact]).all()
    # within one bf16 ulp (< 2^-7 relative for normals)
    nz = np.abs(x) > 1e-30
    assert (np.abs(up[nz] - dn[nz]) <= np.abs(x[nz]) * 2 ** -6).all()


def _scene_wide(n_obj=40):
    data = scenes.stress_scene(num_objects=n_obj).build()
    s = data.triangles
    b = build_bvh_host(s.v0, s.v1, s.v2)
    wide = bvh_wide.build_wide(b, s.v0, s.v1, s.v2)
    return data, s, wide


def test_quantize_layout_and_ids():
    _, s, wide = _scene_wide()
    q = bvh_wide.quantize_bf16(wide)
    assert q.nodes.dtype == ml_dtypes.bfloat16
    assert q.vmem_bytes * 2 == wide.vmem_bytes
    # boxes contain the f32 boxes
    for c in range(8):
        r = 6 * c
        assert (q.nodes[:, r:r + 3, :].astype(np.float32)
                <= wide.nodes[:, r:r + 3, :]).all()
        assert (q.nodes[:, r + 3:r + 6, :].astype(np.float32)
                >= wide.nodes[:, r + 3:r + 6, :]).all()
    # id split reassembles exactly (scene has > 512 tris so plain bf16
    # id storage would corrupt)
    assert s.v0.shape[0] > 512
    for t in range(4):
        r = 12 * t
        lo = q.leaves[:, r + 9, :].astype(np.float32)
        mid = q.leaves[:, r + 10, :].astype(np.float32)
        hi = q.leaves[:, r + 11, :].astype(np.float32)
        dec = lo + 256.0 * mid + 65536.0 * hi
        ref = wide.leaves[:, r + 9, :]
        valid = ref >= 0
        np.testing.assert_array_equal(dec[valid], ref[valid])
        assert (dec[~valid] < 0).all()


def test_bf16_kernel_agrees_with_f32(  ):
    _, s, wide = _scene_wide()
    q = bvh_wide.quantize_bf16(wide)
    rng = np.random.default_rng(7)
    R = 1024
    amin = np.asarray(s.v0).min(0)
    amax = np.asarray(s.v0).max(0)
    o = jnp.asarray(rng.uniform(amin - 1, amax + 1,
                                (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    def run(w):
        return trace_pallas.intersect_wide(
            jnp.asarray(w.nodes), jnp.asarray(w.leaves),
            jnp.asarray(w.meta), o, d, 1e-3, 1e4, interpret=True)

    t32, tri32, _, _ = run(wide)
    t16, tri16, _, _ = run(q)
    hit32 = np.asarray(tri32) >= 0
    hit16 = np.asarray(tri16) >= 0
    # quantized geometry flips only edge-grazing hits
    agree = hit32 == hit16
    assert agree.mean() > 0.98
    both = hit32 & hit16
    same_tri = both & (np.asarray(tri16) == np.asarray(tri32))
    assert same_tri.sum() > 0.9 * both.sum()
    # grazing/near-origin hits can shift visibly at 2^-8 geometry; the
    # bulk must agree tightly (the variant only serves visibility rays
    # on scenes too large for f32 records)
    a = np.asarray(t16)[same_tri]
    b = np.asarray(t32)[same_tri]
    ok = np.abs(a - b) <= 1e-2 + 2e-2 * np.abs(b)
    assert ok.mean() > 0.95


def test_device_refit_quantize_matches_host():
    _, s, wide = _scene_wide(n_obj=10)
    q_host = bvh_wide.quantize_bf16(wide)
    qn, ql = bvh_wide.quantize_refit_device(
        jnp.asarray(wide.nodes), jnp.asarray(wide.leaves))
    np.testing.assert_array_equal(
        np.asarray(qn).view(np.uint16), q_host.nodes.view(np.uint16))
    np.testing.assert_array_equal(
        np.asarray(ql).view(np.uint16), q_host.leaves.view(np.uint16))
