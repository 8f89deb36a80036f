"""Pallas stencil kernels vs jnp reference (interpret mode)."""
import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.ops import stencil_pallas, svgf

H, W = 24, 200  # non-multiple of tile sizes on purpose
PHI = jnp.array([4.0, 128.0, 0.02, 0.0], jnp.float32)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    sig = jnp.asarray(rng.random((H, W, 4), dtype=np.float32))
    mp = jnp.asarray(rng.random((H, W, 4), dtype=np.float32) + 0.5)
    nrm = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    mom = jnp.asarray(rng.random((H, W, 4), dtype=np.float32) + 0.5)
    return sig, mp, nrm, mom


def test_atrous_matches_reference():
    sig, mp, nrm, mom = _inputs()
    for step in (1, 2, 4):
        ref = svgf.atrous(sig, sig, nrm, mp, step, PHI)
        out = stencil_pallas.atrous(sig, nrm, mp, step, PHI, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_filter_moments_matches_reference():
    sig, mp, nrm, mom = _inputs(1)
    ref_s, ref_m = svgf.filter_moments(sig, mom, nrm, mp, PHI)
    out_s, out_m = stencil_pallas.filter_moments(sig, mom, nrm, mp, PHI,
                                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m), atol=2e-5)


def test_variance_blur_matches_reference():
    _, _, _, mom = _inputs(2)
    ref = svgf.variance_blur(mom)
    out = stencil_pallas.variance_blur(mom, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_background_passthrough():
    sig, mp, nrm, _ = _inputs(3)
    mp = mp.at[..., 2].set(0.0)  # all background
    out = stencil_pallas.atrous(sig, nrm, mp, 1, PHI, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sig), atol=1e-6)


def test_tile_size_invariance():
    """Results are identical for any (th, tw) tiling — the tile size is
    a pure perf knob (halo over-fetch amortization, batch 34/35)."""
    sig, mp, nrm, mom = _inputs(4)
    base = stencil_pallas.atrous(sig, nrm, mp, 2, PHI, interpret=True,
                                 tile=(32, 128))
    for tile in ((8, 128), (64, 256), (64, 512)):
        out = stencil_pallas.atrous(sig, nrm, mp, 2, PHI, interpret=True,
                                    tile=tile)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-6)
    ref_s, ref_m = stencil_pallas.filter_moments(sig, mom, nrm, mp, PHI,
                                                 interpret=True,
                                                 tile=(32, 128))
    out_s, out_m = stencil_pallas.filter_moments(sig, mom, nrm, mp, PHI,
                                                 interpret=True,
                                                 tile=(64, 256))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref_m),
                               atol=1e-6)


def test_shared_edge_stack_matches_inline():
    """edge_stack passed explicitly == built internally (the frame
    builds it once and shares it across chains/iterations)."""
    sig, mp, nrm, _ = _inputs(5)
    edges = stencil_pallas.edge_stack(nrm, mp, (32, 128))
    out = stencil_pallas.atrous(sig, nrm, mp, 1, PHI, interpret=True,
                                tile=(32, 128), edges=edges)
    ref = stencil_pallas.atrous(sig, nrm, mp, 1, PHI, interpret=True,
                                tile=(32, 128))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.0)
