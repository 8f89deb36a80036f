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
