"""Multi-device sharded rendering on the 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from hybridrenderer_tpu.core.camera import OrbitCamera
from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.parallel.mesh import make_mesh, row_sharding
from hybridrenderer_tpu.parallel.sharded import ShardedRenderer
from hybridrenderer_tpu.runtime.renderer import Renderer
from hybridrenderer_tpu.scene import scene as scenes

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

FLAGS = RenderFlags.LIGHT | RenderFlags.IBL


def test_mesh_and_sharding():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    sh = row_sharding(mesh)
    x = jax.device_put(np.zeros((64, 32), np.float32), sh)
    assert len(x.addressable_shards) == 8


def test_sharded_matches_single_device():
    """Row-sharded frame == single-device frame (forward path)."""
    data = scenes.cube_scene().build()
    s = RenderSettings(width=64, height=64, path=RenderPathType.FORWARD,
                       flags=FLAGS, raster_backend="jnp")
    cam = OrbitCamera(width=64, height=64, distance=7.0, pitch=0.45,
                      yaw=0.6, focal_point=(0, 0.7, 0))
    single = Renderer(s, data)
    ref = single.render_np(cam.step())

    mesh = make_mesh(8)
    cam2 = OrbitCamera(width=64, height=64, distance=7.0, pitch=0.45,
                       yaw=0.6, focal_point=(0, 0.7, 0))
    sharded = ShardedRenderer(s, data, mesh)
    out = np.asarray(sharded.render(cam2.step()))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_history_carries():
    """Second frame consumes sharded carried state without error."""
    data = scenes.cube_scene().build()
    s = RenderSettings(width=64, height=64, path=RenderPathType.FORWARD,
                       flags=FLAGS | RenderFlags.TAA, raster_backend="jnp")
    mesh = make_mesh(8)
    cam = OrbitCamera(width=64, height=64, distance=7.0, pitch=0.45,
                      yaw=0.6, focal_point=(0, 0.7, 0))
    r = ShardedRenderer(s, data, mesh)
    a = np.asarray(r.render(cam.step(True)))
    b = np.asarray(r.render(cam.step(True)))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a.shape == b.shape == (64, 64, 3)
