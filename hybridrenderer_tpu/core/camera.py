"""Camera: reversed-Z projection, orbit controls, TAA jitter.

TPU-native equivalent of EditorCamera (Scene/EditorCamera.cpp): the
host-side ``OrbitCamera`` replicates the orbit/WASD parameterization
(focal point, distance, pitch, yaw — EditorCamera.cpp:56-110) and emits a
``CameraState`` pytree each frame — the analog of the ``CameraData`` UBO
block (ShaderCommon.h:203-217) with matrices, inverses, previous-frame
matrices and current/previous Halton jitter.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from . import maths


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CameraState:
    """Per-frame camera block (CameraData, ShaderCommon.h:203-217)."""

    view: Any
    proj: Any
    view_inverse: Any
    proj_inverse: Any
    view_proj_inverse: Any
    prev_view: Any
    prev_proj: Any
    position: Any      # (3,)
    jitter: Any        # (2,) current NDC jitter
    prev_jitter: Any   # (2,)

    @staticmethod
    def create(view, proj, prev_view=None, prev_proj=None,
               jitter=None, prev_jitter=None) -> "CameraState":
        view = jnp.asarray(view, jnp.float32)
        proj = jnp.asarray(proj, jnp.float32)
        prev_view = view if prev_view is None else jnp.asarray(prev_view, jnp.float32)
        prev_proj = proj if prev_proj is None else jnp.asarray(prev_proj, jnp.float32)
        zero2 = jnp.zeros((2,), jnp.float32)
        jitter = zero2 if jitter is None else jnp.asarray(jitter, jnp.float32)
        prev_jitter = zero2 if prev_jitter is None else jnp.asarray(prev_jitter, jnp.float32)
        vi = maths.inverse(view)
        return CameraState(
            view=view,
            proj=proj,
            view_inverse=vi,
            proj_inverse=maths.inverse(proj),
            view_proj_inverse=maths.inverse(proj @ view),
            prev_view=prev_view,
            prev_proj=prev_proj,
            position=vi[:3, 3],
            jitter=jitter,
            prev_jitter=prev_jitter,
        )


class OrbitCamera:
    """Host-side orbit+fly camera controller (EditorCamera semantics).

    Position = focal_point - forward * distance, orientation from
    (pitch, yaw) Euler angles exactly as EditorCamera::GetOrientation.
    ``step()`` advances the TAA jitter phase and rolls matrices into the
    previous-frame slots (EditorCamera.cpp:58-61).
    """

    def __init__(self, fov_deg=45.0, width=512, height=512,
                 near=0.1, far=1000.0,
                 focal_point=(0.0, 0.0, 0.0), distance=5.0,
                 pitch=0.0, yaw=0.0):
        self.fov_deg = fov_deg
        self.width, self.height = width, height
        self.near, self.far = near, far
        self.focal_point = jnp.asarray(focal_point, jnp.float32)
        self.distance = float(distance)
        self.pitch, self.yaw = float(pitch), float(yaw)
        self.frame_count = 0
        self._jitter_table = maths.halton_jitter_sequence(width, height)
        self._prev_view = None
        self._prev_proj = None
        self._prev_jitter = jnp.zeros((2,), jnp.float32)

    # --- orientation helpers (EditorCamera.h GetOrientation etc.) ---
    @property
    def orientation(self):
        return maths.quat_from_pitch_yaw(jnp.float32(self.pitch), jnp.float32(self.yaw))

    @property
    def forward(self):
        return maths.quat_rotate(self.orientation, jnp.array([0.0, 0.0, -1.0], jnp.float32))

    @property
    def right(self):
        return maths.quat_rotate(self.orientation, jnp.array([1.0, 0.0, 0.0], jnp.float32))

    @property
    def up(self):
        return maths.quat_rotate(self.orientation, jnp.array([0.0, 1.0, 0.0], jnp.float32))

    @property
    def position(self):
        return self.focal_point - self.forward * self.distance

    def view_matrix(self):
        rot = maths.quat_to_mat3(self.orientation)
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[:3, :3].set(rot)
        m = m.at[:3, 3].set(self.position)
        return maths.inverse(m)

    def proj_matrix(self):
        return maths.perspective_reversed_z(
            self.fov_deg, self.width / self.height, self.near, self.far
        )

    # --- controls ---
    def orbit(self, d_yaw: float, d_pitch: float):
        self.yaw += d_yaw
        self.pitch += d_pitch

    def pan(self, dx: float, dy: float):
        self.focal_point = self.focal_point + self.right * (-dx) + self.up * dy

    def zoom(self, delta: float):
        self.distance = max(0.01, self.distance - delta)

    def fly(self, fwd=0.0, strafe=0.0, lift=0.0):
        self.focal_point = (
            self.focal_point
            + self.forward * fwd
            + self.right * strafe
            + jnp.array([0.0, lift, 0.0], jnp.float32)
        )

    def resize(self, width: int, height: int):
        self.width, self.height = width, height
        self._jitter_table = maths.halton_jitter_sequence(width, height)

    # --- per-frame state emission ---
    def step(self, taa_enabled: bool = False) -> CameraState:
        view = self.view_matrix()
        proj = self.proj_matrix()
        if taa_enabled:
            jitter = self._jitter_table[self.frame_count % 16]
        else:
            jitter = jnp.zeros((2,), jnp.float32)
        state = CameraState.create(
            view, proj,
            prev_view=self._prev_view if self._prev_view is not None else view,
            prev_proj=self._prev_proj if self._prev_proj is not None else proj,
            jitter=jitter, prev_jitter=self._prev_jitter,
        )
        self._prev_view, self._prev_proj = view, proj
        self._prev_jitter = jitter
        self.frame_count += 1
        return state

    def frustum_planes(self):
        return maths.frustum_from_viewproj(self.proj_matrix() @ self.view_matrix())
