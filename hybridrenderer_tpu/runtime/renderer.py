"""Renderer driver — the Application::Run / Renderer frame-pacing analog.

What the reference's backend plumbing does is absorbed here by JAX/XLA,
deliberately (SURVEY §2.2 inventory accounting):

  * VulkanInstance/VulkanDevice/VulkanContext → ``jax.devices()`` and the
    XLA client; device pick, feature probing and allocator are the
    runtime's.
  * Swapchain / present → headless readback (runtime/output.py).
  * Frame pacing (fences, frames-in-flight, Renderer.cpp:147-309) →
    XLA async dispatch: ``render()`` returns a device array immediately;
    ``np.asarray`` / ``block_until_ready`` is the fence. Buffer donation
    of FrameState replaces the deletion queue + history copies.
  * PipelineManager's pipeline cache → the jit cache keyed by
    (RenderSettings, history_valid).
  * Descriptor sets / barriers / layouts → nonexistent by construction.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from ..core.camera import OrbitCamera
from ..graph.params import FrameParams, FrameState
from ..graph.passes import FrameContext
from ..paths.factory import create_render_path
from .log import core as _log


class Renderer:
    def __init__(self, settings, scene_data, tracer=None):
        self.settings = settings
        self.scene = scene_data
        self.path = create_render_path(settings)
        self.tracer = tracer
        self.state = FrameState.empty()
        self.frame_count = 0
        self._fns = {}

    @classmethod
    def for_scene(cls, settings, scene_data):
        """Construct with ray-trace hooks auto-attached when the path's
        flags ask for RT (the RenderPathFactory + IsRayTracingSupported
        analog)."""
        from ..core.types import RenderFlags, RenderPathType

        tracer = None
        needs_rt = (settings.path == RenderPathType.RAYTRACED) or bool(
            settings.flags & (RenderFlags.SHADOW | RenderFlags.AO
                              | RenderFlags.REFLECTION | RenderFlags.GI))
        if needs_rt:
            from ..ops import trace as trace_ops

            t0 = time.perf_counter()
            tracer = trace_ops.SceneTracer.build(scene_data, settings)
            _log().info("ray tracer attached",
                        backend=tracer.backend,
                        tris=int(scene_data.num_triangles),
                        build_ms=round(1e3 * (time.perf_counter() - t0), 1))
        return cls(settings, scene_data, tracer=tracer)

    # --- jitted frame function per (history_valid,) ---------------------
    def _frame_body(self, history_valid: bool):
        """One frame's math: (scene, packed_row, state, tracer) →
        (out, new_state, stats). Shared by the single-frame fn and the
        burst scan body."""
        path = self.path
        settings = self.settings
        has_tracer = self.tracer is not None

        def frame(scene, host_packed, state, tracer):
            # single packed host buffer → camera + traced frame params
            # (one transfer per frame; see CameraState.pack)
            from ..core.camera import CameraState

            cam_state = CameraState.unpack(host_packed)
            off = CameraState.PACKED_SIZE
            params = FrameParams(
                sun_direction=scene.sun.direction,
                sun_color=scene.sun.color,
                sun_intensity=scene.sun.intensity,
                ambient_strength=scene.sun.ambient,
                exposure=host_packed[off],
                svgf_phi=host_packed[off + 1:off + 5],
                frame_index=host_packed[off + 5].astype(jax.numpy.uint32),
            )
            shadow_query = None
            trace_radiance = None
            shadow_query_pair = None
            if has_tracer:
                def shadow_query(p, n, d, t, active=None, **kw):
                    return tracer.shadow_query(scene, p, n, d, t,
                                               active=active, **kw)

                def shadow_query_pair(p, n, da, ta, db, tb,
                                      active=None, **kw):
                    return tracer.shadow_query_pair(
                        scene, p, n, da, ta, db, tb, active=active, **kw)

                def trace_radiance(o, d, c, dep, active=None, **kw):
                    return tracer.trace_radiance(scene, o, d, c, dep,
                                                 active=active, **kw)
            ctx = FrameContext(
                scene=scene, cam=cam_state, params=params, settings=settings,
                state=state, history_valid=history_valid,
                shadow_query=shadow_query, trace_radiance=trace_radiance,
                shadow_query_pair=shadow_query_pair)
            out, new_state, registry = path.run(ctx, state)
            # canonicalize: strip weak types so both history variants
            # produce byte-identical state signatures (a drifting weak
            # type forces a silent 17s re-jit on the 3rd frame)
            new_state = jax.tree_util.tree_map(
                lambda x: x.astype(x.dtype), new_state)
            stats = registry.get("_FrameStats")
            if stats is None:
                stats = jax.numpy.zeros((3,), jax.numpy.int32)
            return out, new_state, stats

        return frame

    def _get_frame_fn(self, history_valid: bool):
        key = history_valid
        if key in self._fns:
            return self._fns[key]
        _log().debug("building frame fn", path=type(self.path).__name__,
                     history_valid=history_valid,
                     size=f"{self.settings.width}x{self.settings.height}")
        fn = jax.jit(self._frame_body(history_valid), donate_argnums=(2,))
        self._fns[key] = fn
        return fn

    def _get_burst_fn(self, first_history_valid: bool, k: int):
        """K frames per dispatch via lax.scan (frames-in-flight analog,
        Renderer.cpp:147-309): ONE host transfer + ONE device dispatch
        per burst. The per-frame dispatch/transfer floor through the
        axon tunnel measured ~50 ms (BENCH.md batch-2 probes) — a burst
        of K amortizes it K×. History flows through the scan carry with
        the same semantics as sequential render() calls."""
        key = ("burst", first_history_valid, k)
        if key in self._fns:
            return self._fns[key]
        _log().debug("building burst fn", k=k,
                     first_history_valid=first_history_valid)
        warm = self._frame_body(True)

        def scan_body(tracer, scene, carry, row):
            out, new_state, stats = warm(scene, row, carry, tracer)
            return new_state, (out, stats)

        if first_history_valid:
            def burst(scene, packed_rows, state, tracer):
                state, (outs, stats) = jax.lax.scan(
                    lambda c, r: scan_body(tracer, scene, c, r),
                    state, packed_rows)
                return outs, state, stats[-1]
        else:
            cold = self._frame_body(False)

            def burst(scene, packed_rows, state, tracer):
                out0, state, stats0 = cold(scene, packed_rows[0], state,
                                           tracer)
                if k == 1:
                    return out0[None], state, stats0
                state, (outs, stats) = jax.lax.scan(
                    lambda c, r: scan_body(tracer, scene, c, r),
                    state, packed_rows[1:])
                return (jax.numpy.concatenate([out0[None], outs], axis=0),
                        state, stats[-1])

        fn = jax.jit(burst, donate_argnums=(2,))
        self._fns[key] = fn
        return fn

    def _get_dynamic_fn(self, history_valid: bool, use_subset: bool,
                        update_lights: bool):
        """Fused dynamic frame: transform re-sync + acceleration refit +
        the full frame in ONE jitted dispatch (vs the 3-dispatch
        commit(); refit() + render() sequence). The reference updates
        the TLAS inside the same frame submission (Scene.cpp:148-189);
        here fusing also lets XLA overlap the refit with early raster
        stages that don't consume it."""
        key = ("dyn", history_valid, use_subset, update_lights)
        if key in self._fns:
            return self._fns[key]
        from ..scene.dynamic import update_transforms, \
            update_transforms_subset

        frame = self._frame_body(history_valid)

        def dyn(scene, host_packed, state, tracer, maps, transforms,
                vert_idx, tri_idx):
            if use_subset:
                new_data = update_transforms_subset(
                    scene, maps, transforms, vert_idx, tri_idx,
                    update_lights=update_lights)
            else:
                new_data = update_transforms(scene, maps, transforms)
            new_tracer = tracer.refit(new_data)
            out, new_state, stats = frame(new_data, host_packed, state,
                                          new_tracer)
            return out, new_state, stats, new_data, new_tracer

        fn = jax.jit(dyn, donate_argnums=(2,))
        self._fns[key] = fn
        return fn

    def render_dynamic(self, cam_state, maps, transforms, vert_idx,
                       tri_idx, use_subset: bool, update_lights: bool,
                       exposure: float = 1.0,
                       svgf_phi=(4.0, 128.0, 0.02, 0.0)):
        """One-dispatch dynamic frame (DynamicScene.commit_and_render is
        the entity-level entry). Updates self.scene/self.tracer to the
        post-update device pytrees, exactly as commit() would."""
        packed = self._pack_row(cam_state, exposure, svgf_phi,
                                self.frame_count)
        fn = self._get_dynamic_fn(self.frame_count > 0, use_subset,
                                  update_lights)
        out, self.state, self._stats, self.scene, self.tracer = fn(
            self.scene, packed, self.state, self.tracer, maps,
            transforms, vert_idx, tri_idx)
        self.frame_count += 1
        return out

    # --- public API -----------------------------------------------------
    def render(self, cam_state, exposure: float = 1.0,
               svgf_phi=(4.0, 128.0, 0.02, 0.0)):
        """Render one frame; returns the device array (async)."""
        packed = self._pack_row(cam_state, exposure, svgf_phi,
                                self.frame_count)
        fn = self._get_frame_fn(history_valid=self.frame_count > 0)
        out, self.state, self._stats = fn(self.scene, packed, self.state,
                                          self.tracer)
        self.frame_count += 1
        return out

    def render_np(self, cam_state, **kw) -> np.ndarray:
        return np.asarray(self.render(cam_state, **kw))

    def _pack_row(self, cam_state, exposure, svgf_phi, frame_index):
        return np.concatenate([
            cam_state.pack(),
            np.asarray([exposure], np.float32),
            np.asarray(svgf_phi, np.float32),
            np.asarray([frame_index], np.float32),
        ])

    def render_burst(self, cam_states, exposure: float = 1.0,
                     svgf_phi=(4.0, 128.0, 0.02, 0.0)):
        """Render K frames in ONE dispatch (frames-in-flight analog —
        the reference keeps 2-3 frames in flight, Renderer.cpp:147-309;
        here the whole burst is a single device program so the ~50 ms
        per-dispatch tunnel cost is paid once per K frames). Returns a
        (K, H, W, 3) device array; history semantics are identical to K
        sequential render() calls."""
        rows = np.stack([
            self._pack_row(cs, exposure, svgf_phi, self.frame_count + i)
            for i, cs in enumerate(cam_states)])
        fn = self._get_burst_fn(self.frame_count > 0, len(cam_states))
        outs, self.state, self._stats = fn(self.scene, rows, self.state,
                                           self.tracer)
        self.frame_count += len(cam_states)
        return outs

    def frame_stats(self) -> dict:
        """Last frame's (drawn, culled) instance counts + covered-pixel
        count — the FrameStats UI readout analog (Application.h:49-54,
        EditorLayer.cpp:516-518). ``covered_pixels`` is the active-ray
        denominator (rays are only traced for pixels with G-buffer hits).
        Forces a device sync; call after the frame you care about."""
        s = np.asarray(getattr(self, "_stats", np.zeros(3, np.int32)))
        return {"instances_drawn": int(s[0]), "instances_culled": int(s[1]),
                "covered_pixels": int(s[2]) if s.shape[0] > 2 else None}

    def switch_path(self, path_type):
        """Live render-path switch (Application::SwitchRenderPath,
        Application.cpp:408-448): new pass stack, history dropped; scene,
        tracer and the jit cache of other paths are kept."""
        from ..core.types import RenderFlags, RenderPathType
        from ..paths.factory import create_render_path

        _log().info("switching render path", to=str(path_type))
        self.settings = self.settings.replace(path=path_type)
        self.path = create_render_path(self.settings)
        needs_rt = (path_type == RenderPathType.RAYTRACED) or bool(
            self.settings.flags & (RenderFlags.SHADOW | RenderFlags.AO
                                   | RenderFlags.REFLECTION | RenderFlags.GI))
        if needs_rt and self.tracer is None:
            from ..ops import trace as trace_ops

            self.tracer = trace_ops.SceneTracer.build(self.scene,
                                                      self.settings)
        self._fns = {}
        self.reset_history()

    def apply_settings(self, **changes):
        """Live settings change (flags / display mode / resolution — the
        EditorLayer checkbox + combo analog, EditorLayer.cpp:182-540):
        rebuild the pass stack for the new static settings, keep scene
        and tracer, drop history. New flag combinations jit-compile on
        first use, exactly like the reference's pipeline(-cache) misses."""
        from ..core.types import RenderFlags, RenderPathType

        _log().info("applying settings", **{
            k: str(v) for k, v in changes.items()})
        self.settings = self.settings.replace(**changes)
        self.path = create_render_path(self.settings)
        needs_rt = (self.settings.path == RenderPathType.RAYTRACED) or bool(
            self.settings.flags & (RenderFlags.SHADOW | RenderFlags.AO
                                   | RenderFlags.REFLECTION | RenderFlags.GI))
        if needs_rt and self.tracer is None:
            from ..ops import trace as trace_ops

            self.tracer = trace_ops.SceneTracer.build(self.scene,
                                                      self.settings)
        self._fns = {}
        self.reset_history()

    def reset_history(self):
        """Path switch / resize semantics (RenderPath.cpp:50-56): drop
        all carried history."""
        self.state = FrameState.empty()
        self.frame_count = 0

    def benchmark(self, camera: OrbitCamera, frames: int = 32,
                  warmup: int = 4) -> dict:
        """Steady-state FPS. Frames serialize through the carried
        FrameState; the host readback is the fence (block_until_ready is
        unreliable through the axon tunnel)."""
        for _ in range(warmup):
            out = self.render(camera.step(taa_enabled=True))
        _ = np.asarray(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(frames):
            out = self.render(camera.step(taa_enabled=True))
        _ = np.asarray(out[0, 0])
        dt = time.perf_counter() - t0
        return {"fps": frames / dt, "ms_per_frame": 1000.0 * dt / frames}
