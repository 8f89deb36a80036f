"""Per-pass timing — the reference's declared-but-dead GPU timestamp
infrastructure (RenderGraph.h:319-343, DrawPerformanceStatistics stub,
RenderGraph.cpp:604) implemented for real.

In production the whole frame is one fused XLA program, so per-pass times
don't exist; profiling mode jits each render-graph pass separately
(slower — fusion boundaries at every pass) and walls each with
block_until_ready. Use for optimization guidance, not absolute truth.
"""
from __future__ import annotations

import time
from typing import Dict

import jax

from ..graph.params import FrameParams, FrameState
from ..graph.passes import FrameContext


def profile_frame(renderer, cam_state, iters: int = 5) -> Dict[str, float]:
    """Returns {pass_name: ms} for one frame of ``renderer``'s path."""
    path = renderer.path
    settings = renderer.settings
    scene = renderer.scene
    tracer = renderer.tracer
    params = FrameParams.create(scene, frame_index=renderer.frame_count)
    state = renderer.state if renderer.state.history else FrameState.empty()
    history_valid = renderer.frame_count > 0 and bool(renderer.state.history)

    shadow_query = None
    trace_radiance = None
    if tracer is not None:
        def shadow_query(p, n, d, t, active=None, **kw):
            return tracer.shadow_query(scene, p, n, d, t, active=active,
                                       **kw)

        def trace_radiance(o, d, c, dep, active=None):
            return tracer.trace_radiance(scene, o, d, c, dep, active=active)

    ctx = FrameContext(
        scene=scene, cam=cam_state, params=params, settings=settings,
        state=state, history_valid=history_valid,
        shadow_query=shadow_query, trace_radiance=trace_radiance)

    registry: dict = {}
    timings: Dict[str, float] = {}
    for p in path.graph.passes:
        for r in p.reads:
            if r.startswith("History_") and r not in registry:
                hname = r[len("History_"):]
                h = state.get(hname)
                registry[r] = h if h is not None else registry.get(hname)

        import numpy as _np

        jitted = jax.jit(lambda reg, c=ctx, fn=p.fn: fn(reg, c))
        out = jitted(registry)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, 'ravel')]
        _ = _np.asarray(leaves[0].ravel()[0]) if leaves else None
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(registry)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, 'ravel')]
        _ = _np.asarray(leaves[0].ravel()[0]) if leaves else None
        timings[p.name] = (time.perf_counter() - t0) / iters * 1000.0
        if out:
            registry.update(out)
    return timings


def print_profile(timings: Dict[str, float]):
    total = sum(timings.values())
    width = max(len(k) for k in timings)
    for name, ms in timings.items():
        bar = "#" * int(40 * ms / max(total, 1e-9))
        print(f"{name:<{width}}  {ms:8.2f} ms  {bar}")
    print(f"{'TOTAL (unfused)':<{width}}  {total:8.2f} ms")
