"""Full ray-traced path (RayTracedRenderPath.cpp:21-38):
DepthPrepass → RaytracePass (primary camera rays) → TAA → PostProcess."""
from __future__ import annotations

from ..graph import passes
from ..graph.params import RS
from .base import RenderPath


class RayTracedRenderPath(RenderPath):
    kind = "raytraced"

    def build_graph(self, graph):
        from ..graph import rt_passes  # lazy: needs ops/trace

        s = self.settings
        self.add(graph, "DepthPrepass", passes.make_depth_prepass(s),
                 "graphics")
        self.add(graph, "RaytracePass", rt_passes.make_primary_rt_pass(s),
                 "raytracing")
        self.add(graph, "TAAPass", passes.make_taa_pass(s, use_gbuffer=False),
                 "compute")
        self.add(graph, "PostProcessPass",
                 passes.make_postprocess_pass(s, RS.TAA_OUTPUT), "graphics")
