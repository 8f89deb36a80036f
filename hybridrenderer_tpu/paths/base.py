"""RenderPath base — pass-stack assembly per path (RenderPath.cpp:31-100).

A path builds its RenderGraph once per (settings) configuration; executing
it inside the jitted frame function replaces the reference's per-frame
rebuild + Compile + Execute (the rebuild existed to re-record Vulkan
state; tracing makes it free)."""
from __future__ import annotations

from ..graph.graph import RenderGraph
from ..graph.params import RS, FrameState


class RenderPath:
    kind = "base"

    def __init__(self, settings):
        self.settings = settings
        self.graph = RenderGraph(
            settings.width, settings.height,
            barrier_passes=getattr(settings, "graph_barriers", "multi"))
        self.build_graph(self.graph)
        self.graph.compile()

    def build_graph(self, graph: RenderGraph):
        raise NotImplementedError

    def add(self, graph, name, builder, kind="compute"):
        fn, reads, writes, history = builder
        graph.add_pass(name, fn, reads, writes, history, kind)

    def run(self, ctx, state: FrameState):
        """Execute the pass stack; returns (output image, new FrameState)."""
        registry, new_history = self.graph.execute({}, ctx, state)
        return registry[RS.RENDER_OUTPUT], FrameState(history=new_history), registry

    def export_mermaid(self) -> str:
        return self.graph.export_mermaid()
