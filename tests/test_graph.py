"""Render graph: validation, Mermaid export, pass ordering."""
import pytest

from hybridrenderer_tpu.core.config import RenderSettings
from hybridrenderer_tpu.core.types import RenderFlags, RenderPathType
from hybridrenderer_tpu.graph.graph import RenderGraph
from hybridrenderer_tpu.paths.factory import create_render_path


def test_undeclared_read_rejected():
    g = RenderGraph(64, 64)
    g.add_pass("p", lambda reg, ctx: {}, reads=("Missing",), writes=("Out",))
    with pytest.raises(ValueError, match="undeclared resource"):
        g.compile()


def test_history_reads_allowed_without_writer():
    g = RenderGraph(64, 64)
    g.add_pass("p", lambda reg, ctx: {"Out": 1}, reads=("History_X",),
               writes=("Out",))
    g.compile()  # History_* satisfied by FrameState fallback


def test_hybrid_graph_structure():
    s = RenderSettings(width=64, height=64, path=RenderPathType.HYBRID,
                       flags=RenderFlags.default_hybrid())
    path = create_render_path(s)
    names = [p.name for p in path.graph.passes]
    assert names[0] == "GBufferPass"
    assert "RTShadowPass" in names
    assert "SVGF_ShadowAO" in names
    assert names[-1] == "PostProcessPass"
    assert names.index("RTShadowPass") < names.index("SVGF_ShadowAO") \
        < names.index("CompositionPass")


def test_mermaid_export():
    s = RenderSettings(width=64, height=64, path=RenderPathType.FORWARD,
                       flags=RenderFlags.LIGHT | RenderFlags.TAA)
    path = create_render_path(s)
    m = path.export_mermaid()
    assert m.startswith("graph TD")
    assert "TAAPass" in m and "RENDER_OUTPUT" in m


def test_forward_no_rt_passes():
    s = RenderSettings(width=64, height=64, path=RenderPathType.FORWARD,
                       flags=RenderFlags.LIGHT)
    path = create_render_path(s)
    names = [p.name for p in path.graph.passes]
    assert "RTShadowPass" not in names
