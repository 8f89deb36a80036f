"""Prototype: group-window texture sampling (r5).

Gathers are priced per ROW (~25 ns in-frame, r5 batches 10/2) at any
row width up to ~1KB — so sample cost scales with ROW COUNT. Bake an
overlapping WINDOW ATLAS (8x8-texel windows at stride 4, REPEAT wrap
baked in; 4x texel memory — same multiplier as the quad bake it would
replace); each 4x4 pixel group then costs ONE 1KB row gather, and the
per-pixel bilinear runs as separable one-hot weight contractions
against the group's window.

Exact (bit-close to sample_bilinear) whenever every pixel's 2x2
footprint lies within the group-representative's window: group texel
span <= 3 per axis (texels-per-pixel rho <= 1 — guaranteed once mips
exist; until then large-rho pixels clamp to the window edge).

Run: python benchmarks/r5_window_sampler_proto.py [cpu]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hybridrenderer_tpu.ops import texture as tex_ops

WS = 8       # window texels per axis
STRIDE = 4   # window origin stride (overlap = WS - STRIDE)
GY, GX = 4, 4


def build_window_atlas(data, sizes):
    """(N,TH,TW,4) -> (N*NWY*NWX, WS*WS*4) wrapped windows + (NWY,NWX)."""
    d = np.asarray(data)
    sz = np.asarray(sizes)
    n, th, tw, c = d.shape
    nwy, nwx = th // STRIDE, tw // STRIDE
    atlas = np.zeros((n, nwy, nwx, WS, WS, c), d.dtype)
    for i in range(n):
        h, w = int(sz[i, 0]), int(sz[i, 1])
        t = d[i, :h, :w]
        for a in range(min(nwy, (h + STRIDE - 1) // STRIDE)):
            ys = (a * STRIDE + np.arange(WS)) % h
            rows = t[ys]
            for b in range(min(nwx, (w + STRIDE - 1) // STRIDE)):
                xs = (b * STRIDE + np.arange(WS)) % w
                atlas[i, a, b] = rows[:, xs]
    return (jnp.asarray(atlas.reshape(n * nwy * nwx, WS * WS * c)),
            nwy, nwx)


def sample_window(atlas, nwy, nwx, sizes, tex_id, uv, default):
    """Group-window bilinear; tex_id (H,W) i32, uv (H,W,2) -> (H,W,4)."""
    H, W = tex_id.shape
    Gy, Gx = H // GY, W // GX
    C = 4

    tid = jnp.maximum(tex_id, 0)
    h = sizes[tid, 0].astype(jnp.float32)
    w = sizes[tid, 1].astype(jnp.float32)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    hi = h.astype(jnp.int32)
    wi = w.astype(jnp.int32)
    xi = jnp.mod(x0.astype(jnp.int32), wi)   # wrapped texel coords
    yi = jnp.mod(y0.astype(jnp.int32), hi)

    def to_groups(a):
        return a.reshape(Gy, GY, Gx, GX) \
                .transpose(0, 2, 1, 3).reshape(Gy * Gx, GY * GX)

    xig, yig = to_groups(xi), to_groups(yi)
    fxg, fyg = to_groups(fx), to_groups(fy)
    tg = to_groups(tid)[:, 0]
    hg = to_groups(hi)[:, 0]
    wg = to_groups(wi)[:, 0]

    # window at the group's circular-min texel (seam-straddling groups
    # resolve via centered wrapped deltas from pixel 0, so REPEAT wrap
    # is exact whenever the group span fits the window)
    def origin_off(cg, size):
        delta = jnp.mod(cg - cg[:, :1] + size[:, None] // 2,
                        size[:, None]) - size[:, None] // 2
        cmin = cg[:, 0] + delta.min(1)
        origin = (cmin // STRIDE) * STRIDE          # floor, may be < 0
        widx = jnp.mod(origin, size) // STRIDE
        off = jnp.clip(cg[:, :1] + delta - origin[:, None], 0, WS - 2)
        return widx, off

    wyx, offy = origin_off(yig, hg)
    wxx, offx = origin_off(xig, wg)
    row = atlas[(tg * nwy + wyx) * nwx + wxx]       # (G, WS*WS*C) — THE gather
    win = row.reshape(-1, WS, WS * C)               # (G, wy, wx*C)

    pos = jnp.arange(WS, dtype=jnp.int32)[None, None, :]
    wym = jnp.where(pos == offy[..., None], 1.0 - fyg[..., None], 0.0) \
        + jnp.where(pos == offy[..., None] + 1, fyg[..., None], 0.0)
    wxm = jnp.where(pos == offx[..., None], 1.0 - fxg[..., None], 0.0) \
        + jnp.where(pos == offx[..., None] + 1, fxg[..., None], 0.0)

    # y-contract on the MXU: (G,P,wy) x (G,wy,wx*C) -> (G,P,wx*C)
    t1 = jnp.einsum("gpy,gyz->gpz", wym, win,
                    preferred_element_type=jnp.float32)
    t1 = t1.reshape(-1, GY * GX, WS, C)
    # x-contract stays elementwise (fusable): (G,P,wx) * (G,P,wx,C)
    out = jnp.sum(wxm[..., None] * t1, axis=2)      # (G, P, C)

    res = out.reshape(Gy, Gx, GY, GX, C).transpose(0, 2, 1, 3, 4) \
             .reshape(H, W, C)
    valid = (tex_id >= 0)[..., None]
    return jnp.where(valid, res, jnp.broadcast_to(default, res.shape))


def main():
    rng = np.random.default_rng(0)
    N, T = 4, 128
    data = jnp.asarray(rng.random((N, T, T, 4), np.float32))
    sizes = jnp.asarray(np.full((N, 2), T, np.int32))
    atlas, nwy, nwx = build_window_atlas(data, sizes)

    H, W = 512, 512
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    # coherent field incl. a seam crossing (uv through 1.0) and mild
    # distortion; rho ~ T*du/dx = 128 * (3.1/512) ~ 0.78 <= 1
    uv = np.stack([xx / W * 3.1 + 0.13 * np.sin(yy / 97),
                   yy / H * 2.7 + 0.11 * np.cos(xx / 83)], axis=-1)
    uv = jnp.asarray(uv.astype(np.float32))
    tex_id = jnp.asarray(((xx.astype(np.int32) // 128
                           + yy.astype(np.int32) // 128) % N))
    default = jnp.ones((4,), jnp.float32)

    ref = tex_ops.sample_bilinear(data, sizes, tex_id, uv, default)
    got = sample_window(atlas, nwy, nwx, sizes, tex_id, uv, default)
    err = np.abs(np.asarray(ref) - np.asarray(got))
    print(json.dumps({"proto": "window", "max_err": float(err.max()),
                      "mean_err": float(err.mean()),
                      "frac_bad": float((err.max(-1) > 1e-3).mean())}),
          flush=True)

    if "cpu" in sys.argv[1:]:
        return

    # chained TPU timing at 1080p scale vs the quad path
    H2, W2 = 1088, 1920
    yy, xx = np.mgrid[0:H2, 0:W2].astype(np.float32)
    uv2 = jnp.asarray(np.stack(
        [xx / W2 * 3.1, yy / H2 * 2.7], axis=-1).astype(np.float32))
    tid2 = jnp.asarray(((xx.astype(np.int32) // 480) % N))
    quads = tex_ops.build_quads(data, sizes)

    def timed(name, fn):
        @jax.jit
        def loop(u):
            def body(_, c):
                s = fn(c)
                return c + s[..., :2] * 1e-7
            return jax.lax.fori_loop(0, 8, body, u)

        r = loop(uv2)
        _ = np.asarray(r[0, 0])
        t0 = time.perf_counter()
        r = loop(uv2)
        _ = np.asarray(r[0, 0])
        print(json.dumps({"probe": name,
                          "ms": round((time.perf_counter() - t0) / 8 * 1e3,
                                      2)}), flush=True)

    timed("win_1080p", lambda u: sample_window(
        atlas, nwy, nwx, sizes, tid2, u, default))
    timed("quad_1080p", lambda u: tex_ops.sample_bilinear_quad(
        quads, sizes, tid2, u, default))


main()
