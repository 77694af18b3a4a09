"""Decompose the 1M-body frame time (VERDICT r4 item 7, step 1).

PARITY row 13 records 735 ms/frame at N=1M, splat=8 — 50x off
interactive — with the scatter-add as the suspected hot op. Before
attempting a Pallas rasterizer, price the pieces: this script times the
production `_raster` against an ablated copy whose scatter is replaced
by a dense reduction of the same computed weights (identical projection
+ patch math, no scatter). The difference IS the scatter cost; the
remainder is projection + patch building + tonemap.

Usage: python scripts/tpu_r4_raster_budget.py [N ...]
Prints one JSON line per (N, splat).
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.render.camera import Camera, perspective
from nbody_tpu.render.rasterizer import _raster
from nbody_tpu.utils.compilation_cache import enable as enable_cache
from nbody_tpu.utils.timing import hard_sync, time_steps

W, H = 1920, 1080


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "splat", "chunk",
                                    "scatter"))
def _raster_ablate(pos, mv, proj, sprite_size, brightness, *,
                   width, height, splat, chunk, scatter):
    """sprites_color math of render.rasterizer._raster with the scatter
    optionally replaced by a dense sum of the same weights."""
    n = pos.shape[0]
    k = splat
    p3 = pos[:, :3].astype(jnp.float32)
    idx = jnp.arange(n)
    cls = (idx % 3).astype(jnp.int32)
    planes_len = 3 * height * width

    eye = p3 @ mv[:3, :3].T + mv[:3, 3]
    clip = eye @ proj[:3, :3].T + proj[:3, 3]
    wc = -eye[:, 2]
    valid = wc > 0.1
    ndc = clip / jnp.where(valid, wc, 1.0)[:, None]
    sx = (ndc[:, 0] + 1.0) * 0.5 * width
    sy = (1.0 - ndc[:, 1]) * 0.5 * height
    size = jnp.clip(500.0 * sprite_size / (1.0 - eye[:, 2]), 1.0, float(k))

    def splat_chunk(args):
        sx_c, sy_c, size_c, cls_c, valid_c = args
        m = sx_c.shape[0]
        ox = jnp.arange(k, dtype=jnp.float32) - (k // 2)
        px = jnp.floor(sx_c)[:, None, None] + ox[None, :, None]
        py = jnp.floor(sy_c)[:, None, None] + ox[None, None, :]
        dx = px + 0.5 - sx_c[:, None, None]
        dy = py + 0.5 - sy_c[:, None, None]
        r = size_c[:, None, None] * 0.5
        d = jnp.sqrt(dx * dx + dy * dy) / r
        d = jnp.minimum(jnp.broadcast_to(d, (m, k, k)), 1.0)
        w = (2 * d**3 - 3 * d**2 + 1) * valid_c[:, None, None] * brightness
        pxi = jnp.broadcast_to(px, (m, k, k)).astype(jnp.int32)
        pyi = jnp.broadcast_to(py, (m, k, k)).astype(jnp.int32)
        inb = (pxi >= 0) & (pxi < width) & (pyi >= 0) & (pyi < height)
        flat = cls_c[:, None, None] * (height * width) + pyi * width + pxi
        flat = jnp.where(inb, flat, planes_len)
        if not scatter:
            # identical math; the 64M-element scatter becomes a dense
            # reduction (flat stays live so index math is not DCE'd)
            out = jnp.zeros((planes_len + 1,), jnp.float32)
            return out.at[0].set(jnp.sum(w) + jnp.sum(flat % 7) * 1e-20)
        buf = jnp.zeros((planes_len + 1,), jnp.float32)
        return buf.at[flat.reshape(-1)].add(w.reshape(-1))

    c = chunk
    n_pad = ((n + c - 1) // c) * c
    pad = n_pad - n

    def padded(x):
        return jnp.pad(x, [(0, pad)]).reshape(n_pad // c, c)

    chunks = (padded(sx), padded(sy), padded(size), padded(cls),
              padded(valid.astype(jnp.float32)))
    acc = jax.lax.map(splat_chunk, chunks).sum(axis=0)
    return acc[:8]


def main():
    enable_cache()
    ns = [int(a) for a in sys.argv[1:]] or [262144, 1048576]
    cam = Camera(origin=(0.0, 0.0, -50.0))
    mv = jnp.asarray(cam.view_matrix())
    proj = jnp.asarray(perspective(60.0, W / H, 0.1, 1000.0))
    for n in ns:
        pos, _ = ic.generate(NBodyConfig.SHELL, n, 1.54, 8.0, seed=0)
        p = jnp.asarray(pos)
        splat = 16 if n <= 262144 else 8
        # production frame
        tint = jnp.asarray((1.0, 0.6, 0.3), jnp.float32)

        def prod():
            return _raster(p, mv, proj, jnp.float32(1.0), tint,
                           jnp.float32(0.3), width=W, height=H,
                           splat=splat, mode="sprites_color", chunk=65536)

        def abl(scatter):
            return _raster_ablate(p, mv, proj, jnp.float32(1.0),
                                  jnp.float32(0.3), width=W, height=H,
                                  splat=splat, chunk=65536,
                                  scatter=scatter)

        from nbody_tpu.render.rasterizer import _raster_conv

        def conv():
            return _raster_conv(p, mv, proj, jnp.float32(1.0), tint,
                                jnp.float32(0.3), width=W, height=H,
                                splat=splat, mode="sprites_color")

        out = {}
        for name, fn in (("frame_ms", prod),
                         ("conv_frame_ms", conv),
                         ("with_scatter_ms", lambda: abl(True)),
                         ("no_scatter_ms", lambda: abl(False))):
            hard_sync(fn())  # warm
            ms, _ = time_steps(lambda *_: fn(), (), iters=1, warmup=0)
            ms2, _ = time_steps(lambda *_: fn(), (), iters=1, warmup=0)
            out[name] = round(min(ms, ms2), 1)
        out.update(n=n, splat=splat,
                   scatter_ms=round(out["with_scatter_ms"]
                                    - out["no_scatter_ms"], 1))
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
