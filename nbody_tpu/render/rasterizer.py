"""On-device point-splat rasterizer.

Replaces the reference's OpenGL point-sprite pipeline
(/root/reference/src/nbody/render_particles.cpp — behavior, not code):

* perspective point size ``500 * sprite_size / (1 - z_eye)`` clamped to the
  splat patch (the reference vertex shader's gl_PointSize),
* the 32x32 procedural Hermite/Gaussian splat ``w(d) = 2d^3 - 3d^2 + 1``
  (createGaussianMap's evalHermite), evaluated analytically per fragment
  instead of baked into a texture,
* additive blending with depth-write off (GL_SRC_ALPHA, GL_ONE),
* per-body B/G/R cycle colors (initialise_colours: body i is blue/green/red
  for i%3 = 0/1/2), modulated ``(0.6 + 0.4*color)`` by the fragment shader,
  then tinted orange {1,.6,.3} for fp32 / green {.4,.8,.1} for fp64.

The whole frame is computed on the device with one fused jit program: project
-> build (N, K, K) splat patches -> one scatter-add into the framebuffer ->
tonemap to uint8. Only the finished frame crosses to the host. Bodies are
processed in chunks so 1M-body frames fit in memory.
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.render.camera import Camera, perspective
from nbody_tpu.io.png import write_png

FP32_TINT = (1.0, 0.6, 0.3)
FP64_TINT = (0.4, 0.8, 0.1)


class DisplayMode(enum.Enum):
    POINTS = "points"
    SPRITES = "sprites"
    SPRITES_COLOR = "sprites_color"
    # beyond the reference (additive-only): depth-ordered alpha compositing
    # for dense cores — see _raster's slab path
    SPRITES_ALPHA = "sprites_alpha"


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "splat", "mode", "chunk", "buckets"),
)
def _raster(pos, mv, proj, sprite_size, tint, brightness, *,
            width, height, splat, mode, chunk, buckets=16):
    n = pos.shape[0]
    k = splat
    p3 = pos[:, :3].astype(jnp.float32)

    # Scatter layout (the hot op at 1M bodies): the body color cycle takes
    # only THREE values (B/G/R, initialise_colours), so instead of scattering
    # (N*K*K, 3) rgb payloads with 2-D indices we scatter SCALAR weights with
    # pre-flattened 1-D indices into per-color-class planes — 3x less
    # payload and a scatter shape XLA lowers far better on TPU (measured
    # 16.5 s -> see PARITY.md for the r2 number at 1M bodies).
    #
    # "sprites_alpha" reuses the same machinery for DEPTH-ORDERED "over"
    # compositing without any per-pixel sort (sorting fragments is
    # TPU-hostile): bodies bucket into `buckets` eye-depth slabs, the
    # scatter targets (slab, class) planes, and the slabs composite
    # back-to-front after the scatter. Within a slab blending stays
    # additive — the classic volume-rendering slice approximation.
    nslab = buckets if mode == "sprites_alpha" else 1
    idx = jnp.arange(n)
    if mode in ("sprites_color", "sprites_alpha"):
        nclass = 3
        cls = (idx % 3).astype(jnp.int32)
        # class c colors body i%3==c: B, G, R, modulated like the fragment
        # shader (0.6 + 0.4*color), then tinted
        onehot = jnp.stack([
            jnp.array([0.0, 0.0, 1.0]),  # i%3==0 -> blue
            jnp.array([0.0, 1.0, 0.0]),  # i%3==1 -> green
            jnp.array([1.0, 0.0, 0.0]),  # i%3==2 -> red
        ])
        class_rgb = (0.6 + 0.4 * onehot) * tint[None, :]
    else:
        nclass = 1
        cls = jnp.zeros((n,), jnp.int32)
        class_rgb = tint[None, :]
    planes_len = nslab * nclass * height * width

    eye = p3 @ mv[:3, :3].T + mv[:3, 3]
    clip = eye @ proj[:3, :3].T + proj[:3, 3]
    wc = -eye[:, 2]
    valid = wc > 0.1  # znear
    ndc = clip / jnp.where(valid, wc, 1.0)[:, None]
    sx = (ndc[:, 0] + 1.0) * 0.5 * width
    sy = (1.0 - ndc[:, 1]) * 0.5 * height

    if mode == "sprites_alpha":
        # slab index from eye depth, normalized over the VISIBLE bodies so
        # the slab resolution adapts to the cluster's extent
        wmin = jnp.min(jnp.where(valid, wc, jnp.inf))
        wmax = jnp.max(jnp.where(valid, wc, -jnp.inf))
        span = jnp.maximum(wmax - wmin, 1e-6)
        slab = jnp.clip(((wc - wmin) / span * nslab).astype(jnp.int32),
                        0, nslab - 1)
        cls = slab * nclass + cls  # scatter class becomes (slab, color)

    if mode == "points":
        size = jnp.ones_like(wc)
    else:
        size = jnp.clip(500.0 * sprite_size / (1.0 - eye[:, 2]), 1.0, float(k))

    def splat_chunk(args):
        sx_c, sy_c, size_c, cls_c, valid_c = args
        m = sx_c.shape[0]
        # integer pixel indices around the body; weights are evaluated at
        # PIXEL CENTERS (index + 0.5) so size~1 sprites neither vanish nor
        # get stamped half a pixel away from where they were sampled
        ox = jnp.arange(k, dtype=jnp.float32) - (k // 2)
        px = jnp.floor(sx_c)[:, None, None] + ox[None, :, None]  # (m, k, 1)
        py = jnp.floor(sy_c)[:, None, None] + ox[None, None, :]  # (m, 1, k)
        dx = px + 0.5 - sx_c[:, None, None]
        dy = py + 0.5 - sy_c[:, None, None]
        if mode == "points":
            # exactly the containing pixel, full weight (GL point size 1,
            # no alpha modulation in the reference's points path)
            w = ((jnp.abs(dx) <= 0.5) & (jnp.abs(dy) <= 0.5)).astype(jnp.float32)
            w = jnp.broadcast_to(w, (m, k, k)) * valid_c[:, None, None]
        else:
            r = size_c[:, None, None] * 0.5
            d = jnp.sqrt(dx * dx + dy * dy) / r
            d = jnp.minimum(jnp.broadcast_to(d, (m, k, k)), 1.0)
            w = 2 * d**3 - 3 * d**2 + 1  # Hermite splat
            w = w * valid_c[:, None, None] * brightness
        pxi = jnp.broadcast_to(px, (m, k, k)).astype(jnp.int32)
        pyi = jnp.broadcast_to(py, (m, k, k)).astype(jnp.int32)
        inb = (pxi >= 0) & (pxi < width) & (pyi >= 0) & (pyi < height)
        flat = (cls_c[:, None, None] * (height * width)
                + pyi * width + pxi)
        # out-of-frame pixels route to a sacrificial trailing slot
        flat = jnp.where(inb, flat, planes_len)
        buf = jnp.zeros((planes_len + 1,), jnp.float32)
        return buf.at[flat.reshape(-1)].add(w.reshape(-1))

    if n <= chunk:
        acc = splat_chunk((sx, sy, size, cls, valid.astype(jnp.float32)))
    else:
        c = chunk
        n_pad = ((n + c - 1) // c) * c
        pad = n_pad - n

        def padded(x):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)).reshape(
                (n_pad // c, c) + x.shape[1:]
            )

        chunks = (
            padded(sx), padded(sy), padded(size), padded(cls),
            padded(valid.astype(jnp.float32)),
        )
        acc = jax.lax.map(splat_chunk, chunks).sum(axis=0)

    if mode == "sprites_alpha":
        planes = acc[:planes_len].reshape(nslab, nclass, height, width)
        wsum = planes.sum(axis=1)                           # (B, H, W)
        rgb = jnp.einsum("bchw,ck->bhwk", planes, class_rgb)
        avg = rgb / jnp.maximum(wsum, 1e-12)[..., None]     # slab mean color
        alpha = 1.0 - jnp.exp(-wsum)                        # soft saturation
        img = jnp.zeros((height, width, 3), jnp.float32)
        for b in range(nslab - 1, -1, -1):                  # far -> near
            a = alpha[b][..., None]
            img = img * (1.0 - a) + avg[b] * a              # "over" operator
    else:
        planes = acc[:planes_len].reshape(nclass, height, width)
        img = jnp.einsum("chw,ck->hwk", planes, class_rgb)
    return (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "splat", "mode", "sizes", "cic"),
)
def _raster_conv(pos, mv, proj, sprite_size, tint, brightness, *,
                 width, height, splat, mode, sizes=6, cic=True):
    """Deposit + dense convolution: the TPU-first reformulation of the
    splat scatter (VERDICT r3 item 7).

    The exact path scatters N·K² weighted fragments — a 64M-element
    scatter-add at 1M bodies that XLA serializes (measured ~11 ns/elem).
    This path scatters only O(N) DEPOSIT points and turns the splat into
    dense convolutions, which XLA lowers onto the TPU's conv/matmul
    machinery:

    * each body deposits its total brightness at its continuous screen
      position — bilinearly over the 2×2 nearest pixels (``cic=True``,
      the PM solver's CIC trick: first-order-accurate subpixel placement)
      or to the nearest pixel,
    * perspective point size is handled by a geometric SIZE LADDER: the
      body's clamped size lands between two ladder rungs and its deposit
      lerps between their planes, so radius varies smoothly with depth,
    * each (size-rung, color-class) plane convolves with that rung's
      K×K Hermite splat kernel (evaluated at integer pixel offsets), and
      rungs sum into the frame.

    Approximation vs the exact path: CIC linearizes the kernel's
    subpixel shift (exact when a body sits on a pixel center and its
    size on a rung). Visually indistinguishable for the smooth Hermite
    blobs; the tests pin a tolerance. POINTS mode needs no convolution
    (the exact path is already O(N)); SPRITES_ALPHA keeps the exact
    path (its depth slabs multiply plane count 16×)."""
    n = pos.shape[0]
    k = splat
    p3 = pos[:, :3].astype(jnp.float32)

    idx = jnp.arange(n)
    if mode == "sprites_color":
        nclass = 3
        cls = (idx % 3).astype(jnp.int32)
        onehot = jnp.stack([
            jnp.array([0.0, 0.0, 1.0]),
            jnp.array([0.0, 1.0, 0.0]),
            jnp.array([1.0, 0.0, 0.0]),
        ])
        class_rgb = (0.6 + 0.4 * onehot) * tint[None, :]
    else:
        nclass = 1
        cls = jnp.zeros((n,), jnp.int32)
        class_rgb = tint[None, :]

    eye = p3 @ mv[:3, :3].T + mv[:3, 3]
    clip = eye @ proj[:3, :3].T + proj[:3, 3]
    wc = -eye[:, 2]
    valid = wc > 0.1
    ndc = clip / jnp.where(valid, wc, 1.0)[:, None]
    sx = (ndc[:, 0] + 1.0) * 0.5 * width
    sy = (1.0 - ndc[:, 1]) * 0.5 * height
    size = jnp.clip(500.0 * sprite_size / (1.0 - eye[:, 2]), 1.0, float(k))

    # geometric size ladder 1..k; rung spacing constant in log(size)
    nsz = sizes
    log_ratio = np.log(float(k)) / (nsz - 1)
    rung_sizes = np.exp(np.arange(nsz) * log_ratio)  # 1 .. k
    f = jnp.log(size) / log_ratio                    # fractional rung
    j0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, nsz - 2)
    fj = jnp.clip(f - j0.astype(jnp.float32), 0.0, 1.0)

    # deposits: (rung, class) planes with a 1px halo so CIC at the frame
    # edge stays in-bounds; splat halo comes from conv padding
    hw, hh = width + 2, height + 2
    plane_len = nsz * nclass * hh * hw
    base = (j0 * nclass + cls) * (hh * hw)
    base_hi = jnp.minimum(j0 + 1, nsz - 1) * nclass + cls
    base_hi = base_hi * (hh * hw)

    px = sx - 0.5 + 1.0  # continuous position in halo pixel coords
    py = sy - 0.5 + 1.0
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    w_amp = jnp.where(valid, brightness, 0.0)

    def clip_ok(xi, yi):
        return (xi >= 0) & (xi < hw) & (yi >= 0) & (yi < hh)

    if cic:
        fx = px - x0.astype(jnp.float32)
        fy = py - y0.astype(jnp.float32)
        corners = [(x0, y0, (1 - fx) * (1 - fy)),
                   (x0 + 1, y0, fx * (1 - fy)),
                   (x0, y0 + 1, (1 - fx) * fy),
                   (x0 + 1, y0 + 1, fx * fy)]
    else:
        corners = [(jnp.round(px).astype(jnp.int32),
                    jnp.round(py).astype(jnp.int32),
                    jnp.ones_like(px))]

    flats = []
    weights = []
    for xi, yi, cw in corners:
        ok = clip_ok(xi, yi)
        cell = jnp.where(ok, yi * hw + xi, 0)
        dead = jnp.where(ok, 0, plane_len)  # sacrificial slot
        for b, rung_w in ((base, (1.0 - fj)), (base_hi, fj)):
            flats.append(b + cell + dead)
            weights.append(w_amp * cw * rung_w)
    flat = jnp.concatenate(flats)
    wts = jnp.concatenate(weights)
    planes = jnp.zeros((plane_len + 1,), jnp.float32).at[flat].add(wts)
    planes = planes[:plane_len].reshape(nsz * nclass, 1, hh, hw)

    # per-rung Hermite splat kernels at integer offsets (odd support so
    # the kernel is centered; K is the max radius's support)
    ksup = k + (k % 2 == 0)  # odd
    off = np.arange(ksup, dtype=np.float32) - (ksup // 2)
    dyy, dxx = np.meshgrid(off, off, indexing="ij")
    dist = np.sqrt(dxx * dxx + dyy * dyy)
    kerns = []
    for s in rung_sizes:
        d = np.minimum(dist / max(s * 0.5, 0.5), 1.0)
        kerns.append(2 * d**3 - 3 * d**2 + 1)
    kern = jnp.asarray(np.stack(kerns), jnp.float32)  # (nsz, ksup, ksup)

    # one grouped conv: feature group per rung, classes ride the batch dim
    planes = planes.reshape(nsz, nclass, hh, hw).transpose(1, 0, 2, 3)
    out = jax.lax.conv_general_dilated(
        planes,                                  # (nclass, nsz, hh, hw)
        kern[:, None, :, :],                     # (nsz, 1, ksup, ksup)
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=nsz,
    )                                            # (nclass, nsz, hh, hw)
    acc = out.sum(axis=1)[:, 1:1 + height, 1:1 + width]  # drop halo
    img = jnp.einsum("chw,ck->hwk", acc, class_rgb)
    return (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)


class FrameRenderer:
    def __init__(self, width: int = 1024, height: int = 768, *,
                 splat: int = 16, fov_deg: float = 60.0,
                 znear: float = 0.1, zfar: float = 1000.0,
                 chunk: int = 65536, depth_buckets: int = 16,
                 method: str = "auto"):
        self.width = width
        self.height = height
        self.splat = splat
        self.chunk = chunk
        self.depth_buckets = depth_buckets  # SPRITES_ALPHA slab count
        # method: "scatter" (exact N*K^2 fragment scatter), "conv"
        # (deposit + dense convolution — see _raster_conv), or "auto"
        # (conv for the sprite modes once the fragment count is large
        # enough that the serialized scatter dominates; measured
        # crossover well below 262k bodies at K>=8)
        if method not in ("auto", "scatter", "conv"):
            raise ValueError(f"unknown raster method {method!r}")
        self.method = method
        self.proj = perspective(fov_deg, width / height, znear, zfar)

    def render(
        self,
        pos,
        camera: Camera | None = None,
        *,
        fp64: bool = False,
        mode: DisplayMode = DisplayMode.SPRITES_COLOR,
        sprite_size: float = 1.0,
        brightness: float = 0.3,
    ) -> np.ndarray:
        """Rasterize positions (N, 4) into an (H, W, 3) uint8 frame.

        brightness scales each splat's additive contribution (the GL path's
        source-alpha analogue) so dense cores don't immediately saturate."""
        mv = camera.view_matrix() if camera is not None else np.eye(4, dtype=np.float32)
        tint = jnp.asarray(FP64_TINT if fp64 else FP32_TINT, jnp.float32)
        # the conv path's geometric size ladder needs k >= 2 rungs
        # (splat=1 would divide by log(1)); the scatter path handles the
        # 1px-splat case exactly and just as cheaply
        use_conv = self.splat >= 2 and (
            self.method == "conv"
            or (self.method == "auto"
                and mode in (DisplayMode.SPRITES, DisplayMode.SPRITES_COLOR)
                and pos.shape[0] * self.splat * self.splat >= 1 << 22)
        )
        if use_conv and mode in (DisplayMode.SPRITES,
                                 DisplayMode.SPRITES_COLOR):
            frame = _raster_conv(
                jnp.asarray(pos, jnp.float32),
                jnp.asarray(mv),
                jnp.asarray(self.proj),
                jnp.float32(sprite_size),
                tint,
                jnp.float32(brightness),
                width=self.width,
                height=self.height,
                splat=self.splat,
                mode=mode.value,
            )
            return np.array(frame)
        frame = _raster(
            jnp.asarray(pos, jnp.float32),
            jnp.asarray(mv),
            jnp.asarray(self.proj),
            jnp.float32(sprite_size),
            tint,
            jnp.float32(brightness),
            width=self.width,
            height=self.height,
            splat=self.splat,
            mode=mode.value,
            chunk=self.chunk,
            buckets=self.depth_buckets,
        )
        # writable copy: zero-copy views of device buffers are read-only and
        # the HUD overlay stamps pixels in place
        return np.array(frame)

    @staticmethod
    def write_png(frame: np.ndarray, path) -> None:
        write_png(frame, path)
