"""Rasterizer + camera tests."""

import numpy as np

from nbody_tpu.render import Camera, DisplayMode, FrameRenderer
from nbody_tpu.render.camera import perspective


def _cluster(n=64, z=0.0):
    rng = np.random.default_rng(0)
    pos = np.zeros((n, 4), np.float32)
    pos[:, :3] = rng.normal(scale=2.0, size=(n, 3))
    pos[:, 2] += z
    pos[:, 3] = 1.0
    return pos


def test_render_produces_nonempty_frame():
    cam = Camera(origin=(0.0, 0.0, -30.0))
    r = FrameRenderer(width=128, height=96)
    frame = r.render(_cluster(), cam)
    assert frame.shape == (96, 128, 3)
    assert frame.dtype == np.uint8
    assert frame.sum() > 0, "visible cluster must light pixels"


def test_fp64_tint_differs():
    cam = Camera(origin=(0.0, 0.0, -30.0))
    r = FrameRenderer(width=64, height=64)
    f32 = r.render(_cluster(), cam, fp64=False)
    f64 = r.render(_cluster(), cam, fp64=True)
    assert not np.array_equal(f32, f64)
    # fp32 tint is orange (R-heavy), fp64 green (G-heavy)
    assert f32[..., 0].sum() > f32[..., 2].sum()
    assert f64[..., 1].sum() > f64[..., 0].sum()


def test_behind_camera_invisible():
    cam = Camera(origin=(0.0, 0.0, -30.0))
    r = FrameRenderer(width=64, height=64)
    frame = r.render(_cluster(z=100.0), cam)  # behind the near plane
    assert frame.sum() == 0


def test_points_mode_renders():
    cam = Camera(origin=(0.0, 0.0, -30.0))
    r = FrameRenderer(width=64, height=64)
    sprites = r.render(_cluster(), cam, mode=DisplayMode.SPRITES)
    points = r.render(_cluster(), cam, mode=DisplayMode.POINTS)
    assert points.sum() > 0
    assert (points > 0).sum() < (sprites > 0).sum(), "points cover fewer pixels"


def test_chunked_rendering_matches_unchunked():
    cam_mv = np.eye(4, dtype=np.float32)
    cam_mv[2, 3] = -30.0
    pos = _cluster(300)
    a = FrameRenderer(width=64, height=64, chunk=100000)
    b = FrameRenderer(width=64, height=64, chunk=64)

    class FixedCam:
        def view_matrix(self):
            return cam_mv

    fa = a.render(pos, FixedCam())
    fb = b.render(pos, FixedCam())
    assert np.abs(fa.astype(int) - fb.astype(int)).max() <= 1  # rounding only


def test_camera_inertia_converges():
    cam = Camera(origin=(0.0, 0.0, -50.0))
    cam.translation[2] = -10.0
    for _ in range(200):
        mv = cam.view_matrix()
    assert abs(mv[2, 3] - (-10.0)) < 1e-2


def test_camera_zoom_scales_with_distance():
    cam = Camera(origin=(0.0, 0.0, -100.0))
    cam.zoom(10.0)
    assert cam.translation[2] != -100.0


def test_perspective_matrix_shape():
    p = perspective(60.0, 4 / 3, 0.1, 1000.0)
    assert p.shape == (4, 4)
    assert p[3, 2] == -1.0


def test_sprites_alpha_occlusion():
    """SPRITES_ALPHA composites depth slabs back-to-front: a near red body
    must occlude a far blue body on the same line of sight (additive mode
    mixes them instead)."""
    cam = Camera(origin=(0.0, 0.0, 0.0))
    # body index picks the color class (i%3): 0 -> blue (far), 2 -> red
    # (near); body 1 (green) parked far off to the side
    pos = np.zeros((3, 4), np.float32)
    pos[0, :3] = (0.0, 0.0, -50.0)   # blue, far
    pos[1, :3] = (500.0, 500.0, -50.0)
    pos[2, :3] = (0.0, 0.0, -5.0)    # red, near
    pos[:, 3] = 1.0
    r = FrameRenderer(width=64, height=64, splat=8)
    # high brightness -> both bodies nearly opaque
    alpha = r.render(pos, cam, mode=DisplayMode.SPRITES_ALPHA,
                     brightness=50.0).astype(np.int64)
    additive = r.render(pos, cam, mode=DisplayMode.SPRITES_COLOR,
                        brightness=50.0).astype(np.int64)
    cy, cx = 32, 32
    # alpha: near red wins at the center; fp32 tint keeps R > B anyway, so
    # compare the blue CHANNEL between modes — occlusion must suppress it
    assert alpha[cy, cx, 0] > 0, "red body visible"
    assert alpha[cy, cx, 2] < additive[cy, cx, 2], (
        "far blue body must be occluded in alpha mode, additive in color mode")


def test_sprites_alpha_finite_and_chunked():
    cam = Camera(origin=(0.0, 0.0, -30.0))
    pos = _cluster(300)
    a = FrameRenderer(width=64, height=64, chunk=100000, depth_buckets=8)
    b = FrameRenderer(width=64, height=64, chunk=64, depth_buckets=8)
    fa = a.render(pos, cam, mode=DisplayMode.SPRITES_ALPHA)
    fb = b.render(pos, cam, mode=DisplayMode.SPRITES_ALPHA)
    assert fa.sum() > 0
    np.testing.assert_array_equal(fa, fb)


def test_conv_raster_matches_scatter_within_tolerance():
    """The deposit+convolution rasterizer (method='conv' — N-point
    deposits + dense Hermite-kernel convs instead of the N*K^2 fragment
    scatter) must visually match the exact path: mean lit-pixel delta
    at the ~1/255 scale, everywhere bounded by the CIC/size-lerp
    approximation."""
    from nbody_tpu import NBodyConfig, ic

    pos, _ = ic.generate(NBodyConfig.SHELL, 2048, 1.68, 2.98, seed=7)
    cam = Camera(origin=(0.0, 0.0, -50.0))
    r_sc = FrameRenderer(width=320, height=180, splat=8, method="scatter")
    r_cv = FrameRenderer(width=320, height=180, splat=8, method="conv")
    for mode in (DisplayMode.SPRITES_COLOR, DisplayMode.SPRITES):
        a = r_sc.render(pos, cam, mode=mode).astype(np.float32)
        b = r_cv.render(pos, cam, mode=mode).astype(np.float32)
        lit = a.max(axis=-1) > 8
        assert lit.sum() > 500  # scene actually rendered
        diff = np.abs(a - b)
        assert diff[lit].mean() < 3.0, mode
        assert np.percentile(diff[lit], 99) < 25.0, mode


def test_conv_raster_modes_and_validation():
    import pytest

    from nbody_tpu import NBodyConfig, ic

    with pytest.raises(ValueError, match="method"):
        FrameRenderer(width=64, height=48, method="nope")
    pos, _ = ic.generate(NBodyConfig.SHELL, 256, 1.5, 2.0, seed=1)
    cam = Camera(origin=(0.0, 0.0, -30.0))
    r = FrameRenderer(width=64, height=48, splat=8, method="conv")
    # alpha/points have no conv form: the renderer falls back to the
    # exact path rather than erroring
    for mode in (DisplayMode.POINTS, DisplayMode.SPRITES_ALPHA):
        f = r.render(pos, cam, mode=mode)
        assert f.shape == (48, 64, 3) and f.dtype == np.uint8


def test_conv_raster_centered_body_near_exact():
    """A single body parked on a pixel center with its size exactly on a
    ladder rung makes the CIC and size-lerp corrections vanish — conv
    and scatter frames then agree to tonemap rounding."""
    import jax.numpy as jnp

    from nbody_tpu.render.rasterizer import _raster, _raster_conv

    w, h, k = 64, 48, 8
    proj = perspective(60.0, w / h, 0.1, 1000.0)
    mv = np.eye(4, dtype=np.float32)
    # place the body so it projects to a half-integer pixel coordinate
    # (a pixel center — screen x = w/2 + 0.5) at z where
    # clamp(500*s/(1-z)) == k, a rung size
    z = 1.0 - 500.0 / k  # size == k exactly (top rung)
    ndc_x = 2.0 * ((w / 2 + 0.5) / w) - 1.0
    ndc_y = 1.0 - 2.0 * ((h / 2 + 0.5) / h)
    pos = np.zeros((1, 4), np.float32)
    pos[0, 0] = ndc_x * (-z) / proj[0, 0]
    pos[0, 1] = ndc_y * (-z) / proj[1, 1]
    pos[0, 2] = z
    pos[0, 3] = 1.0
    args = (jnp.asarray(pos), jnp.asarray(mv), jnp.asarray(proj),
            jnp.float32(1.0), jnp.asarray((1.0, 0.6, 0.3), jnp.float32),
            jnp.float32(0.3))
    a = np.asarray(_raster(*args, width=w, height=h, splat=k,
                           mode="sprites", chunk=65536)).astype(np.float32)
    b = np.asarray(_raster_conv(*args, width=w, height=h, splat=k,
                                mode="sprites")).astype(np.float32)
    assert a.max() > 0
    assert np.abs(a - b).max() <= 2.0


def test_conv_raster_splat1_falls_back_to_scatter():
    """splat=1 has no geometric size ladder (log(1) rung spacing); the
    renderer must serve the exact scatter path instead of feeding NaN
    rung indices into the deposit (review finding r4)."""
    from nbody_tpu import NBodyConfig, ic

    pos, _ = ic.generate(NBodyConfig.SHELL, 256, 1.5, 2.0, seed=1)
    cam = Camera(origin=(0.0, 0.0, -30.0))
    a = FrameRenderer(width=64, height=48, splat=1, method="conv")
    b = FrameRenderer(width=64, height=48, splat=1, method="scatter")
    fa = a.render(pos, cam)
    fb = b.render(pos, cam)
    assert fa.sum() > 0  # scene drawn, not a NaN-blanked frame
    np.testing.assert_array_equal(fa, fb)
