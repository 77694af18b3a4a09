"""Tipsy + checkpoint + PNG I/O tests."""

import numpy as np
import pytest

from nbody_tpu.io import (
    load_checkpoint,
    read_tipsy_file,
    save_checkpoint,
    write_tipsy_file,
)
from nbody_tpu.io.png import write_png
from nbody_tpu.params import NBodyParams
from nbody_tpu.config import NBodyConfig


def test_tipsy_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 300
    pos = rng.normal(size=(n, 4)).astype(np.float64)
    vel = rng.normal(size=(n, 4)).astype(np.float64)
    path = tmp_path / "galaxy.tipsy"
    write_tipsy_file(path, pos, vel)
    rpos, rvel = read_tipsy_file(path)
    # padded to multiple of 256
    assert rpos.shape == (512, 4)
    np.testing.assert_allclose(rpos[:n], pos.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(rvel[:n], vel.astype(np.float32), rtol=1e-6)
    # padding is zero-mass
    np.testing.assert_array_equal(rpos[n:], 0.0)


def test_tipsy_dark_and_star_records(tmp_path):
    rng = np.random.default_rng(1)
    n = 256
    pos = rng.normal(size=(n, 4)).astype(np.float64)
    vel = rng.normal(size=(n, 4)).astype(np.float64)
    path = tmp_path / "mixed.tipsy"
    write_tipsy_file(path, pos, vel, n_dark=100)
    rpos, rvel = read_tipsy_file(path)
    np.testing.assert_allclose(rpos[:n], pos.astype(np.float32), rtol=1e-6)


def test_tipsy_native_matches_numpy(tmp_path):
    """The C++ loader and the NumPy loader must agree byte-for-byte."""
    from nbody_tpu.oracle import native_available

    if not native_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    n = 300
    pos = rng.normal(size=(n, 4)).astype(np.float64)
    vel = rng.normal(size=(n, 4)).astype(np.float64)
    path = tmp_path / "x.tipsy"
    write_tipsy_file(path, pos, vel, n_dark=120)
    p_nat, v_nat = read_tipsy_file(path, native=True)
    p_np, v_np = read_tipsy_file(path, native=False)
    np.testing.assert_array_equal(p_nat, p_np)
    np.testing.assert_array_equal(v_nat, v_np)


def test_tipsy_native_missing_file():
    from nbody_tpu.oracle import native_available

    if not native_available():
        pytest.skip("native library not built")
    with pytest.raises((ValueError, FileNotFoundError)):
        read_tipsy_file("/nonexistent/file.tipsy", native=True)


def test_tipsy_corrupt_header(tmp_path):
    path = tmp_path / "bad.tipsy"
    path.write_bytes(b"\x00" * 32)
    pos, vel = read_tipsy_file(path)  # nbodies=0 -> empty padded state
    assert pos.shape[0] == 0 or pos.shape[0] % 256 == 0

    path.write_bytes(b"\xff" * 32)
    with pytest.raises(ValueError):
        read_tipsy_file(path)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(64, 4)).astype(np.float32)
    vel = rng.normal(size=(64, 4)).astype(np.float32)
    params = NBodyParams(time_step=0.002, softening=0.7)
    path = tmp_path / "ck.npz"
    save_checkpoint(path, pos, vel, params, step=17, config=NBodyConfig.EXPAND)
    rpos, rvel, rparams, meta = load_checkpoint(path)
    np.testing.assert_array_equal(rpos, pos)
    np.testing.assert_array_equal(rvel, vel)
    assert rparams == params
    assert meta["step"] == 17
    assert meta["config"] == "expand"


@pytest.mark.slow
def test_checkpoint_orbax_roundtrip(tmp_path):
    from nbody_tpu.io import save_checkpoint_orbax

    rng = np.random.default_rng(5)
    pos = rng.normal(size=(32, 4)).astype(np.float32)
    vel = rng.normal(size=(32, 4)).astype(np.float32)
    params = NBodyParams(time_step=0.004, damping=0.99)
    path = tmp_path / "ck_orbax"
    save_checkpoint_orbax(path, pos, vel, params, step=3,
                          config=NBodyConfig.SHELL)
    # the generic loader dispatches on directory-ness
    rpos, rvel, rparams, meta = load_checkpoint(path)
    np.testing.assert_array_equal(rpos, pos)
    np.testing.assert_array_equal(rvel, vel)
    assert rparams == params
    assert meta["step"] == 3 and meta["config"] == "shell"


def test_png_writer(tmp_path):
    frame = np.zeros((8, 16, 3), np.uint8)
    frame[2, 3] = (255, 128, 0)
    path = tmp_path / "img.png"
    write_png(frame, path)
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and b"IEND" in data

    with pytest.raises(ValueError):
        write_png(np.zeros((8, 16), np.uint8), tmp_path / "bad.png")


# ---- AVI writer (ROADMAP "MP4 export" closure: uncompressed RIFF) ----


def test_avi_round_trip(tmp_path):
    import numpy as np
    import pytest

    from nbody_tpu.io.avi import read_avi, write_avi

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
              for _ in range(5)]
    path = tmp_path / "clip.avi"
    write_avi(frames, path, fps=24)
    back, fps = read_avi(path)
    assert fps == 24 and len(back) == 5
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a, b)
    # container magic old players check
    data = path.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert b"idx1" in data
    with pytest.raises(ValueError, match="no frames"):
        write_avi([], tmp_path / "empty.avi")


def test_avi_odd_width_row_padding(tmp_path):
    import numpy as np

    from nbody_tpu.io.avi import read_avi, write_avi

    # width 5 -> 15-byte rows pad to a 16-byte stride; the round trip
    # must strip the padding exactly
    frame = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3)
    path = tmp_path / "odd.avi"
    write_avi([frame, frame + 1], path)
    back, _ = read_avi(path)
    np.testing.assert_array_equal(back[0], frame)
    np.testing.assert_array_equal(back[1], frame + 1)


def test_avi_rejects_over_4gib(tmp_path):
    import numpy as np
    import pytest

    from nbody_tpu.io.avi import write_avi

    # broadcast views: 100 x (4096, 4096, 3) frames (~5 GiB of video)
    # without allocating them — the size guard must fire before writing
    frame = np.broadcast_to(np.zeros((1, 1, 3), np.uint8), (4096, 4096, 3))
    with pytest.raises(ValueError, match="AVI 1.0"):
        write_avi([frame] * 100, tmp_path / "big.avi")


def test_avi_rejects_non_rgb_frames(tmp_path):
    import numpy as np
    import pytest

    from nbody_tpu.io.avi import write_avi

    rgba = np.zeros((8, 8, 4), np.uint8)
    with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
        write_avi([rgba, rgba], tmp_path / "rgba.avi")
    gray = np.zeros((8, 8), np.uint8)
    with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
        write_avi([gray], tmp_path / "gray.avi")
