"""UI layer tests: keyboard controls, param panel, HUD overlay."""

import numpy as np
import pytest

from nbody_tpu.compute import Compute
from nbody_tpu.render.rasterizer import DisplayMode
from nbody_tpu.ui import Controls, ParamPanel
from nbody_tpu.ui.hud import draw_hud, hud_lines, render_text_mask


def _compute(n=256):
    return Compute(num_bodies=n, backend="xla", cycle_demo=False, log=lambda *a: None)


# ---- controls ----

def test_space_pauses():
    c = _compute()
    ctl = Controls(c, log=lambda *a: None)
    assert ctl.handle(" ") is True
    assert c.paused is True
    ctl.handle(" ")
    assert c.paused is False


def test_q_and_escape_quit():
    c = _compute()
    ctl = Controls(c, log=lambda *a: None)
    assert ctl.handle("q") is False
    assert ctl.handle("\x1b") is False


def test_bracket_demo_navigation():
    c = _compute()
    ctl = Controls(c, log=lambda *a: None)
    ctl.handle("]")
    assert c.active_demo == 1
    ctl.handle("[")
    assert c.active_demo == 0


def test_digit_resets_config():
    from nbody_tpu.config import NBodyConfig

    c = _compute()
    ctl = Controls(c, log=lambda *a: None)
    p0 = c.system.positions.copy()
    ctl.handle("3")
    assert c.system.config == NBodyConfig.EXPAND
    assert not np.allclose(c.system.positions, p0)
    ctl.handle("4")
    assert c.system.config == NBodyConfig.PLUMMER


def test_p_cycles_display_mode():
    c = _compute()
    ctl = Controls(c, log=lambda *a: None)
    start = ctl.display_mode
    seen = {start}
    for _ in range(len(DisplayMode) - 1):
        ctl.handle("p")
        seen.add(ctl.display_mode)
    assert seen == set(DisplayMode)
    ctl.handle("p")
    assert ctl.display_mode == start


def test_o_prints_params():
    c = _compute()
    out = []
    ctl = Controls(c, log=out.append)
    ctl.handle("o")
    assert any("{" in s for s in out)


def test_g_and_backquote_and_d_toggles():
    c = _compute()
    ctl = Controls(c, log=lambda *a: None)
    ctl.handle("g")
    assert ctl.show_interactions
    ctl.handle("`")
    assert ctl.show_sliders
    ctl.handle("d")
    assert not ctl.display_enabled


def test_camera_keys():
    from nbody_tpu.render import Camera

    c = _compute()
    cam = Camera(origin=(0, 0, -50))
    ctl = Controls(c, cam, log=lambda *a: None)
    z0 = cam.translation[2]
    ctl.handle("w")
    assert cam.translation[2] != z0
    ctl.handle("a")
    assert cam.rotation[1] != 0


def test_camera_translate_keys():
    """SHIFT+H/J/K/L translate the camera (the reference's shift/middle-drag,
    controls.cpp:38-55 — Camera.translate must be reachable from the loop)."""
    from nbody_tpu.render import Camera

    c = _compute()
    cam = Camera(origin=(0, 0, -50))
    ctl = Controls(c, cam, log=lambda *a: None)
    x0, y0 = cam.translation[0], cam.translation[1]
    ctl.handle("L")
    assert cam.translation[0] > x0
    ctl.handle("H")
    ctl.handle("H")
    assert cam.translation[0] < x0
    ctl.handle("K")
    assert cam.translation[1] > y0
    ctl.handle("J")
    ctl.handle("J")
    assert cam.translation[1] < y0


# ---- param panel ----

def test_param_clamping_and_percentage():
    from nbody_tpu.ui import AdjustableParam

    p = AdjustableParam("x", 0.5, 0.0, 1.0, 0.1)
    p.value = 5.0
    assert p.value == 1.0
    p.percentage = 0.25
    assert abs(p.value - 0.25) < 1e-9
    p.decrement()
    assert abs(p.value - 0.15) < 1e-9


def test_panel_write_through():
    c = _compute()
    panel = ParamPanel.for_compute(c)
    panel.set("softening_factor", 0.5)
    assert c.active_params.softening == 0.5
    assert c.system.params.softening == 0.5


def test_panel_unknown_param_raises():
    c = _compute()
    panel = ParamPanel.for_compute(c)
    with pytest.raises(KeyError):
        panel.set("warp_factor", 9.0)


def test_panel_keyboard_adjust():
    c = _compute()
    panel = ParamPanel.for_compute(c)
    panel.select_next()  # -> softening_factor
    before = panel.params["softening_factor"].value
    panel.adjust_selected(+1)
    assert c.active_params.softening == pytest.approx(before + 0.0001)


def test_panel_render_text():
    c = _compute()
    panel = ParamPanel.for_compute(c)
    text = panel.render_text()
    assert "velocity_damping" in text and "[" in text


# ---- HUD ----

def test_render_text_mask_shapes():
    mask = render_text_mask("123", scale=1)
    assert mask.shape == (5, 12)
    assert mask.any()


def test_draw_hud_stamps_pixels():
    c = _compute()
    c.fps, c.g_flops = 30.0, 123.4
    frame = np.zeros((64, 256, 3), np.uint8)
    draw_hud(frame, hud_lines(c, "cpu:test"))
    assert (frame == 255).any()


def test_hud_interactions_mode():
    c = _compute()
    c.interactions_per_second = 1.5
    lines = hud_lines(c, "dev", show_interactions=True)
    assert any("interactions" in l for l in lines)


def test_terminal_viewer_halfblocks_and_session():
    """frame_to_ansi: one cell = two vertical pixels ('▀', fg=top,
    bg=bottom, 24-bit); TerminalViewer enters the alternate screen once,
    repaints with cursor-home (no clear), and restores on close."""
    import io

    import numpy as np

    from nbody_tpu.ui.terminal_view import TerminalViewer, frame_to_ansi

    frame = np.zeros((4, 3, 3), np.uint8)
    frame[0, 0] = (255, 0, 0)   # top pixel of cell (0,0) -> fg red
    frame[1, 0] = (0, 0, 255)   # bottom pixel -> bg blue
    s = frame_to_ansi(frame)
    assert s.count("▀") == 6    # 2 cell rows x 3 cols
    assert "\x1b[38;2;255;0;0m" in s and "\x1b[48;2;0;0;255m" in s
    # repeated colors elide: the all-black remainder re-emits few codes
    assert s.count("\x1b[38;2;0;0;0m") <= 3

    out = io.StringIO()
    v = TerminalViewer(stream=out)
    v.show(frame, status="stat")
    v.show(frame)
    v.close()
    text = out.getvalue()
    assert text.count("\x1b[?1049h") == 1       # one session enter
    assert text.count("\x1b[H") == 2            # home per repaint
    assert "stat" in text
    # every repaint erases below the status so stray writes / shrinking
    # statuses can't accumulate in the alternate screen
    assert text.count("\x1b[0J") == 2
    assert text.endswith("\x1b[?1049l\x1b[?25h")  # restored
    v.close()  # idempotent

    # multi-line statuses (the interactive param panel under --live)
    # paint as discrete erased lines
    out = io.StringIO()
    v = TerminalViewer(stream=out)
    v.show(frame, status="line one\nline two")
    v.close()
    text = out.getvalue()
    assert "line one\x1b[K" in text and "line two\x1b[K" in text


def test_cli_live_demo(capsys):
    """--live: the reference's real-time window as a terminal session —
    runs the full demo loop, draws half-block frames, restores the
    terminal, and routes the report into the status line."""
    from nbody_tpu.cli import main

    rc = main(["--numbodies", "128", "--frames", "2", "--kernel", "xla",
               "--no-cycle", "--live"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "▀" in out
    assert "\x1b[?1049h" in out and "\x1b[?1049l" in out


def test_cli_live_interactive_logs_route_to_status(capsys, monkeypatch):
    """--live --interactive: key-handler logs (here 'o' = print params)
    must land in the viewer's status area — NOT as raw prints that
    accumulate below the repainted frame (review finding r4)."""
    import io

    import jax

    from nbody_tpu.cli import main

    # 'o' logs the live params on frame 1; 'q' quits on frame 2
    monkeypatch.setattr("sys.stdin", io.StringIO("oq"))
    try:
        rc = main(["--numbodies", "128", "--frames", "5", "--kernel", "xla",
                   "--no-cycle", "--live", "--interactive"])
    finally:
        jax.config.update("jax_enable_x64", False)
    assert rc == 0
    out = capsys.readouterr().out
    # the params dump (source-pasteable brace format, the 'o' key) reached
    # the alternate screen as an erased status line
    assert "{ 0.016" in out
    i = out.rindex("{ 0.016")
    assert "\x1b[K" in out[i:i + 120]
