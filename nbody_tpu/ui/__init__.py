"""Interactive UI equivalents: keyboard controls, adjustable-parameter panel,
HUD overlay — the reference's GLUT/OpenGL UI layer (SURVEY.md §2 L4)
re-imagined for a headless TPU host."""

from nbody_tpu.ui.controls import Controls
from nbody_tpu.ui.params_panel import AdjustableParam, ParamPanel
from nbody_tpu.ui.hud import draw_hud

__all__ = ["Controls", "AdjustableParam", "ParamPanel", "draw_hud"]
