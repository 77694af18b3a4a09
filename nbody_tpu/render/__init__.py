"""On-device rendering: camera, point-splat rasterizer, PNG export.

Replaces the reference's OpenGL/GLUT pipeline (SURVEY.md §2 L4) with a
TPU-native design: points are projected and splatted additively into an RGB
framebuffer *on the device* (jnp scatter-add), and only the finished uint8
frame crosses to the host for PNG export.
"""

from nbody_tpu.render.camera import Camera
from nbody_tpu.render.rasterizer import FrameRenderer, DisplayMode

__all__ = ["Camera", "FrameRenderer", "DisplayMode"]
