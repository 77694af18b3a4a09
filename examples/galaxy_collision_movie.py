"""Render a two-galaxy collision as a PNG frame sequence.

Usage: python examples/galaxy_collision_movie.py [outdir]

Equivalent CLI one-liner:
    nbody --config galaxy --numbodies 16384 --frames 120 --render \
          --camera 0,0,-12 --sprite-size 0.25 --brightness 0.12 \
          --set time_step=0.004 --steps-per-frame 4 --outdir frames
"""

import sys

from nbody_tpu.cli import main

outdir = sys.argv[1] if len(sys.argv) > 1 else "galaxy_frames"
raise SystemExit(main([
    "--config", "galaxy",
    "--numbodies", "16384",
    "--frames", "120",
    "--steps-per-frame", "4",
    "--no-cycle",
    "--render",
    "--outdir", outdir,
    "--width", "960", "--height", "720",
    "--camera", "0,0,-12",
    "--sprite-size", "0.25",
    "--brightness", "0.12",
    "--set", "time_step=0.004",
]))
