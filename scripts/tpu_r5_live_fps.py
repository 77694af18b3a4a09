"""Measure the --live terminal session's on-chip cadence (VERDICT r4
item 6 / r5): per-frame component costs and end-to-end fps at the demo
Ns, plus a one-frame-latency pipelined variant that overlaps the host
ANSI build + terminal write with the NEXT frame's device dispatches.

The reference's live mode reports and regulates fps
(/root/reference/src/nbody/interface.cpp:62-87); the terminal analogue
should know its own cadence the same way.

Run alone (single-client tunnel): python scripts/tpu_r5_live_fps.py
"""

import io
import time

import jax
import numpy as np

from nbody_tpu.compute import Compute
from nbody_tpu.render import Camera, FrameRenderer
from nbody_tpu.ui.terminal_view import TerminalViewer, frame_to_ansi

COLS, ROWS = 100, 38          # the headless terminal_cell_size fallback
WARM, MEAS = 4, 30


def setup(n):
    compute = Compute(num_bodies=n, cycle_demo=False)
    cam = Camera(origin=compute.active_params.camera_origin)
    renderer = FrameRenderer(width=COLS, height=2 * ROWS, splat=8,
                             method="auto")
    return compute, cam, renderer


def run_shipped(compute, cam, renderer, view, frames):
    """The cli.py loop order: update -> render -> show (show's
    np.asarray is the sync point)."""
    for _ in range(frames):
        compute.update_simulation(cam, steps=1)
        small = renderer.render(compute.system.state[0], cam)
        view.show(small, "status")
    compute.system.hard_sync()


def run_pipelined(compute, cam, renderer, view, frames):
    """One-frame latency: dispatch frame k+1's physics+render BEFORE
    fetching/painting frame k, so the host-side ANSI build and terminal
    write overlap the device work."""
    pending = None
    for _ in range(frames):
        compute.update_simulation(cam, steps=1)
        small = renderer.render(compute.system.state[0], cam)
        if pending is not None:
            view.show(np.asarray(pending), "status")
        pending = small
    if pending is not None:
        view.show(np.asarray(pending), "status")
    compute.system.hard_sync()


def main():
    print("devices:", jax.devices())
    sink = io.StringIO()
    for n in (4096, 16384, 65536, 262144):
        compute, cam, renderer = setup(n)
        view = TerminalViewer(stream=sink)

        # component costs (each synced)
        compute.update_simulation(cam, steps=1)
        compute.system.hard_sync()
        t0 = time.perf_counter()
        for _ in range(10):
            compute.update_simulation(cam, steps=1)
        compute.system.hard_sync()
        t_phys = (time.perf_counter() - t0) / 10

        small = renderer.render(compute.system.state[0], cam)
        np.asarray(small)
        t0 = time.perf_counter()
        for _ in range(10):
            small = renderer.render(compute.system.state[0], cam)
            np.asarray(small)
        t_render = (time.perf_counter() - t0) / 10

        host = np.asarray(small)
        t0 = time.perf_counter()
        for _ in range(10):
            frame_to_ansi(host)
        t_ansi = (time.perf_counter() - t0) / 10

        results = {}
        for name, fn in (("shipped", run_shipped),
                         ("pipelined", run_pipelined)):
            fn(compute, cam, renderer, view, WARM)   # warm the compiles
            sink.truncate(0)
            t0 = time.perf_counter()
            fn(compute, cam, renderer, view, MEAS)
            dt = time.perf_counter() - t0
            results[name] = MEAS / dt
        print(f"N={n:7d}  phys={t_phys * 1e3:7.1f}ms  "
              f"render+fetch={t_render * 1e3:6.1f}ms  "
              f"ansi={t_ansi * 1e3:5.1f}ms  "
              f"fps shipped={results['shipped']:6.2f}  "
              f"pipelined={results['pipelined']:6.2f}  "
              f"({results['pipelined'] / results['shipped']:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
