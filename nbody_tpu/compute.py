"""Compute facade: demo cycling, benchmark, QA compare, perf stats.

The engine-level controller, mirroring the reference's ``Compute``
(/root/reference/src/nbody/compute.hpp:17-127): owns a BodySystem, the 7-demo
preset state machine with 10 s auto-cycling, the N-bucketed scale tuning, the
benchmark driver (1 untimed warm-up step + timed loop + the exact result
formulas/format of compute.cpp:105-121), and the device-vs-CPU-oracle QA
compare (compute_cuda.cpp:294-333: one dt=0.001 step, |dpos| <= 5e-4).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from nbody_tpu.config import NBodyConfig
from nbody_tpu.models import BodySystem
from nbody_tpu.oracle import step_best, native_available
from nbody_tpu.params import (
    DEMO_PARAMS,
    DEMO_TIME_S,
    flops_per_interaction,
    gflops,
    interactions_per_second,
    tuned_scales,
)

QA_TOLERANCE = 5e-4
QA_DT = 0.001

def default_num_bodies(ndev: int = 1) -> int:
    """Device-derived default N — the TPU-native analogue of the reference's
    default ``4 * blockSize * SM-count``
    (/root/reference/src/nbody/compute_cuda.cpp:113).

    Per TensorCore: 256 i-tiles of DEFAULT_TILE_I (=64) bodies = 16384, the
    point where a v5e core is decisively compute-bound (step time ~ms vs
    ~µs dispatch; PARITY.md), scaled by core and device count so bigger
    meshes default to proportionally more work. On CPU, the reference's CPU
    default of 4096 (/root/reference/src/nbody/compute_cpu.cpp:31).
    """
    import jax

    from nbody_tpu.ops.pallas_kernel import DEFAULT_TILE_I

    if jax.default_backend() == "cpu":
        return 4096
    try:
        cores = int(getattr(jax.devices()[0], "num_cores", 1) or 1)
    except Exception:
        cores = 1
    tiles_per_core = 16384 // DEFAULT_TILE_I
    return tiles_per_core * DEFAULT_TILE_I * cores * max(int(ndev), 1)


class Compute:
    def __init__(
        self,
        *,
        num_bodies: Optional[int] = None,
        fp64: bool = False,
        precision: Optional[str] = None,
        cycle_demo: bool = True,
        backend: str = "auto",
        tile_i: Optional[int] = None,
        tile_j: Optional[int] = None,
        placement: str = "device",
        mesh=None,
        strategy: str = "auto",
        variant: str = "vpu",
        integrator: str = "euler",
        interpret: Optional[bool] = None,
        chunk_size: Optional[int] = None,
        pm_grid: int = 64,
        pm_assignment: str = "cic",
        pm_fft: str = "replicated",
        p3m_capacity: Optional[int] = None,
        p3m_short_range: str = "auto",
        p3m_auto_refresh: bool = False,
        seed: int = 42,
        tipsy_state: Optional[tuple] = None,
        log=print,
    ):
        import jax.numpy as jnp

        self.log = log
        self.paused = False
        # precision: "fp32" | "fp64" (BodySystem dtype) | "ds" (the
        # double-single DSBodySystem — fp64-grade state behind the same
        # facade: demo cycling, rendering hi-planes, checkpoints via the
        # exact f64 round trip, adaptive rollouts). `fp64` stays as the
        # boolean the reference-shaped call sites use.
        if precision is None:
            precision = "fp64" if fp64 else "fp32"
        if precision not in ("fp32", "fp64", "ds"):
            raise ValueError(f"unknown precision {precision!r}")
        if precision == "fp64":
            fp64 = True
        elif fp64:
            raise ValueError("fp64=True contradicts precision="
                             f"{precision!r}")
        self.precision = precision
        self.fp64_enabled = fp64
        self.cycle_demo = cycle_demo
        self.active_demo = 0
        self.active_params = DEMO_PARAMS[0]
        self.interactions_per_second = 0.0
        self.g_flops = 0.0
        self.fps = 0.0
        self._tipsy_state = tipsy_state
        self.adaptive = None        # {"eta", "dt_min", "dt_max"} when on
        self.adaptive_stats = None  # accumulated {"t", "dt_last", ...}
        self.block = None           # {"eta", "dt_max", "n_classes"} when on
        self.block_stats = None     # accumulated {"t", "rows", ...}
        # simulation steps taken through update_simulation (checkpoint
        # metadata); a resumed run seeds this with the loaded step counter
        self.steps_taken = 0

        if tipsy_state is not None:
            num_bodies = tipsy_state[0].shape[0]
        elif num_bodies is None:
            ndev = 1
            if mesh is not None:
                ndev = int(np.prod(list(mesh.shape.values())))
            num_bodies = default_num_bodies(ndev)

        scales = tuned_scales(num_bodies)
        if scales is not None:
            self.active_params = self.active_params.replace(
                cluster_scale=scales[0], velocity_scale=scales[1]
            )

        if precision == "ds":
            if backend not in ("auto", "pallas"):
                raise ValueError(
                    "precision='ds' runs the double-single pallas "
                    f"kernels; backend must be 'auto'/'pallas' (got "
                    f"{backend!r})")
            if placement != "device":
                raise ValueError("precision='ds' keeps state on device")
            if variant not in ("auto", "vpu", "sym", "one_sided"):
                raise ValueError(
                    f"precision='ds' variants are 'auto'/'sym'/"
                    f"'one_sided' (got {variant!r})")
            from nbody_tpu.models import DSBodySystem

            kw = {}
            if tile_i is not None:
                kw["tile_i"] = tile_i
            self.system = DSBodySystem(
                num_bodies,
                self.active_params,
                tile_j=tile_j,
                integrator=integrator,
                variant=variant if variant in ("sym", "one_sided")
                else "auto",
                interpret=interpret,
                seed=seed,
                state=tipsy_state,
                mesh=mesh,
                strategy=strategy,
                **kw,
            )
            self.num_bodies = self.system.num_bodies
            self._demo_reset_time = time.monotonic()
            return

        dtype = jnp.float64 if fp64 else jnp.float32
        self.system = BodySystem(
            num_bodies,
            self.active_params,
            dtype=dtype,
            backend=backend if not fp64 else "xla",
            tile_i=tile_i,
            tile_j=tile_j,
            placement=placement,
            mesh=mesh,
            strategy=strategy,
            variant=variant,
            integrator=integrator,
            interpret=interpret,
            chunk_size=chunk_size,
            pm_grid=pm_grid,
            pm_assignment=pm_assignment,
            pm_fft=pm_fft,
            p3m_capacity=p3m_capacity,
            p3m_short_range=p3m_short_range,
            p3m_auto_refresh=p3m_auto_refresh,
            seed=seed,
            state=tipsy_state,
        )
        self.num_bodies = self.system.num_bodies
        self._demo_reset_time = time.monotonic()

    # ---- demo state machine ----

    def _select_demo(self, camera=None) -> None:
        self.active_params = DEMO_PARAMS[self.active_demo]
        if camera is not None:
            camera.reset(self.active_params.camera_origin)
        self.reset(NBodyConfig.SHELL)
        self._demo_reset_time = time.monotonic()

    def next_demo(self, camera=None) -> None:
        self.active_demo = (self.active_demo + 1) % len(DEMO_PARAMS)
        self._select_demo(camera)

    def previous_demo(self, camera=None) -> None:
        self.active_demo = (self.active_demo - 1) % len(DEMO_PARAMS)
        self._select_demo(camera)

    def toggle_cycle_demo(self) -> None:
        self.cycle_demo = not self.cycle_demo
        self._demo_reset_time = time.monotonic()

    def pause(self) -> None:
        self.paused = not self.paused

    def update_simulation(self, camera=None, steps: int = 1) -> None:
        """Advance one frame of `steps` simulation steps: auto-cycle demos
        every DEMO_TIME_S, then step (fixed dt, or the adaptive criterion
        when set_adaptive is on). Multi-step frames go out as ONE rollout
        dispatch — for adaptive stepping that also amortizes the rollout's
        initial force evaluation over the whole frame (splitting a frame
        into 1-step calls would double the per-step force work)."""
        if self.cycle_demo and time.monotonic() - self._demo_reset_time > DEMO_TIME_S:
            self.next_demo(camera)
        if not self.paused:
            if self.block is not None:
                self.step_block(steps)
            elif self.adaptive is not None:
                self.step_adaptive(steps)
            elif steps == 1:
                self.system.update(self.active_params.time_step)
            else:
                self.system.update_many(steps, self.active_params.time_step)
            self.steps_taken += steps

    def set_adaptive(self, eta: float, dt_min: Optional[float] = None,
                     dt_max: Optional[float] = None) -> None:
        """Switch frame stepping to the adaptive global timestep
        (BodySystem.update_many_adaptive). dt_min/dt_max None = the
        per-call defaults, which track the ACTIVE demo preset's
        time_step across demo cycles."""
        self.adaptive = {"eta": eta, "dt_min": dt_min, "dt_max": dt_max}
        self.adaptive_stats = None

    def set_block(self, eta: float, dt_max: Optional[float] = None,
                  n_classes: int = 4) -> None:
        """Switch frame stepping to PER-BODY block timesteps
        (BodySystem.update_many_block): each frame's `steps` become
        macro steps of dt_max (None = the active preset's time_step,
        tracking demo cycles), so a frame spans the same simulated time
        as the fixed-dt demo while tight bodies sub-cycle on the
        power-of-two ladder."""
        self.block = {"eta": eta, "dt_max": dt_max, "n_classes": n_classes}
        self.block_stats = None
        self._block_rows_reported = 0.0

    def step_block(self, steps: int) -> None:
        """Advance `steps` block macro steps; accumulate the eval-row
        accounting (rows vs the global-dt bill) for reporting."""
        st = self.system.update_many_block(steps, **self.block)
        acc = self.block_stats
        if acc is None:
            self.block_stats = st
        else:
            acc["t"] += st["t"]
            acc["rows"] += st["rows"]
            acc["global_rows"] += st["global_rows"]
            acc["k_max"] = max(acc["k_max"], st["k_max"])
            acc["macro_steps"] += st["macro_steps"]

    def step_adaptive(self, steps: int) -> None:
        """Advance `steps` adaptive steps and fold the rollout stats into
        the running adaptive_stats (simulated time sums; dt extrema
        merge)."""
        st = self.system.update_many_adaptive(steps, **self.adaptive)
        acc = self.adaptive_stats
        if acc is None:
            self.adaptive_stats = st
        else:
            acc["t"] += st["t"]
            acc["steps"] += st["steps"]
            acc["dt_last"] = st["dt_last"]
            acc["dt_lo"] = min(acc["dt_lo"], st["dt_lo"])
            acc["dt_hi"] = max(acc["dt_hi"], st["dt_hi"])

    def reset(self, config: NBodyConfig, seed: Optional[int] = None) -> None:
        if self._tipsy_state is not None:
            self.system.set_state(*self._tipsy_state)
            self.system.update_params(self.active_params)
        else:
            self.system.reset(self.active_params, config, seed=seed)

    def update_params(self, **kw) -> None:
        """Live param mutation (sliders equivalent): softening/damping/
        time_step/cluster_scale/velocity_scale."""
        self.active_params = self.active_params.replace(**kw)
        self.system.update_params(self.active_params)

    def switch_precision(self) -> None:
        if self.precision == "ds":
            # the reference Enter key toggles fp32<->fp64; ds IS the
            # fp64-grade mode and its hi/lo state has no cheaper-precision
            # twin to hop to — report instead of silently no-opping
            self.log("precision fixed: double-single (fp64-grade) mode")
            return
        self.system = self.system.switch_precision()
        self.fp64_enabled = not self.fp64_enabled
        self.precision = "fp64" if self.fp64_enabled else "fp32"

    # ---- perf ----

    def compute_perf_stats(self, steps_per_second: float) -> None:
        self.interactions_per_second = interactions_per_second(
            self.num_bodies, steps_per_second
        )
        # ds reports at the fp64 convention (30 flops/interaction): the
        # result is fp64-grade, and the raw ALU multiple (~20x) would
        # inflate the figure meaninglessly (same convention as the
        # reference's fp64 mode, compute.cpp:118-121)
        self.g_flops = gflops(self.num_bodies, steps_per_second,
                              self.fp64_enabled or self.precision == "ds")

    def calculate_fps(self, frame_count: int, milliseconds: float,
                      *, steps_per_frame: int = 1) -> None:
        self.fps = frame_count * 1000.0 / max(milliseconds, 1e-9)
        if self.block_stats is not None:
            # block mode: the N^2-per-step formula would report the
            # EQUIVALENT fixed-dt work; charge the rows the ladder
            # actually computed instead (each i-row is N interactions)
            rows = self.block_stats["rows"]
            d_rows = rows - self._block_rows_reported
            self._block_rows_reported = rows
            secs = max(milliseconds / 1000.0, 1e-9)
            self.interactions_per_second = (
                d_rows * float(self.num_bodies) * 1e-9 / secs)
            self.g_flops = (self.interactions_per_second
                            * flops_per_interaction(self.fp64_enabled))
            return
        # perf formulas are per simulation STEP, not per frame
        self.compute_perf_stats(self.fps * steps_per_frame)

    def run_benchmark(self, nb_iterations: int) -> dict:
        """Delta-timed rollouts: time `nb_iterations` and `5*nb_iterations`
        steps (each one hard-synced scan dispatch after an untimed warm-up)
        and report the marginal per-step rate. The subtraction cancels the
        FIXED per-dispatch cost of the remote attachment (~55-60 ms here,
        microseconds on a local host — r3 overhead study), so the number
        is what the reference's CUDA-event timing would see locally
        (/root/reference/src/nbody/compute_cuda.cpp:183-195)."""
        dt = self.active_params.time_step
        times = {}
        for k in (nb_iterations, 5 * nb_iterations):
            # warm-up with the same rollout length so compilation (keyed on
            # scan length) happens entirely outside the timed region
            self.system.update_many(k, dt)
            self.system.hard_sync()
            t0 = time.perf_counter()
            self.system.update_many(k, dt)
            self.system.hard_sync()
            times[k] = (time.perf_counter() - t0) * 1e3
        # marginal time of 4*nb_iterations steps, normalized to the
        # requested iteration count for the reference-format printout
        # (floored: clock noise on sub-ms host runs can invert the delta)
        milliseconds = max(
            (times[5 * nb_iterations] - times[nb_iterations]) / 4.0, 1e-6)
        self.compute_perf_stats(nb_iterations * (1000.0 / milliseconds))
        self._print_benchmark_results(nb_iterations, milliseconds)
        return {
            "num_bodies": self.num_bodies,
            "iterations": nb_iterations,
            "milliseconds": milliseconds,
            "interactions_per_second_e9": self.interactions_per_second,
            "gflops": self.g_flops,
            "fp64": self.fp64_enabled,
        }

    def _print_benchmark_results(self, nb_iterations: int, milliseconds: float) -> None:
        # same shape as the reference's output (compute.cpp:105-112)
        self.log(
            f"{self.num_bodies} bodies, total time for {nb_iterations} "
            f"iterations: {milliseconds:.3f} ms"
        )
        self.log(f"= {self.interactions_per_second:.3f} billion interactions per second")
        precision = {"fp64": "double", "ds": "double-single",
                     "fp32": "single"}[self.precision]
        fpi = flops_per_interaction(self.fp64_enabled
                                    or self.precision == "ds")
        self.log(
            f"= {self.g_flops:.3f} {precision}-precision GFLOP/s at "
            f"{fpi} flops per interaction"
            + (" (fp64-convention)" if self.precision == "ds" else "")
        )
        if self.system.backend in ("pm", "p3m"):
            # the reference formula assumes O(N^2) work; for the mesh
            # solvers it is the pairwise-EQUIVALENT rate (what an all-pairs
            # kernel would need to match this wall clock), not ALU flops
            self.log(
                f"  (pairwise-equivalent rate: the {self.system.backend} "
                f"solver does O(N) work per step)"
            )

    def drift_check(self, steps: int) -> dict:
        """Energy-drift comparison: run `steps` at the active dt on the
        device AND on the CPU oracle from identical state; report both
        relative drifts and their difference (BASELINE config[2] criterion:
        device drift matches the CPU reference's drift)."""
        # fp64 energy functional regardless of state dtype: fp32 summation
        # noise at N >= 65k is the same order as the drifts reported, so an
        # fp32 functional would measure its own rounding, not the physics
        # (VERDICT r2 item 4; scripts/tpu_drift_table.py uses the same
        # functional for the published drift table)
        from nbody_tpu.ops.energy import total_energy_precise

        p = self.active_params
        pos0 = self.system.positions
        vel0 = self.system.velocities
        soft = p.softening
        e0 = total_energy_precise(pos0, vel0, soft)

        self.system.update_many(steps, p.time_step)
        self.system.hard_sync()
        e_dev = total_energy_precise(
            self.system.positions, self.system.velocities, soft,
        )

        op, ov = pos0, vel0
        for _ in range(steps):
            op, ov = step_best(op, ov, p.time_step, soft, p.damping,
                               integrator=self.system.integrator)
        e_ora = total_energy_precise(op, ov, soft)

        drift_dev = (e_dev - e0) / abs(e0) if e0 else 0.0
        drift_ora = (e_ora - e0) / abs(e0) if e0 else 0.0
        oracle = "native C++" if native_available() else "NumPy"
        self.log(
            f"energy drift over {steps} steps (dt={p.time_step}): "
            f"device {drift_dev:.3e} | {oracle} oracle {drift_ora:.3e} | "
            f"delta {abs(drift_dev - drift_ora):.3e}"
        )
        self.system.set_state(pos0, vel0)
        return {
            "steps": steps,
            "drift_device": drift_dev,
            "drift_oracle": drift_ora,
            "delta": abs(drift_dev - drift_ora),
        }

    # ---- QA compare (the reference's --compare/--qatest) ----

    def compare_results(self, tolerance: float = QA_TOLERANCE) -> bool:
        """One dt=QA_DT step on device and on the CPU oracle from identical
        state; pass iff every position coordinate differs <= tolerance."""
        pos0 = self.system.positions
        vel0 = self.system.velocities
        p = self.active_params

        self.system.update(QA_DT)
        self.system.block_until_ready()
        dev_pos = self.system.positions

        ref_pos, _ = step_best(pos0, vel0, QA_DT, p.softening, p.damping,
                               integrator=self.system.integrator)
        err = np.abs(dev_pos[:, :3] - ref_pos[:, :3]).max()
        passed = bool(err <= tolerance)
        oracle = "native C++" if native_available() else "NumPy"
        self.log(
            f"QA compare vs {oracle} oracle: max |dpos| = {err:.3e} "
            f"(tolerance {tolerance:g}) -> {'OK' if passed else 'FAILED'}"
        )
        # restore pre-compare state so compare is side-effect free
        self.system.set_state(pos0, vel0)
        return passed
