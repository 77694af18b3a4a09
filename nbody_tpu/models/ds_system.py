"""DSBodySystem: the double-single (fp64-grade) simulation surface.

BodySystem's API shape (get/set state, update/update_many, reset,
total_energy, hard_sync) over the two-float32 kernel (ops/ds_kernel.py):
state lives on device as four float32 arrays (pos/vel hi+lo), the public
accessors speak float64, and stepping runs the fused ds Pallas kernel —
measured fp64-grade (|Δpos| 1.2e-14 vs the f64 oracle, drift parity to
8e-16) at 48× the XLA-emulated-f64 path's throughput (PARITY.md).

Use it where the reference's fp64 mode is used (accuracy anchoring,
drift studies) but the emulated-f64 cost is prohibitive. It needs no
jax_enable_x64: only the host-side split/recombine touches float64.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from nbody_tpu.config import NBodyConfig
from nbody_tpu.params import NBodyParams
from nbody_tpu import ic
from nbody_tpu.ops.ds_kernel import (
    DS_AJ_SYM_MAX_N,
    DS_AJ_SYM_TILE_J,
    DS_HERMITE_TILE_J,
    DS_SYM_MAX_N,
    DS_SYM_TILE_J,
    DS_TILE_I,
    DS_TILE_J,
    _scal_ds,
    _scal_ds_hermite,
    _scal_ds_leapfrog,
    ds_from_f64,
    ds_to_f64,
    nbody_step_pallas_ds,
    nbody_step_pallas_ds_hermite,
    nbody_step_pallas_ds_sym_blocked,
    nbody_step_pallas_ds_leapfrog,
    rollout_pallas_ds,
)
from nbody_tpu.utils.timing import hard_sync as _hard_sync, on_tpu as _on_tpu


class DSBodySystem:
    """Owns ds (hi/lo float32-pair) state and advances it with the fused
    double-single kernel. Public state in/out is float64."""

    def __init__(
        self,
        num_bodies: int,
        params: NBodyParams,
        *,
        tile_i: int = DS_TILE_I,
        tile_j: Optional[int] = None,
        integrator: str = "euler",
        variant: str = "auto",
        interpret: Optional[bool] = None,
        config: NBodyConfig = NBodyConfig.SHELL,
        seed: int = 42,
        state: Optional[tuple] = None,
    ):
        self.num_bodies = int(num_bodies)
        self.params = params
        self.tile_i = tile_i
        if integrator not in ("euler", "leapfrog", "hermite"):
            raise ValueError(
                "DSBodySystem supports integrator='euler' (reference "
                "parity), 'leapfrog' (symplectic DKD, fused in-kernel), "
                "or 'hermite' (4th-order P(EC), two ds accel+jerk "
                f"dispatches per step); got {integrator!r}")
        self.integrator = integrator
        # variant: 'sym' = Newton's-third-law ds kernels (each pair once,
        # 1.36-1.47x the one-sided euler ds rate — ops/ds_kernel.py) for
        # euler at ANY N (blockwise composition above DS_SYM_MAX_N) and
        # hermite at N <= DS_AJ_SYM_MAX_N; 'auto' picks it where it applies
        if variant not in ("auto", "sym", "one_sided"):
            raise ValueError(f"unknown ds variant {variant!r}")
        # euler sym runs at ANY N (the blockwise composition keeps the
        # per-block ds reaction scratch in VMEM above DS_SYM_MAX_N);
        # hermite's ds accel+jerk has no blocked form, so it keeps a cap
        sym_cap = {"euler": None,
                   "hermite": DS_AJ_SYM_MAX_N}.get(integrator, False)
        if variant == "sym":
            if sym_cap is False:
                raise ValueError(
                    "variant='sym' applies to the euler/hermite ds steps")
            if sym_cap is not None and self.num_bodies > sym_cap:
                raise ValueError(
                    f"variant='sym' caps at N={sym_cap} for "
                    f"integrator={integrator!r} (VMEM ds reaction "
                    f"scratch); got {self.num_bodies}")
        if variant == "auto":
            variant = ("sym" if (sym_cap is not False
                                 and (sym_cap is None
                                      or self.num_bodies <= sym_cap))
                       else "one_sided")
        self.variant = variant
        # the accel+jerk kernel's larger live set caps its j-tile below
        # the force-only kernels' (scoped-vmem limit); the sym kernels'
        # dual (masked+unmasked) chunk loops cap it further
        if tile_j is not None:
            self.tile_j = tile_j
        elif integrator == "hermite":
            self.tile_j = (DS_AJ_SYM_TILE_J if variant == "sym"
                           else DS_HERMITE_TILE_J)
        else:
            self.tile_j = (DS_SYM_TILE_J if variant == "sym"
                           else DS_TILE_J)
        self.interpret = (not _on_tpu()) if interpret is None else bool(interpret)
        self.seed = seed
        self.config = config
        if state is not None:
            self.set_state(*state)
        else:
            self.reset(params, config)

    # ---- state ----

    def set_state(self, pos, vel) -> None:
        p64 = np.asarray(pos, np.float64)
        v64 = np.asarray(vel, np.float64)
        if p64.shape != (self.num_bodies, 4) or v64.shape != (self.num_bodies, 4):
            raise ValueError(
                f"state must be (N, 4) AoS with N={self.num_bodies}")
        self._ph, self._pl = ds_from_f64(p64)
        self._vh, self._vl = ds_from_f64(v64)

    @property
    def positions(self) -> np.ndarray:
        """(N, 4) float64 [x,y,z,m]."""
        return ds_to_f64(self._ph, self._pl)

    @property
    def velocities(self) -> np.ndarray:
        return ds_to_f64(self._vh, self._vl)

    def reset(self, params: NBodyParams, config: NBodyConfig,
              *, seed: Optional[int] = None) -> None:
        self.params = params
        self.config = config
        if seed is not None:
            self.seed = seed
        pos, vel = ic.generate(config, self.num_bodies, params.cluster_scale,
                               params.velocity_scale, seed=self.seed,
                               dtype=np.float64)
        self.set_state(pos, vel)

    def update_params(self, params: NBodyParams) -> None:
        """Softening/damping/dt land via the SMEM scalar block — no
        recompilation, mirroring BodySystem.update_params."""
        self.params = params

    # ---- stepping ----

    def _scal(self, dt):
        p = self.params
        if self.integrator == "leapfrog":
            return _scal_ds_leapfrog(dt, p.softening, p.damping)
        if self.integrator == "hermite":
            return _scal_ds_hermite(dt, p.softening, p.damping)
        return _scal_ds(dt, p.softening, p.damping)

    def _step_fn(self):
        import functools

        if self.variant == "sym":
            if self.integrator == "euler":
                from nbody_tpu.ops import ds_kernel as dsk

                # delegates to the single triangle under DS_SYM_MAX_N
                # (module attr: tests shrink it to force blocking)
                return functools.partial(nbody_step_pallas_ds_sym_blocked,
                                         block_cap=dsk.DS_SYM_MAX_N)
            return functools.partial(nbody_step_pallas_ds_hermite, sym=True)
        return {"euler": nbody_step_pallas_ds,
                "leapfrog": nbody_step_pallas_ds_leapfrog,
                "hermite": nbody_step_pallas_ds_hermite}[self.integrator]

    def update(self, dt: Optional[float] = None) -> None:
        dt = self.params.time_step if dt is None else dt
        self._ph, self._pl, self._vh, self._vl = self._step_fn()(
            self._ph, self._pl, self._vh, self._vl, self._scal(dt),
            tile_i=self.tile_i, tile_j=self.tile_j, interpret=self.interpret)

    def update_many(self, steps: int, dt: Optional[float] = None) -> None:
        """Compiled scan rollouts, work-bounded per dispatch like
        BodySystem.update_many (~4e11 pair-interactions per segment)."""
        dt = self.params.time_step if dt is None else dt
        if steps <= 1:
            for _ in range(steps):
                self.update(dt)
            return
        scal = self._scal(dt)
        n2 = float(self.num_bodies) ** 2
        # hermite runs TWO force evaluations per step, so its per-dispatch
        # pair-interaction budget is half the single-eval integrators'
        work = 2.0e11 if self.integrator == "hermite" else 4.0e11
        seg_max = (max(1, min(1000, int(work / max(n2, 1.0))))
                   if _on_tpu() else 1000)
        done = 0
        while done < steps:
            seg = min(steps - done, seg_max)
            from nbody_tpu.ops import ds_kernel as dsk

            self._ph, self._pl, self._vh, self._vl = rollout_pallas_ds(
                self._ph, self._pl, self._vh, self._vl, scal, steps=seg,
                tile_i=self.tile_i, tile_j=self.tile_j,
                interpret=self.interpret,
                integrator=self.integrator,
                sym=self.variant == "sym",
                block_cap=dsk.DS_SYM_MAX_N)
            done += seg

    # ---- diagnostics ----

    def total_energy(self, *, precise: bool = True) -> float:
        """ds states are precision anchors, so the f64 functional is the
        default here (BodySystem defaults to the fast f32 path)."""
        from nbody_tpu.ops.energy import total_energy, total_energy_f64

        if precise:
            return total_energy_f64(self.positions, self.velocities,
                                    self.params.softening)
        import jax.numpy as jnp

        return float(total_energy(
            jnp.asarray(self.positions, jnp.float32),
            jnp.asarray(self.velocities, jnp.float32),
            self.params.softening))

    def block_until_ready(self) -> None:
        jax.block_until_ready((self._ph, self._pl, self._vh, self._vl))

    def hard_sync(self) -> None:
        _hard_sync((self._ph, self._pl, self._vh, self._vl))
