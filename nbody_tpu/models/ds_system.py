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
        tile_i: Optional[int] = None,
        tile_j: Optional[int] = None,
        integrator: str = "euler",
        variant: str = "auto",
        interpret: Optional[bool] = None,
        config: NBodyConfig = NBodyConfig.SHELL,
        seed: int = 42,
        state: Optional[tuple] = None,
        mesh=None,
        strategy: str = "auto",
    ):
        ndev = 1
        is2d = False
        if mesh is not None:
            ndev = int(np.prod(list(mesh.shape.values())))
            if len(mesh.axis_names) not in (1, 2):
                raise ValueError(
                    "DSBodySystem shards over a 1-D body mesh "
                    "(make_sharded_ds_step) or a 2-D rows×cols mesh "
                    f"(make_sharded_ds_step_2d); got {mesh.axis_names}")
            is2d = len(mesh.axis_names) == 2
        if is2d and strategy != "auto":
            raise ValueError(
                "the ds 2-D decomposition is its own communication "
                "pattern (two-axis gathers + a ds reduce-scatter over "
                "cols); leave strategy at 'auto' — allgather/ring are "
                "1-D body-mesh strategies")
        if mesh is not None and strategy not in ("auto", "allgather",
                                                 "ring"):
            # without a mesh, strategy is irrelevant and silently
            # coerced below — the BodySystem convention (fp32
            # single-device ignores --strategy too)
            raise ValueError(
                "DSBodySystem strategy must be 'auto', 'allgather', or "
                f"'ring' (got {strategy!r}); ring_fused/sym are fp32 "
                "mesh paths")
        # round N up so body shards divide evenly (BodySystem semantics)
        self.num_bodies = -(-int(num_bodies) // ndev) * ndev
        self.mesh = mesh
        # mesh strategy: 'auto' applies the shared ICI cost model
        # (choose_strategy — ring once shards amortize the per-hop launch;
        # ds moves 2x [euler] to 4x [hermite] the fp32 bytes, so the ring's
        # O(N/D) live j-bytes matter MORE here, making the shared threshold
        # conservative for ds, never wrong)
        if mesh is not None and strategy == "auto":
            if is2d:
                strategy = "2d"
            else:
                from nbody_tpu.parallel import choose_strategy

                strategy = choose_strategy(self.num_bodies, ndev)
        self.strategy = strategy if mesh is not None else "allgather"
        self.params = params
        # None = "pick for me" (compile-time default, autotuner may
        # override); an explicit tile_i always wins, even when it equals
        # the default — the BodySystem sentinel convention
        self.tile_i = DS_TILE_I if tile_i is None else int(tile_i)
        self.backend = "pallas"  # the Compute facade's backend probe
        if integrator not in ("euler", "leapfrog", "hermite"):
            raise ValueError(
                "DSBodySystem supports integrator='euler' (reference "
                "parity), 'leapfrog' (symplectic DKD, fused in-kernel), "
                "or 'hermite' (4th-order P(EC), two ds accel+jerk "
                f"dispatches per step); got {integrator!r}")
        self.integrator = integrator
        # variant: 'sym' = Newton's-third-law ds kernels (each pair once,
        # 1.36-1.47x the one-sided euler ds rate — ops/ds_kernel.py) for
        # euler AND hermite at ANY N (blockwise compositions above
        # DS_SYM_MAX_N / DS_AJ_SYM_MAX_N); 'auto' picks it where it
        # applies (leapfrog's fused DKD kernel has no sym form)
        if variant not in ("auto", "sym", "one_sided"):
            raise ValueError(f"unknown ds variant {variant!r}")
        sym_ok = integrator in ("euler", "hermite") and mesh is None
        if variant == "sym" and not sym_ok:
            raise ValueError(
                "variant='sym' applies to the euler/hermite ds steps on "
                "a single device (the sharded ds step is one-sided)")
        # the autotuner's ds-family winner (nbody-tune --family ds/
        # ds_leapfrog/ds_hermite) resolves 'auto' and the default tiles
        # by measurement on this chip; compile-time defaults otherwise
        winner = None
        if variant == "auto" or tile_j is None:
            if mesh is None and _on_tpu():
                from nbody_tpu.tune import best_config

                fam = {"euler": "ds", "leapfrog": "ds_leapfrog",
                       "hermite": "ds_hermite"}[integrator]
                winner = best_config(self.num_bodies, family=fam)
        if variant == "auto":
            if winner is not None:
                variant = ("sym" if winner.get("variant") == "sym"
                           and sym_ok else "one_sided")
            else:
                variant = "sym" if sym_ok else "one_sided"
        self.variant = variant
        if winner is not None and winner.get("variant", variant) != variant:
            winner = None  # tiles were measured on the other kernel
        if winner is not None:
            if tile_j is None:
                tile_j = winner["tile_j"]
            if tile_i is None:
                self.tile_i = winner["tile_i"]
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
        if p64.shape[0] != self.num_bodies:
            # N was rounded up to a shard multiple: pad with inert
            # zero-mass bodies (BodySystem._place semantics)
            if p64.shape[0] > self.num_bodies:
                raise ValueError(
                    f"state must be (N, 4) AoS with N={self.num_bodies}")
            padn = self.num_bodies - p64.shape[0]
            p64 = np.concatenate([p64, np.zeros((padn, 4), np.float64)])
            v64 = np.concatenate([v64, np.zeros((padn, 4), np.float64)])
        self._ph, self._pl = ds_from_f64(p64)
        self._vh, self._vl = ds_from_f64(v64)
        self._place_planes()

    def _place_planes(self) -> None:
        """Shard the four hi/lo planes over the body mesh (1-D axis or
        the joint 2-D rows×cols chunking, matching the sharded step's
        in_specs)."""
        if self.mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        names = tuple(self.mesh.axis_names)
        ax = names[0] if len(names) == 1 else names
        sh = NamedSharding(self.mesh, P(ax, None))
        self._ph, self._pl, self._vh, self._vl = (
            jax.device_put(a, sh)
            for a in (self._ph, self._pl, self._vh, self._vl))

    def get_ds_state(self):
        """The raw (pos_hi, pos_lo, vel_hi, vel_lo) float32 planes as host
        arrays — the BIT-exact checkpoint payload (a ds pair can carry
        information below f64 resolution when the hi/lo exponent gap
        exceeds 29 bits, so the f64 view alone does not round-trip)."""
        return tuple(np.asarray(a)
                     for a in (self._ph, self._pl, self._vh, self._vl))

    def set_ds_state(self, pos_hi, pos_lo, vel_hi, vel_lo) -> None:
        """Restore raw hi/lo planes (get_ds_state's inverse)."""
        planes = [np.asarray(a, np.float32)
                  for a in (pos_hi, pos_lo, vel_hi, vel_lo)]
        if planes[0].shape != (self.num_bodies, 4):
            raise ValueError(
                f"ds planes must be (N, 4) with N={self.num_bodies}")
        self._ph, self._pl, self._vh, self._vl = planes
        self._place_planes()

    @property
    def state(self):
        """(pos4, vel4) float32 device views — the hi planes, which carry
        the full f32-visible state (renderer input; zero host round-trip,
        matching BodySystem.state's contract)."""
        import jax.numpy as jnp

        return jnp.asarray(self._ph), jnp.asarray(self._vh)

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
        recompilation, mirroring BodySystem.update_params. (The adaptive
        cache keys on softening/damping, so a slider write-through costs
        one recompile there, never wrong physics.)"""
        self.params = params

    # ---- stepping ----

    def _scal(self, dt):
        p = self.params
        if self.integrator == "leapfrog":
            return _scal_ds_leapfrog(dt, p.softening, p.damping)
        if self.integrator == "hermite":
            return _scal_ds_hermite(dt, p.softening, p.damping)
        return _scal_ds(dt, p.softening, p.damping)

    def _sharded_step_fn(self):
        """Lazily-built body-sharded ds step (one-sided kernels; the hi/lo
        planes either gather over ICI or rotate the ring per
        self.strategy — parallel.sharded.make_sharded_ds_step — or, on a
        2-D rows×cols mesh, gather along both axes with a ds
        reduce-scatter over cols: make_sharded_ds_step_2d)."""
        if getattr(self, "_sharded_step", None) is None:
            if len(self.mesh.axis_names) == 2:
                from nbody_tpu.parallel import make_sharded_ds_step_2d

                self._sharded_step = make_sharded_ds_step_2d(
                    self.mesh, axes=tuple(self.mesh.axis_names),
                    tile_i=self.tile_i, tile_j=self.tile_j,
                    interpret=self.interpret, integrator=self.integrator)
            else:
                from nbody_tpu.parallel import make_sharded_ds_step

                self._sharded_step = make_sharded_ds_step(
                    self.mesh, tile_i=self.tile_i, tile_j=self.tile_j,
                    interpret=self.interpret, integrator=self.integrator,
                    strategy=self.strategy)
        return self._sharded_step

    def _step_fn(self):
        import functools

        if self.mesh is not None:
            return self._sharded_step_fn()
        kw = dict(tile_i=self.tile_i, tile_j=self.tile_j,
                  interpret=self.interpret)
        if self.variant == "sym":
            from nbody_tpu.ops import ds_kernel as dsk

            # delegates to the single triangles under the caps (module
            # attrs: tests shrink them to force blocking)
            if self.integrator == "euler":
                return functools.partial(nbody_step_pallas_ds_sym_blocked,
                                         block_cap=dsk.DS_SYM_MAX_N, **kw)
            return functools.partial(nbody_step_pallas_ds_hermite, sym=True,
                                     block_cap=dsk.DS_AJ_SYM_MAX_N, **kw)
        return functools.partial(
            {"euler": nbody_step_pallas_ds,
             "leapfrog": nbody_step_pallas_ds_leapfrog,
             "hermite": nbody_step_pallas_ds_hermite}[self.integrator], **kw)

    def update(self, dt: Optional[float] = None) -> None:
        dt = self.params.time_step if dt is None else dt
        self._ph, self._pl, self._vh, self._vl = self._step_fn()(
            self._ph, self._pl, self._vh, self._vl, self._scal(dt))

    def _segment_steps(self) -> int:
        """Work-bounded per-dispatch step count (BodySystem semantics):
        hermite runs TWO force evaluations per step, so its budget is
        half the single-eval integrators'."""
        n2 = float(self.num_bodies) ** 2
        work = 2.0e11 if self.integrator == "hermite" else 4.0e11
        return (max(1, min(1000, int(work / max(n2, 1.0))))
                if _on_tpu() else 1000)

    def _sharded_rollout_fn(self, steps: int):
        """Cached k-step scan over the sharded ds step (one dispatch)."""
        import functools

        cache = getattr(self, "_sharded_rollouts", None)
        if cache is None:
            cache = self._sharded_rollouts = {}
        run = cache.get(steps)
        if run is None:
            step = self._sharded_step_fn()

            @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def run(ph, pl, vh, vl, scal):
                def body(state, _):
                    return step(*state, scal), None

                state, _ = jax.lax.scan(body, (ph, pl, vh, vl), None,
                                        length=steps)
                return state

            cache[steps] = run
        return run

    def update_many(self, steps: int, dt: Optional[float] = None) -> None:
        """Compiled scan rollouts, work-bounded per dispatch like
        BodySystem.update_many (~4e11 pair-interactions per segment)."""
        dt = self.params.time_step if dt is None else dt
        if steps <= 1:
            for _ in range(steps):
                self.update(dt)
            return
        scal = self._scal(dt)
        seg_max = self._segment_steps()
        done = 0
        while done < steps:
            seg = min(steps - done, seg_max)
            if self.mesh is not None:
                self._ph, self._pl, self._vh, self._vl = (
                    self._sharded_rollout_fn(seg)(
                        self._ph, self._pl, self._vh, self._vl, scal))
                done += seg
                continue
            from nbody_tpu.ops import ds_kernel as dsk

            self._ph, self._pl, self._vh, self._vl = rollout_pallas_ds(
                self._ph, self._pl, self._vh, self._vl, scal, steps=seg,
                tile_i=self.tile_i, tile_j=self.tile_j,
                interpret=self.interpret,
                integrator=self.integrator,
                sym=self.variant == "sym",
                block_cap=(dsk.DS_AJ_SYM_MAX_N
                           if self.integrator == "hermite"
                           else dsk.DS_SYM_MAX_N))
            done += seg

    def update_many_adaptive(self, steps: int, *, eta: float = 0.025,
                             dt_min: Optional[float] = None,
                             dt_max: Optional[float] = None) -> dict:
        """Adaptive global timestep in ds: dt picked inside the compiled
        scan from an f32 criterion on the hi planes (it only picks dt;
        the step itself stays full ds — ops/ds_kernel.py
        make_ds_adaptive_rollout). Same criterion family, [dt_min,
        dt_max] defaults, stats dict, and segmenting as
        BodySystem.update_many_adaptive. Mesh-capable: on a 1-D body
        mesh the rollout shards like the fixed-dt ds step (allgather
        hi/lo planes) with ONE scalar pmax/pmin collective per step for
        the global dt (parallel.sharded.make_sharded_ds_adaptive_rollout).
        The 1-D adaptive decomposition is allgather regardless of
        self.strategy — the criterion kernel needs the full gathered
        hi planes anyway, so a ring would move the same bytes twice.
        On a 2-D rows×cols mesh the rollout composes the ds 2-D step's
        gathers + ds reduce-scatter with an f32 criterion psum'd over
        cols (make_sharded_ds_adaptive_rollout_2d; dt matches
        single-device to f32 rounding, the step stays full ds)."""
        from nbody_tpu.ops import ds_kernel as dsk

        p = self.params
        if dt_max is None:
            dt_max = p.time_step
        if dt_min is None:
            dt_min = dt_max / 1024.0
        if not (0.0 < dt_min <= dt_max):
            raise ValueError(f"need 0 < dt_min <= dt_max, got "
                             f"[{dt_min}, {dt_max}]")
        if not eta > 0.0:   # also rejects NaN
            raise ValueError(f"need eta > 0, got {eta}")
        cache = getattr(self, "_adaptive_rollouts", None)
        if cache is None:
            cache = self._adaptive_rollouts = {}
        seg_max = self._segment_steps()
        stats = {"t": 0.0, "dt_last": float(dt_max),
                 "dt_lo": float("inf"), "dt_hi": 0.0, "steps": int(steps)}
        done = 0
        while done < steps:
            seg = min(steps - done, seg_max)
            key = (seg, eta, dt_min, dt_max, p.softening, p.damping)
            run = cache.get(key)
            if run is None:
                if self.mesh is not None and len(self.mesh.axis_names) == 2:
                    from nbody_tpu.parallel import (
                        make_sharded_ds_adaptive_rollout_2d,
                    )

                    run = make_sharded_ds_adaptive_rollout_2d(
                        self.mesh, axes=tuple(self.mesh.axis_names),
                        integrator=self.integrator,
                        softening=p.softening, damping=p.damping,
                        eta=eta, dt_min=dt_min, dt_max=dt_max,
                        steps=seg, tile_i=self.tile_i,
                        tile_j=self.tile_j, interpret=self.interpret)
                elif self.mesh is not None:
                    from nbody_tpu.parallel import (
                        make_sharded_ds_adaptive_rollout,
                    )

                    run = make_sharded_ds_adaptive_rollout(
                        self.mesh, integrator=self.integrator,
                        softening=p.softening, damping=p.damping,
                        eta=eta, dt_min=dt_min, dt_max=dt_max,
                        steps=seg, tile_i=self.tile_i,
                        tile_j=self.tile_j, interpret=self.interpret)
                else:
                    run = dsk.make_ds_adaptive_rollout(
                        integrator=self.integrator, softening=p.softening,
                        damping=p.damping, eta=eta, dt_min=dt_min,
                        dt_max=dt_max, steps=seg, tile_i=self.tile_i,
                        tile_j=self.tile_j, interpret=self.interpret,
                        sym=self.variant == "sym",
                        block_cap=(dsk.DS_AJ_SYM_MAX_N
                                   if self.integrator == "hermite"
                                   else dsk.DS_SYM_MAX_N))
                cache[key] = run
            self._ph, self._pl, self._vh, self._vl, st = run(
                self._ph, self._pl, self._vh, self._vl)
            st = np.asarray(st)
            stats["t"] += float(st[0])
            stats["dt_last"] = float(st[1])
            stats["dt_lo"] = min(stats["dt_lo"], float(st[2]))
            stats["dt_hi"] = max(stats["dt_hi"], float(st[3]))
            done += seg
        return stats

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
