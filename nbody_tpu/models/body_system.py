"""BodySystem: simulation state + stepping, the framework's core model class.

API parity with the reference's abstract BodySystem
(/root/reference/src/nbody/bodysystemcuda.hpp:38-58): get/set positions and
velocities, update(dt), reset(params, config), update_params — redesigned
functionally for JAX: state is an immutable pytree of jax.Arrays, a step
returns new arrays (with XLA buffer donation giving the zero-alloc behavior
of the reference's ping-pong buffers), and the class is a thin stateful shell
around that.

Memory-placement variants (the reference's three BodySystemCUDA subclasses,
SURVEY.md §2) map to:
  * placement="device" — state lives in HBM as jax.Arrays (the Default impl)
  * placement="host"   — state lives in host RAM, streamed to the device per
    step (the --hostmem zero-copy analogue; useful when N exceeds HBM)
  * the render path (Graphics impl) needs no special placement on TPU: the
    rasterizer consumes the same device arrays with zero copies
    (nbody_tpu.render).

Backends:
  * "pallas" — the fused TPU kernel (float32)
  * "xla"    — portable jnp path (any backend, fp64-capable)
  * "pm"     — particle-mesh far-field solver (O(N + G^3 log G),
               resolution-limited accuracy — see ops/pm.py)
  * "p3m"    — PM + exact short-range correction (sub-percent forces at
               mesh speed — see ops/p3m.py)
  * "auto"   — pallas on TPU for float32, else xla
A ``jax.sharding.Mesh`` switches stepping to the body-sharded multi-chip path
(all backends: pallas/xla strategies, sharded PM, sharded P3M).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import NBodyConfig
from nbody_tpu.params import NBodyParams
from nbody_tpu import ic
from nbody_tpu.ops.pallas_kernel import (
    DEFAULT_TILE_I,
    DEFAULT_TILE_J,
    nbody_step_pallas,
)
from nbody_tpu.ops.pallas_kernel import _round_up
from nbody_tpu.ops.reference import nbody_step_xla
from nbody_tpu.ops.energy import total_energy
from nbody_tpu.utils.timing import hard_sync as _hard_sync, on_tpu as _default_backend_is_tpu


# module-level jit wrapper so its compilation cache is shared across systems
_XLA_STEP_JIT = jax.jit(nbody_step_xla, static_argnames=("chunk_size",))


class BodySystem:
    """Owns (pos, vel) state and advances it with the selected kernel."""

    def __init__(
        self,
        num_bodies: int,
        params: NBodyParams,
        *,
        dtype=jnp.float32,
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
        config: NBodyConfig = NBodyConfig.SHELL,
        seed: int = 42,
        state: Optional[tuple] = None,
    ):
        if backend not in ("auto", "pallas", "xla", "pm", "p3m"):
            raise ValueError(f"unknown backend {backend!r}")
        if placement not in ("device", "host"):
            raise ValueError(f"unknown placement {placement!r}")
        dtype = jnp.dtype(dtype)
        # pre-resolution values, so a precision switch can re-resolve them
        self._requested_backend = backend
        self._requested_interpret = interpret
        if backend == "auto":
            backend = "pallas" if (_default_backend_is_tpu() and dtype == jnp.float32) else "xla"
        if backend == "pallas" and dtype != jnp.float32:
            raise ValueError("pallas backend is float32-only; use backend='xla' for fp64")
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            raise ValueError(
                "fp64 requested but x64 is disabled; set JAX_ENABLE_X64=1 or "
                "jax.config.update('jax_enable_x64', True) before creating arrays"
            )
        if interpret is None:
            interpret = (backend in ("pallas", "p3m")
                         and not _default_backend_is_tpu())

        self.params = params
        self.dtype = dtype
        self.backend = backend
        # None = "not specified": defaults apply and the tune cache may
        # override them; an explicit value always wins (reference --blockSize)
        explicit_tile_i = tile_i is not None
        explicit_tile_j = tile_j is not None
        # the hermite acc+jerk kernel has its own tuned defaults; only an
        # explicit user tile overrides them
        self._explicit_tiles = (explicit_tile_i, explicit_tile_j)
        # set when variant='auto' adopts the autotuner cache's tiles — the
        # sym paths must honor them like explicit values (they are the
        # measured winner), not fall back to the compile-time defaults
        self._tiles_from_cache = False
        self.tile_i = tile_i = DEFAULT_TILE_I if tile_i is None else tile_i
        self.tile_j = tile_j = DEFAULT_TILE_J if tile_j is None else tile_j
        self.placement = placement
        self.mesh = mesh
        self.strategy = strategy
        self.variant = variant
        self._requested_variant = variant  # pre-tune-cache-resolution
        if integrator not in ("euler", "leapfrog", "hermite"):
            raise ValueError(f"unknown integrator {integrator!r}")
        if integrator == "hermite" and backend in ("pm", "p3m"):
            raise ValueError(
                "integrator='hermite' needs the jerk of the exact pairwise "
                "force, which the mesh solvers do not provide; use euler "
                f"or leapfrog with backend={backend!r}"
            )
        self.integrator = integrator
        self.interpret = bool(interpret)
        self.chunk_size = chunk_size
        self.pm_grid = int(pm_grid)
        if pm_assignment not in ("cic", "tsc"):
            raise ValueError(f"unknown pm_assignment {pm_assignment!r}")
        self.pm_assignment = pm_assignment
        # "replicated" (per-chip FFT, right while (2G)^3 fits one chip) or
        # "slab" (distributed FFT over the mesh; needs ndev | 2*grid).
        # Single-device stepping ignores it.
        if pm_fft not in ("replicated", "slab"):
            raise ValueError(f"unknown pm_fft {pm_fft!r}")
        self.pm_fft = pm_fft
        # None = auto-size from the initial state's cell occupancy (+50%
        # headroom) at first placement; resolved before any step compiles
        self.p3m_capacity = None if p3m_capacity is None else int(p3m_capacity)
        # "auto" = block-sparse Pallas pair kernel on TPU (2.3x the XLA
        # short-range at N=1M; sharded steps run per-device chunk ranges
        # of the same worklist), XLA elsewhere
        if p3m_short_range not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown p3m_short_range {p3m_short_range!r}")
        if p3m_short_range == "auto":
            p3m_short_range = ("pallas" if _default_backend_is_tpu()
                               else "xla")
        self.p3m_short_range = p3m_short_range
        # True = a mid-run contract breach re-sizes capacity/pair budget
        # from the breach-step state and resumes automatically (recompiles);
        # False = warn with the breach step and keep going degraded
        self.p3m_auto_refresh = bool(p3m_auto_refresh)
        self._p3m_pair_budget: Optional[int] = None
        self.seed = seed
        self.config = config

        ndev = 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
        # round N up so body shards divide evenly (the reference rounds N to a
        # block-size multiple, /root/reference/src/nbody/compute_cuda.cpp:103-107)
        self.num_bodies = _round_up(int(num_bodies), ndev)

        if variant == "sym":
            # Newton's-third-law kernels: single-device pallas. ALL
            # integrators run at ANY N — above the per-kernel scratch cap
            # (SYM_MAX_N forces, AJ_SYM_MAX_N accel+jerk) the blockwise
            # composition keeps the per-block reaction scratch inside
            # VMEM (ops/symmetric_kernel.py)
            if backend != "pallas":
                raise ValueError("variant='sym' needs backend='pallas'")
            if mesh is not None:
                raise ValueError(
                    "variant='sym' is single-device (the reaction "
                    "accumulator is chip-local); for the each-pair-once "
                    "saving on a mesh use strategy='sym' instead")

        if variant == "auto":
            # use the autotuner's cached winner for this chip/N if
            # present — hermite systems consult the HERMITE family (the
            # accel+jerk kernels were measured, not the euler force;
            # nbody-tune --family hermite), others the euler family
            resolved = None
            if backend == "pallas" and _default_backend_is_tpu():
                from nbody_tpu.tune import best_config

                fam = "hermite" if integrator == "hermite" else "euler"
                resolved = best_config(self.num_bodies, family=fam)
                if resolved and resolved.get("variant") == "one_sided":
                    # the tune families name the one-sided aj kernel
                    # 'one_sided'; the system-level variant for it is vpu
                    resolved = dict(resolved, variant="vpu")
            if resolved and resolved["variant"] == "sym":
                if mesh is not None:
                    # the cached winner was tuned single-device; a mesh
                    # run can't use it — fall through to the no-cache
                    # resolution rather than crash downstream (every
                    # integrator's sym runs at any N via the blocked
                    # compositions)
                    resolved = None
            if resolved:
                variant = resolved["variant"]
                if explicit_tile_i or explicit_tile_j:
                    import warnings

                    warnings.warn(
                        f"explicit tile sizes (tile_i={tile_i}, tile_j={tile_j}) "
                        f"override the autotuner cache (tile_i={resolved['tile_i']}, "
                        f"tile_j={resolved['tile_j']})",
                        stacklevel=2,
                    )
                if not explicit_tile_i:
                    self.tile_i = tile_i = resolved["tile_i"]
                    self._tiles_from_cache = True
                if not explicit_tile_j:
                    self.tile_j = tile_j = resolved["tile_j"]
                    self._tiles_from_cache = True
            else:
                # no cache: the Newton's-third-law kernels where they
                # apply (exact fp32, 1.29-1.42x — PARITY.md), else vpu;
                # every integrator's sym covers any N (blocked
                # compositions above the per-kernel scratch caps)
                sym_ok = backend == "pallas" and mesh is None
                variant = "sym" if sym_ok else "vpu"
            self.variant = variant

        self._rollout_cache: dict = {}
        self._adaptive_cache: dict = {}
        self._sharded_step = None
        self._mesh_axes = (None if mesh is None
                           else tuple(mesh.axis_names))
        if mesh is not None and len(self._mesh_axes) == 2:
            # 2-D (rows x cols) force decomposition — the pod-scale
            # strategy (make_sharded_step_2d); exact kernels only
            if backend in ("pm", "p3m"):
                raise ValueError(
                    "the mesh solvers shard over a 1-D body mesh; use a "
                    "1-D mesh with backend='pm'/'p3m'"
                )
            from nbody_tpu.parallel import make_sharded_step_2d

            # judge the USER's request, not the tune cache's resolution
            # (variant='auto' may have resolved to mxu* from the cache)
            if self._requested_variant not in ("vpu", "auto"):
                raise ValueError(
                    "the 2-D decomposition uses the accel-only kernels "
                    "(no mxu variants); leave variant at 'vpu'/'auto'"
                )
            self._sharded_step = make_sharded_step_2d(
                mesh,
                axes=self._mesh_axes,
                kernel=backend,
                # None = not user-specified: the builder applies the tuned
                # per-kernel defaults (AJ_TILE_* for hermite)
                tile_i=tile_i if explicit_tile_i else None,
                tile_j=tile_j if explicit_tile_j else None,
                interpret=self.interpret,
                chunk_size=chunk_size,
                integrator=integrator,
            )
        elif mesh is not None:
            if backend == "pm":
                from nbody_tpu.ops.pm import make_sharded_pm_step

                self._sharded_step = make_sharded_pm_step(
                    mesh, grid=self.pm_grid, integrator=integrator,
                    assignment=pm_assignment, fft=pm_fft,
                )
            elif backend == "p3m":
                # built lazily in _step_fn: p3m_capacity=None auto-sizes
                # from the first state, which is placed below — the builder
                # needs the resolved capacity
                pass
            else:
                from nbody_tpu.parallel import make_sharded_step

                self._sharded_step = make_sharded_step(
                    mesh,
                    kernel=backend,
                    strategy=strategy,
                    tile_i=tile_i if explicit_tile_i else None,
                    tile_j=tile_j if explicit_tile_j else None,
                    interpret=self.interpret,
                    chunk_size=chunk_size,
                    variant=variant,
                    integrator=integrator,
                )

        if state is not None:
            pos, vel = state
            self.set_state(np.asarray(pos), np.asarray(vel))
        else:
            self.reset(params, config, seed=seed)

    # ---- state access (the reference's get/set_position/velocity) ----

    def _place(self, pos: np.ndarray, vel: np.ndarray):
        pos = np.asarray(pos, dtype=self.dtype)
        vel = np.asarray(vel, dtype=self.dtype)
        if pos.shape[0] != self.num_bodies:
            # zero-mass-pad up to the allocated N (tipsy-style)
            pad = self.num_bodies - pos.shape[0]
            if pad < 0:
                raise ValueError(f"state has {pos.shape[0]} bodies > allocated {self.num_bodies}")
            pos = np.pad(pos, ((0, pad), (0, 0)))
            vel = np.pad(vel, ((0, pad), (0, 0)))
        if self.placement == "host":
            self._pos, self._vel = pos, vel
        elif self.mesh is not None:
            from nbody_tpu.parallel import shard_state

            axis = (self._mesh_axes if len(self._mesh_axes) > 1
                    else self._mesh_axes[0])
            self._pos, self._vel = shard_state(self.mesh, pos, vel,
                                               axis=axis)
        else:
            self._pos = jnp.asarray(pos)
            self._vel = jnp.asarray(vel)
        if self.backend == "p3m":
            self._probe_p3m_capacity(pos)

    def _probe_p3m_capacity(self, pos) -> None:
        """Fail fast when the p3m cell capacity cannot hold the CURRENT
        state (overflowing cells silently drop short-range pairs). Steps
        assume the contract keeps holding as the system evolves; heavily
        collapsing runs should re-set_state periodically or raise capacity.
        Uses the occupancy-only counter (a bincount — no FFT, no pair
        math), and counts only massive bodies: zero-mass padding is inert.

        p3m_capacity=None auto-sizes from the first state: max cell
        occupancy + 50% headroom, rounded up to a multiple of 8."""
        from nbody_tpu.ops.p3m import p3m_max_occupancy, p3m_overflow_count

        pos32 = jnp.asarray(pos, jnp.float32)
        if self.p3m_capacity is None:
            occ = int(p3m_max_occupancy(pos32, grid=self.pm_grid))
            self.p3m_capacity = max(8, -(-int(occ * 1.5 + 1) // 8) * 8)
        overflow = int(p3m_overflow_count(pos32,
                                          grid=self.pm_grid,
                                          capacity=self.p3m_capacity))
        if overflow:
            raise ValueError(
                f"p3m cell capacity {self.p3m_capacity} overflows for "
                f"{overflow} bodies of this state; raise p3m_capacity "
                f"(--p3m-capacity) or the mesh resolution (--pm-grid)"
            )
        if self.p3m_short_range == "pallas":
            # same contract as capacity, for the Pallas pair worklist:
            # auto-size the budget from the first state (+50% headroom),
            # then fail fast if a later state outgrows it
            from nbody_tpu.ops.p3m import p3m_kernel_blk
            from nbody_tpu.ops.p3m_kernel import PAIR_CHUNK, p3m_pair_count

            blk = p3m_kernel_blk(self.p3m_capacity)
            pairs = int(p3m_pair_count(pos32, grid=self.pm_grid,
                                       capacity=self.p3m_capacity, blk=blk))
            if self._p3m_pair_budget is None:
                budget = -(-int(pairs * 1.5 + 1) // PAIR_CHUNK) * PAIR_CHUNK
                self._p3m_pair_budget = max(PAIR_CHUNK, budget)
            elif pairs > self._p3m_pair_budget:
                raise ValueError(
                    f"p3m pair budget {self._p3m_pair_budget} exceeded "
                    f"({pairs} pair tiles for this state); re-create the "
                    f"system (budget auto-sizes from the first state) or "
                    f"use p3m_short_range='xla'"
                )

    def set_state(self, pos, vel) -> None:
        self._place(np.asarray(pos), np.asarray(vel))

    def set_positions(self, pos) -> None:
        self._place(np.asarray(pos), self.velocities)

    def set_velocities(self, vel) -> None:
        self._place(self.positions, np.asarray(vel))

    @property
    def positions(self) -> np.ndarray:
        """(N, 4) [x,y,z,m] on the host."""
        return np.asarray(self._pos)

    @property
    def velocities(self) -> np.ndarray:
        return np.asarray(self._vel)

    @property
    def state(self):
        """The device-side (pos, vel) pytree (host arrays for placement='host')."""
        return self._pos, self._vel

    # ---- parameters ----

    def update_params(self, params: NBodyParams) -> None:
        """Live-update softening/damping/dt (the reference's slider write-through,
        /root/reference/src/nbody/compute.cpp:237-243). No recompilation:
        params are dynamic kernel inputs."""
        self.params = params

    def reset(self, params: NBodyParams, config: NBodyConfig, *, seed: Optional[int] = None) -> None:
        """Regenerate initial conditions (reference reset -> randomise_bodies,
        /root/reference/src/nbody/bodysystemcuda.cpp:60-64)."""
        self.params = params
        self.config = config
        if seed is not None:
            self.seed = seed
        np_dtype = np.float64 if self.dtype == jnp.float64 else np.float32
        pos, vel = ic.generate(
            config,
            self.num_bodies,
            params.cluster_scale,
            params.velocity_scale,
            seed=self.seed,
            dtype=np_dtype,
        )
        self._place(pos, vel)

    # ---- stepping ----

    def _sym_dispatch(self):
        """Measured default ``(block_cap, tile_j)`` for the sym force
        path at this N — including the half-cap blocked composition that
        beats the single triangle in the top of its range
        (ops/symmetric_kernel.py::sym_default_dispatch provenance).

        An explicit (or autotuner-cached) tile_j too wide for the half
        cap keeps the FULL triangle cap: the blocked path silently clamps
        its j-stream to <= cap/2, which would turn an explicitly
        requested tile into a different shape (advisor r4); the single
        triangle honors it as given."""
        from nbody_tpu.ops.symmetric_kernel import (
            SYM_MAX_N,
            sym_default_dispatch,
        )

        cap, d_tj = sym_default_dispatch(self.num_bodies)
        if (cap < SYM_MAX_N
                and (self._explicit_tiles[1] or self._tiles_from_cache)
                and self.tile_j * 2 > cap):
            return SYM_MAX_N, d_tj
        return cap, d_tj

    def _sym_tiles(self, default_ti: int, default_tj: int,
                   *, cache_ok: bool = True):
        """Tile resolution for the sym kernels: explicit user tiles always
        win; autotuner-cache tiles win when ``cache_ok`` (the cache is
        measured with the euler FORCE kernel, so the accel+jerk sym path
        passes cache_ok=False — its tuned default is not the euler
        winner); otherwise the kernel's own measured defaults."""
        ti_src = self._explicit_tiles[0] or (
            cache_ok and self._tiles_from_cache)
        tj_src = self._explicit_tiles[1] or (
            cache_ok and self._tiles_from_cache)
        return (self.tile_i if ti_src else default_ti,
                self.tile_j if tj_src else default_tj)

    def _step_fn(self):
        """(pos, vel, dt, softening, damping) -> (pos, vel), jit-compatible."""
        if (self.mesh is not None and self.backend == "p3m"
                and self._sharded_step is None):
            # deferred from __init__: by now state placement has resolved
            # p3m_capacity (auto-size probe runs at every _place)
            from nbody_tpu.ops.p3m import make_sharded_p3m_step

            self._sharded_step = make_sharded_p3m_step(
                self.mesh, grid=self.pm_grid, capacity=self.p3m_capacity,
                integrator=self.integrator, assignment=self.pm_assignment,
                fft=self.pm_fft, short_range=self.p3m_short_range,
                pair_budget=self._p3m_pair_budget,
                interpret=self.interpret,
            )
        if self._sharded_step is not None:
            return self._sharded_step
        if self.integrator == "hermite":
            # 4th-order predictor-corrector; the pallas backend plugs the
            # fused acc+jerk kernel into the force evaluations, other
            # backends run the chunked XLA pass
            from nbody_tpu.ops.reference import nbody_step_hermite

            aj = self._accel_jerk_closure()

            def step(pos, vel, dt, soft, damp):
                return nbody_step_hermite(
                    pos, vel, dt, soft, damp,
                    accel_jerk_fn=lambda p4, v4: aj(p4, v4, soft))

            return step
        if self.integrator == "leapfrog":
            return self._leapfrog_fn()
        if self.backend == "pm":
            from nbody_tpu.ops.pm import nbody_step_pm

            grid, assignment = self.pm_grid, self.pm_assignment

            def step(pos, vel, dt, soft, damp):
                return nbody_step_pm(pos, vel, dt, soft, damp, grid=grid,
                                     assignment=assignment)

            return step
        if self.backend == "p3m":
            from nbody_tpu.ops.p3m import nbody_step_p3m

            grid, cap = self.pm_grid, self.p3m_capacity
            assignment = self.pm_assignment
            sr, budget = self.p3m_short_range, self._p3m_pair_budget
            interp = self.interpret

            def step(pos, vel, dt, soft, damp):
                # overflow was probed against the initial state (_place);
                # steps assume the capacity contract keeps holding
                p, v, _ = nbody_step_p3m(pos, vel, dt, soft, damp,
                                         grid=grid, capacity=cap,
                                         assignment=assignment,
                                         short_range=sr, pair_budget=budget,
                                         interpret=interp)
                return p, v

            return step
        if self.backend == "pallas":
            tile_i, tile_j, interpret = self.tile_i, self.tile_j, self.interpret
            variant = self.variant
            if variant == "sym":
                from nbody_tpu.ops import symmetric_kernel as symk

                # the sym kernels have their own tuned defaults (single
                # triangle vs blocked composition differ); explicit user
                # tiles or the autotuner cache's measured winner override
                cap, d_tj = self._sym_dispatch()
                s_ti, s_tj = self._sym_tiles(symk.TI, d_tj)

                def step(pos, vel, dt, soft, damp):
                    # delegates to the single-triangle kernel bit-exactly
                    # when N <= block_cap
                    return symk.nbody_step_symmetric_blocked(
                        pos, vel, dt, soft, damp,
                        tile_i=s_ti, tile_j=s_tj, interpret=interpret,
                        block_cap=cap)

                return step

            def step(pos, vel, dt, soft, damp):
                return nbody_step_pallas(
                    pos, vel, dt, soft, damp,
                    tile_i=tile_i, tile_j=tile_j, interpret=interpret,
                    variant=variant,
                )

            return step
        chunk = self.chunk_size

        def step(pos, vel, dt, soft, damp):
            return _XLA_STEP_JIT(pos, vel, dt, soft, damp, chunk_size=chunk)

        return step

    def _accel_closure(self):
        """`accel(pos4, softening) -> (N,3)` for the current single-device
        backend — the force evaluation the leapfrog and adaptive paths
        plug into their integrators (softening stays an argument so
        update_params never recompiles)."""
        if self.backend == "pm":
            from nbody_tpu.ops.pm import pm_accel

            grid, assignment = self.pm_grid, self.pm_assignment
            return lambda p4, soft: pm_accel(p4, grid=grid,
                                             assignment=assignment)
        if self.backend == "p3m":
            from nbody_tpu.ops.p3m import p3m_accel

            grid, cap = self.pm_grid, self.p3m_capacity
            assignment = self.pm_assignment
            sr, budget = self.p3m_short_range, self._p3m_pair_budget
            interp = self.interpret

            def accel(p4, soft):
                return p3m_accel(p4, soft, grid=grid, capacity=cap,
                                 assignment=assignment, short_range=sr,
                                 pair_budget=budget, interpret=interp)[0]

            return accel
        if self.backend == "pallas":
            from nbody_tpu.ops.pallas_kernel import compute_accel_pallas

            tile_i, tile_j, interpret = self.tile_i, self.tile_j, self.interpret
            if self.variant == "sym":
                from nbody_tpu.ops import symmetric_kernel as symk

                cap, d_tj = self._sym_dispatch()
                s_ti, s_tj = self._sym_tiles(symk.TI, d_tj)

                def accel_sym(p4, soft):
                    # delegates to the single-triangle kernel bit-exactly
                    # when N <= block_cap
                    return symk.compute_accel_symmetric_blocked(
                        p4, soft, tile_i=s_ti, tile_j=s_tj,
                        interpret=interpret, block_cap=cap)

                return accel_sym

            def accel(p4, soft):
                return compute_accel_pallas(
                    p4, p4, soft,
                    tile_i=tile_i, tile_j=tile_j, interpret=interpret)

            return accel
        from nbody_tpu.ops.reference import compute_accel_xla

        chunk = self.chunk_size
        return lambda p4, soft: compute_accel_xla(p4, soft, chunk_size=chunk)

    def _accel_jerk_closure(self):
        """`aj(pos4, vel4, softening) -> ((N,3), (N,3))` — the Hermite
        scheme's force evaluation (fused Pallas kernel on the pallas
        backend, chunked XLA elsewhere; pm/p3m have no jerk)."""
        if self.backend == "pallas":
            from nbody_tpu.ops.pallas_kernel import (
                AJ_TILE_I,
                AJ_TILE_J,
                compute_accel_jerk_pallas,
            )

            interpret = self.interpret
            # hermite systems' cached tiles come from the HERMITE tune
            # family (measured on these accel+jerk kernels, __init__), so
            # they are honored; a euler-family winner adopted by a
            # non-hermite system must never leak into this shape
            aj_cache_ok = self.integrator == "hermite"
            if self.variant == "sym":
                from nbody_tpu.ops import symmetric_kernel as symk

                s_ti, s_tj = self._sym_tiles(
                    symk.TI, symk.AJ_SYM_TILE_J, cache_ok=aj_cache_ok)
                cap = symk.AJ_SYM_MAX_N  # module attr: tests shrink it

                def aj_sym(p4, v4, soft):
                    # delegates to the single-triangle kernel bit-exactly
                    # when N <= AJ_SYM_MAX_N
                    return symk.compute_accel_jerk_symmetric_blocked(
                        p4, v4, soft, tile_i=s_ti, tile_j=s_tj,
                        interpret=interpret, block_cap=cap)

                return aj_sym

            from_cache = aj_cache_ok and self._tiles_from_cache
            tile_i = (self.tile_i if self._explicit_tiles[0] or from_cache
                      else AJ_TILE_I)
            tile_j = (self.tile_j if self._explicit_tiles[1] or from_cache
                      else AJ_TILE_J)

            def aj(p4, v4, soft):
                return compute_accel_jerk_pallas(
                    p4, v4, p4, v4, soft,
                    tile_i=tile_i, tile_j=tile_j, interpret=interpret)

            return aj
        if self.backend in ("pm", "p3m"):
            raise ValueError(
                "hermite needs the jerk; pm/p3m mesh forces have none — "
                "use integrator='euler' or 'leapfrog' with these backends")
        from nbody_tpu.ops.reference import compute_accel_jerk_xla

        chunk = self.chunk_size

        def aj(p4, v4, soft):
            return compute_accel_jerk_xla(p4, v4, soft, chunk_size=chunk)

        return aj

    def _leapfrog_fn(self):
        """Symplectic DKD step; the force evaluation uses the Pallas accel
        kernel on TPU (the O(N) drift/kick stays in XLA)."""
        from nbody_tpu.ops.reference import nbody_step_leapfrog

        accel = self._accel_closure()

        def step(pos, vel, dt, soft, damp):
            return nbody_step_leapfrog(pos, vel, dt, soft, damp,
                                       accel_fn=lambda p4: accel(p4, soft))

        return step

    def _step_arrays(self, pos, vel, dt):
        p = self.params
        return self._step_fn()(pos, vel, dt, p.softening, p.damping)

    def _rollout_fn(self, steps: int):
        """Cached k-step scan rollout (one dispatch; params stay dynamic)."""
        cached = self._rollout_cache.get(steps)
        if cached is not None:
            return cached
        step = self._step_fn()

        if self.backend == "p3m":
            # single-device AND sharded: the probe's O(N) bincounts run
            # at the jit level on the (possibly sharded) global state, so
            # GSPMD inserts the needed collectives — a sharded collapsing
            # rollout reports its first breached step too, not a post-hoc
            # warning up to a segment late (VERDICT r3 item 6)
            run = self._p3m_probed_rollout(step, steps)
        else:
            # donated buffers: the functional equivalent of the reference's
            # ping-pong position buffers — the rollout updates state in place
            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def run(pos, vel, dt, soft, damp):
                def body(state, _):
                    p, v = state
                    return step(p, v, dt, soft, damp), None

                (pos, vel), _ = jax.lax.scan(body, (pos, vel), None, length=steps)
                return pos, vel

        self._rollout_cache[steps] = run
        return run

    def _p3m_breach_fn(self):
        """`breach(pos4) -> bool` — the p3m contract probe (cell-capacity
        overflow + Pallas pair-tile budget) against an evolving state.
        Runs at the jit level on possibly-sharded global arrays (GSPMD
        inserts the bincount collectives), shared by the fixed-dt AND
        adaptive probed rollouts."""
        from nbody_tpu.ops.p3m import p3m_overflow_count

        grid, cap = self.pm_grid, self.p3m_capacity
        sr, budget = self.p3m_short_range, self._p3m_pair_budget
        if sr == "pallas":
            from nbody_tpu.ops.p3m_kernel import p3m_pair_count

        def breach(p):
            p32 = p.astype(jnp.float32)
            b = p3m_overflow_count(p32, grid=grid, capacity=cap) > 0
            if sr == "pallas" and budget:
                b = b | (p3m_pair_count(p32, grid=grid, capacity=cap) > budget)
            return b

        return breach

    def _p3m_probed_rollout(self, step, steps: int):
        """p3m rollout that carries the contract probe THROUGH the scan:
        per step, an O(N) bincount checks cell-capacity overflow (and the
        Pallas pair-tile budget) against the evolving state — cheap next to
        the force evaluation — and the carry records the FIRST breached
        step plus a snapshot of the last in-contract state. A 20k-step
        collapsing rollout thus reports (or, with p3m_auto_refresh,
        recovers at) the breach step instead of warning post-hoc after
        every short-range term since the breach was silently dropped
        (VERDICT r2 item 5; the contract machinery is this framework's
        replacement for the reference's runtime asserts,
        /root/reference/src/nbody/bodysystemcuda_default.cu:40,49)."""
        breach = self._p3m_breach_fn()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(pos, vel, dt, soft, damp):
            def body(state, i):
                p, v, first, bp, bv = state
                np_, nv_ = step(p, v, dt, soft, damp)
                newly = (first < 0) & breach(np_)
                first = jnp.where(newly, i, first)
                # snapshot the state at the first breached step: steps
                # 0..first ran under a valid contract, so resuming from it
                # after refresh_p3m_contract() loses nothing
                bp = jnp.where(newly, np_, bp)
                bv = jnp.where(newly, nv_, bv)
                return (np_, nv_, first, bp, bv), None

            init = (pos, vel, jnp.int32(-1), pos, vel)
            (pos, vel, first, bp, bv), _ = jax.lax.scan(
                body, init, jnp.arange(steps, dtype=jnp.int32))
            return pos, vel, first, bp, bv

        return run

    def update(self, dt: Optional[float] = None) -> None:
        """Advance one step (dt defaults to params.time_step)."""
        from nbody_tpu.utils.profiling import annotate

        dt = self.params.time_step if dt is None else dt
        with annotate("nbody.step"):
            self._update_inner(dt)
        self._warn_if_p3m_contract_broken(throttled=True)

    # per-step updates probe the contract every K steps (each probe costs a
    # blocking device round-trip — ~8 ms on the remote relay); update_many
    # probes once per rollout, which is the cheap path
    _P3M_PROBE_EVERY = 16

    def _warn_if_p3m_contract_broken(self, *, throttled: bool = False) -> None:
        """Post-step p3m contract check (bincount probes): the capacity AND
        pair-budget contracts are probed at state-SET, but a collapsing
        system can outgrow them mid-run (measured: a 65k shell run
        overflows 25% of bodies by 1000 leapfrog steps), silently
        degrading short-range forces. Warn with guidance instead of
        staying silent; warn once per breach episode."""
        if self.backend != "p3m":
            return
        if throttled:
            self._p3m_probe_tick = getattr(self, "_p3m_probe_tick", 0) + 1
            if self._p3m_probe_tick % self._P3M_PROBE_EVERY:
                return
        from nbody_tpu.ops.p3m import p3m_overflow_count

        pos = jnp.asarray(self._pos, jnp.float32)
        overflow = int(p3m_overflow_count(pos, grid=self.pm_grid,
                                          capacity=self.p3m_capacity))
        broken = []
        if overflow:
            broken.append(
                f"{overflow} bodies exceed cell capacity {self.p3m_capacity}")
        if self.p3m_short_range == "pallas":
            # the Pallas engine also drops PAIR TILES beyond its budget —
            # a collapse can grow pair counts with zero capacity overflow
            # (core cells crossing block boundaries multiply tiles)
            from nbody_tpu.ops.p3m import p3m_kernel_blk
            from nbody_tpu.ops.p3m_kernel import p3m_pair_count

            pairs = int(p3m_pair_count(
                pos, grid=self.pm_grid, capacity=self.p3m_capacity,
                blk=p3m_kernel_blk(self.p3m_capacity)))
            if pairs > (self._p3m_pair_budget or 0):
                broken.append(
                    f"{pairs} pair tiles exceed budget "
                    f"{self._p3m_pair_budget}")
        if broken and self.p3m_auto_refresh:
            self.refresh_p3m_contract()
        elif broken and not getattr(self, "_p3m_contract_warned", False):
            import warnings

            warnings.warn(
                "p3m contract broken mid-run: " + "; ".join(broken)
                + " — short-range terms are being dropped. Call "
                "refresh_p3m_contract() to re-size from the current state "
                "(recompiles), or raise --p3m-capacity / --pm-grid.",
                stacklevel=3,
            )
            self._p3m_contract_warned = True
        elif not broken:
            self._p3m_contract_warned = False

    def refresh_p3m_contract(self) -> None:
        """Re-size the p3m capacity (and the Pallas pair budget) from the
        CURRENT state and rebuild the cached steps — the actionable
        response to the mid-run contract warning. Recompiles on the next
        step."""
        if self.backend != "p3m":
            raise ValueError("refresh_p3m_contract applies to backend='p3m'")
        self.p3m_capacity = None
        self._p3m_pair_budget = None
        self._rollout_cache.clear()
        self._adaptive_cache.clear()
        if self.mesh is not None:
            self._sharded_step = None   # rebuilt lazily with the new sizes
        self._p3m_contract_warned = False
        self._probe_p3m_capacity(jnp.asarray(self._pos, jnp.float32))

    def _update_inner(self, dt: float) -> None:
        if self.placement == "host":
            pos = jnp.asarray(self._pos)
            vel = jnp.asarray(self._vel)
            npos, nvel = self._step_arrays(pos, vel, dt)
            self._pos = np.asarray(npos)
            self._vel = np.asarray(nvel)
        else:
            self._pos, self._vel = self._step_arrays(self._pos, self._vel, dt)

    # Very long rollouts run as SEGMENTS: one shared segment length means
    # every segment reuses ONE compiled rollout, contract probing and
    # auto-refresh resolve per segment, and — critically — no single
    # dispatch runs for minutes. Evidence (r3): scans whose on-device
    # runtime reached ~90-100 s crashed the attached TPU worker
    # ("UNAVAILABLE: TPU worker process crashed") while identical scans
    # under ~80 s completed — a dispatch-duration watchdog, NOT program
    # size (a lax.scan's program is length-independent). The segment is
    # therefore WORK-bounded: at most _SEG_BUDGET pair-interaction
    # equivalents per dispatch (~45 s at the measured rates, ~2x headroom
    # under the observed kill threshold), derated for the mesh solvers'
    # per-step constant factors and fp64 emulation. ~8 ms of relay
    # dispatch per segment is noise against multi-second device scans.
    _MAX_ROLLOUT_SEGMENT = 1000
    _SEG_BUDGET_FP32 = 1.0e13   # exact kernels ~220 G int/s -> ~45 s
    _SEG_BUDGET_MESH = 2.0e12   # pm/p3m pairwise-equivalent rate ~45 G
    _SEG_BUDGET_F64 = 1.6e10    # XLA-emulated f64 ~0.32 G int/s

    def _segment_steps(self) -> int:
        """Steps per dispatched rollout segment (work-bounded; see above)."""
        if not _default_backend_is_tpu():
            # host dispatches cannot trip an accelerator watchdog
            return self._MAX_ROLLOUT_SEGMENT
        if self.dtype == jnp.float64:
            budget = self._SEG_BUDGET_F64
        elif self.backend in ("pm", "p3m"):
            budget = self._SEG_BUDGET_MESH
        else:
            budget = self._SEG_BUDGET_FP32
        n2 = float(self.num_bodies) ** 2
        return max(1, min(self._MAX_ROLLOUT_SEGMENT, int(budget / max(n2, 1.0))))

    def update_many(self, steps: int, dt: Optional[float] = None) -> None:
        """Advance `steps` steps via compiled lax.scan rollouts (one device
        dispatch per work-bounded segment; see _segment_steps).

        The TPU-idiomatic benchmark loop: the reference enqueues k kernel
        launches in a CUDA stream with one final sync
        (/root/reference/src/nbody/compute_cuda.cpp:183-195); on TPU the
        equivalent is a compiled scan so per-step host dispatch (expensive
        over a remote-attached chip) disappears."""
        from nbody_tpu.utils.profiling import annotate

        dt = self.params.time_step if dt is None else dt
        if steps <= 1:
            for _ in range(steps):
                self.update(dt)
            return
        seg_max = self._segment_steps()
        done = 0
        while done < steps:
            seg = min(steps - done, seg_max)
            with annotate(f"nbody.rollout[{seg}]"):
                first = self._update_many_inner(seg, dt)
            done += seg
            if self.backend != "p3m":
                continue
            if first < 0:
                self._p3m_contract_warned = False
                continue
            # breach at segment-local step `first` (absolute step
            # done - seg + first)
            if self.p3m_auto_refresh:
                # rewind to the snapshot of the first breached step
                # (everything before it ran in-contract), re-size from
                # that state, and redo the rest of this segment under the
                # new contract
                self._pos, self._vel = self._p3m_breach_snapshot
                del self._p3m_breach_snapshot
                self.refresh_p3m_contract()
                done -= seg - first - 1
            elif not getattr(self, "_p3m_contract_warned", False):
                import warnings

                warnings.warn(
                    f"p3m contract broken mid-rollout: first breach at "
                    f"step {done - seg + first} of {steps} — short-range "
                    "terms have been dropped since. Call "
                    "refresh_p3m_contract() and re-run, enable "
                    "p3m_auto_refresh (--p3m-auto-refresh), or raise "
                    "--p3m-capacity / --pm-grid.",
                    stacklevel=2,
                )
                self._p3m_contract_warned = True

    def _update_many_inner(self, steps: int, dt: float) -> Optional[int]:
        """Run the compiled rollout; for single-device p3m returns the first
        breached step (-1 = contract held throughout), else None."""
        p = self.params
        probed = self.backend == "p3m"
        host = self.placement == "host"
        if host:
            # stream host state in ONCE, scan k steps on-device, stream out:
            # one dispatch instead of k (each costing ~8 ms relay latency),
            # preserving the zero-copy intent of the reference's host-memory
            # path (/root/reference/src/nbody/bodysystemcuda_host_memory.cpp:20-32)
            out = self._rollout_fn(steps)(
                jnp.asarray(self._pos), jnp.asarray(self._vel),
                dt, p.softening, p.damping,
            )
        else:
            out = self._rollout_fn(steps)(
                self._pos, self._vel, dt, p.softening, p.damping
            )
        if not probed:
            npos, nvel = out
            self._pos = np.asarray(npos) if host else npos
            self._vel = np.asarray(nvel) if host else nvel
            return None
        npos, nvel, first, bp, bv = out
        first = int(first)
        self._pos = np.asarray(npos) if host else npos
        self._vel = np.asarray(nvel) if host else nvel
        if first >= 0:
            self._p3m_breach_snapshot = (
                (np.asarray(bp), np.asarray(bv)) if host else (bp, bv))
        return first

    def update_many_adaptive(self, steps: int, *, eta: float = 0.025,
                             dt_min: Optional[float] = None,
                             dt_max: Optional[float] = None) -> dict:
        """Advance `steps` steps with a GLOBAL adaptive timestep chosen
        inside the compiled rollout (ops/adaptive.py: the criterion is an
        O(N) reduction off the force evaluation the step already does, so
        adapting costs zero host round-trips). The reference has no
        analogue — its integrateBodies takes one fixed deltaTime
        (/root/reference/src/nbody/bodysystemcuda.cu:148-184).

        Criterion: euler/leapfrog use eta*sqrt(softening/max|a|) (the
        standard collisionless free-fall rule); hermite uses Aarseth's
        eta*min|a|/|j|. dt is clipped to [dt_min, dt_max]; dt_max defaults
        to params.time_step (the preset's fixed dt is the ceiling) and
        dt_min to dt_max/1024.

        Returns {"t": simulated time, "dt_last", "dt_lo", "dt_hi",
        "steps"}. Like update_many, long runs go out as work-bounded
        segments; the p3m contract is probed at segment boundaries (the
        in-scan breach carry is a fixed-dt rollout feature).

        Each CALL evaluates the initial acceleration once to seed the
        carried-acceleration scan, so adapting is eval-neutral *within* a
        rollout (1/steps amortized overhead per call) — batch interactive
        frames into one call per frame (Compute.update_simulation does)
        rather than looping 1-step calls, which would double the per-step
        force work.

        Mesh-capable over the 1-D body mesh for EVERY backend (exact
        kernels via parallel.sharded.make_sharded_adaptive_rollout —
        one pmax/pmin collective per step inside shard_map; pm/p3m via
        a jit-level scan over the shard_map'd force decomposition, the
        criterion max reducing over the sharded array through GSPMD)
        and over the 2-D (rows x cols) decomposition for the exact
        kernels (make_sharded_adaptive_rollout_2d, two-axis pmax).

        p3m rollouts (single-device AND sharded) carry the contract
        probe THROUGH the adaptive scan exactly like the fixed-dt
        probed rollout: the first breached step is reported (or, with
        p3m_auto_refresh, rewound to, re-sized from, and resumed —
        adaptive dt matters most for collapsing states, which is also
        where the contract breaches)."""
        from nbody_tpu.utils.profiling import annotate

        if self.mesh is not None and self.strategy == "ring_fused":
            raise ValueError(
                "strategy='ring_fused' fuses the fixed-dt Euler "
                "update into its kernel; use allgather/ring/auto "
                "for adaptive rollouts")
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
        host = self.placement == "host"
        probed = self.backend == "p3m"
        totals = {"t": 0.0, "dt_last": float(dt_max),
                  "dt_lo": float("inf"), "dt_hi": 0.0, "steps": steps}

        def merge(stats):
            stats = np.asarray(stats)
            totals["t"] += float(stats[0])
            totals["dt_last"] = float(stats[1])
            totals["dt_lo"] = min(totals["dt_lo"], float(stats[2]))
            totals["dt_hi"] = max(totals["dt_hi"], float(stats[3]))

        seg_max = self._segment_steps()
        done = 0
        while done < steps:
            seg = min(steps - done, seg_max)
            run = self._adaptive_rollout_fn(seg, eta, dt_min, dt_max)
            with annotate(f"nbody.adaptive_rollout[{seg}]"):
                if host:
                    out = run(jnp.asarray(self._pos), jnp.asarray(self._vel))
                else:
                    out = run(self._pos, self._vel)
            if probed:
                npos, nvel, stats, first, bp, bv, bst = out
                first = int(first)
            else:
                npos, nvel, stats = out
                first = -1
            self._pos = np.asarray(npos) if host else npos
            self._vel = np.asarray(nvel) if host else nvel
            done += seg
            if first < 0:
                merge(stats)
                self._p3m_contract_warned = False if probed else getattr(
                    self, "_p3m_contract_warned", False)
                continue
            # p3m contract breach at segment-local step `first` — the
            # same recovery ladder as the fixed-dt rollout (update_many)
            if self.p3m_auto_refresh:
                # rewind to the snapshot of the first breached step and
                # account only the simulated time THROUGH it (bstats)
                self._pos = np.asarray(bp) if host else bp
                self._vel = np.asarray(bv) if host else bv
                merge(bst)
                self.refresh_p3m_contract()
                done -= seg - first - 1
            else:
                merge(stats)
                if not getattr(self, "_p3m_contract_warned", False):
                    import warnings

                    warnings.warn(
                        f"p3m contract broken mid-rollout: first breach "
                        f"at adaptive step {done - seg + first} of "
                        f"{steps} — short-range terms have been dropped "
                        "since. Call refresh_p3m_contract() and re-run, "
                        "enable p3m_auto_refresh (--p3m-auto-refresh), "
                        "or raise --p3m-capacity / --pm-grid.",
                        stacklevel=2,
                    )
                    self._p3m_contract_warned = True
        return totals

    def _adaptive_rollout_fn(self, steps: int, eta: float,
                             dt_min: float, dt_max: float):
        """Cached adaptive rollout. Unlike the fixed-dt rollout, softening
        and damping are BAKED into the compiled scan (the dt criterion
        folds softening into traced constants), so the cache keys on them:
        a slider write-through costs one recompile here, not wrong
        physics."""
        p = self.params
        key = (steps, eta, dt_min, dt_max, p.softening, p.damping)
        cached = self._adaptive_cache.get(key)
        if cached is not None:
            return cached
        if self.mesh is not None and self.backend in ("pm", "p3m"):
            run = self._mesh_solver_adaptive_rollout(steps, eta,
                                                     dt_min, dt_max)
            self._adaptive_cache[key] = run
            return run
        if self.mesh is not None:
            from nbody_tpu.parallel.sharded import (
                make_sharded_adaptive_rollout,
                make_sharded_adaptive_rollout_2d,
            )

            kw = dict(
                softening=p.softening, damping=p.damping,
                eta=eta, dt_min=dt_min, dt_max=dt_max, steps=steps,
                kernel="pallas" if self.backend == "pallas" else "xla",
                integrator=self.integrator,
                tile_i=self.tile_i if self._explicit_tiles[0] else None,
                tile_j=self.tile_j if self._explicit_tiles[1] else None,
                interpret=bool(self.interpret),
                chunk_size=self.chunk_size,
            )
            if len(self._mesh_axes) == 2:
                run = make_sharded_adaptive_rollout_2d(
                    self.mesh, axes=self._mesh_axes, **kw)
            else:
                run = make_sharded_adaptive_rollout(
                    self.mesh, strategy=self.strategy, **kw)
            self._adaptive_cache[key] = run
            return run
        from nbody_tpu.ops.adaptive import make_adaptive_rollout

        probe = self._p3m_breach_fn() if self.backend == "p3m" else None
        if self.integrator == "hermite":
            aj = self._accel_jerk_closure()
            run = make_adaptive_rollout(
                "hermite",
                accel_jerk_fn=lambda p4, v4: aj(p4, v4, p.softening),
                softening=p.softening, damping=p.damping,
                eta=eta, dt_min=dt_min, dt_max=dt_max, steps=steps,
                probe_fn=probe)
        else:
            integrator = "leapfrog" if self.integrator == "leapfrog" else "euler"
            accel = self._accel_closure()
            run = make_adaptive_rollout(
                integrator,
                accel_fn=lambda p4: accel(p4, p.softening),
                softening=p.softening, damping=p.damping,
                eta=eta, dt_min=dt_min, dt_max=dt_max, steps=steps,
                probe_fn=probe)
        self._adaptive_cache[key] = run
        return run

    def _mesh_solver_adaptive_rollout(self, steps: int, eta: float,
                                      dt_min: float, dt_max: float):
        """Adaptive rollout for pm/p3m over the 1-D body mesh: a
        jit-level scan around the shard_map'd force decomposition
        (make_sharded_pm_accel / make_sharded_p3m_accel). The dt
        criterion's global max and the p3m contract probe's bincounts
        run at the jit level on the sharded global arrays — GSPMD
        inserts the collectives, exactly like the fixed-dt probed
        rollout (_rollout_fn's p3m comment)."""
        from nbody_tpu.ops.adaptive import make_adaptive_scan

        p = self.params
        if self.backend == "pm":
            from nbody_tpu.ops.pm import make_sharded_pm_accel

            acc_sh = make_sharded_pm_accel(
                self.mesh, grid=self.pm_grid,
                assignment=self.pm_assignment, fft=self.pm_fft)

            def accel_fn(p4):
                return acc_sh(p4)

            probe = None
        else:
            from nbody_tpu.ops.p3m import make_sharded_p3m_accel

            acc_sh = make_sharded_p3m_accel(
                self.mesh, grid=self.pm_grid, capacity=self.p3m_capacity,
                assignment=self.pm_assignment, fft=self.pm_fft,
                short_range=self.p3m_short_range,
                pair_budget=self._p3m_pair_budget,
                interpret=self.interpret)
            soft = p.softening

            def accel_fn(p4):
                return acc_sh(p4, jnp.asarray(soft, p4.dtype))

            probe = self._p3m_breach_fn()

        integrator = ("leapfrog" if self.integrator == "leapfrog"
                      else "euler")
        run = make_adaptive_scan(
            integrator, accel_fn=accel_fn,
            softening=p.softening, damping=p.damping, eta=eta,
            dt_min=dt_min, dt_max=dt_max, steps=steps, probe_fn=probe)
        return jax.jit(run, donate_argnums=(0, 1))

    def update_many_block(self, macro_steps: int, *, eta: float = 0.025,
                          dt_max: Optional[float] = None,
                          n_classes: int = 4) -> dict:
        """Advance `macro_steps` macro steps of dt_max with PER-BODY
        block timesteps on a power-of-two ladder (ops/block_timestep.py
        — the collisional-dynamics standard the global adaptive path's
        docstring named as its follow-up). Each body integrates at the
        largest rung dt_max/2^k not exceeding its own criterion dt, so
        a collapsing core no longer drags every halo body down to the
        global minimum: force work per macro step is the sum of active
        prefix rows instead of 2^(K-1) * N.

        Same criterion family as update_many_adaptive (KDK leapfrog,
        eta*sqrt(softening/|a_i|), per body instead of globally
        reduced). dt_max defaults to params.time_step. Returns
        {"t", "rows", "global_rows", "k_max", "macro_steps"} — rows is
        the force-eval rows actually computed, global_rows what a
        global dt at the deepest occupied rung would have cost over the
        same span (the measured saving; scripts/tpu_r5_block_dt.py).

        Exact kernels, single device, damping=1 only: pm/p3m force
        error floors sit at the cell scale (their adaptive path is
        update_many_adaptive), the sharded composition is REJECTED on
        the measured single-chip numbers (the ladder loses 1.6-4.1x
        wall to the global adaptive scan with zero collective costs; a
        mesh adds a global class re-sort plus per-boundary exchanges —
        ARCHITECTURE.md "Per-body block timesteps"), and a per-kick
        damping is not the reference's per-step multiplier once bodies
        kick at different cadences."""
        from nbody_tpu.utils.profiling import annotate

        p = self.params
        if self.mesh is not None:
            raise ValueError(
                "block timesteps are single-device (the sharded "
                "composition is rejected on measured numbers — "
                "ARCHITECTURE.md 'Per-body block timesteps'); use "
                "update_many_adaptive on meshes")
        if self.backend in ("pm", "p3m"):
            raise ValueError(
                "block timesteps drive the exact kernels; pm/p3m take "
                "update_many_adaptive (per-body ladders below the mesh "
                "force's cell-scale error floor are meaningless)")
        if p.damping != 1.0:
            raise ValueError(
                "block timesteps need damping=1.0 (a per-kick damping "
                "is not the reference's per-step multiplier once bodies"
                " kick at different cadences)")
        if dt_max is None:
            dt_max = p.time_step
        if not dt_max > 0:
            raise ValueError(f"need dt_max > 0, got {dt_max}")
        if not eta > 0.0:   # also rejects NaN
            raise ValueError(f"need eta > 0, got {eta}")
        if not 1 <= n_classes <= 16:
            raise ValueError(f"need 1 <= n_classes <= 16, got {n_classes}")
        host = self.placement == "host"
        totals = {"t": 0.0, "rows": 0.0, "global_rows": 0.0, "k_max": 0,
                  "macro_steps": macro_steps}
        # a macro step spans 2^(K-1) substeps: bound the per-dispatch
        # work the same way the fixed-dt segments do
        s_count = 1 << (n_classes - 1)
        seg_max = max(1, self._segment_steps() // s_count)
        # chain the classifying force across CALLS, not just segments:
        # the rollout returns the synchronized macro-end force exactly so
        # the next macro (e.g. the next demo frame's step_block) need not
        # re-evaluate it. `_pos` is only ever rebound (never mutated in
        # place), so identity + softening keys the cache soundly.
        chain = getattr(self, "_block_chain", None)
        if chain is not None and chain[0] is self._pos \
                and chain[1] == p.softening:
            a0 = chain[2]
        else:
            # chain-start force: integrator startup a GLOBAL-dt KDK run
            # pays identically, so it is billed to neither rows column
            # (and the cache above amortizes it away across calls)
            accel = self._accel_closure()
            a0 = accel(jnp.asarray(self._pos) if host else self._pos,
                       p.softening)
        done = 0
        while done < macro_steps:
            seg = min(seg_max, macro_steps - done)
            run = self._block_rollout_fn(seg, eta, dt_max, n_classes)
            with annotate(f"nbody.block_rollout[{seg}]"):
                if host:
                    npos, nvel, a0, stats = run(jnp.asarray(self._pos),
                                                jnp.asarray(self._vel), a0)
                else:
                    npos, nvel, a0, stats = run(self._pos, self._vel, a0)
            self._pos = np.asarray(npos) if host else npos
            self._vel = np.asarray(nvel) if host else nvel
            stats = np.asarray(stats)
            totals["t"] += float(stats[0])
            totals["rows"] += float(stats[1])
            totals["global_rows"] += float(stats[2])
            totals["k_max"] = max(totals["k_max"], int(stats[3]))
            done += seg
        self._block_chain = (self._pos, p.softening, a0)
        return totals

    def _block_rollout_fn(self, macro_steps: int, eta: float,
                          dt_max: float, n_classes: int):
        """Compiled block-timestep rollout for the current backend
        (cached like the adaptive rollouts; the pallas backend plugs
        its one-sided i-vs-j kernel into the prefix tiles)."""
        key = ("block", macro_steps, float(eta), float(dt_max),
               n_classes, self.backend, float(self.params.softening))
        cached = self._adaptive_cache.get(key)
        if cached is not None:
            return cached
        from nbody_tpu.ops.block_timestep import make_block_rollout

        accel_vs_fn = None
        if self.backend == "pallas":
            from nbody_tpu.ops.pallas_kernel import compute_accel_pallas

            tile_j, interpret = self.tile_j, self.interpret

            def accel_vs_fn(pi4, pj4, soft):
                return compute_accel_pallas(pi4, pj4, soft,
                                            tile_j=tile_j,
                                            interpret=interpret)

        run = make_block_rollout(
            softening=self.params.softening, eta=eta, dt_max=dt_max,
            n_classes=n_classes, macro_steps=macro_steps,
            accel_vs_fn=accel_vs_fn)
        self._adaptive_cache[key] = run
        return run

    def block_until_ready(self) -> None:
        if self.placement != "host":
            jax.block_until_ready((self._pos, self._vel))

    def hard_sync(self) -> None:
        """True execution barrier (see utils.timing.hard_sync for why
        block_until_ready alone is not enough on remote-attached backends)."""
        if self.placement != "host":
            _hard_sync((self._pos, self._vel))

    # ---- precision switch (reference Enter key, compute_cuda.cpp:152-181) ----

    def switch_precision(self) -> "BodySystem":
        """Return a new BodySystem in the other precision with the same state
        (device-sync + cast, like the reference's D2H/cast/H2D switch)."""
        new_dtype = jnp.float64 if self.dtype == jnp.float32 else jnp.float32
        if new_dtype == jnp.float64 and not jax.config.jax_enable_x64:
            raise ValueError("fp64 unavailable: enable x64 first (JAX_ENABLE_X64=1)")
        self.block_until_ready()
        other = BodySystem(
            self.num_bodies,
            self.params,
            dtype=new_dtype,
            # fp64 needs the XLA path; fp32 re-resolves the ORIGINALLY
            # requested backend so a round trip restores the Pallas kernel
            backend="xla" if new_dtype == jnp.float64 else self._requested_backend,
            # None = "not user-specified": keeps tune-cache eligibility and
            # per-kernel tile defaults across the precision hop
            tile_i=self.tile_i if self._explicit_tiles[0] else None,
            tile_j=self.tile_j if self._explicit_tiles[1] else None,
            placement=self.placement,
            mesh=self.mesh,
            strategy=self.strategy,
            # the ORIGINAL request, not the resolution: auto may have
            # resolved to 'sym', which the fp64/XLA hop must not inherit
            # (sym is pallas-only; variant is unused on the XLA path, so
            # the hop maps it to 'auto' and the carry below restores the
            # request for the round trip back to fp32)
            variant=("auto" if (new_dtype == jnp.float64
                                and self._requested_variant == "sym")
                     else self._requested_variant),
            integrator=self.integrator,
            interpret=self._requested_interpret if new_dtype == jnp.float32 else None,
            chunk_size=self.chunk_size,
            pm_grid=self.pm_grid,
            pm_assignment=self.pm_assignment,
            pm_fft=self.pm_fft,
            p3m_capacity=self.p3m_capacity,
            p3m_short_range=self.p3m_short_range,
            config=self.config,
            seed=self.seed,
            state=(
                self.positions.astype(np.float64 if new_dtype == jnp.float64 else np.float32),
                self.velocities.astype(np.float64 if new_dtype == jnp.float64 else np.float32),
            ),
        )
        # the fp64 hop is forced onto the XLA path; carry the user's ORIGINAL
        # request across it so fp32->fp64->fp32 restores the Pallas kernel
        other._requested_backend = self._requested_backend
        other._requested_interpret = self._requested_interpret
        other._requested_variant = self._requested_variant
        return other

    # ---- diagnostics ----

    def total_energy(self, *, precise: bool = False) -> float:
        """Total energy diagnostic.

        precise=True evaluates the fp64 functional (host f64 up to ~131k
        bodies, f32 pair terms + host-f64 accumulation above) — use it for
        drift comparisons, where fp32 summation noise at N >= 65k is the
        same order as the drifts themselves. The default stays the fast
        state-dtype path (Pallas-tiled at large N)."""
        pos = jnp.asarray(self._pos)
        vel = jnp.asarray(self._vel)
        if precise:
            from nbody_tpu.ops.energy import total_energy_precise

            return total_energy_precise(pos, vel, self.params.softening,
                                        chunk_size=self.chunk_size)
        if self.backend == "pallas" and self.dtype == jnp.float32:
            # tiled Pallas potential: fast diagnostics at large N
            from nbody_tpu.ops.energy import kinetic_energy
            from nbody_tpu.ops.pallas_kernel import potential_energy_pallas

            ke = kinetic_energy(pos, vel)
            pe = potential_energy_pallas(
                pos, self.params.softening, interpret=self.interpret
            )
            return float(ke + pe)
        return float(total_energy(pos, vel, self.params.softening, chunk_size=self.chunk_size))
