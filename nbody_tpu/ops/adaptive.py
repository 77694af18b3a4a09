"""Adaptive global (shared) timestep rollouts.

The reference integrates at a fixed dt everywhere (integrateBodies takes
one deltaTime, /root/reference/src/nbody/bodysystemcuda.cu:148-184, and
the demo presets hard-code it, compute.cpp:74-92). Collapsing or
close-encounter configurations have no single good dt: the drift tables
in PARITY.md show demo-0's collapse amplifying at dt=0.016 while the
same kernel holds 1e-5-grade drift at gentler configs. The classic
remedy is a timestep that tracks the shortest dynamical time.

TPU-first design decisions:

* The dt choice lives INSIDE the compiled ``lax.scan`` — the criterion
  is an O(N) reduction off the force evaluation the step already does,
  so adapting costs one max/min reduction per step and ZERO host
  round-trips (at ~8 ms relay latency per dispatch, a host-side dt loop
  would be 100x slower than the physics at small N).
* The timestep is GLOBAL (one dt shared by all bodies per step).
  Per-body block timesteps — the collisional-dynamics standard — make
  the force evaluation irregular (active-set gather/scatter, dynamic
  shapes): TPU-hostile and XLA-unfriendly. A global criterion keeps
  every step a full dense all-pairs evaluation on the MXU/VPU-shaped
  tiles, trading wasted small steps for regularity. (Block steps on a
  sorted power-of-two ladder exist too — ops/block_timestep.py,
  ``BodySystem.update_many_block`` — and the measured comparison in
  ARCHITECTURE "Per-body block timesteps" found THIS global adaptive
  path the wall-clock default at all measured configs: against an
  adaptive (not floor-pinned) global dt, the ladder's row savings
  largely vanish in globally-coupled states (0.85-1.06x rows) while
  its substep machinery costs 1.6-4.1x wall at N=16384-65536.)
* Criteria:
    - euler / leapfrog: dt = eta * sqrt(softening / max_i |a_i|) — the
      softening length is the smallest resolved scale, so eps/|a| is the
      shortest resolved free-fall time^2 (the standard collisionless
      choice, e.g. GADGET's criterion).
    - hermite: dt = eta * min_i |a_i| / |j_i| (Aarseth's first-step
      rule; |a|/|j| is the force's own rate-of-change time).
  Both clip to [dt_min, dt_max].
* Damping keeps the reference's PER-STEP multiplier semantics (velocity
  scaled by `damping` once per step, like the fixed-dt paths) — under
  adaptive dt that is a per-step drag, not a per-time one; pass
  damping=1 for physical runs.

Integrator forms (one force evaluation per step for euler/leapfrog —
the leapfrog runs kick-drift-kick with the end-of-step acceleration
carried into the next step's first kick, so adapting is eval-neutral;
hermite keeps its two evaluations, the first doubling as the criterion
input):

    euler    a = accel(x);  dt = crit(a);  v' = (v + a dt) d;  x' = x + v' dt
    KDK      dt = crit(a_carried); v½ = v + a dt/2; x' = x + v½ dt;
             a' = accel(x'); v' = (v½ + a' dt/2) d
    hermite  (a0,j0) = aj(x,v); dt = crit(a0,j0); P(EC) as in
             ops/reference.py::nbody_step_hermite

Note the fixed-dt leapfrog is DKD (drift-kick-drift); the adaptive one
is KDK so dt is known before any force evaluation of the step. Both are
velocity-Verlet forms of identical order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accel_timestep(acc, softening, eta, dt_min, dt_max, *, mesh_axis=None):
    """Global dt from accelerations: eta * sqrt(softening / max|a|),
    clipped to [dt_min, dt_max]. `acc` is (N, 3). Under shard_map,
    `mesh_axis` turns the max into a cross-device pmax so every shard
    steps with the SAME dt (the criterion is global by construction)."""
    amax2 = jnp.max(jnp.sum(acc * acc, axis=-1))
    if mesh_axis is not None:
        amax2 = jax.lax.pmax(amax2, mesh_axis)
    amax = jnp.sqrt(amax2)
    soft = jnp.asarray(softening, acc.dtype)
    dt = eta * jnp.sqrt(soft / jnp.maximum(amax, jnp.finfo(acc.dtype).tiny))
    return jnp.clip(dt, dt_min, dt_max).astype(acc.dtype)


def aarseth_timestep(acc, jerk, eta, dt_min, dt_max, *, mesh_axis=None):
    """Global dt from Aarseth's rule: eta * min_i |a_i|/|j_i|."""
    a = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
    j = jnp.sqrt(jnp.sum(jerk * jerk, axis=-1))
    t = jnp.min(a / jnp.maximum(j, jnp.finfo(acc.dtype).tiny))
    if mesh_axis is not None:
        t = jax.lax.pmin(t, mesh_axis)
    dt = eta * t
    return jnp.clip(dt, dt_min, dt_max).astype(acc.dtype)


def _with_mass(p3, mass_col):
    return jnp.concatenate([p3, mass_col], axis=1)


def make_adaptive_scan(integrator: str, *, accel_fn=None,
                       accel_jerk_fn=None, softening, damping,
                       eta: float, dt_min: float, dt_max: float,
                       steps: int, mesh_axis=None, probe_fn=None):
    """Build an UNJITTED `(pos, vel) -> (pos, vel, stats)` adaptive scan.

    stats is a (4,) array [t_total, dt_last, dt_lo, dt_hi]: simulated
    time, the last step's dt, and the smallest/largest dt used. The
    criterion, carry structure, and per-integrator forms are documented
    in the module docstring. `accel_fn(pos4) -> (N,3)` for
    euler/leapfrog; `accel_jerk_fn(pos4, vel4) -> ((N,3), (N,3))` for
    hermite.

    `mesh_axis` makes the scan shard_map-composable: the force closures
    see the LOCAL shard (they carry their own collectives) and the dt
    criterion pmax/pmin-reduces across the axis, so every device steps
    with one global dt and the per-device stats are replicated.

    `probe_fn(pos4) -> bool` threads a per-step contract probe through
    the scan carry (the p3m capacity/pair-budget breach detector,
    BodySystem._p3m_probed_rollout's pattern composed with the adaptive
    carry): the return grows to `(pos, vel, stats, first, bpos, bvel,
    bstats)` where `first` is the first breached step index (-1 = the
    contract held), `bpos/bvel` snapshot the state at that step, and
    `bstats` snapshots the stats THROUGH it — so an auto-refresh caller
    can rewind to the snapshot and account the simulated time exactly.
    """
    if integrator not in ("euler", "leapfrog", "hermite"):
        raise ValueError(f"unknown integrator {integrator!r}")
    if integrator == "hermite":
        if accel_jerk_fn is None:
            raise ValueError("hermite needs accel_jerk_fn")
    elif accel_fn is None:
        raise ValueError(f"{integrator} needs accel_fn")

    def stats_init(dtype):
        return jnp.asarray([0.0, 0.0, jnp.inf, 0.0], dtype)

    def stats_update(stats, dt):
        return jnp.stack([stats[0] + dt, dt,
                          jnp.minimum(stats[2], dt),
                          jnp.maximum(stats[3], dt)])

    def _wrap(step_body, extra_init):
        """Drive `step_body(p, v, extra) -> (np, nv, nextra, nstats)`
        through the scan, threading the optional breach probe."""
        def run(pos, vel):
            if probe_fn is None:
                def body(state, _):
                    p, v, extra, stats = state
                    np_, nv_, nextra, nstats = step_body(p, v, extra, stats)
                    return (np_, nv_, nextra, nstats), None

                init = (pos, vel, extra_init(pos, vel), stats_init(pos.dtype))
                (pos, vel, _, stats), _ = jax.lax.scan(body, init, None,
                                                       length=steps)
                return pos, vel, stats

            def body(state, i):
                p, v, extra, stats, first, bp, bv, bst = state
                np_, nv_, nextra, nstats = step_body(p, v, extra, stats)
                newly = (first < 0) & probe_fn(np_)
                first = jnp.where(newly, i, first)
                bp = jnp.where(newly, np_, bp)
                bv = jnp.where(newly, nv_, bv)
                bst = jnp.where(newly, nstats, bst)
                return (np_, nv_, nextra, nstats, first, bp, bv, bst), None

            st0 = stats_init(pos.dtype)
            init = (pos, vel, extra_init(pos, vel), st0,
                    jnp.int32(-1), pos, vel, st0)
            (pos, vel, _, stats, first, bp, bv, bst), _ = jax.lax.scan(
                body, init, jnp.arange(steps, dtype=jnp.int32))
            return pos, vel, stats, first, bp, bv, bst

        return run

    if integrator == "euler":

        def step_euler(p, v, extra, stats):
            damp = jnp.asarray(damping, p.dtype)
            acc = accel_fn(p)
            dt = accel_timestep(acc, softening, eta, dt_min, dt_max,
                                mesh_axis=mesh_axis)
            v3 = (v[:, :3] + acc * dt) * damp
            p3 = p[:, :3] + v3 * dt
            np_ = _with_mass(p3, p[:, 3:4])
            nv_ = _with_mass(v3, v[:, 3:4])
            return np_, nv_, extra, stats_update(stats, dt)

        return _wrap(step_euler, lambda pos, vel: jnp.zeros((), pos.dtype))

    if integrator == "leapfrog":

        def step_leapfrog(p, v, acc, stats):
            damp = jnp.asarray(damping, p.dtype)
            dt = accel_timestep(acc, softening, eta, dt_min, dt_max,
                                mesh_axis=mesh_axis)
            v_half = v[:, :3] + acc * (dt / 2)
            p3 = p[:, :3] + v_half * dt
            np_ = _with_mass(p3, p[:, 3:4])
            acc_new = accel_fn(np_)
            v3 = (v_half + acc_new * (dt / 2)) * damp
            nv_ = _with_mass(v3, v[:, 3:4])
            return np_, nv_, acc_new, stats_update(stats, dt)

        return _wrap(step_leapfrog, lambda pos, vel: accel_fn(pos))

    from nbody_tpu.ops.reference import hermite_correct, hermite_predict

    def step_hermite(p, v, extra, stats):
        damp = jnp.asarray(damping, p.dtype)
        x0, v0 = p[:, :3], v[:, :3]
        a0, j0 = accel_jerk_fn(p, v)
        dt = aarseth_timestep(a0, j0, eta, dt_min, dt_max,
                              mesh_axis=mesh_axis)

        xp, vp = hermite_predict(x0, v0, a0, j0, dt)
        pos_p = _with_mass(xp, p[:, 3:4])
        vel_p = _with_mass(vp, v[:, 3:4])
        a1, j1 = accel_jerk_fn(pos_p, vel_p)

        x1, v1 = hermite_correct(x0, v0, a0, j0, a1, j1, dt, damp)
        np_ = _with_mass(x1, p[:, 3:4])
        nv_ = _with_mass(v1, v[:, 3:4])
        return np_, nv_, extra, stats_update(stats, dt)

    return _wrap(step_hermite, lambda pos, vel: jnp.zeros((), pos.dtype))


def make_adaptive_rollout(integrator: str, *, accel_fn=None,
                          accel_jerk_fn=None, softening, damping,
                          eta: float, dt_min: float, dt_max: float,
                          steps: int, probe_fn=None):
    """Jitted single-device `(pos, vel) -> (pos, vel, stats[, first,
    bpos, bvel, bstats])` adaptive rollout (make_adaptive_scan under jit
    with donated state buffers; the breach-carry tail appears iff
    `probe_fn` is given)."""
    run = make_adaptive_scan(
        integrator, accel_fn=accel_fn, accel_jerk_fn=accel_jerk_fn,
        softening=softening, damping=damping, eta=eta,
        dt_min=dt_min, dt_max=dt_max, steps=steps, probe_fn=probe_fn)
    return jax.jit(run, donate_argnums=(0, 1))
