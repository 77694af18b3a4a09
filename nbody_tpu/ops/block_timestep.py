"""Per-body BLOCK timesteps on a power-of-two ladder.

The reference integrates every body at one fixed dt
(/root/reference/src/nbody/bodysystemcuda.cu:148-184); ops/adaptive.py
upgraded that to one GLOBAL adaptive dt, whose own docstring named the
follow-up: "Block steps on a sorted power-of-two ladder are the
pod-scale follow-up." This module is that follow-up — the
collisional-dynamics standard (Aarseth block steps; GADGET-2 §4 uses the
same power-of-two kick/drift ladder), designed TPU-first.

Why a global dt wastes work: the criterion dt_i = eta*sqrt(eps/|a_i|)
is per body, and a collapsing core drags the GLOBAL min down ~100-1000x
while the halo's dt_i is unchanged — so every halo body is integrated
at the core's dt, paying a full dense force row per tiny step. Block
steps give each body the largest ladder rung dt_max/2^k <= dt_i, so the
force work per macro step is sum_s |active(s)| rows instead of
2^(K-1) * N.

TPU-first design (dense tiles, static shapes, no per-body gather):

* **Ladder**: K rungs, class k steps at dt_k = dt_max / 2^k. A macro
  step spans dt_max = S * dt_small substeps (S = 2^(K-1)). At substep
  boundary s, the classes whose step starts/ends there are exactly
  {k >= K-1-t} where t = trailing_zeros(s) — a deterministic schedule
  computed HOST-side (t is static per s; only the class populations are
  runtime values).
* **Sorted prefix, not gather**: bodies are sorted by class DESCENDING
  (smallest dt first) once per macro step — the p3m cell-sort pattern:
  one O(N log N) XLA sort buys dense layout. The active set at every
  boundary is then a PREFIX of the sorted array, so the force
  evaluation is dense i-tiles [0, n_active) against the full j-set —
  the same i-set-vs-j-set form every kernel in this framework takes.
* **Dynamic prefix, static tiles**: n_active is a traced scalar (class
  populations move), so the prefix is walked by a ``lax.while_loop``
  over fixed-size i-tiles with a dynamic trip count — each iteration is
  one (tile, N) dense block, XLA-shaped, and work scales with the
  active population instead of N. (A masked full-N evaluation would be
  correctness-equivalent and zero savings — the entire point is the
  trip count.)
* **One scan**: the substep loop is a ``lax.scan`` whose xs are the
  host-computed (t, is_boundary) schedule; classes are FROZEN within a
  macro step (re-classified from the synchronized full force at every
  macro boundary). Classic block schemes let a body shrink its step at
  its own step end; freezing per macro step keeps the scan carry static
  and costs at most one macro step of lag — choose dt_max accordingly.
* **Integrator**: KDK leapfrog per class. Opening half kick at the
  macro start (force known there for ALL bodies — it is also what
  classifies), full kicks a(t_s)*dt_k at interior boundaries a class
  crosses (closing + opening half kicks share one evaluation), drift of
  ALL bodies every substep by dt_small (O(N) multiply-add, force-free),
  closing half kick from the synchronized full evaluation at the macro
  end — which is ALSO the next macro step's opening/classifying force,
  so it is carried, never recomputed.

Force evaluations per macro step (in rows): sum over interior
boundaries of n_active(t(s)), plus N for the synchronized macro-end
evaluation. The equivalent global-adaptive cost is S*N (it must step
everyone at the tightest dt). The rollout returns both numbers measured
from the actual class populations so callers can print the saving —
scripts/tpu_r5_block_dt.py is the measured adopt/reject comparison
(ARCHITECTURE "Per-body block timesteps").

Damping: block kicks keep damping=1 semantics only (a per-kick velocity
scale is not a per-step multiplier once bodies kick at different
cadences); callers wanting the reference's damped demo dynamics use the
global-dt paths. BodySystem passes damping=1.0 runs through
``update_many_block``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.ops.reference import _accel_rows


def block_schedule(n_classes: int) -> tuple[np.ndarray, int]:
    """Host-side interior-boundary schedule for a K-rung ladder.

    Returns (t_arr, S): S = 2^(K-1) substeps per macro step and, for
    the S-1 INTERIOR boundaries s = 1..S-1, t_arr[s-1] =
    trailing_zeros(s) — the deepest class index offset active at s
    (active classes are k >= K-1-t)."""
    if n_classes < 1:
        raise ValueError(f"need n_classes >= 1, got {n_classes}")
    s_count = 1 << (n_classes - 1)
    s = np.arange(1, s_count, dtype=np.int32)
    # trailing zeros: log2 of the lowest set bit (exact for int32 here)
    t = np.round(np.log2(s & -s)).astype(np.int32)
    return t, s_count


def classify(acc, softening, eta, dt_max, n_classes: int):
    """Per-body ladder class from the acceleration criterion.

    k_i = smallest k with dt_max/2^k <= eta*sqrt(eps/|a_i|), clipped to
    [0, K-1] — i.e. each body gets the LARGEST rung not exceeding its
    criterion dt (bodies too tight for the deepest rung saturate at
    K-1, exactly like the global path's dt_min clip)."""
    amax = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
    soft = jnp.asarray(softening, acc.dtype)
    dt_i = eta * jnp.sqrt(soft / jnp.maximum(amax, jnp.finfo(acc.dtype).tiny))
    k = jnp.ceil(jnp.log2(dt_max / jnp.maximum(dt_i, jnp.finfo(acc.dtype).tiny)))
    return jnp.clip(k, 0, n_classes - 1).astype(jnp.int32)


def _xla_accel_vs(pos_i, pos_j, softening):
    """Default tile force: dense i-set-vs-j-set XLA rows (the same
    primitive compute_accel_xla_vs wraps)."""
    eps2 = jnp.asarray(softening, pos_i.dtype) ** 2
    return _accel_rows(pos_i[:, :3], pos_j[:, :3], pos_j[:, 3], eps2)


def _prefix_accel(pos_sorted, n_active, softening, tile: int, accel_vs):
    """Dense-prefix force: rows [0, n_active) of the class-sorted i-set
    against the full j-set, walked in `tile`-row blocks by a dynamic
    trip-count while_loop (`accel_vs(pos_i4, pos_j4, softening) ->
    (tile, 3)` does one block). Rows >= n_active keep zeros (their
    class is not at a boundary — they are mid-drift and get no kick)."""
    n = pos_sorted.shape[0]
    n_tiles = (n_active + tile - 1) // tile

    def cond(c):
        return c[0] < n_tiles

    def body(c):
        i, out = c
        start = i * tile
        rows = lax.dynamic_slice_in_dim(pos_sorted, start, tile)
        acc = accel_vs(rows, pos_sorted, softening)
        return i + 1, lax.dynamic_update_slice_in_dim(out, acc, start, 0)

    _, out = lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((n, 3), pos_sorted.dtype)))
    return out


def make_block_rollout(*, softening, eta: float, dt_max: float,
                       n_classes: int, macro_steps: int,
                       tile: int = 256, accel_vs_fn=None):
    """Jitted `(pos, vel, acc0) -> (pos, vel, acc, stats)` block-timestep
    rollout over `macro_steps` macro steps of dt_max each.

    `acc0` is the synchronized full-force at the initial state (it
    classifies the first macro step and opens its kicks; take it from
    the previous rollout's returned `acc` to chain segments without a
    redundant evaluation, or compute it once with compute_accel_xla).

    `accel_vs_fn(pos_i4, pos_j4, softening) -> (tile, 3)` evaluates one
    dense i-tile against the full j-set (default: the XLA rows
    primitive; BodySystem plugs the Pallas one-sided kernel here on the
    pallas backend).

    stats is a (4,) float array:
      [0] simulated time (= macro_steps * dt_max)
      [1] force-eval ROWS actually computed (prefix boundaries + the
          macro-end synchronizations)
      [2] rows a GLOBAL dt at this ladder's deepest occupied rung would
          have computed over the same span (2^(k_max) * N per macro)
      [3] deepest occupied class over the whole rollout (k_max).

    N not a multiple of `tile` is padded internally with far-field
    zero-mass rows: zero mass keeps them out of every force sum, the
    far placement classifies them onto rung 0, and rung 0 is active
    only at macro boundaries — so padding costs one extra tile in the
    synchronized evaluations and nothing in the interior prefixes."""
    if n_classes < 1:
        raise ValueError(f"need n_classes >= 1, got {n_classes}")
    t_arr, s_count = block_schedule(n_classes)
    dt_small = dt_max / s_count
    k_range = jnp.arange(n_classes, dtype=jnp.int32)
    accel_vs = _xla_accel_vs if accel_vs_fn is None else accel_vs_fn

    def macro(pos, vel, acc, ftype):
        n = pos.shape[0]
        assert n % tile == 0  # run() pads before calling
        # classify from the synchronized force, sort smallest-dt first
        k = classify(acc, softening, eta, dt_max, n_classes)
        order = jnp.argsort(-k, stable=True)
        p = pos[order]
        v = vel[order]
        a = acc[order]
        ks = k[order]
        dt_k = (dt_max / (1 << k_range).astype(ftype))[ks]  # (N,)
        counts = jnp.bincount(ks, length=n_classes)
        # n_active for trailing-zeros t: all classes k >= K-1-t
        suffix = jnp.cumsum(counts[::-1])                   # (K,)
        row_idx = jnp.arange(n, dtype=jnp.int32)

        # opening half kick for every body (all classes start at s=0)
        v = v.at[:, :3].add(a * (dt_k * 0.5)[:, None])

        def sub(carry, t):
            p, v, rows = carry
            p = p.at[:, :3].add(v[:, :3] * ftype(dt_small))
            na = suffix[t]
            a_pref = _prefix_accel(p, na, softening, tile, accel_vs)
            active = (row_idx < na)[:, None]
            v = v.at[:, :3].add(
                jnp.where(active, a_pref * dt_k[:, None], ftype(0.0)))
            return (p, v, rows + na), None

        rows0 = jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64
                          else jnp.int32)
        (p, v, rows), _ = lax.scan(sub, (p, v, rows0),
                                   jnp.asarray(t_arr))
        # final drift to the macro boundary + synchronized closing eval
        p = p.at[:, :3].add(v[:, :3] * ftype(dt_small))
        a_end = _prefix_accel(p, jnp.int32(n), softening, tile, accel_vs)
        v = v.at[:, :3].add(a_end * (dt_k * 0.5)[:, None])
        rows = rows + n

        # unsort (row i of the sorted arrays is original body order[i])
        inv = jnp.zeros_like(order).at[order].set(row_idx)
        k_max = jnp.max(ks)
        global_rows = (1 << k_max).astype(rows.dtype) * n
        return p[inv], v[inv], a_end[inv], rows, global_rows, k_max

    def run(pos, vel, acc0):
        ftype = pos.dtype.type
        n_real = pos.shape[0]
        pad = (-n_real) % tile
        if pad:
            # far-field zero-mass rows: invisible to force sums, rung 0
            # by construction (module docstring)
            far = jnp.zeros((pad, 4), pos.dtype).at[:, 0].set(
                ftype(1e6)).at[:, 0].add(
                jnp.arange(pad, dtype=pos.dtype) * ftype(1e3))
            pos = jnp.concatenate([pos, far])
            vel = jnp.concatenate([vel, jnp.zeros((pad, 4), vel.dtype)])
            acc0 = jnp.concatenate([acc0, jnp.zeros((pad, 3), acc0.dtype)])

        def body(carry, _):
            p, v, a, rows, grows, kmax = carry
            p, v, a, r, gr, km = macro(p, v, a, ftype)
            return (p, v, a, rows + r, grows + gr,
                    jnp.maximum(kmax, km)), None

        z = jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64
                      else jnp.int32)
        (pos, vel, acc, rows, grows, kmax), _ = lax.scan(
            body, (pos, vel, acc0, z, z, jnp.int32(0)), None,
            length=macro_steps)
        if pad:
            pos, vel, acc = pos[:n_real], vel[:n_real], acc[:n_real]
        stats = jnp.stack([
            jnp.asarray(macro_steps * dt_max, pos.dtype),
            rows.astype(pos.dtype),
            grows.astype(pos.dtype),
            kmax.astype(pos.dtype),
        ])
        return pos, vel, acc, stats

    return jax.jit(run, donate_argnums=(0, 1))
