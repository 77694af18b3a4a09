"""Tile auto-tuner: sweep kernel configurations on the attached chip and
cache the winner — across EVERY kernel family, not just the euler force.

The reference exposes --blockSize and leaves tuning to the user
(/root/reference/src/nbody.cpp:285); a production TPU framework should
measure. ``autotune(n, family=...)`` times each candidate with a
hard-synced scan rollout and persists the best configuration per
(device_kind, family, N-bucket) in ``~/.cache/nbody_tpu/tune.json``,
which ``best_config(n, family=...)`` serves back.

Families and their consumers:

* ``euler``       — the fp32 force kernels (vpu/mxu/sym). Consumed by
                    BodySystem variant='auto' (steps + leapfrog accel).
* ``hermite``     — the fp32 fused accel+jerk kernels (one-sided vs the
                    Newton's-third-law blocked composition). Consumed by
                    BodySystem._accel_jerk_closure.
* ``ds``          — the double-single euler kernels (one-sided vs sym).
* ``ds_leapfrog`` — the fused ds DKD kernel (tile sweep; no sym form).
* ``ds_hermite``  — the ds accel+jerk kernels (one-sided vs sym).
                    The ds families are consumed by DSBodySystem.
* ``p3m``         — the block-sparse short-range pair-tile edge ``blk``
                    (bucketed by CAPACITY, not N: probe and engine both
                    resolve blk through ops.p3m_kernel.p3m_kernel_blk, so
                    the cached winner keeps them consistent by
                    construction).

Drift gate: only the euler family carries arithmetic-changing variants
(mxu_bf16's reduced-precision accumulation); its candidates must match
the exact-fp32 vpu anchor's energy drift over DRIFT_GATE_STEPS. Every
other family's candidates share their family's arithmetic exactly
(sym re-orders the same fp32/ds sums), so speed can never buy a
different simulation there by construction.

CLI: ``nbody-tune [--family F | --all]`` /
``python -m nbody_tpu.tune [--numbodies N]``.
"""

from __future__ import annotations

import json
import os
import pathlib
import time

DEFAULT_CANDIDATES = (
    ("sym", 64, 4096),      # Newton's-third-law kernel (any N, blocked)
    ("sym", 64, 8192),
    ("vpu", 64, 32768),
    ("vpu", 64, 8192),
    ("vpu", 128, 4096),
    ("vpu", 256, 1024),
    ("mxu_bf16", 512, 4096),
    ("mxu_bf16", 1024, 8192),
)

# measured champions bracket each sweep (provenance: the r3/r4 hand
# sweeps whose winners these families' compile-time defaults froze —
# ops/symmetric_kernel.py, ops/ds_kernel.py tile comments)
FAMILY_CANDIDATES = {
    "euler": DEFAULT_CANDIDATES,
    "hermite": (
        ("sym", 64, 1024),
        ("sym", 64, 2048),
        ("sym", 64, 4096),
        ("one_sided", 32, 16384),
        ("one_sided", 32, 8192),
        ("one_sided", 64, 8192),
    ),
    "ds": (
        ("sym", 64, 512),
        ("sym", 64, 1024),
        ("sym", 64, 2048),
        ("one_sided", 64, 2048),
        ("one_sided", 64, 4096),
        ("one_sided", 64, 8192),
    ),
    "ds_leapfrog": (
        ("one_sided", 64, 1024),
        ("one_sided", 64, 2048),
        ("one_sided", 64, 4096),
    ),
    "ds_hermite": (
        ("sym", 64, 512),
        ("sym", 64, 1024),
        ("sym", 64, 2048),
        ("one_sided", 64, 1024),
        ("one_sided", 64, 2048),
    ),
    # blk sweep; candidates are (blk,) tuples
    "p3m": ((128,), (256,), (512,)),
}

# Drift gate: a candidate only qualifies if its relative energy drift over
# DRIFT_GATE_STEPS steps agrees with the exact-fp32 `vpu` anchor to within
# max(DRIFT_GATE_ABS, DRIFT_GATE_REL * |anchor drift|) — the same shape of
# criterion as the oracle drift check (compute.drift_check), so speed can
# never silently buy a different simulation (VERDICT r1 §2).
#
# Constants set from the measured N=65536 table (PARITY.md "Long-horizon
# drift"): at 1,000 steps mxu_bf16 deviates 4.0% from the vpu anchor and by
# 10,000 steps it has exploded (drift +1471 vs +0.75) — bf16 reduction noise
# stochastically heats the system. mxu (3-pass) deviates 0.2%. A 1,000-step
# window at 2% cleanly rejects the former and passes the latter; 100 steps
# (0.4% deviation) would NOT have caught it.
DRIFT_GATE_STEPS = 1000
DRIFT_GATE_REL = 0.02
DRIFT_GATE_ABS = 5e-4

FAMILIES = tuple(FAMILY_CANDIDATES)


def _cache_path() -> pathlib.Path:
    root = pathlib.Path(os.environ.get("XDG_CACHE_HOME", "~/.cache")).expanduser()
    return root / "nbody_tpu" / "tune.json"


def _bucket(n: int) -> str:
    b = 1 << max(n - 1, 1).bit_length()  # next power of two
    return str(b)


def _key() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{d.device_kind}"


def load_cache() -> dict:
    p = _cache_path()
    if p.exists():
        try:
            return json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return {}
    return {}


def best_config(n: int, family: str = "euler") -> dict | None:
    """Cached best candidate for this device, family, and N-bucket.

    Schema: cache[device][family][bucket]. Pre-family caches (r3) stored
    euler winners flat under cache[device][bucket]; those are still
    served for family='euler' so an existing tuned chip keeps its
    winner."""
    dev = load_cache().get(_key(), {})
    entry = dev.get(family, {}).get(_bucket(n)) if isinstance(
        dev.get(family), dict) else None
    if entry is None and family == "euler":
        legacy = dev.get(_bucket(n))
        if isinstance(legacy, dict) and "variant" in legacy:
            entry = legacy
    return dict(entry) if entry else None


def _gate_by_drift(results, drift_of, *, log=print) -> list:
    """Qualifying candidates, fastest first, stopping at the first pass.

    ``drift_of(variant, tile_i, tile_j)`` returns the relative energy drift
    over DRIFT_GATE_STEPS steps. vpu candidates pass by definition (they ARE
    the anchor kernel); others must match the anchor's drift to within
    max(DRIFT_GATE_ABS, DRIFT_GATE_REL * |anchor|). Candidates are walked in
    descending speed order and the walk STOPS at the first qualifier —
    slower candidates can never win, and each skipped drift test saves
    ~DRIFT_GATE_STEPS on-device steps plus a multi-minute remote compile.
    The anchor rollout itself only runs if a non-vpu candidate leads."""
    anchor = None
    bound = None
    gated = []
    for r in sorted(results, key=lambda r: -r["g_interactions_per_s"]):
        if r["variant"] in ("vpu", "sym"):
            # vpu IS the anchor; sym is the same exact-fp32 arithmetic per
            # interaction (each pair once — measured drift delta 3.5e-4 vs
            # a 1.3e-2 bound, r3) — both pass by definition, skipping two
            # multi-minute remote compiles per autotune run
            r["drift_delta"] = 0.0
            gated.append(r)
            break
        if anchor is None:
            anchor = drift_of("vpu", 64, 8192)
            bound = max(DRIFT_GATE_ABS, DRIFT_GATE_REL * abs(anchor))
            log(f"drift gate: vpu anchor {anchor:+.3e}, bound {bound:.1e} "
                f"over {DRIFT_GATE_STEPS} steps")
        delta = abs(drift_of(r["variant"], r["tile_i"], r["tile_j"]) - anchor)
        r["drift_delta"] = round(delta, 8)
        if delta <= bound:
            gated.append(r)
            break
        log(f"  REJECTED {r['variant']} ti={r['tile_i']} "
            f"tj={r['tile_j']}: drift delta {delta:.2e} > {bound:.1e}")
    if not gated:
        raise RuntimeError("every tuning candidate failed the drift gate")
    return gated


def _make_family_harness(family: str, n: int):
    """(state0, make_step) for a family: state0 is the rollout carry,
    make_step(candidate) -> step(*state) -> state."""
    import jax.numpy as jnp
    import numpy as np

    from nbody_tpu import NBodyConfig, ic

    dt, soft, damp = 0.016, 0.1, 1.0

    if family in ("ds", "ds_leapfrog", "ds_hermite"):
        from nbody_tpu.ops.ds_kernel import (
            _scal_ds,
            _scal_ds_hermite,
            _scal_ds_leapfrog,
            ds_from_f64,
            nbody_step_pallas_ds,
            nbody_step_pallas_ds_hermite,
            nbody_step_pallas_ds_leapfrog,
            nbody_step_pallas_ds_sym_blocked,
        )

        pos, vel = ic.generate(NBodyConfig.SHELL, n, 1.54, 8.0, seed=0,
                               dtype=np.float64)
        ph, pl = ds_from_f64(pos)
        vh, vl = ds_from_f64(vel)
        scal = {"ds": _scal_ds, "ds_leapfrog": _scal_ds_leapfrog,
                "ds_hermite": _scal_ds_hermite}[family](dt, soft, damp)
        state0 = (jnp.asarray(ph), jnp.asarray(pl),
                  jnp.asarray(vh), jnp.asarray(vl))

        def make_step(cand):
            variant, ti, tj = cand
            if family == "ds":
                if variant == "sym":
                    def step(*s):
                        return nbody_step_pallas_ds_sym_blocked(
                            *s, scal, tile_i=ti, tile_j=tj)
                else:
                    def step(*s):
                        return nbody_step_pallas_ds(*s, scal, tile_i=ti,
                                                    tile_j=tj)
            elif family == "ds_leapfrog":
                def step(*s):
                    return nbody_step_pallas_ds_leapfrog(*s, scal,
                                                         tile_i=ti,
                                                         tile_j=tj)
            else:  # ds_hermite
                def step(*s):
                    return nbody_step_pallas_ds_hermite(
                        *s, scal, tile_i=ti, tile_j=tj,
                        sym=variant == "sym")
            return step

        return state0, make_step, {}

    if family == "p3m":
        from nbody_tpu.ops.p3m import nbody_step_p3m, p3m_max_occupancy
        from nbody_tpu.ops.p3m_kernel import p3m_pair_count

        pos, vel = ic.generate(NBodyConfig.SHELL, n, 1.54, 8.0, seed=0)
        p, v = jnp.asarray(pos), jnp.asarray(vel)
        # BodySystem's auto-size rule: max occupancy + 50%, multiple of 8
        occ = int(p3m_max_occupancy(p, grid=64))
        cap = max(8, -(-int(occ * 1.5 + 1) // 8) * 8)

        def make_step(cand):
            (blk,) = cand
            budget = int(p3m_pair_count(p, grid=64, capacity=cap,
                                        blk=blk)) + 64

            def step(pp, vv):
                pp, vv, _ = nbody_step_p3m(
                    pp, vv, dt, soft, damp, grid=64, capacity=cap,
                    short_range="pallas", pair_budget=budget, blk=blk)
                return pp, vv
            return step

        # the winner is consumed through p3m_kernel_blk(capacity), so it
        # is cached under the CAPACITY bucket, not the N bucket
        return (p, v), make_step, {"bucket_value": cap}

    pos, vel = ic.generate(NBodyConfig.SHELL, n, 1.54, 8.0, seed=0)
    state0 = (jnp.asarray(pos), jnp.asarray(vel))

    if family == "hermite":
        from nbody_tpu.ops.pallas_kernel import compute_accel_jerk_pallas
        from nbody_tpu.ops.reference import nbody_step_hermite
        from nbody_tpu.ops.symmetric_kernel import (
            compute_accel_jerk_symmetric_blocked,
        )

        def make_step(cand):
            variant, ti, tj = cand
            if variant == "sym":
                def aj(p4, v4):
                    return compute_accel_jerk_symmetric_blocked(
                        p4, v4, soft, tile_i=ti, tile_j=tj)
            else:
                def aj(p4, v4):
                    return compute_accel_jerk_pallas(p4, v4, p4, v4, soft,
                                                     tile_i=ti, tile_j=tj)

            def step(pp, vv):
                return nbody_step_hermite(pp, vv, dt, soft, damp,
                                          accel_jerk_fn=aj)
            return step

        return state0, make_step, {}

    # euler
    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.ops.symmetric_kernel import nbody_step_symmetric_blocked

    def make_step(cand):
        variant, ti, tj = cand
        if variant == "sym":
            # any N, at the same block_cap policy BodySystem ships (the
            # half cap wins the top of the single-triangle range): the
            # tuned tile is measured on the kernel shape it will run on
            from nbody_tpu.ops.symmetric_kernel import sym_default_dispatch

            cap = sym_default_dispatch(n)[0]

            def step(pp, vv):
                return nbody_step_symmetric_blocked(pp, vv, dt, soft, damp,
                                                    tile_i=ti, tile_j=tj,
                                                    block_cap=cap)
        else:
            def step(pp, vv):
                return nbody_step_pallas(pp, vv, dt, soft, damp,
                                         tile_i=ti, tile_j=tj,
                                         variant=variant)
        return step

    return state0, make_step, {}


def _cand_record(family: str, cand, gips: float) -> dict:
    if family == "p3m":
        return {"blk": cand[0], "g_interactions_per_s": round(gips, 1)}
    variant, ti, tj = cand
    return {"variant": variant, "tile_i": ti, "tile_j": tj,
            "g_interactions_per_s": round(gips, 1)}


def autotune(n: int = 65536, *, family: str = "euler", steps: int = 20,
             candidates=None, save: bool = True,
             drift_gate: bool = True, log=print) -> dict:
    import jax

    from nbody_tpu.utils.timing import hard_sync

    if family not in FAMILY_CANDIDATES:
        raise ValueError(f"unknown family {family!r}; one of {FAMILIES}")
    if jax.default_backend() == "cpu":
        raise RuntimeError("autotune needs an accelerator (got cpu backend)")
    if candidates is None:
        candidates = FAMILY_CANDIDATES[family]

    state0, make_step, harness_meta = _make_family_harness(family, n)

    def make_roll(step, length):
        def roll_fn(*state):
            def body(s, _):
                return step(*s), None
            state, _ = jax.lax.scan(body, state, None, length=length)
            return state
        return jax.jit(roll_fn)

    # hermite runs 2 force evals/step: count interactions accordingly so
    # family rates are comparable to their own kernels' published numbers
    evals = 2 if family in ("hermite", "ds_hermite") else 1

    results = []
    for cand in candidates:
        try:
            roll = make_roll(make_step(cand), steps)
            out = roll(*state0)
            hard_sync(out)
            t0 = time.perf_counter()
            out = roll(*state0)
            hard_sync(out)
            dtime = time.perf_counter() - t0
        except Exception as e:  # config invalid on this chip — skip it
            log(f"  {family} {cand}: failed ({type(e).__name__})")
            continue
        gips = n * n * steps * evals / dtime * 1e-9
        log(f"  {family} {cand}: {gips:7.1f} G interactions/s")
        results.append(_cand_record(family, cand, gips))

    if not results:
        raise RuntimeError("no tuning candidate succeeded")

    if drift_gate and family == "euler":
        # only the euler family carries arithmetic-changing variants
        # (mxu_bf16); see module docstring
        import jax.numpy as jnp

        from nbody_tpu import NBodyConfig, ic
        from nbody_tpu.ops.energy import kinetic_energy
        from nbody_tpu.ops.pallas_kernel import potential_energy_pallas

        pos, vel = ic.generate(NBodyConfig.SHELL, n, 1.54, 8.0, seed=0)
        p, v = jnp.asarray(pos), jnp.asarray(vel)

        def energy_f32(pp, vv):
            return float(kinetic_energy(pp, vv)
                         + potential_energy_pallas(pp, 0.1))

        def drift_of(variant, ti, tj):
            roll = make_roll(make_step((variant, ti, tj)),
                             DRIFT_GATE_STEPS)
            e0 = energy_f32(p, v)
            out = roll(p, v)
            hard_sync(out)
            return (energy_f32(*out) - e0) / abs(e0)

        results = _gate_by_drift(results, drift_of, log=log)

    best = max(results, key=lambda r: r["g_interactions_per_s"])
    log(f"best[{family}]: {best}")

    if save:
        cache = load_cache()
        dev = cache.setdefault(_key(), {})
        fam = dev.get(family)
        if not isinstance(fam, dict):
            fam = dev[family] = {}
        fam[_bucket(harness_meta.get("bucket_value", n))] = best
        path = _cache_path()
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(cache, indent=2))
        # consumers that memoize cache READS must see the new winner in
        # this same process (notebook/driver flows: tune, then rebuild)
        from nbody_tpu.ops.p3m_kernel import _tuned_blk

        _tuned_blk.cache_clear()
        log(f"cached to {path}")
    return best


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="nbody-tune")
    ap.add_argument("--numbodies", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--family", choices=FAMILIES, default="euler",
                    help="kernel family to sweep (see module docstring)")
    ap.add_argument("--all", action="store_true",
                    help="sweep every family at this N")
    ap.add_argument("--no-save", action="store_true")
    ap.add_argument("--no-drift-gate", action="store_true",
                    help="skip the energy-drift-vs-vpu qualification pass")
    args = ap.parse_args(argv)
    families = FAMILIES if args.all else (args.family,)
    for family in families:
        autotune(args.numbodies, family=family, steps=args.steps,
                 save=not args.no_save,
                 drift_gate=not args.no_drift_gate)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
