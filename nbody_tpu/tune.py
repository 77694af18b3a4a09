"""Tile auto-tuner: sweep kernel configurations on the attached chip and
cache the winner.

The reference exposes --blockSize and leaves tuning to the user
(/root/reference/src/nbody.cpp:285); a production TPU framework should
measure. ``autotune(n)`` times each (variant, tile_i, tile_j) candidate with
a hard-synced scan rollout and persists the best configuration per
(device_kind, N-bucket) in ``~/.cache/nbody_tpu/tune.json``, which
``best_config(n)`` serves back.

CLI: ``nbody-tune`` / ``python -m nbody_tpu.tune [--numbodies N]``.
"""

from __future__ import annotations

import json
import os
import pathlib
import time

DEFAULT_CANDIDATES = (
    ("vpu", 256, 1024),
    ("vpu", 128, 4096),
    ("mxu_bf16", 512, 4096),
    ("mxu_bf16", 1024, 8192),
    ("mxu_bf16", 2048, 8192),
)


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


def best_config(n: int) -> dict | None:
    """Cached best (variant, tile_i, tile_j) for this device and N-bucket."""
    entry = load_cache().get(_key(), {}).get(_bucket(n))
    return dict(entry) if entry else None


def autotune(n: int = 65536, *, steps: int = 20,
             candidates=DEFAULT_CANDIDATES, save: bool = True, log=print) -> dict:
    import jax
    import jax.numpy as jnp

    from nbody_tpu import NBodyConfig, ic
    from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
    from nbody_tpu.utils.timing import hard_sync

    if jax.default_backend() == "cpu":
        raise RuntimeError("autotune needs an accelerator (got cpu backend)")

    pos, vel = ic.generate(NBodyConfig.SHELL, n, 1.54, 8.0, seed=0)
    p, v = jnp.asarray(pos), jnp.asarray(vel)

    results = []
    for variant, ti, tj in candidates:
        def roll_fn(pp, vv, variant=variant, ti=ti, tj=tj):
            def body(s, _):
                return nbody_step_pallas(
                    *s, 0.016, 0.1, 1.0, tile_i=ti, tile_j=tj, variant=variant
                ), None
            (pp, vv), _ = jax.lax.scan(body, (pp, vv), None, length=steps)
            return pp, vv

        roll = jax.jit(roll_fn)
        try:
            out = roll(p, v)
            hard_sync(out)
            t0 = time.perf_counter()
            out = roll(p, v)
            hard_sync(out)
            dt = time.perf_counter() - t0
        except Exception as e:  # config invalid on this chip — skip it
            log(f"  {variant} ti={ti} tj={tj}: failed ({type(e).__name__})")
            continue
        gips = n * n * steps / dt * 1e-9
        log(f"  {variant} ti={ti} tj={tj}: {gips:7.1f} G interactions/s")
        results.append({"variant": variant, "tile_i": ti, "tile_j": tj,
                        "g_interactions_per_s": round(gips, 1)})

    if not results:
        raise RuntimeError("no tuning candidate succeeded")
    best = max(results, key=lambda r: r["g_interactions_per_s"])
    log(f"best: {best}")

    if save:
        cache = load_cache()
        cache.setdefault(_key(), {})[_bucket(n)] = best
        path = _cache_path()
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(cache, indent=2))
        log(f"cached to {path}")
    return best


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="nbody-tune")
    ap.add_argument("--numbodies", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-save", action="store_true")
    args = ap.parse_args(argv)
    autotune(args.numbodies, steps=args.steps, save=not args.no_save)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
