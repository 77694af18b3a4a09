"""Round-3 bench-shape sweep: close the N=65536 gap (197 G -> >=200 G int/s).

The same vpu kernel measures 221.5 G int/s at N=1M but 197 G at the official
bench shape N=65536 (PARITY.md). Hypothesis: per-i-block prologue/epilogue
overhead — at (64, 32768) tiles the j-extent gives only nj=2 grid steps per
i-block, so half of all grid steps carry the zero/reduce/integrate work and
the i-boundary DMA latency, vs 1/32 of steps at N=1M.

Levers swept here (VERDICT r2 item 2):
  * tile_i up (fewer i-blocks -> fewer epilogues), now that lane_chunk can
    restore ILP independently of tile_i,
  * lane_chunk 256/512 (wider unrolled slices, fewer slice ops),
  * tile_j = 65536 (nj=1) — previously uncompilable at lane_chunk=128
    (512-chunk unroll); wider chunks shorten the program 2-4x.

Usage: python scripts/tpu_r3_sweep.py  (requires the attached TPU; ~minutes
of remote compiles on first run, cached after).
"""

import json
import sys
import time

sys.path.insert(0, ".")

from nbody_tpu.utils.compilation_cache import enable

enable()

import jax
import jax.numpy as jnp

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.ops.pallas_kernel import nbody_step_pallas
from nbody_tpu.utils.timing import time_steps

N = 65536
ITERS = 25

CONFIGS = [
    # (tile_i, tile_j, lane_chunk)
    (64, 32768, 128),   # r2 champion (baseline)
    (64, 32768, 256),
    (64, 32768, 512),
    (128, 32768, 128),
    (128, 32768, 256),
    (96, 32768, 128),
    (64, 65536, 256),   # nj=1: single j-visit per i-block
    (64, 65536, 512),
    (128, 65536, 512),
    (256, 65536, 512),
]


def main():
    params = DEMO_PARAMS[0]
    pos, vel = ic.generate(NBodyConfig.SHELL, N, params.cluster_scale,
                           params.velocity_scale, seed=42)
    p0, v0 = jnp.asarray(pos), jnp.asarray(vel)

    results = []
    for ti, tj, lc in CONFIGS:
        def step(p, v, ti=ti, tj=tj, lc=lc):
            return nbody_step_pallas(p, v, params.time_step, params.softening,
                                     params.damping, tile_i=ti, tile_j=tj,
                                     variant="vpu", lane_chunk=lc)

        @jax.jit
        def roll(p, v, step=step):
            def body(state, _):
                return step(*state), None
            (p, v), _ = jax.lax.scan(body, (p, v), None, length=ITERS)
            return p, v

        label = f"ti={ti} tj={tj} lc={lc}"
        try:
            t0 = time.time()
            ms = min(
                time_steps(lambda p, v: roll(p, v), (p0, v0), iters=1,
                           warmup=1 if i == 0 else 0)[0]
                for i in range(3)
            )
        except Exception as e:  # compile failures are data, not crashes
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            results.append({"ti": ti, "tj": tj, "lc": lc, "error": True})
            continue
        gint = N * N * ITERS / ms * 1e3 / 1e9
        print(f"{label}: {ms:.1f} ms  {gint:.1f} G int/s "
              f"({gint*20:.0f} GFLOP/s)  [compile+run {time.time()-t0:.0f}s]",
              flush=True)
        results.append({"ti": ti, "tj": tj, "lc": lc, "ms": round(ms, 2),
                        "g_int_s": round(gint, 1)})

    print(json.dumps(results))


if __name__ == "__main__":
    main()
