"""Measure the scan-step launch component of the ring cost model's t_hop.

A real ppermute hop needs >= 2 devices (a 1-device self-permute is elided
by XLA — measured: the chain collapses to identity). What IS measurable on
one chip is the per-scan-iteration launch overhead that dominates t_hop's
on-chip component: delta-timed scans (4112 vs 16 iterations, best of 3 so
one-sided relay noise cancels) of a minimal non-foldable body on a
shard-sized array.

Measured on the attached v5e: |per-iteration delta| < 1 us at 4096- and
16384-row shards — the launch component is BELOW the relay noise floor,
i.e. sub-microsecond. Consequence for the cost model: t_hop ~ 5 us
(parallel/sharded.py) is dominated by the ICI-side components (wire/switch
latency + async collective setup), which genuinely need a pod to measure;
the on-chip part is measured to be negligible. The other assumed constant
is ici_bw ~ 45 GB/s/link (docs/ROADMAP.md).
"""

import sys
import time

sys.path.insert(0, ".")

from nbody_tpu.utils.compilation_cache import enable

enable()

import jax
import jax.numpy as jnp

from nbody_tpu.utils.timing import hard_sync


def main():
    a = jnp.float32(1.0000001)

    def make(k):
        @jax.jit
        def run(x):
            def body(c, _):
                return c * a, None
            c, _ = jax.lax.scan(body, x, None, length=k)
            return c
        return run

    for n in (4096, 16384):
        x = jnp.ones((n, 4), jnp.float32)
        times = {}
        for k in (16, 4112):
            run = make(k)
            hard_sync(run(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                hard_sync(run(x))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        per = (times[4112] - times[16]) / (4112 - 16)
        print(f"scan-step launch + ({n},4) multiply: {per*1e6:.2f} us/iter")


if __name__ == "__main__":
    main()
