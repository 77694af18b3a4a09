"""Where do the missing ~10% go at N=65536? Decompose the bench loop.

Measures, at the official bench shape (N=65536, ti=64, tj=32768, vpu):
  a) single-step dispatch throughput (PARITY r2 recorded 205 G int/s)
  b) scan-of-25 throughput (bench.py's loop; r2 recorded ~197 G)
  c) the per-step (N,4)->(4,N) transpose+pad cost in isolation
  d) N-scaling at fixed tiles (65k..1M) to separate i-block-boundary
     overhead (scales with blocks) from per-step overhead (scales with steps)
"""

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
from nbody_tpu.utils.timing import hard_sync, time_steps

P = DEMO_PARAMS[0]
TI, TJ = 64, 32768


def make_state(n):
    pos, vel = ic.generate(NBodyConfig.SHELL, n, P.cluster_scale,
                           P.velocity_scale, seed=42)
    return jnp.asarray(pos), jnp.asarray(vel)


def step(p, v):
    return nbody_step_pallas(p, v, P.time_step, P.softening, P.damping,
                             tile_i=TI, tile_j=TJ, variant="vpu")


def bench_single(n, iters=25):
    p, v = make_state(n)
    ms, _ = time_steps(step, (p, v), iters=iters, warmup=2)
    return n * n * iters / ms * 1e3 / 1e9, ms / iters


def bench_scan(n, iters=25):
    p0, v0 = make_state(n)

    @jax.jit
    def roll(p, v):
        def body(s, _):
            return step(*s), None
        (p, v), _ = jax.lax.scan(body, (p, v), None, length=iters)
        return p, v

    ms = min(time_steps(lambda p, v: roll(p, v), (p0, v0), iters=1,
                        warmup=1 if i == 0 else 0)[0] for i in range(3))
    return n * n * iters / ms * 1e3 / 1e9, ms / iters


def bench_transpose(n, iters=100):
    p, _ = make_state(n)

    @jax.jit
    def tr(p):
        return p.T.sum(axis=1)  # forces the materialized layout change

    ms, _ = time_steps(lambda x: (tr(x), p)[1:], (p,), iters=0, warmup=0)
    # time a scan of transposes to avoid dispatch noise
    @jax.jit
    def roll(p):
        def body(c, _):
            q = c.T
            # feed a scalar back so the transpose isn't dead code, keep
            # carry shape
            return c + q[0, 0] * 0, None
        c, _ = jax.lax.scan(body, p, None, length=iters)
        return c

    t0 = time.perf_counter()
    hard_sync(roll(p))
    t0 = time.perf_counter()
    hard_sync(roll(p))
    ms = (time.perf_counter() - t0) * 1e3
    return ms / iters


def main():
    n = 65536
    g1, ms1 = bench_single(n)
    print(f"single-step  N={n}: {g1:.1f} G int/s ({ms1:.2f} ms/step)", flush=True)
    g2, ms2 = bench_scan(n)
    print(f"scan-of-25   N={n}: {g2:.1f} G int/s ({ms2:.2f} ms/step)", flush=True)
    mst = bench_transpose(n)
    print(f"transpose    N={n}: {mst:.3f} ms per (N,4)->(4,N)", flush=True)
    for n2 in (131072, 262144):
        g, ms = bench_scan(n2, iters=8)
        print(f"scan-of-8    N={n2}: {g:.1f} G int/s ({ms:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
