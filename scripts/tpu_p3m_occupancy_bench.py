"""P3M short-range layout benchmark on occupancy-skewed states (r2).

Reproduces the PARITY.md numbers for the i-subtile worklist + j-capacity
classes: a collapsed shell at N=1M/G=128 auto-sizes to capacity=1000 and
ran 10.06 s per force eval on the one-dense-tile-per-cell layout; the
occupancy-adaptive worklist runs it in ~1.9 s (5.3x). Also times the
TSC-assignment overhead (~7%).

Run on the attached TPU (single process — the tunnel is single-client):
    python scripts/tpu_p3m_occupancy_bench.py
"""

import time

import jax
import jax.numpy as jnp

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.p3m import p3m_accel, p3m_max_occupancy
from nbody_tpu.utils.timing import hard_sync

N, G = 1_048_576, 128


def bench(pos, cap, **kw):
    f = jax.jit(lambda p: p3m_accel(p, 0.1, grid=G, capacity=cap, **kw)[0])
    a = f(pos)
    hard_sync(a)
    t0 = time.perf_counter()
    for _ in range(3):
        a = f(pos)
    hard_sync(a)
    return (time.perf_counter() - t0) / 3 * 1e3


def pallas_budget(pos, cap):
    from nbody_tpu.ops.p3m import p3m_kernel_blk
    from nbody_tpu.ops.p3m_kernel import p3m_pair_count

    blk = p3m_kernel_blk(cap)
    return int(int(p3m_pair_count(pos, grid=G, capacity=cap, blk=blk)) * 1.25)


def main() -> int:
    for label, scales in (("collapsed shell", (4.0, 5.0)),
                          ("random ball", (6.0, 8.0))):
        cfg = NBodyConfig.SHELL if "shell" in label else NBodyConfig.RANDOM
        pos, _ = ic.generate(cfg, N, *scales, seed=42)
        pos = jnp.asarray(pos)
        occ = int(p3m_max_occupancy(pos, grid=G))
        cap = max(8, -(-int(occ * 1.5 + 1) // 8) * 8)
        ms_cic = bench(pos, cap)
        ms_tsc = bench(pos, cap, assignment="tsc")
        ms_pl = bench(pos, cap, short_range="pallas",
                      pair_budget=pallas_budget(pos, cap))
        print(f"{label}: N={N} G={G} max_occ={occ} cap={cap} -> "
              f"cic {ms_cic:.0f} ms, tsc {ms_tsc:.0f} ms, "
              f"pallas-sr {ms_pl:.0f} ms per force eval")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
