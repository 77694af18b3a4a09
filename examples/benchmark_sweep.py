"""Benchmark sweep across N, kernel variants, and solver families.

Usage: python examples/benchmark_sweep.py [N ...]

Covers the exact Pallas variants (vpu / mxu_bf16) and the fast solvers
(pm / p3m) so the O(N^2)-vs-O(N) crossover is visible in one table.
"""

import sys

from nbody_tpu.compute import Compute

sizes = [int(a) for a in sys.argv[1:]] or [16384, 65536]
rows = [("pallas", "vpu"), ("pallas", "mxu_bf16"), ("pm", "-"), ("p3m", "-")]

print(f"{'N':>9} {'kernel':>7} {'variant':>9} {'ms/step':>9} "
      f"{'G int/s':>9} {'GFLOP/s':>9}")
for n in sizes:
    for kernel, variant in rows:
        kw = {"variant": variant} if kernel == "pallas" else {}
        try:
            c = Compute(num_bodies=n, cycle_demo=False, backend=kernel,
                        log=lambda *a: None, **kw)
            r = c.run_benchmark(10)
        except Exception as e:
            print(f"{n:>9} {kernel:>7} {variant:>9}  failed: {e}")
            continue
        if kernel in ("pm", "p3m"):
            # N^2-convention rates are fictitious for O(N) solvers — only
            # ms/step is comparable across rows
            print(f"{n:>9} {kernel:>7} {variant:>9} "
                  f"{r['milliseconds']/10:>9.2f} {'-':>9} {'-':>9}")
        else:
            print(f"{n:>9} {kernel:>7} {variant:>9} {r['milliseconds']/10:>9.2f} "
                  f"{r['interactions_per_second_e9']:>9.1f} {r['gflops']:>9.0f}")
