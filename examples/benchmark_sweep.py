"""Benchmark sweep across N and kernel variants; prints a table.

Usage: python examples/benchmark_sweep.py [N ...]
"""

import sys

from nbody_tpu.compute import Compute

sizes = [int(a) for a in sys.argv[1:]] or [16384, 65536]
variants = ["vpu", "mxu_bf16"]

print(f"{'N':>9} {'variant':>9} {'ms/step':>9} {'G int/s':>9} {'GFLOP/s':>9}")
for n in sizes:
    for variant in variants:
        c = Compute(num_bodies=n, cycle_demo=False, variant=variant,
                    log=lambda *a: None)
        r = c.run_benchmark(10)
        print(f"{n:>9} {variant:>9} {r['milliseconds']/10:>9.2f} "
              f"{r['interactions_per_second_e9']:>9.1f} {r['gflops']:>9.0f}")
