"""r5 item 4: sweep the p3m tune family ON-CHIP across capacity buckets.

`nbody-tune --family p3m` (tune.py:253-280) existed since r4 but had never
run against the hardware it was built for — the default short-range pair
tile still came from the hand-measured 128-vs-256 note at N=1M/cap=1000
(ops/p3m_kernel.py::p3m_kernel_blk). This script runs the real autotune at
the four N that land in four distinct CAPACITY buckets (the p3m family
buckets by capacity, not N, so probe and engine resolve the same blk):

    N=16384   -> cap=120  -> bucket 128
    N=65536   -> cap=496  -> bucket 512
    N=262144  -> cap=1712 -> bucket 2048
    N=1048576 -> cap=6680 -> bucket 8192

and prints the winner per bucket plus the full candidate table, ready to
paste into PARITY (row: p3m autotune) and to freeze into the
p3m_kernel_blk compile-time heuristic if the winners disagree with it.

Run (ONE TPU process at a time): python scripts/tpu_r5_p3m_tune.py
"""

import json

import jax

from nbody_tpu.tune import autotune, load_cache

assert jax.default_backend() != "cpu", "needs the TPU attachment"

table = {}
for n, steps in ((16384, 20), (65536, 20), (262144, 20), (1048576, 10)):
    print(f"=== N={n} (steps={steps}) ===", flush=True)
    best = autotune(n, family="p3m", steps=steps)
    table[n] = best

print("\nwinners by N:")
print(json.dumps(table, indent=2))
print("\ncache p3m section:")
cache = load_cache()
for dev, fams in cache.items():
    if isinstance(fams, dict) and "p3m" in fams:
        print(dev, json.dumps(fams["p3m"], indent=2))
