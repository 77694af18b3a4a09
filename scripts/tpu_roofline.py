"""Measure the v5e VPU roofline that bounds the N-body hot loop.

VERDICT r1 asked for a *measured* ceiling instead of the qualitative
"VPU-bound" claim: this times dependency-free chains of the exact op mix the
interaction kernel uses (fma, mul, sub, rsqrt) on large f32 arrays, derives
per-op throughput, and prints the interactions/s ceiling the op-count model
implies for each kernel variant.

Timing uses a two-point delta (t(S2) - t(S1) for S2 > S1 scan lengths) so
the relay's per-dispatch/sync overhead (~tens of ms here) cancels exactly.

Run on the attached chip: ``python scripts/tpu_roofline.py``.
"""

import json
import time

ELEMS = 8 * 128 * 4096          # 4 Mi f32 lanes (512 vregs) — ILP-saturating
CHAIN = 64                      # fused ops per scan iteration
S1, S2 = 200, 2200              # two-point scan lengths


def measure(op_name, op, x0, a, b):
    import jax

    from nbody_tpu.utils.timing import hard_sync

    def make(scans):
        @jax.jit
        def run(x):
            def body(x, _):
                for _ in range(CHAIN):
                    x = op(x, a, b)
                return x, None
            x, _ = jax.lax.scan(body, x, None, length=scans)
            return x
        return run

    times = {}
    for scans in (S1, S2):
        run = make(scans)
        hard_sync(run(x0))  # compile + warm
        t0 = time.perf_counter()
        hard_sync(run(x0))
        times[scans] = time.perf_counter() - t0
    dt = times[S2] - times[S1]
    rate = ELEMS * CHAIN * (S2 - S1) / dt / 1e9  # G elem-ops/s
    print(f"{op_name:28s} {rate:8.1f} G op/s  (delta {dt*1e3:.1f} ms)")
    return rate


def main():
    from nbody_tpu.utils.compilation_cache import enable
    enable()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu", "roofline needs the TPU"

    x0 = jnp.full((8 * 128, ELEMS // (8 * 128)), 1.0001, jnp.float32)
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)

    # NOTE: pure mul/add chains are useless here — XLA algebraically
    # collapses x*a*...*a and x+b+...+b with scalar constants (measured
    # "37-83 T op/s"), so only chains it provably cannot fold are timed:
    # fma (non-reassociable in fp) and the rsqrt+fma renormalizer.
    rates = {
        "fma": measure("fma (x*a+b)", lambda x, a, b: x * a + b, x0, a, b),
        # rsqrt with a renormalizing fma so the value stays in range;
        # one rsqrt + one fma per element per chain step
        "rsqrt_fma": measure(
            "rsqrt+fma (rsqrt(x)*a+1)",
            lambda x, a, b: jax.lax.rsqrt(x) * a + jnp.float32(1.0),
            x0, a, b,
        ),
    }

    dev = jax.devices()[0]
    fma = rates["fma"]
    # the rsqrt chain issues 1 rsqrt + 1 fma per element-step: if they share
    # a port the rsqrt rate IS the chain rate (lower bound); if they dual
    # issue, subtract the fma slot (upper bound)
    rsqrt_lo = rates["rsqrt_fma"]
    rsqrt_hi = 1.0 / max(1.0 / rates["rsqrt_fma"] - 1.0 / fma, 1e-12)

    # op counts per interaction (ops on (TILE_I,128) vregs, from the kernels):
    #   vpu:       3 sub + 3 fma(r2) + 2 mul(inv3) + 1 mul(s) + 3 fma(acc)
    #              = 12 alu + 1 rsqrt
    #   mxu_bf16:  3 sub + 3 fma(r2) + 2 mul(inv3) + 1 cast = ~7 alu
    #              + 1 rsqrt (reduction on the MXU; j-side fold amortized)
    ceilings = {}
    for name, alu_ops in (("vpu", 12), ("mxu_bf16", 7)):
        lo = 1.0 / (alu_ops / fma + 1.0 / rsqrt_lo)
        hi = 1.0 / (alu_ops / fma + 1.0 / rsqrt_hi)
        ceilings[name] = (lo, hi)
        print(f"ceiling[{name}]: {lo:6.1f} - {hi:6.1f} G interactions/s "
              f"({alu_ops} alu + 1 rsqrt)")

    print(json.dumps({
        "device": f"{dev.platform}:{dev.device_kind}",
        "rates_gops": {k: round(v, 1) for k, v in rates.items()},
        "rsqrt_gops_bounds": [round(rsqrt_lo, 1), round(rsqrt_hi, 1)],
        "ceiling_g_interactions_per_s": {
            k: [round(lo, 1), round(hi, 1)] for k, (lo, hi) in ceilings.items()
        },
    }))


if __name__ == "__main__":
    main()
