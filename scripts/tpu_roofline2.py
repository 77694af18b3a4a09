"""Corrected v5e VPU ceiling: dual-issue + rsqrt-port measurement.

The r2 roofline (tpu_roofline.py) timed SERIAL chains: one fma per element
per step, ILP only across vregs. Its 2.21 T op/s "fma peak" is refuted by
the kernel itself (220 G int/s x 12 booked ALU ops = 2.64 T op/s of useful
work), so the model must measure, not assume:

  1. ALU issue width — K independent fma chains interleaved per element
     step (K=1,2,3,4). If K=2 runs ~2x K=1, one chain was not saturating
     the ports.
  2. rsqrt concurrency — bodies issuing 1 rsqrt + M independent fmas per
     element step (M=0,2,4,8,12). If rsqrt runs on its own pipe, chain
     time is max(M/R_alu, 1/R_rsqrt), and the M-sweep shows a plateau
     until M/R_alu crosses 1/R_rsqrt; if it shares ALU ports, time grows
     linearly from M=0.

Ceiling for the vpu kernel (12 ALU + 1 rsqrt per interaction):
  shared ports:   1 / (12/R_alu + 1/R_rsqrt)
  separate pipes: 1 / max(12/R_alu, 1/R_rsqrt)

Two-point delta timing throughout (relay fixed cost cancels).
"""

import json
import time

ELEMS = 8 * 128 * 4096
CHAIN = 32
S1, S2 = 100, 1100


def _time_body(body, carries):
    """Time CHAIN applications of `body` per scan step, two-point delta.
    Returns seconds per (element * CHAIN * step)."""
    import jax

    from nbody_tpu.utils.timing import hard_sync

    def make(scans):
        @jax.jit
        def run(args):
            def step(c, _):
                for _ in range(CHAIN):
                    c = body(c)
                return c, None
            c, _ = jax.lax.scan(step, args, None, length=scans)
            return c
        return run

    times = {}
    for scans in (S1, S2):
        run = make(scans)
        hard_sync(run(carries))
        t0 = time.perf_counter()
        hard_sync(run(carries))
        times[scans] = time.perf_counter() - t0
    return (times[S2] - times[S1]) / ((S2 - S1) * CHAIN * ELEMS)


def main():
    from nbody_tpu.utils.compilation_cache import enable
    enable()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu", "roofline needs the TPU"

    shape = (8 * 128, ELEMS // (8 * 128))
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)

    def carries(k):
        return tuple(jnp.full(shape, 1.0001 + 0.01 * i, jnp.float32)
                     for i in range(k))

    out = {"issue_width": {}, "rsqrt_mix": {}}

    # 1. ALU issue width: K independent fma chains
    print("— ALU issue width (K independent fma chains) —", flush=True)
    for k in (1, 2, 3, 4):
        def body(c, k=k):
            return tuple(x * a + b for x in c)
        sec = _time_body(body, carries(k))
        rate = k / sec / 1e12
        out["issue_width"][k] = round(rate, 3)
        print(f"  K={k}: {rate:6.2f} T fma/s total", flush=True)

    r_alu = max(out["issue_width"].values()) * 1e12

    # 2. rsqrt + M independent fmas per element step
    print("— rsqrt concurrency (1 rsqrt + M fmas per step) —", flush=True)
    for m in (0, 2, 4, 8, 12):
        nrest = min(m, 4)
        reps = m // nrest if nrest else 0

        def body(c, reps=reps):
            x, rest = c[0], c[1:]
            x = jax.lax.rsqrt(x) * a + jnp.float32(1.0)  # renormalize
            new_rest = []
            for y in rest:
                for _ in range(reps):
                    y = y * a + b
                new_rest.append(y)
            return (x, *new_rest)

        sec = _time_body(body, carries(1 + nrest))
        # per element-step: 1 rsqrt + 1 fma (renorm) + m fmas
        chain_rate = 1.0 / sec / 1e9
        out["rsqrt_mix"][m] = round(chain_rate, 1)
        print(f"  M={m:2d}: {chain_rate:7.1f} G rsqrt-steps/s", flush=True)

    # interpretation
    r_rsqrt_serial = out["rsqrt_mix"][0] * 1e9  # incl. 1 renorm fma
    r_with_12 = out["rsqrt_mix"][12] * 1e9
    shared = 1.0 / (13.0 / r_alu + 1.0 / r_rsqrt_serial)
    separate = 1.0 / max(13.0 / r_alu, 1.0 / r_rsqrt_serial)
    print(f"ALU peak: {r_alu/1e12:.2f} T op/s")
    print(f"rsqrt(+renorm fma) serial: {r_rsqrt_serial/1e9:.1f} G/s")
    print(f"measured 1 rsqrt + 13 fma: {r_with_12/1e9:.1f} G/s "
          f"(shared-port model {shared/1e9:.1f}, "
          f"separate-pipe model {separate/1e9:.1f})")
    # the vpu kernel: 12 alu + 1 rsqrt per interaction == the M=12 body
    # (its renorm fma is the 12th alu op), so r_with_12 IS the measured
    # ceiling for the vpu op mix
    print(f"vpu-mix ceiling (measured): {r_with_12/1e9:.1f} G interactions/s")
    out["alu_peak_tops"] = round(r_alu / 1e12, 3)
    out["vpu_mix_ceiling_g"] = round(r_with_12 / 1e9, 1)
    dev = jax.devices()[0]
    out["device"] = f"{dev.platform}:{dev.device_kind}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
