"""Measure the blocked ds Newton's-third-law composition above
DS_SYM_MAX_N: one-sided ds vs blocked ds sym at N=65536 (2 blocks),
plus on-chip accuracy vs the one-sided ds step. One JSON line each."""

import json
import sys

import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.params import DEMO_PARAMS
from nbody_tpu.utils.compilation_cache import enable as enable_cache
from nbody_tpu.utils.timing import delta_time_rolls

N = 65536
ITERS = 8


def main():
    enable_cache()
    params = DEMO_PARAMS[0]
    from nbody_tpu.ops.ds_kernel import (
        _scal_ds,
        ds_from_f64,
        ds_to_f64,
        nbody_step_pallas_ds,
        nbody_step_pallas_ds_sym_blocked,
    )

    pos, vel = ic.generate(NBodyConfig.SHELL, N, params.cluster_scale,
                           params.velocity_scale, seed=42,
                           dtype=np.float64)
    ph, plo = ds_from_f64(pos)
    vh, vlo = ds_from_f64(vel)
    scal = _scal_ds(params.time_step, params.softening, params.damping)
    scal_qa = _scal_ds(1e-3, params.softening, params.damping)

    # accuracy: one dt=1e-3 step, blocked sym vs one-sided ds
    a = nbody_step_pallas_ds_sym_blocked(ph, plo, vh, vlo, scal_qa)
    b = nbody_step_pallas_ds(ph, plo, vh, vlo, scal_qa)
    dd = float(np.abs(ds_to_f64(a[0], a[1]) - ds_to_f64(b[0], b[1])).max())
    print(json.dumps({"check": "ds_blocked_vs_onesided_1step", "n": N,
                      "max_dpos": dd}))
    sys.stdout.flush()
    assert dd <= 1e-10

    def one_sided(*s):
        return nbody_step_pallas_ds(*s, scal)

    ms = delta_time_rolls(one_sided, (ph, plo, vh, vlo), iters=ITERS,
                          rolls=3)
    print(json.dumps({"kernel": "ds_one_sided", "n": N,
                      "g_int_per_s": round(N * N * 1e-6 / ms, 2)}))
    sys.stdout.flush()

    for tj in (512, 1024, 2048):
        def blocked(*s, tj=tj):
            return nbody_step_pallas_ds_sym_blocked(*s, scal, tile_j=tj)
        ms = delta_time_rolls(blocked, (ph, plo, vh, vlo), iters=ITERS,
                              rolls=3)
        print(json.dumps({"kernel": "ds_sym_blocked", "n": N, "tile_j": tj,
                          "g_int_per_s": round(N * N * 1e-6 / ms, 2)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
