"""Body-sharded simulation over a device mesh.

Usage:
    python examples/multichip_sim.py --cpu    # virtual 8-device CPU mesh
    python examples/multichip_sim.py          # whatever devices are attached
"""

import os
import sys

if "--cpu" in sys.argv:
    # must happen before any backend initializes (env vars alone can lose to
    # a sitecustomize that pre-imports jax)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.parallel import make_mesh, make_sharded_step, shard_state
from nbody_tpu.parallel.sharded import make_sharded_rollout

ndev = len(jax.devices())
mesh = make_mesh(ndev)
n = 1024 * ndev
pos, vel = ic.generate(NBodyConfig.SHELL, n, 1.54, 8.0, seed=42)
ps, vs = shard_state(mesh, pos, vel)

kernel = "xla" if jax.default_backend() == "cpu" else "pallas"
step = make_sharded_step(mesh, kernel=kernel, strategy="allgather")
rollout = make_sharded_rollout(step, steps=10)
ps, vs = rollout(ps, vs, 0.016, 0.1, 1.0)
jax.block_until_ready((ps, vs))
print(f"{n} bodies over {ndev} {jax.default_backend()} devices x 10 steps: "
      f"finite={bool(np.isfinite(np.asarray(ps)).all())}")

# --- 2-D (rows x cols) force decomposition: the pod-scale strategy ---
if ndev % 2 == 0:
    from nbody_tpu.parallel import make_mesh_2d, make_sharded_step_2d

    mesh2d = make_mesh_2d(2, ndev // 2)
    p2, v2 = shard_state(mesh2d, pos, vel, axis=("rows", "cols"))
    step2d = make_sharded_step_2d(mesh2d, kernel=kernel)
    p2, v2 = step2d(p2, v2, 0.016, 0.1, 1.0)
    jax.block_until_ready((p2, v2))
    print(f"2-D decomposition (2x{ndev // 2}): "
          f"finite={bool(np.isfinite(np.asarray(p2)).all())}")

# --- sharded P3M fast mode with the distributed-FFT long range ---
from nbody_tpu.ops.p3m import make_sharded_p3m_step

from nbody_tpu.ops.p3m import p3m_max_occupancy

occ = int(p3m_max_occupancy(np.asarray(pos, np.float32), grid=32))
cap = max(8, -(-int(occ * 1.5 + 1) // 8) * 8)   # auto-size like BodySystem
p3m = make_sharded_p3m_step(mesh, grid=32, capacity=cap, fft="slab")
p3, v3 = p3m(*shard_state(mesh, pos, vel), 0.016, 0.1, 1.0)
jax.block_until_ready((p3, v3))
print(f"sharded P3M + slab FFT: "
      f"finite={bool(np.isfinite(np.asarray(p3)).all())}")
