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
