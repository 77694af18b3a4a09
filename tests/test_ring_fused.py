"""Fused Pallas ring kernel tests (interpret mode, virtual 8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import NBodyConfig, ic
from nbody_tpu.ops.reference import compute_accel_xla, nbody_step_xla
from nbody_tpu.ops.ring_kernel import ring_accel_fused
from nbody_tpu.parallel import make_mesh, make_sharded_step, shard_state

SOFT = 0.1


def _accel_via_mesh(pos, ndev, tile_i=64):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(ndev)

    def local(p):
        return ring_accel_fused(p, SOFT, axis="bodies", ndev=ndev,
                                tile_i=tile_i, interpret=True)

    f = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=P("bodies", None),
        out_specs=P("bodies", None), check_vma=False,
    ))
    ps = jax.device_put(jnp.asarray(pos), NamedSharding(mesh, P("bodies", None)))
    return np.asarray(f(ps))


@pytest.mark.parametrize("ndev,n", [(2, 512), (8, 2048)])
def test_ring_fused_accel_matches_xla(ndev, n):
    pos, _ = ic.generate(NBodyConfig.SHELL, n, 1.52, 2.0, seed=3)
    acc = _accel_via_mesh(pos, ndev)
    ref = np.asarray(compute_accel_xla(jnp.asarray(pos), SOFT))
    np.testing.assert_allclose(acc, ref, atol=5e-4, rtol=1e-4)


def test_ring_fused_step_via_strategy(random_state_tiny):
    pos, vel = random_state_tiny
    mesh = make_mesh(8)
    step = make_sharded_step(
        mesh, kernel="pallas", strategy="ring_fused", tile_i=8, interpret=True
    )
    ps, vs = shard_state(mesh, pos, vel)
    p1, v1 = step(ps, vs, 0.001, SOFT, 1.0)
    ref_p, ref_v = nbody_step_xla(jnp.asarray(pos), jnp.asarray(vel), 0.001, SOFT, 1.0)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ref_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_v), atol=1e-5)


def test_ring_fused_requires_pallas_kernel():
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="ring_fused"):
        make_sharded_step(mesh, kernel="xla", strategy="ring_fused")


def test_ring_fused_nonmultiple_shards_padded():
    """M=100 per shard is not a lane multiple: zero-mass padding must keep
    results exact."""
    pos, _ = ic.generate(NBodyConfig.SHELL, 8 * 100, 1.5, 2.0, seed=0)
    acc = _accel_via_mesh(pos, 8, tile_i=32)
    ref = np.asarray(compute_accel_xla(jnp.asarray(pos), SOFT))
    np.testing.assert_allclose(acc, ref, atol=5e-4, rtol=1e-4)


def test_compiled_ring_fused_rounds_tiles_to_lane_multiple():
    """Compiled (non-interpret) ring_fused must round tile_i UP to a 128
    multiple — Mosaic otherwise dies late on the unaligned accumulator store
    ('cannot statically prove index is a multiple of 128', found r2
    on-chip), and the framework DEFAULT tile_i=64 must keep working."""
    from nbody_tpu.ops.ring_kernel import _resolve_tile_i

    assert _resolve_tile_i(64, 4096, interpret=False) == 128   # the default
    assert _resolve_tile_i(8, 4096, interpret=False) == 128
    assert _resolve_tile_i(256, 4096, interpret=False) == 256  # already aligned
    assert _resolve_tile_i(200, 4096, interpret=False) == 256  # clamp+round
    assert _resolve_tile_i(256, 64, interpret=False) == 128    # tiny shard
    # interpret mode keeps small tiles (CI runs 8-body tiles on the CPU mesh)
    assert _resolve_tile_i(8, 64, interpret=True) == 8
    assert _resolve_tile_i(256, 64, interpret=True) == 64
