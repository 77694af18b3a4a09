"""Multi-host (DCN) initialization helpers.

A TPU pod slice spanning hosts needs ``jax.distributed.initialize`` before
any backend use; afterwards the same body-sharded mesh/steps in
``nbody_tpu.parallel`` work unchanged — XLA routes intra-slice collectives
over ICI and cross-host traffic over DCN (SURVEY.md §5). Single-process
multi-chip needs none of this.

Untested here (this environment has one chip); kept deliberately thin: all
simulation logic is host-count-agnostic because state is a sharded
jax.Array and steps are shard_map programs.
"""

from __future__ import annotations

import jax


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> int:
    """Initialize jax.distributed (no-op if already initialized).

    With no arguments, relies on the TPU environment's auto-detection.
    Returns the global device count.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    return len(jax.devices())


def is_multihost() -> bool:
    return jax.process_count() > 1
