"""Multi-host (multi-slice) initialization.

The reference is single-host only (SURVEY §1-L3: pmap over local devices).
For pod-scale runs, call `initialize_multihost()` once per process before
any backend use; `make_mesh` then spans all hosts' devices and the same
jit programs scale — XLA routes collectives over ICI within a slice and
DCN across slices.  No user-level communication backend (the NCCL analog
the reference pins) is needed.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """jax.distributed.initialize with env-based autodetection (TPU pods
    populate the arguments automatically). Returns topology info.

    Safe to call on single-host setups: initialization is skipped when no
    coordinator can be inferred and only one process exists.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except ValueError:
        # autodetection found no cluster env: genuine single-host run —
        # but if the caller EXPECTED a cluster, that is an error
        if num_processes not in (None, 1):
            raise
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise  # real coordinator failure must not silently degrade
            # a pod run into independent single-host training
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }
