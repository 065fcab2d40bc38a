"""Multi-host bring-up: jax.distributed + global meshes over all hosts.

The reference is single-process/single-GPU (SURVEY.md §2.9/§5.8); this is
the TPU-native multi-host layer: one `jax.distributed.initialize` per
process, then a global mesh whose collectives ride ICI inside each slice
and DCN across slices. Both sharded train steps (`parallel.train` over
("data", "gauss") and `parallel.spatial` over ("tiles",)) work unchanged on
a multi-host mesh — shard_map + NamedSharding are host-count agnostic.

Typical launch (one process per host, e.g. via the TPU VM runtime):

    from stopthepop_tpu.parallel import hosts
    hosts.initialize()                    # env-driven (TPU pods: automatic)
    mesh = hosts.global_mesh(("data", "gauss"))
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op if already initialized or single
    process). On TPU pods all arguments are discovered from the environment;
    on CPU/GPU fleets pass them explicitly."""
    # NOTE: do NOT probe jax.process_count() here — it initializes the
    # (single-process) backend, after which distributed initialization is
    # impossible. Only the side-effect-free is_initialized() is safe.
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if coordinator_address is not None:
            # An explicit coordinator was requested: surface the failure
            # instead of silently running single-process.
            raise
        # Env-driven single-process run (no coordinator configured) — fine.


def global_mesh(
    axis_names: Sequence[str],
    axis_shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Mesh over every device of every host.

    With no ``axis_shape``: 1 axis gets all devices; 2 axes get
    (num_hosts, devices_per_host) — the natural DCN x ICI split, putting the
    leading axis across hosts (gradient/feature collectives on the trailing
    axis then stay on ICI).
    """
    devices = jax.devices()
    n = len(devices)
    if axis_shape is None:
        if len(axis_names) == 1:
            axis_shape = (n,)
        elif len(axis_names) == 2:
            hosts_n = jax.process_count()
            axis_shape = (hosts_n, n // hosts_n)
        else:
            raise ValueError("pass axis_shape for >2 axes")
    arr = np.array(devices).reshape(axis_shape)
    return Mesh(arr, tuple(axis_names))
