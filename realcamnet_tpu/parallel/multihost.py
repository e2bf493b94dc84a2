"""Multi-host initialization: ICI within a slice, DCN across hosts.

The reference's multi-device story is single-process DataParallel
(`networks.py:99-106`); here multi-host pods initialize through
`jax.distributed` and the same pjit programs scale across hosts — XLA routes
intra-slice collectives over ICI and cross-host ones over DCN (SURVEY.md
§5.8). Call `initialize()` once per process before any jax computation.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or standard env vars.

    No-ops on single-process setups (no coordinator configured).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is not None or "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def global_batch_sharding(mesh, spatial: bool = False):
    """Sharding for per-host batch shards assembled into a global array."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P("data", "spatial", None, None) if spatial else P("data", None, None, None)
    return NamedSharding(mesh, spec)


def host_local_to_global(mesh, tree, spatial: bool = False):
    """Assemble per-host numpy shards into globally-sharded jax.Arrays
    (multi-host data loading: each host loads its own batch slice)."""
    sharding = global_batch_sharding(mesh, spatial)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, tree)
