"""Device mesh + sharding utilities.

The reference's entire multi-device story is single-process
`nn.DataParallel` (`networks.py:99-106`) plus `nn.SyncBatchNorm` allreduces
(`groupmix.py:64` et al.). Here distribution is first-class: a
`Mesh(('data','spatial'))` over which pjit shards batches (data parallel,
gradient psum over ICI) and optionally the H dimension of large frames
(spatial parallel with halo exchange — the image-domain analog of sequence
parallelism; see realcamnet_tpu/parallel/spatial.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: Optional[int] = None,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data','spatial') mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
        data = n // spatial
    assert data * spatial == n, f"data*spatial={data*spatial} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, ("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(spatial_sharded: bool = False) -> P:
    """PartitionSpec for a NHWC batch: shard N over 'data' and optionally H
    over 'spatial'."""
    if spatial_sharded:
        return P("data", "spatial", None, None)
    return P("data", None, None, None)


def shard_batch(mesh: Mesh, tree, spatial_sharded: bool = False):
    """Device-put a pytree of NHWC arrays with batch (and optional H) sharding."""
    sharding = NamedSharding(mesh, batch_spec(spatial_sharded))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
