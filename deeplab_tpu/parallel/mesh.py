"""Device mesh + sharding layout.

The reference's entire parallelism story is single-host data parallelism via
``keras.utils.multi_gpu_model`` (utils.py:209-211).  Here parallelism is
mesh-native: a 2-D ``('data', 'space')`` mesh where the batch shards over
'data' and, optionally, the image height shards over 'space' (XLA's SPMD
partitioner inserts conv halo exchanges automatically).  Gradient reduction
is the psum XLA inserts for sharded-batch grads — riding ICI, no NCCL.

Everything degrades gracefully to a 1x1 mesh on a single chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices: Optional[Sequence] = None, data: Optional[int] = None,
             space: int = 1) -> Mesh:
    """Build a ('data', 'space') mesh.  Defaults: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // space
    assert data * space == len(devices), (
        f"{len(devices)} devices != data({data}) * space({space})")
    import numpy as np
    arr = np.array(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def data_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Batch tensors: shard batch over 'data' (and H over 'space' if used).
    Layout (B, H, W, C) or (B, N) / (B, N, 1) for flattened labels."""
    if spatial:
        return NamedSharding(mesh, P("data", "space"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the data-parallel layout."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def get_available_devices(kind: str = "tpu"):
    """Reference utils.py:94-96 analogue: list accelerator devices."""
    import jax
    return [d for d in jax.devices() if kind in d.platform.lower()
            or kind == "all"]
