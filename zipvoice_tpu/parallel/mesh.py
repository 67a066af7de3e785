"""Device mesh and sharding helpers.

The reference scales with one-process-per-GPU DDP over NCCL
(reference zipvoice/utils/common.py:187-213, train_zipvoice.py:941-943).
TPU-native, the same thing is a ``jax.sharding.Mesh`` with the batch sharded
over a ``data`` axis: gradients are reduced by XLA-inserted collectives over
ICI/DCN, no explicit allreduce calls.  A ``model`` axis is kept in the mesh
shape for tensor-sharding larger variants; the 123M ZipVoice fits one chip so
the default is model=1 (params replicated).
"""

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[: n_data * n_model]
    )
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), batch)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
