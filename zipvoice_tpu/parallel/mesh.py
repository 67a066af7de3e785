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


def local_batch_rows(mesh: Mesh, global_batch: int) -> np.ndarray:
    """Global batch-row indices whose shards live on THIS process's devices
    under P('data') sharding — the rows a per-host data loader must
    materialize (ascending; every other row belongs to another host)."""
    sh = batch_sharding(mesh)
    rows = set()
    for idx in sh.addressable_devices_indices_map((global_batch,)).values():
        s = idx[0]
        rows.update(range(s.start or 0,
                          global_batch if s.stop is None else s.stop))
    return np.array(sorted(rows), np.int64)


def shard_batch_per_host(local_batch: dict, mesh: Mesh,
                         global_batch: int) -> dict:
    """Assemble a global mesh-sharded batch from per-process local rows
    (the rows from ``local_batch_rows``, ascending).  The host-side inverse
    of ``shard_batch``: no process ever holds the full batch.  Replaces the
    reference's per-rank DataLoader shards (datamodule.py:177-195)."""
    sh = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sh, x, (global_batch,) + x.shape[1:]
        )

    return jax.tree.map(put, local_batch)
