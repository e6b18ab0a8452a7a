"""Device mesh and sharding helpers.

The RADAE model fits on one chip (~1.7M params), so parallelism targets the
*data* axes the reference never had (SURVEY §2.7): utterance batches and
channel-realisation grids (SNR x channel class).  We use a 1-D "dp" mesh by
default — batch rows sharded across chips, parameters replicated — with XLA
inserting the psum for the loss/grad reduction.  The channel-grid eval
(evaluate_loop) reuses the same mesh with one grid cell per device row.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "dp", batch_axis: int = 0):
    """Place a batch pytree with its batch axis sharded over the mesh.

    batch_axis=1 handles stacked multi-step batches (scan, B, ...) from
    make_train_step(scan_steps=N): the scan axis stays replicated-in-time
    while B is sharded."""
    spec = P(*([None] * batch_axis + [axis]))
    sharding = NamedSharding(mesh, spec)

    def put(x):
        return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, tree)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp"):
    return NamedSharding(mesh, P(axis))
