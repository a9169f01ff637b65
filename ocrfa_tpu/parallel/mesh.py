"""Mesh creation and data-parallel sharding.

Replaces the reference's ``nn.DataParallel`` wrappers (utils.py:692,
detectors.py:88/182) with a 1-D device mesh: parameters replicated, the
page/line batch dimension sharded across chips.  XLA inserts all_gathers and
reduce-scatters over ICI; no hand-written transport exists or is needed
(SURVEY.md §5.8).

Multi-host extension: call ``jax.distributed.initialize()`` before
``create_mesh`` and the same code spans hosts over DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicate(pytree, mesh: Mesh):
    """Place a pytree fully-replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(pytree, sharding)


def shard_batch(x, mesh: Mesh, axis: str = DATA_AXIS):
    """Shard an array's leading (batch) dim across the mesh.

    When the batch is not divisible by the mesh size it is padded up to the
    next multiple by repeating the final row, so every batch gets real
    data parallelism (real pages produce arbitrary box counts).  The result
    may therefore have a *larger* leading dim than the input; callers that
    track the true count slice outputs back to it.
    """
    n = mesh.shape[axis]
    rem = x.shape[0] % n
    if rem:
        pad = np.repeat(np.asarray(x[-1:]), n - rem, axis=0)
        x = np.concatenate([np.asarray(x), pad], axis=0)
    return jax.device_put(x, NamedSharding(mesh, P(axis)))
