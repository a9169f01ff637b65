"""Device mesh setup and sharding helpers (the 'communication backend').

The reference's only parallelism is ``torch.nn.DataParallel``
(single-process scatter/gather, SURVEY.md §2.7).  The TPU-native equivalent
is a ``jax.sharding.Mesh`` over all chips with batch-dim sharding; XLA emits
the ICI/DCN collectives.
"""

from ocrfa_tpu.parallel.mesh import create_mesh, replicate, shard_batch

__all__ = ["create_mesh", "replicate", "shard_batch"]
