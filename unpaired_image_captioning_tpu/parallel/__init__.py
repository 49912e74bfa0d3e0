"""Scale-out: device mesh construction + sharding rules (pjit/shard_map).

The reference's only parallelism is single-process `torch.nn.DataParallel`
(trainer.py:74,88-89; SURVEY.md §2.10). The TPU-native equivalent is a
jit-compiled step over a `jax.sharding.Mesh`: batch sharded over the 'data'
axis (gradients all-reduced by XLA over ICI), optional 'model' axis sharding
the wide LSTM gate matrices and vocab projections (tensor parallel)."""

from .mesh import (batch_sharding, make_mesh, param_sharding, replicate,
                   shard_batch)
