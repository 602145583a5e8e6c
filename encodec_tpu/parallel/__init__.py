"""Device-mesh / sharding helpers (the TPU-native distrib layer).

Replaces the reference's torch.distributed side-band machinery
(encodec/distrib.py: sync_grad, sync_buffer, broadcast_tensors,
average_metrics) with declarative sharding: the train step is jitted over a
`Mesh` with the batch sharded along the `data` axis and parameters/EMA state
replicated. XLA inserts the gradient psums over ICI; the quantizer's EMA
statistics are computed from globally-reduced batch moments inside the same
program, so every replica's state update is identical by construction — no
broadcasts, no buffer syncs, no deadlock guards.
"""

from .pp import (  # noqa: F401
    lm_forward_batch_pp,
    make_lm_pp_train_step,
    shard_stacked_layers,
    stack_lm_layers,
)
from .mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    make_hybrid_mesh,
    initialize_multihost,
    batch_sharding,
    replicated,
    shard_batch,
)
