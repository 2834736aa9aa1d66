"""Multi-chip data parallelism over a 1-D ICI mesh.

The reference has NO distributed capability (SURVEY §2.4: no NCCL/MPI/
torch.distributed anywhere in the tree — concurrency is two CUDA streams and
a host thread pool). The TPU-native scaling story for this workload is
batch(ray)-sharded data parallelism: the model (~12 M params, hash table
dominated) is replicated, each chip marches and shades its own slice of the
ray batch against its slice of the sample budget, and the gradient is one
`psum` that XLA lowers onto ICI. No other collective is needed; the
occupancy-grid refresh shards over cells the same way.

Loss decomposition keeping single-chip semantics exact:
  global = Σ_dev [ (color+mask)_dev ] / R_global + ek_w · Σ_dev ek_dev
so each device computes its partial with the GLOBAL ray count as the
normalizer and one psum of grads reproduces the single-chip gradient.

The shard_map'd step and occupancy-refresh bodies live in
`parallel.trainer.ParallelTrainer` (the product path — a train.Trainer
subclass that inherits the whole host loop); this module keeps the mesh
construction they share.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))
