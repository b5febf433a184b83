"""Parallelism: device mesh, sharding rules, distributed FFT.

The reference is single-device with no communication layer (SURVEY §5);
here the backend is XLA collectives over ICI/DCN via jit/GSPMD +
``shard_map``, mesh axes ("data", "seq", "model").
"""

from fft_tpu.parallel.mesh import (
    make_mesh, lm_state_shardings, lm_batch_sharding, lm_param_shardings,
    shardings_for_tree,
)
from fft_tpu.parallel.multihost import distributed_init, is_primary

__all__ = ["make_mesh", "lm_state_shardings", "lm_batch_sharding",
           "lm_param_shardings", "shardings_for_tree", "distributed_init",
           "is_primary"]
