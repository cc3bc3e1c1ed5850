"""Parallelism: device mesh + sharding specs.

The TPU-native replacement for the reference's split modes
(LLAMA_SPLIT_MODE_LAYER/ROW, llama.h:191-195) and RPC distribution: a
jax.sharding.Mesh with tensor-parallel PartitionSpecs; XLA inserts the
all-reduces the CUDA backend does by hand (ggml-cuda.cu:773-941).
"""

from .sharding import (
    kv_cache_shardings,
    make_mesh,
    param_shardings,
    shard_params,
)

__all__ = ["make_mesh", "param_shardings", "kv_cache_shardings", "shard_params"]
