"""Parameter sharding rules (tensor parallelism for the CAT GPT).

The FA-VAE side is pure data parallelism (parity with the reference's DDP).
The CAT transformer additionally supports Megatron-style tensor parallelism
over a 'tp' mesh axis: the Q projection and first FF matmul are sharded
column-wise (output dim), the output projection and second FF matmul row-wise
(input dim), so each block needs exactly one all-reduce per sublayer — XLA
GSPMD inserts it from the sharding constraints. The single-head K/V
projections are tiny (dim_head wide) and stay replicated, which is what makes
multi-query attention cheap to tensor-shard.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gpt_param_pspec(path, leaf) -> P:
    keys = [getattr(p, "key", "") for p in path]
    name = keys[-1] if keys else ""
    if name != "kernel":
        return P()  # embeddings, norms, biases, null_kv: replicated
    # scanned layer stacks carry a leading (n_layer,) axis on every leaf
    lead = (None,) * (getattr(leaf, "ndim", 2) - 2)
    if "to_q" in keys or "fc1" in keys:
        return P(*lead, None, "tp")   # column parallel
    if "to_out" in keys or "fc2" in keys:
        return P(*lead, "tp", None)   # row parallel
    return P()                        # to_kv, cond_proj: replicated


def gpt_param_shardings(params: Any, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, gpt_param_pspec(path, x)), params)


def shard_gpt_params(params: Any, mesh: Mesh):
    sh = gpt_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
