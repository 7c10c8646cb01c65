"""Device mesh + sharding helpers.

The reference's distribution substrate is HF Accelerate DDP + raw
torch.distributed all_reduce inside the quantizer (reference:
favae_scripts/train_favae.py:344-347, models/l2_quantize.py:82-115,291-295).
The TPU-native equivalent is one SPMD mesh: the train step is written in
global-view jnp, the batch is sharded over the 'dp' axis, parameters and
codebook state are replicated, and XLA inserts the gradient/stat reductions
over ICI automatically. A 'tp' axis is available for the CAT transformer's
tensor parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D data-parallel mesh by default; pass axes/shape for dp x tp."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'dp', replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh sharded along 'dp'.

    Single-host: a plain device_put with the dp sharding. Multi-host: each
    process holds only its own shard of the global batch (the data pipeline
    shards by process), so assemble a global array from the process-local
    data — after this, every jnp reduction inside the jitted step/eval is a
    true GLOBAL reduction (the SPMD equivalent of the reference's
    accelerator.gather at favae_scripts/train_favae.py:210-219)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when running under a multi-host launcher
    (JAX_COORDINATOR_ADDRESS / megascale env present). Safe no-op otherwise —
    single-host SPMD needs nothing."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass  # already initialized or misconfigured; single-host fallback
