"""Sharding rules: replicated parameters, ZeRO-sharded optimizer state.

The reference reaches optimizer-state sharding through DeepSpeed ZeRO-2
(reference: ``makefile:82-83``). The TPU-native equivalent is to give the optimizer
state a sharding that splits each moment tensor along the data axis and let XLA
place the reduce-scatter/all-gather collectives — no wrapper engine involved.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DATA

# Leaves smaller than this stay replicated: sharding tiny tensors costs more in
# collective latency than it saves in HBM.
MIN_SHARD_SIZE = 2**14


def replicated(mesh: Mesh) -> NamedSharding:
    """A fully-replicated sharding."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard a batch tensor along the data axis at position ``axis``."""
    spec = [None] * (axis + 1)
    spec[axis] = AXIS_DATA
    return NamedSharding(mesh, P(*spec))


def zero_shardings(tree, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """ZeRO-style shardings for an optimizer-state (or param) pytree.

    Each leaf is sharded along its first axis divisible by the data-axis extent
    (largest-axis first would fragment layouts; first-divisible keeps the layer
    stacking axis of scanned modules intact). Small or indivisible leaves stay
    replicated.
    """
    dp = mesh.shape[AXIS_DATA]

    def leaf_sharding(leaf) -> NamedSharding:
        shape = getattr(leaf, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if dp == 1 or size < min_size:
            return NamedSharding(mesh, P())
        for axis, dim in enumerate(shape):
            if dim % dp == 0 and dim >= dp:
                spec = [None] * len(shape)
                spec[axis] = AXIS_DATA
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, tree)


def host_batch_to_global(batch: dict, shardings: dict):
    """Host-replicated eval batch -> global sharded arrays (multi-process).

    Single-process: returns the batch untouched (jit's implicit transfer
    handles it). Multi-process: every host holds the SAME full batch; each
    contributes its own row slice so the jitted computation sees one global
    array — the multi-host counterpart of the reference's
    ``dispatch_batches=False`` eval feeding (src/coral/whisper.py:227-230).
    Outputs of multi-process eval steps must be replicated (see the
    ``out_shardings`` at the predictor jits) so every host can fetch them.
    """
    world = jax.process_count()
    if world == 1:
        return batch
    pid = jax.process_index()

    def to_global(name: str, v):
        rows = v.shape[0]
        if rows % world:
            raise ValueError(
                f"eval batch rows ({rows}) not divisible by process count "
                f"({world}); pad eval batches to the global batch size"
            )
        local = rows // world
        return jax.make_array_from_process_local_data(
            shardings[name], v[pid * local:(pid + 1) * local]
        )

    return {k: to_global(k, v) for k, v in batch.items()}
