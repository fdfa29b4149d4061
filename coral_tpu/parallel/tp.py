"""Tensor-parallel sharding rules for the "model" mesh axis.

The reference has no tensor parallelism (SPMD story = DeepSpeed ZeRO-2 data
parallelism only; SURVEY.md section 2.3). Here TP is a set of parameter
PartitionSpecs: attention heads and the FFN hidden dimension shard over the
"model" axis, and GSPMD inserts the all-reduces where the row-parallel
projections (out_proj / fc2) contract the sharded dimension — the Megatron
column/row-parallel pattern without hand-written collectives.

The same path-based rules apply to the optimizer state: optax's Adam moments
are param-shaped subtrees, so the parameter path appears inside the optimizer
leaf path and matches the same rule.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_MODEL

# (path regex, spec builder) — first match wins. ndim-aware: stacked per-layer
# tensors carry a leading (L,) axis, handled by right-aligning the spec.
_TP_RULES: list[tuple[re.Pattern, tuple]] = [
    # Column-parallel: outputs shard over the model axis.
    (re.compile(r"attention.*(q_proj|k_proj|v_proj).*kernel"), (None, AXIS_MODEL)),
    (re.compile(r"attention.*(q_proj|k_proj|v_proj).*bias"), (AXIS_MODEL,)),
    (re.compile(r"self_attn.*(q_proj|k_proj|v_proj).*kernel"), (None, AXIS_MODEL)),
    (re.compile(r"self_attn.*(q_proj|k_proj|v_proj).*bias"), (AXIS_MODEL,)),
    (re.compile(r"encoder_attn.*(q_proj|k_proj|v_proj).*kernel"),
     (None, AXIS_MODEL)),
    (re.compile(r"encoder_attn.*(q_proj|k_proj|v_proj).*bias"), (AXIS_MODEL,)),
    # Row-parallel: inputs shard; GSPMD all-reduces the contraction.
    (re.compile(r"(attention|self_attn|encoder_attn).*out_proj.*kernel"),
     (AXIS_MODEL, None)),
    # FFN: hidden dimension shards (column- then row-parallel).
    (re.compile(r"(feed_forward.*intermediate_dense|fc1).*kernel"),
     (None, AXIS_MODEL)),
    (re.compile(r"(feed_forward.*intermediate_dense|fc1).*bias"), (AXIS_MODEL,)),
    (re.compile(r"(feed_forward.*output_dense|fc2).*kernel"), (AXIS_MODEL, None)),
]


def _spec_for(path: str, ndim: int) -> P:
    for pattern, partial_spec in _TP_RULES:
        if pattern.search(path):
            if ndim < len(partial_spec):
                return P()
            # Right-align: leading axes (the stacked layer axis) stay unsharded.
            return P(*([None] * (ndim - len(partial_spec)) + list(partial_spec)))
    return P()


def tp_shardings(tree, mesh: Mesh):
    """Tensor-parallel NamedShardings for a parameter (or optimizer) pytree.

    Leaves that no rule matches (norms, convs, embeddings, scalars) replicate.
    Matched dimensions must divide the model-axis extent, else the leaf
    replicates too (e.g. a tiny CTC head).
    """
    mp = mesh.shape[AXIS_MODEL]

    def leaf_sharding(path, leaf):
        path_str = jax.tree_util.keystr(path)
        shape = getattr(leaf, "shape", ())
        spec = _spec_for(path_str, len(shape))
        for dim, axis in enumerate(spec):
            if axis is not None and shape[dim] % mp != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def tp_zero_shardings(tree, mesh: Mesh, min_size: int = 2**14):
    """2D sharding for optimizer state under tensor parallelism.

    TP-matched leaves keep their Megatron specs; everything else large enough
    shards its leading dimension over the data axis (the ZeRO-2 role), so the
    Adam moments never replicate across either mesh axis unnecessarily.
    """
    from .mesh import AXIS_DATA

    dp = mesh.shape[AXIS_DATA]
    mp = mesh.shape[AXIS_MODEL]

    def leaf_sharding(path, leaf):
        path_str = jax.tree_util.keystr(path)
        shape = getattr(leaf, "shape", ())
        spec = _spec_for(path_str, len(shape))
        ok = all(
            axis is None or shape[dim] % mp == 0
            for dim, axis in enumerate(spec)
        )
        if ok and any(axis is not None for axis in spec):
            return NamedSharding(mesh, spec)
        size = 1
        for dim in shape:
            size *= dim
        if shape and size >= min_size and shape[0] % dp == 0:
            return NamedSharding(
                mesh, P(*([AXIS_DATA] + [None] * (len(shape) - 1)))
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)
