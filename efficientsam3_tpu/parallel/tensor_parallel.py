"""Tensor parallelism for the SAM3 detector via GSPMD param shardings.

The reference has no tensor parallelism (its only multi-GPU modes are DDP
training and frame-parallel inference, sam3_video_base.py); on TPU pods the
fusion encoder + DETR decoder — the detector's two hot transformer loops —
can additionally be sharded Megatron-style over an ICI 'tp' mesh axis.

This is done the XLA way: no model rewrite, only PartitionSpecs on the
weights. Column-parallel layers (q/k/v projections, MLP linear1) shard
their output features, row-parallel layers (out_proj, MLP linear2) shard
their input features, so each attention/MLP block needs a single
all-reduce on its residual write — which GSPMD inserts automatically once
the weights carry these shardings and activations are left unconstrained.

Head counts (8) and FFN widths (2048) divide typical tp sizes (2/4/8);
biases of column-parallel layers are sharded with the features, everything
else (norms, embeddings, convs, backbone, heads) stays replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# submodules whose transformer layers get tensor-sharded: the two 8-head
# detector hot loops. (The tracker's memory attention is single-head with
# 64-dim kv — head-wise splits don't apply there; it stays replicated and
# scales over the 'objects'/'frames' axes instead.)
TP_SCOPES = ("fusion_encoder", "decoder")
_COLUMN = ("q_proj", "k_proj", "v_proj", "linear1")
_ROW = ("out_proj", "linear2")


def tp_param_spec(params, tp_axis: str = "tp", scopes=TP_SCOPES):
    """PartitionSpec pytree for `params`: Megatron column/row rules inside
    `scopes`, replicated elsewhere. Works on concrete or eval_shape trees."""

    def rule(path, leaf):
        names = [str(k.key) for k in path]
        if names[0] not in scopes or getattr(leaf, "ndim", 0) == 0:
            return P()
        kind = names[-1]
        owner = names[-2] if len(names) >= 2 else ""
        if owner in _COLUMN:
            if kind == "kernel" and leaf.ndim == 2:
                return P(None, tp_axis)
            if kind == "bias" and leaf.ndim == 1:
                return P(tp_axis)
        if owner in _ROW and kind == "kernel" and leaf.ndim == 2:
            return P(tp_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh, spec=None, tp_axis: str = "tp"):
    """Place `params` on `mesh` under the tensor-parallel spec."""
    if spec is None:
        spec = tp_param_spec(params, tp_axis=tp_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec
    )


def count_sharded(spec) -> int:
    """Number of leaves with a non-trivial PartitionSpec (sanity metric)."""
    return sum(
        1 for s in jax.tree.leaves(spec, is_leaf=lambda x: isinstance(x, P))
        if any(a is not None for a in s)
    )
