"""Tensor-parallel parameter shardings over the 'model' mesh axis.

The reference has no tensor parallelism (SURVEY.md §2.11 — single-node DDP
only); this module is the TPU-native scale-up story: Megatron-style
column/row-parallel sharding of the HiFi-GAN channel dimension and the
transformer attention/FFN projections, expressed as `PartitionSpec`s on the
parameter pytree. XLA's SPMD partitioner propagates the activation shardings
and inserts the all-reduces over ICI — no hand-written collectives.

Layout rules (axis = cfg.mesh.model_axis, applied only when the target dim
is divisible by the axis size):

HiFi-GAN generator (param layouts documented in models/hifigan.py):
  - conv_pre            column-parallel: v (Co,Ci,K) dim0, g dim0, b dim0
  - ups_i (tconv)       column-parallel on output: v (Ci,Co,K) dim1, b dim0;
                        g is per-*input*-channel (Ci,1,1) -> dim0
  - resblock convs1_i   column-parallel (v dim0, g dim0, b dim0)
  - resblock convs2_i   row-parallel (v dim1 = Ci); g/b replicated
  - conv_post           row-parallel (v dim1 = Ci); 1 output channel

Acoustic-model transformer:
  - self_attn linear_q/k/v   kernel (d,d) dim1 (head-parallel), bias dim0
  - self_attn linear_out     kernel dim0 (row-parallel), bias replicated
  - feed_forward w_1         conv kernel (K,Ci,Co) dim2, bias dim0
  - feed_forward w_2         conv kernel dim1 (row-parallel), bias replicated

MPD discriminator towers: column-parallel on every convs_i (v dim0, g dim0,
b dim0); conv_post replicated (1 channel). The MSD stacks use grouped convs
(feature_group_count up to 16) whose channel/group interaction does not
partition cleanly on one axis — they stay replicated (they are <15% of
discriminator FLOPs).

Everything else (embeddings, layer norms, variance predictors, aligner,
spectral-norm state, optimizer scalars) is replicated.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, GetAttrKey, SequenceKey


def _path_names(path) -> list:
    names = []
    for k in path:
        if isinstance(k, DictKey):
            names.append(str(k.key))
        elif isinstance(k, GetAttrKey):
            names.append(str(k.name))
        elif isinstance(k, SequenceKey):
            names.append(str(k.idx))
    return names


def _div(shape, dim: int, size: int) -> bool:
    return 0 <= dim < len(shape) and shape[dim] % size == 0 and shape[dim] >= size


def _spec_dim(ndim: int, dim: int, axis: str) -> P:
    return P(*(axis if i == dim else None for i in range(ndim)))


def param_partition_spec(path, leaf, axis: str, size: int) -> P:
    """PartitionSpec for one parameter (or optimizer-moment) leaf.

    Matches on the flax module-path names, so it applies equally to
    g_params/d_params and to the optax mu/nu trees that mirror them.
    """
    if size <= 1 or not hasattr(leaf, "shape") or leaf.ndim == 0:
        return P()
    names = _path_names(path)
    shape = leaf.shape
    leaf_name = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""

    def col(dim_v: int):
        # column-parallel conv: v/g/b all sharded on the output channel
        if leaf_name == "v" and _div(shape, dim_v, size):
            return _spec_dim(leaf.ndim, dim_v, axis)
        if leaf_name in ("g", "b") and _div(shape, 0, size):
            return _spec_dim(leaf.ndim, 0, axis)
        return P()

    # ---- HiFi-GAN generator ------------------------------------------
    if "generator" in names:
        if parent == "conv_pre":
            return col(0)
        if parent.startswith("ups_"):
            # tconv: v (Ci, Co, K) -> output dim1; g is per-input-channel
            if leaf_name == "v" and _div(shape, 1, size):
                return _spec_dim(leaf.ndim, 1, axis)
            if leaf_name in ("g", "b") and _div(shape, 0, size):
                return _spec_dim(leaf.ndim, 0, axis)
            return P()
        if parent.startswith("convs1_"):
            return col(0)
        if parent.startswith("convs2_") or parent == "conv_post":
            # row-parallel: shard the contraction (input-channel) dim of v
            if leaf_name == "v" and _div(shape, 1, size):
                return _spec_dim(leaf.ndim, 1, axis)
            return P()
        return P()

    # ---- MPD discriminator towers ------------------------------------
    if any(n.startswith("mpd_") for n in names):
        if parent.startswith("convs_"):
            return col(0)
        return P()

    # ---- acoustic-model transformer -----------------------------------
    if "self_attn" in names:
        if parent in ("linear_q", "linear_k", "linear_v"):
            if leaf_name == "kernel" and _div(shape, 1, size):
                return _spec_dim(leaf.ndim, 1, axis)
            if leaf_name == "bias" and _div(shape, 0, size):
                return _spec_dim(leaf.ndim, 0, axis)
        elif parent == "linear_out":
            if leaf_name == "kernel" and _div(shape, 0, size):
                return _spec_dim(leaf.ndim, 0, axis)
        return P()
    if "feed_forward" in names:
        if "w_1" in names:
            if leaf_name == "kernel" and _div(shape, leaf.ndim - 1, size):
                return _spec_dim(leaf.ndim, leaf.ndim - 1, axis)
            if leaf_name == "bias" and _div(shape, 0, size):
                return _spec_dim(leaf.ndim, 0, axis)
        elif "w_2" in names:
            # conv kernel (K, Ci, Co): shard the contraction dim
            if leaf_name == "kernel" and leaf.ndim >= 2 and _div(
                shape, leaf.ndim - 2, size
            ):
                return _spec_dim(leaf.ndim, leaf.ndim - 2, axis)
        return P()

    return P()


def tree_shardings(tree: Any, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding pytree for a parameter / optimizer-state tree."""
    size = mesh.shape.get(model_axis, 1)

    def f(path, leaf):
        return NamedSharding(
            mesh, param_partition_spec(path, leaf, model_axis, size)
        )

    return jax.tree_util.tree_map_with_path(f, tree)


def replicated_like(tree: Any, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: repl, tree)


def count_partitioned(tree: Any, shardings: Any) -> int:
    """Number of parameters that are actually partitioned (for tests/logs)."""
    total = 0
    for leaf, sh in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(shardings)
    ):
        if isinstance(sh, NamedSharding) and any(
            s is not None for s in sh.spec
        ):
            total += leaf.size
    return total
