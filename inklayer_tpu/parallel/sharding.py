"""Parameter/activation sharding rules (GSPMD via PartitionSpec).

Rules are path-pattern based over the flax param tree, tuned for the ViT
families in this framework:

  * attention qkv / mlp up-projection kernels: shard the OUTPUT features over
    'tp' (head-parallel — each tp shard holds whole heads);
  * attention out-proj / mlp down-projection kernels: shard the INPUT
    features over 'tp' (XLA inserts the psum);
  * everything 2D+ additionally sharded over 'fsdp' on the largest remaining
    dimension (ZeRO-3 style weight sharding, all-gathered per layer);
  * biases / norms / small tables replicated.

Activations: batch dim over 'dp'.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex on 'a/b/c' param path, PartitionSpec builder given ndim)
_COL_PAT = re.compile(
    r".*(qkv|attn_qkv|q_proj|k_proj|v_proj|sa_[qkv]|ca_text_[qkv]|fc1|lin(ear)?1|"
    r"intermediate_dense|value_proj|values_[vl]_proj|[vl]_proj)/kernel")
_ROW_PAT = re.compile(
    r".*(proj|attn_proj|out_proj|sa_out|ca_text_out|fc2|lin(ear)?2|"
    r"output_dense|output_proj|out_[vl]_proj)/kernel")


def spec_for_param(path: str, ndim: int, shape=None) -> P:
    """PartitionSpec for one parameter."""
    if ndim < 2:
        return P()
    if _COL_PAT.match(path):
        # (in, out) -> shard out over tp, in over fsdp
        if ndim == 2:
            return P("fsdp", "tp")
        return P(*([None] * (ndim - 2)), "fsdp", "tp")
    if _ROW_PAT.match(path):
        if ndim == 2:
            return P("tp", "fsdp")
        return P(*([None] * (ndim - 2)), "tp", "fsdp")
    # default: fsdp on the last axis (usually the large feature dim)
    return P(*([None] * (ndim - 1)), "fsdp")


def param_sharding_rules(params, mesh: Mesh):
    """Tree of NamedShardings matching `params`, skipping axes whose size
    does not divide the mesh axis."""
    def one(path, leaf):
        keys = [str(getattr(p, "key", p)) for p in path]
        spec = spec_for_param("/".join(keys), np.ndim(leaf))
        # drop mesh axes that don't divide the dim
        parts = []
        for i, ax in enumerate(spec):
            if ax is None:
                parts.append(None)
                continue
            dim = np.shape(leaf)[i + (np.ndim(leaf) - len(spec))]
            if dim % mesh.shape[ax] == 0:
                parts.append(ax)
            else:
                parts.append(None)
        return NamedSharding(mesh, P(*parts)) if parts else NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    shardings = param_sharding_rules(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
