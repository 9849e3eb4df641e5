"""Shared model components: node/edge type embeddings (reference
models/protein_gnn.py:86-152 and molecule_gnn.py:73-140)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class TypeEmbedding(nn.Module):
    """nn.Embedding when emb_dim is set, one-hot otherwise (reference
    protein_gnn.py:122-133). One-hot is the trained config (emb_dim=None)."""

    num_types: int
    emb_dim: Optional[int] = None

    @nn.compact
    def __call__(self, types: jnp.ndarray) -> jnp.ndarray:
        if self.emb_dim is None:
            return jax.nn.one_hot(types, self.num_types, dtype=jnp.float32)
        return nn.Embed(self.num_types, self.emb_dim,
                        embedding_init=nn.initializers.normal(stddev=1.0),
                        name="embedding")(types)

    @property
    def out_dim(self) -> int:
        return self.num_types if self.emb_dim is None else self.emb_dim


def masked_pool(x: jnp.ndarray, mask: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Masked mean/max/sum pooling over the node axis of [B, N, D]
    (reference joint_gnn.py:221-241, including the 1e10 max-offset trick)."""
    m = mask[..., None]
    if mode == "mean":
        return (x * m).sum(axis=1) / mask.sum(axis=1, keepdims=True)
    if mode == "max":
        offset = (~mask)[..., None] * 1.0e10
        return (x - offset).max(axis=1)
    if mode == "sum":
        return (x * m).sum(axis=1)
    raise ValueError(f"unknown element_pooling: {mode!r}")
