"""JointGNN: two-tower GNN + residue-atom cross-attention + affinity head.

Behavioral spec: reference models/joint_gnn.py:15-452. TPU redesign notes:
the reference runs GNNs on ragged graphs then densifies for attention via
``pyg.utils.to_dense_batch`` (joint_gnn.py:206-207); here everything is dense
``[B, N, D]`` from the start so the "densification" is free and the whole
forward is one static-shape jitted program per bucket.

Construction mirrors the reference's kwargs contract exactly so the four JSON
artifacts (model_kwargs.json etc., README.md:105-118 of the reference) reload
unchanged.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from caster_dta_tpu.data.graphs import GraphBatch
from caster_dta_tpu.models.common import masked_pool
from caster_dta_tpu.models.molecule import make_molecule_gnn
from caster_dta_tpu.models.protein import make_protein_gnn
from caster_dta_tpu.nn.attention import MultiheadAttention
from caster_dta_tpu.nn.common import Dense, select_activation, apply_act
from caster_dta_tpu.nn.norm import MaskedBatchNorm


class CrossAttentionModule(nn.Module):
    """Bidirectional cross-attention (reference joint_gnn.py:321-408):
    pre-LN, MHA in both directions with key_padding masks, optional residual
    streams with 2-layer FFNs. Returns both head-averaged weight matrices."""

    embed_dim_1: int
    embed_dim_2: int
    n_attention_heads: int
    attn_dropout: float = 0.0
    include_residual_stream: bool = True
    dim_feedforward_scale: int = 2
    feedforward_dropout: float = 0.2

    @nn.compact
    def __call__(self, embed_1, embed_2, mask1, mask2,
                 deterministic: bool = True, need_weights: bool = True):
        x1n = nn.LayerNorm(epsilon=1e-5, name="preattn_norm1")(embed_1)
        x2n = nn.LayerNorm(epsilon=1e-5, name="preattn_norm2")(embed_2)

        x1_attn, w1 = MultiheadAttention(self.embed_dim_1, self.n_attention_heads,
                                         dropout=self.attn_dropout,
                                         name="embed1_to_2")(
            x1n, x2n, x2n, key_padding_mask=~mask2, deterministic=deterministic,
            need_weights=need_weights)
        x2_attn, w2 = MultiheadAttention(self.embed_dim_2, self.n_attention_heads,
                                         dropout=self.attn_dropout,
                                         name="embed2_to_1")(
            x2n, x1n, x1n, key_padding_mask=~mask1, deterministic=deterministic,
            need_weights=need_weights)

        def ff_dropout(x):
            if self.feedforward_dropout == 0.0 or deterministic:
                return x
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.feedforward_dropout, x.shape)
            return jnp.where(keep, x / (1.0 - self.feedforward_dropout), 0.0)

        if self.include_residual_stream:
            e1 = embed_1 + ff_dropout(x1_attn)
            h1 = nn.LayerNorm(epsilon=1e-5, name="ff_norm1")(e1)
            h1 = Dense(self.embed_dim_1 * self.dim_feedforward_scale, name="ff1_lin0")(h1)
            h1 = jax.nn.relu(h1)
            h1 = ff_dropout(h1)
            h1 = Dense(self.embed_dim_1, name="ff1_lin1")(h1)
            e1 = e1 + ff_dropout(h1)

            e2 = embed_2 + ff_dropout(x2_attn)
            h2 = nn.LayerNorm(epsilon=1e-5, name="ff_norm2")(e2)
            h2 = Dense(self.embed_dim_2 * self.dim_feedforward_scale, name="ff2_lin0")(h2)
            h2 = jax.nn.relu(h2)
            h2 = ff_dropout(h2)
            h2 = Dense(self.embed_dim_2, name="ff2_lin1")(h2)
            e2 = e2 + ff_dropout(h2)
        else:
            e1, e2 = x1_attn, x2_attn

        return e1, e2, (w1, w2)


class JointGNN(nn.Module):
    """Top model (reference joint_gnn.py:15-317).

    __call__(protein_graph, molecule_graph) -> (score [B, 1], attn_weights)
    where attn_weights is a list (one per cross-attn layer) of tuples
    (residues→atoms weights [B,R,A], atoms→residues weights [B,A,R]).
    """

    protein_gnn_kwargs: Dict[str, Any]
    molecule_gnn_kwargs: Dict[str, Any]
    residue_lin_depth: int = 1
    atom_lin_depth: int = 1
    n_attention_heads: int = 8
    attention_dropout: float = 0.0
    protein_lin_depth: int = 1
    molecule_lin_depth: int = 1
    pairwise_embedding_dim: int = 512
    out_lin_depth: int = 1
    out_lin_factor: float = 0.5
    out_lin_norm_type: Optional[str] = None
    activation: str = "relu"
    dropout: float = 0.0
    element_pooling: str = "mean"
    include_residual_stream: bool = True
    residual_dim_ff_scale: int = 2
    num_cross_attn_layers: int = 1
    include_post_pool_layernorm: bool = False

    def _dropout(self, x, deterministic):
        if self.dropout == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.dropout, x.shape)
        return jnp.where(keep, x / (1.0 - self.dropout), 0.0)

    def _lin_stack(self, x, depth, name, deterministic, scale_factor=2,
                   norm_type=None, mask=None):
        """Successive widening/narrowing linear stack with act+dropout
        (reference joint_gnn.py:290-317)."""
        act = select_activation(self.activation)
        dim = x.shape[-1]
        for i in range(depth):
            dim = int(dim * scale_factor)
            x = Dense(dim, name=f"{name}_lin{i}")(x)
            if norm_type == "layer":
                x = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm{i}")(x)
            elif norm_type == "batch":
                x = MaskedBatchNorm(dim, name=f"{name}_norm{i}")(
                    x, mask=mask, use_running_average=deterministic)
            x = apply_act(act, x)
            x = self._dropout(x, deterministic)
        return x

    @nn.compact
    def __call__(self, protein_graph: GraphBatch, molecule_graph: GraphBatch,
                 deterministic: bool = True, return_attention: bool = True):
        protein_gnn = make_protein_gnn(name="protein_gnn", **self.protein_gnn_kwargs)
        molecule_gnn = make_molecule_gnn(name="molecule_gnn", **self.molecule_gnn_kwargs)

        residue_embed = protein_gnn(protein_graph, deterministic=deterministic)
        atom_embed = molecule_gnn(molecule_graph, deterministic=deterministic)

        return self._head(residue_embed, atom_embed, protein_graph.node_mask,
                          molecule_graph.node_mask, deterministic,
                          return_attention)

    def _head(self, residue_embed, atom_embed, residue_mask, atom_mask,
              deterministic: bool, return_attention: bool = True):
        """Everything after the towers (lin stacks, cross-attention, pooling,
        output MLP). A helper inside the compact context — param names stay
        at the module root — so the edge-partitioned JointGNN
        (parallel/partition.py) reuses it verbatim."""
        act = select_activation(self.activation)

        residue_embed = self._lin_stack(residue_embed, self.residue_lin_depth,
                                        "residue", deterministic)
        atom_embed = self._lin_stack(atom_embed, self.atom_lin_depth,
                                     "atom", deterministic)

        attn_weights = []
        if self.num_cross_attn_layers > 0:
            for i in range(self.num_cross_attn_layers):
                residue_embed, atom_embed, w = CrossAttentionModule(
                    embed_dim_1=residue_embed.shape[-1],
                    embed_dim_2=atom_embed.shape[-1],
                    n_attention_heads=self.n_attention_heads,
                    attn_dropout=self.attention_dropout,
                    include_residual_stream=self.include_residual_stream,
                    dim_feedforward_scale=self.residual_dim_ff_scale,
                    feedforward_dropout=self.dropout,
                    name=f"cross_attn_{i}",
                )(residue_embed, atom_embed, residue_mask, atom_mask,
                  deterministic=deterministic, need_weights=return_attention)
                attn_weights.append(w)
        else:
            attn_weights = None
        if not return_attention:
            attn_weights = None

        protein_embed = masked_pool(residue_embed, residue_mask, self.element_pooling)
        molecule_embed = masked_pool(atom_embed, atom_mask, self.element_pooling)

        if self.include_post_pool_layernorm:
            protein_embed = nn.LayerNorm(epsilon=1e-5, name="protein_post_pool_norm")(protein_embed)
            molecule_embed = nn.LayerNorm(epsilon=1e-5, name="molecule_post_pool_norm")(molecule_embed)

        protein_embed = self._dropout(apply_act(act, protein_embed), deterministic)
        molecule_embed = self._dropout(apply_act(act, molecule_embed), deterministic)

        protein_embed = self._lin_stack(protein_embed, self.protein_lin_depth,
                                        "protein", deterministic)
        molecule_embed = self._lin_stack(molecule_embed, self.molecule_lin_depth,
                                         "molecule", deterministic)

        x = jnp.concatenate([protein_embed, molecule_embed], axis=-1)
        x = Dense(self.pairwise_embedding_dim, name="pm_embed_lin")(x)
        x = self._dropout(apply_act(act, x), deterministic)

        x = self._lin_stack(x, self.out_lin_depth, "out_fc", deterministic,
                            scale_factor=self.out_lin_factor,
                            norm_type=self.out_lin_norm_type)

        x = Dense(1, name="output_layer")(x)
        return x, attn_weights


def make_joint_gnn(protein_gnn_kwargs: dict, molecule_gnn_kwargs: dict,
                   **joint_gnn_kwargs) -> JointGNN:
    """Constructor mirroring the reference call signature
    (train_model.py:333-334, inference/inference_utils.py:48-49)."""
    return JointGNN(protein_gnn_kwargs=dict(protein_gnn_kwargs),
                    molecule_gnn_kwargs=dict(molecule_gnn_kwargs),
                    **joint_gnn_kwargs)
