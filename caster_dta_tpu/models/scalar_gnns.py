"""Scalar protein GNN baselines: GATv2 and HEAT
(reference models/protein_gnn.py:155-285)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from caster_dta_tpu.data.graphs import GraphBatch
from caster_dta_tpu.models.common import TypeEmbedding
from caster_dta_tpu.models import protein as protein_mod
from caster_dta_tpu.nn import conv as convs
from caster_dta_tpu.nn.common import select_activation, apply_act
import jax


class _BaseScalarProtein(nn.Module):
    in_channels: int
    edge_dim: int
    num_ntypes: int
    num_etypes: int
    ntype_emb_dim: Optional[int] = None
    etype_emb_dim: Optional[int] = None
    num_convs: int = 1
    hidden_channels: Optional[int] = None
    out_channels: int = 8
    dropout_rate: float = 0.2
    activation: str = "relu"

    def _hidden(self):
        return self.hidden_channels if self.hidden_channels is not None else self.out_channels

    def _ntype_dim(self):
        return self.num_ntypes if self.ntype_emb_dim is None else self.ntype_emb_dim

    def _etype_dim(self):
        return self.num_etypes if self.etype_emb_dim is None else self.etype_emb_dim

    def _dropout(self, x, deterministic):
        if self.dropout_rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.dropout_rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.dropout_rate), 0.0)


class HomoScalarProteinGNN_GATv2(_BaseScalarProtein):
    """GATv2 stack over scalar protein features (protein_gnn.py:155-217)."""

    aggr: str = "sum"
    concat: bool = False
    heads: int = 2
    conv_dropout: float = 0.0
    conv_neg_slope: float = 0.2

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        act = select_activation(self.activation)
        ntype_emb = TypeEmbedding(self.num_ntypes, self.ntype_emb_dim, name="ntype_embedding")
        etype_emb = TypeEmbedding(self.num_etypes, self.etype_emb_dim, name="etype_embedding")
        x = jnp.concatenate([ntype_emb(g.node_type), g.node_s], axis=-1)
        e = jnp.concatenate([etype_emb(g.edge_type), g.edge_s], axis=-1)
        dims = ([self.in_channels + self._ntype_dim()]
                + [self._hidden()] * (self.num_convs - 1) + [self.out_channels])
        for i in range(self.num_convs):
            x = convs.GATv2Conv(dims[i + 1], heads=self.heads, concat=self.concat,
                                negative_slope=self.conv_neg_slope,
                                dropout=self.conv_dropout, aggr=self.aggr,
                                edge_dim=self.edge_dim + self._etype_dim(),
                                name=f"conv_{i}")(
                x, g.edge_src, g.edge_dst, g.edge_mask, e,
                deterministic=deterministic)
            x = apply_act(act, x)
            if i < self.num_convs - 1:
                x = self._dropout(x, deterministic)
        return x


class HeteroScalarProteinGNN_HEAT(_BaseScalarProtein):
    """HEATConv stack over scalar protein features (protein_gnn.py:221-285)."""

    eattr_emb_dim: int = 8
    aggr: str = "sum"
    concat: bool = True
    heads: int = 2
    conv_dropout: float = 0.0
    conv_neg_slope: float = 0.2

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        act = select_activation(self.activation)
        x = g.node_s
        dims = ([self.in_channels] + [self._hidden()] * (self.num_convs - 1)
                + [self.out_channels])
        for i in range(self.num_convs):
            x = convs.HEATConv(dims[i + 1], num_node_types=self.num_ntypes,
                               num_edge_types=self.num_etypes,
                               edge_type_emb_dim=self._etype_dim(),
                               edge_dim=self.edge_dim,
                               edge_attr_emb_dim=self.eattr_emb_dim,
                               heads=self.heads, concat=self.concat,
                               negative_slope=self.conv_neg_slope,
                               dropout=self.conv_dropout, aggr=self.aggr,
                               name=f"conv_{i}")(
                x, g.edge_src, g.edge_dst, g.edge_mask, g.node_type, g.edge_type,
                g.edge_s, deterministic=deterministic)
            x = apply_act(act, x)
            if i < self.num_convs - 1:
                x = self._dropout(x, deterministic)
        return x


protein_mod.PROTEIN_MODELS.setdefault("gatv2", HomoScalarProteinGNN_GATv2)
protein_mod.PROTEIN_MODELS.setdefault("heat", HeteroScalarProteinGNN_HEAT)
