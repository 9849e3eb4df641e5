"""Molecule GNN zoo over padded graph batches.

Behavioral spec: reference models/molecule_gnn.py. The trained/default config
is ``base_conv='gine'`` (train_model.py:294-312). All models take a GraphBatch
with scalar-only node features and return per-atom embeddings [B, N, out].
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from caster_dta_tpu.data.graphs import GraphBatch
from caster_dta_tpu.models.common import TypeEmbedding
from caster_dta_tpu.nn import conv as convs
from caster_dta_tpu.nn.attention import MultiheadAttention
from caster_dta_tpu.nn.common import Dense, MLP, select_activation, apply_act
from caster_dta_tpu.nn.norm import MaskedBatchNorm
from caster_dta_tpu.ops import segment


class _BaseMolecule(nn.Module):
    """Shared fields (reference molecule_gnn.py:73-140)."""

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
    aggr: str = "sum"

    def _hidden(self):
        return self.hidden_channels if self.hidden_channels is not None else self.out_channels

    def _dims(self):
        return ([self.in_channels + self._ntype_dim()]
                + [self._hidden()] * (self.num_convs - 1) + [self.out_channels])

    def _ntype_dim(self):
        return self.num_ntypes if self.ntype_emb_dim is None else self.ntype_emb_dim

    def _etype_dim(self):
        return self.num_etypes if self.etype_emb_dim is None else self.etype_emb_dim

    def _embed_types_and_cat(self, g: GraphBatch):
        ntype_emb = TypeEmbedding(self.num_ntypes, self.ntype_emb_dim,
                                  name="ntype_embedding")
        etype_emb = TypeEmbedding(self.num_etypes, self.etype_emb_dim,
                                  name="etype_embedding")
        x = jnp.concatenate([ntype_emb(g.node_type), g.node_s], axis=-1)
        e = jnp.concatenate([etype_emb(g.edge_type), g.edge_s], axis=-1)
        return x, e

    def _dropout(self, x, deterministic):
        if self.dropout_rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.dropout_rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.dropout_rate), 0.0)


class HomoMoleculeGNN_GINE(_BaseMolecule):
    """Stack of GINEConvs (reference molecule_gnn.py:208-280)."""

    gin_trainable_eps: bool = True
    act_first: bool = False
    gin_norm: Optional[str] = None
    gin_norm_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        act = select_activation(self.activation)
        x, e = self._embed_types_and_cat(g)
        dims = self._dims()
        for i in range(self.num_convs):
            x = convs.GINEConv(dims[i + 1], act=self.activation,
                               train_eps=self.gin_trainable_eps, aggr=self.aggr,
                               name=f"conv_{i}")(
                x, g.edge_src, g.edge_dst, g.edge_mask, e)
            x = apply_act(act, x)
            if i < self.num_convs - 1:
                x = self._dropout(x, deterministic)
        return x


class HomoMoleculeGNN_GIN(_BaseMolecule):
    """GIN without edge attrs (reference molecule_gnn.py:283-355)."""

    gin_trainable_eps: bool = True
    act_first: bool = False
    gin_norm: Optional[str] = None
    gin_norm_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        act = select_activation(self.activation)
        x, _ = self._embed_types_and_cat(g)
        dims = self._dims()
        for i in range(self.num_convs):
            x = convs.GINConv(dims[i + 1], act=self.activation,
                              train_eps=self.gin_trainable_eps, aggr=self.aggr,
                              name=f"conv_{i}")(
                x, g.edge_src, g.edge_dst, g.edge_mask)
            x = apply_act(act, x)
            if i < self.num_convs - 1:
                x = self._dropout(x, deterministic)
        return x


class HomoMoleculeGNN_GAT(_BaseMolecule):
    """GATv2 stack (reference molecule_gnn.py:143-205).

    Divergence from PyG noted: implicit self-loop insertion is not performed —
    the framework's graphs carry explicit self-loop edges when configured
    (molecule_include_selfloops), so PyG's add_self_loops would double them.
    """

    concat: bool = False
    heads: int = 2
    conv_dropout: float = 0.0
    conv_neg_slope: float = 0.2

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        act = select_activation(self.activation)
        x, e = self._embed_types_and_cat(g)
        dims = self._dims()
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


class HomoMoleculeGNN_AttentiveFP(_BaseMolecule):
    """AttentiveFP-style atom embedder (reference molecule_gnn.py:358-454):
    lin1 -> GATEConv+GRU -> (GATConv+GRU)^(n-1) -> lin2."""

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        act = select_activation(self.activation)
        hidden = self._hidden()
        x, e = self._embed_types_and_cat(g)
        x = jax.nn.leaky_relu(Dense(hidden, name="lin1")(x), 0.01)

        x_h = convs.GATEConv(hidden, self.edge_dim + self._etype_dim(),
                             dropout=self.dropout_rate, name="conv_0")(
            x, g.edge_src, g.edge_dst, g.edge_mask, e, deterministic=deterministic)
        x_h = jax.nn.elu(x_h)
        x_h = self._dropout(x_h, deterministic)
        x = jax.nn.relu(convs.GRUCell(hidden, name="gru_0")(x_h, x))

        for i in range(1, self.num_convs):
            x_h = convs.GATConv(hidden, dropout=self.dropout_rate,
                                negative_slope=0.01, name=f"conv_{i}")(
                x, g.edge_src, g.edge_dst, g.edge_mask, deterministic=deterministic)
            x_h = jax.nn.elu(x_h)
            x_h = self._dropout(x_h, deterministic)
            x = jax.nn.relu(convs.GRUCell(hidden, name=f"gru_{i}")(x_h, x))

        x = Dense(self.out_channels, name="lin2")(x)
        return apply_act(act, x)


def random_walk_pe(g: GraphBatch, n_walks: int = 20) -> jnp.ndarray:
    """Random-walk positional encodings via dense per-graph adjacency powers
    (reference molecule_gnn.py:507-531 computes this with CSR matmuls; the
    dense [B,N,N] form is the TPU-friendly equivalent — molecule graphs are
    tiny so these are small MXU matmuls under jit instead of host sparse ops).
    """
    b, n = g.node_type.shape
    adj = jnp.zeros((b, n, n), jnp.float32)
    bidx = jnp.arange(b)[:, None]
    w = g.edge_mask.astype(jnp.float32)
    adj = adj.at[bidx, g.edge_src, g.edge_dst].add(w)
    outdeg = jnp.maximum(adj.sum(axis=2, keepdims=True), 1.0)
    adj = adj / outdeg

    def body(p, _):
        pe = jnp.diagonal(p, axis1=1, axis2=2)
        return jnp.einsum("bij,bjk->bik", p, adj), pe

    _, pes = jax.lax.scan(body, adj, None, length=n_walks)
    return jnp.moveaxis(pes, 0, -1)  # [B, N, n_walks]


class HomoMoleculeGNN_GPS(_BaseMolecule):
    """GraphGPS-style model (reference molecule_gnn.py:457-531): random-walk
    PE (20 walks -> BatchNorm -> Linear(pe_dim)) concatenated to features,
    then GPS layers (local GINEConv + global dense self-attention + FFN).

    Divergence noted: the reference's GPSConv residual add crashes when layer
    input/output widths differ; here the residual is applied only when the
    widths match (same math in the width-matched case).
    """

    pe_dim: int = 8
    attn_type: str = "multihead"
    attn_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        x, e = self._embed_types_and_cat(g)
        pe = random_walk_pe(g, 20)
        pe = MaskedBatchNorm(20, name="pe_norm")(
            pe, mask=g.node_mask, use_running_average=deterministic)
        pe = Dense(self.pe_dim, name="pe_lin")(pe)
        x = jnp.concatenate([x, pe], axis=-1)

        attn_dropout = (self.attn_kwargs or {}).get("dropout", 0.5)
        dims = ([self.in_channels + self._ntype_dim() + self.pe_dim]
                + [self._hidden()] * (self.num_convs - 1) + [self.out_channels])
        for i in range(self.num_convs):
            d_in, d_out = dims[i], dims[i + 1]
            h_local = convs.GINEConv(d_out, act="relu", train_eps=False,
                                     aggr="sum", name=f"conv_{i}_local")(
                x, g.edge_src, g.edge_dst, g.edge_mask, e)
            if d_in == d_out:
                h_local = h_local + x
            h_local = nn.LayerNorm(epsilon=1e-5, name=f"conv_{i}_norm1")(h_local)

            q = Dense(d_out, name=f"conv_{i}_attn_in")(x) if d_in != d_out else x
            h_attn, _ = MultiheadAttention(d_out, 4, dropout=attn_dropout,
                                           name=f"conv_{i}_attn")(
                q, q, q, key_padding_mask=~g.node_mask, deterministic=deterministic)
            h_attn = h_attn + q
            h_attn = nn.LayerNorm(epsilon=1e-5, name=f"conv_{i}_norm2")(h_attn)

            h = h_local + h_attn
            ff = MLP((d_out, 2 * d_out, d_out), act="relu", name=f"conv_{i}_ff")(h)
            x = nn.LayerNorm(epsilon=1e-5, name=f"conv_{i}_norm3")(h + ff)
        return x


class HomoMoleculeGNN_PNA(_BaseMolecule):
    """Principal Neighbourhood Aggregation (reference molecule_gnn.py:534-596;
    operator spec pyg.nn.PNAConv with towers, divide_input=False).

    degree_hist: 1-D histogram of in-degrees over the training set
    (reference models/model_utils.py:37-58)."""

    degree_hist: Optional[tuple] = None
    aggregators: tuple = ("mean", "min", "max", "std")
    scalers: tuple = ("identity", "amplification", "attenuation")
    towers: int = 4

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        act = select_activation(self.activation)
        x, e = self._embed_types_and_cat(g)
        dims = self._dims()
        hist = np.asarray(self.degree_hist, np.float64)
        degs = np.arange(len(hist))
        # PyG: delta = mean of log(deg+1) under the histogram distribution
        delta = float((np.log(degs + 1) * hist).sum() / max(hist.sum(), 1.0))

        for i in range(self.num_convs):
            x = _PNAConv(dims[i + 1], edge_dim=self.edge_dim + self._etype_dim(),
                         aggregators=tuple(self.aggregators),
                         scalers=tuple(self.scalers), towers=self.towers,
                         delta=delta, name=f"conv_{i}")(
                x, g.edge_src, g.edge_dst, g.edge_mask, e)
            x = apply_act(act, x)
            if i < self.num_convs - 1:
                x = self._dropout(x, deterministic)
        return x


class _PNAConv(nn.Module):
    out_channels: int
    edge_dim: int
    aggregators: tuple
    scalers: tuple
    towers: int
    delta: float

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, edge_attr):
        n = x.shape[1]
        f_in = x.shape[-1]
        f_out = self.out_channels // self.towers
        e = Dense(f_in, name="edge_encoder")(edge_attr)
        x_i = segment.gather_nodes(x, edge_dst)
        x_j = segment.gather_nodes(x, edge_src)
        h = jnp.concatenate([x_i, x_j, e], axis=-1)

        deg = segment.segment_degree(edge_dst, edge_mask, n)           # [B, N]
        log_deg = jnp.log(deg + 1.0)
        tower_outs = []
        for t in range(self.towers):
            m = Dense(f_in, name=f"pre_nn_{t}")(h)                     # [B, E, F]
            aggs = []
            mean = segment.segment_mean(m, edge_dst, edge_mask, n)
            for a in self.aggregators:
                if a == "mean":
                    agg = mean
                elif a == "min":
                    agg = -segment.segment_max(-m, edge_dst, edge_mask, n)
                elif a == "max":
                    agg = segment.segment_max(m, edge_dst, edge_mask, n)
                elif a == "std":
                    sq = segment.segment_mean(m * m, edge_dst, edge_mask, n)
                    agg = jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0) + 1e-5)
                elif a in ("sum", "add"):
                    agg = segment.segment_sum(m, edge_dst, edge_mask, n)
                else:
                    raise ValueError(f"unknown PNA aggregator {a}")
                aggs.append(agg)
            scaled = []
            for s in self.scalers:
                for agg in aggs:
                    if s == "identity":
                        scaled.append(agg)
                    elif s == "amplification":
                        scaled.append(agg * (log_deg / self.delta)[..., None])
                    elif s == "attenuation":
                        scaled.append(agg * (self.delta / jnp.maximum(log_deg, 1e-5))[..., None])
                    else:
                        raise ValueError(f"unknown PNA scaler {s}")
            cat = jnp.concatenate([x] + scaled, axis=-1)
            tower_outs.append(Dense(f_out, name=f"post_nn_{t}")(cat))
        out = jnp.concatenate(tower_outs, axis=-1)
        return Dense(self.out_channels, name="lin")(out)


class HeteroMoleculeGNN_HEAT(_BaseMolecule):
    """HEATConv stack (reference molecule_gnn.py:599-660)."""

    eattr_emb_dim: int = 8
    concat: bool = True
    heads: int = 2
    conv_dropout: float = 0.0
    conv_neg_slope: float = 0.2

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        act = select_activation(self.activation)
        x = g.node_s
        dims = [self.in_channels] + [self._hidden()] * (self.num_convs - 1) + [self.out_channels]
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


MOLECULE_MODELS = {
    "gatv2": HomoMoleculeGNN_GAT,
    "gine": HomoMoleculeGNN_GINE,
    "gin": HomoMoleculeGNN_GIN,
    "gps": HomoMoleculeGNN_GPS,
    "pna": HomoMoleculeGNN_PNA,
    "attentivefp": HomoMoleculeGNN_AttentiveFP,
    "heat": HeteroMoleculeGNN_HEAT,
}


def make_molecule_gnn(base_conv: str, **kwargs) -> nn.Module:
    """Selectable wrapper (reference molecule_gnn.py:13-70)."""
    base_conv = base_conv.lower()
    if base_conv not in MOLECULE_MODELS:
        raise ValueError(f"unknown molecule base_conv: {base_conv!r}")
    cls = MOLECULE_MODELS[base_conv]
    field_names = {f for f in cls.__dataclass_fields__}
    kwargs = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in kwargs.items() if k in field_names}
    return cls(**kwargs)
