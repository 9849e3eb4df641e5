"""Scalar graph convolutions over padded batches: GINE, GIN, GATv2, GAT,
GATE (AttentiveFP), HEAT.

Behavioral specs are the torch_geometric operators used by the reference
(molecule_gnn.py / protein_gnn.py); implementations are fresh, written against
the published operator math, on the dense [B, N]/[B, E] layout with sorted
segment aggregation (ops/segment.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from caster_dta_tpu.nn.common import Dense, MLP, select_activation, apply_act
from caster_dta_tpu.ops import segment


class GINEConv(nn.Module):
    """GIN with edge features (pyg.nn.GINEConv; used at reference
    molecule_gnn.py:271-280): out = MLP((1+eps)*x_i + aggr_j ReLU(x_j + W_e e_ij)).

    The inner MLP is PyG's MLP([in, out, out]) with norm=None.
    """

    out_channels: int
    act: str = "relu"
    train_eps: bool = True
    aggr: str = "sum"

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, edge_attr):
        in_ch = x.shape[-1]
        eps = self.param("eps", nn.initializers.zeros, (1,)) if self.train_eps \
            else jnp.zeros((1,), x.dtype)
        e = Dense(in_ch, name="edge_lin")(edge_attr)
        x_j = segment.gather_nodes(x, edge_src)
        msg = jax.nn.relu(x_j + e)
        agg = segment.aggregate(msg, edge_dst, edge_mask, x.shape[1], self.aggr)
        out = (1.0 + eps) * x + agg
        return MLP((in_ch, self.out_channels, self.out_channels),
                   act=self.act, name="mlp")(out)


class GINConv(nn.Module):
    """GIN without edge features (pyg.nn.GINConv; reference
    molecule_gnn.py:346-355): out = MLP((1+eps)*x_i + aggr_j x_j)."""

    out_channels: int
    act: str = "relu"
    train_eps: bool = True
    aggr: str = "sum"

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, edge_attr=None):
        in_ch = x.shape[-1]
        eps = self.param("eps", nn.initializers.zeros, (1,)) if self.train_eps \
            else jnp.zeros((1,), x.dtype)
        x_j = segment.gather_nodes(x, edge_src)
        agg = segment.aggregate(x_j, edge_dst, edge_mask, x.shape[1], self.aggr)
        out = (1.0 + eps) * x + agg
        return MLP((in_ch, self.out_channels, self.out_channels),
                   act=self.act, name="mlp")(out)


class GATv2Conv(nn.Module):
    """pyg.nn.GATv2Conv with edge features (reference protein_gnn.py:184-190,
    molecule_gnn.py:172-178).

    alpha_ij = softmax_j(a^T LeakyReLU(W_l x_i + W_r x_j + W_e e_ij));
    out_i = aggr_j alpha_ij (W_r x_j), concat or mean over heads.
    PyG defaults: share_weights=False, bias=True, att applied per head.
    """

    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    aggr: str = "sum"
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, edge_attr=None,
                 deterministic: bool = True):
        h, c = self.heads, self.out_channels
        n = x.shape[1]
        x_l = Dense(h * c, use_bias=True, name="lin_l")(x).reshape(*x.shape[:-1], h, c)
        x_r = Dense(h * c, use_bias=True, name="lin_r")(x).reshape(*x.shape[:-1], h, c)
        # PyG: x_i from lin_l (dst), x_j from lin_r (src)
        xi = segment.gather_nodes(x_l, edge_dst)
        xj = segment.gather_nodes(x_r, edge_src)
        z = xi + xj
        if edge_attr is not None and self.edge_dim is not None:
            e = Dense(h * c, use_bias=False, name="lin_edge")(edge_attr)
            z = z + e.reshape(*edge_attr.shape[:-1], h, c)
        z = jax.nn.leaky_relu(z, self.negative_slope)
        att = self.param("att", nn.initializers.glorot_uniform(), (1, 1, h, c))
        logits = (z * att).sum(-1)                                   # [B, E, H]
        alpha = segment.segment_softmax(logits, edge_dst, edge_mask, n)
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - self.dropout), 0.0)
        msg = xj * alpha[..., None]                                  # [B, E, H, C]
        # attention weights already sum to 1 per dst; PyG applies `aggr` on top
        out = segment.aggregate(msg, edge_dst, edge_mask, n, self.aggr)
        if self.concat:
            out = out.reshape(*out.shape[:-2], h * c)
        else:
            out = out.mean(axis=-2)
        bias = self.param("bias", nn.initializers.zeros,
                          (h * c if self.concat else c,))
        return out + bias


class GATConv(nn.Module):
    """pyg.nn.GATConv (v1; used by AttentiveFP layers ≥2, reference
    molecule_gnn.py:383-385): alpha from a^T [W x_i ‖ W x_j]."""

    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, deterministic: bool = True):
        h, c = self.heads, self.out_channels
        n = x.shape[1]
        xw = Dense(h * c, use_bias=True, name="lin")(x).reshape(*x.shape[:-1], h, c)
        att_src = self.param("att_src", nn.initializers.glorot_uniform(), (1, 1, h, c))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (1, 1, h, c))
        a_src = (xw * att_src).sum(-1)                               # [B, N, H]
        a_dst = (xw * att_dst).sum(-1)
        logits = segment.gather_nodes(a_src, edge_src) + segment.gather_nodes(a_dst, edge_dst)
        logits = jax.nn.leaky_relu(logits, self.negative_slope)
        alpha = segment.segment_softmax(logits, edge_dst, edge_mask, n)
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - self.dropout), 0.0)
        xj = segment.gather_nodes(xw, edge_src)
        out = segment.segment_sum(xj * alpha[..., None], edge_dst, edge_mask, n)
        if self.concat:
            out = out.reshape(*out.shape[:-2], h * c)
        else:
            out = out.mean(axis=-2)
        bias = self.param("bias", nn.initializers.zeros,
                          (h * c if self.concat else c,))
        return out + bias


class GATEConv(nn.Module):
    """AttentiveFP's first-layer edge-aware conv
    (pyg.nn.models.attentive_fp.GATEConv, reference molecule_gnn.py:396-400):

    a_j = LeakyReLU(att_l · ReLU(W1 [x_j ‖ e_ij]))   (per edge)
    a_i = LeakyReLU(att_r · (W x_i))
    alpha = softmax_j(a_j + a_i); out_i = sum_j alpha * (W2 [x_j ‖ e_ij]) + b
    """

    out_channels: int
    edge_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, edge_attr,
                 deterministic: bool = True):
        n = x.shape[1]
        c = self.out_channels
        x_j = segment.gather_nodes(x, edge_src)
        xe = jnp.concatenate([x_j, edge_attr], axis=-1)
        h_j = jax.nn.relu(Dense(c, use_bias=False, name="lin1")(xe))
        att_l = self.param("att_l", nn.initializers.glorot_uniform(), (1, 1, c))
        att_r = self.param("att_r", nn.initializers.glorot_uniform(), (1, 1, c))
        a_j = jax.nn.leaky_relu((h_j * att_l).sum(-1), 0.2)
        x_i_proj = Dense(c, use_bias=False, name="lin_dst")(x)
        a_i_all = jax.nn.leaky_relu((x_i_proj * att_r).sum(-1), 0.2)
        a_i = segment.gather_nodes(a_i_all[..., None], edge_dst)[..., 0]
        alpha = segment.segment_softmax((a_j + a_i)[..., None], edge_dst,
                                        edge_mask, n)[..., 0]
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - self.dropout), 0.0)
        msg = Dense(c, use_bias=False, name="lin2")(xe) * alpha[..., None]
        out = segment.segment_sum(msg, edge_dst, edge_mask, n)
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return out + bias


class GRUCell(nn.Module):
    """torch.nn.GRUCell semantics (used between AttentiveFP layers,
    reference molecule_gnn.py:408): h' = (1-z)*n + z*h with torch's gate
    layout r,z,n and bias split b_ih/b_hh."""

    hidden_size: int

    @nn.compact
    def __call__(self, inp, h):
        hs = self.hidden_size
        gi = Dense(3 * hs, name="weight_ih")(inp)
        gh = Dense(3 * hs, name="weight_hh")(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class HEATConv(nn.Module):
    """Heterogeneous edge-attribute transformer conv (pyg.nn.HEATConv,
    reference protein_gnn.py:252-262 / molecule_gnn.py:627-637).

    Per PyG: node features are type-specific-linearly projected, edge type
    embedded + edge attrs projected, concatenated to drive GATv2-style
    attention; messages are the *raw projected node features* weighted by
    attention.
    """

    out_channels: int
    num_node_types: int
    num_edge_types: int
    edge_type_emb_dim: int
    edge_dim: int
    edge_attr_emb_dim: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    aggr: str = "sum"

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, node_type, edge_type,
                 edge_attr, deterministic: bool = True):
        n = x.shape[1]
        h, c = self.heads, self.out_channels
        # HeteroLinear: per-node-type projection
        kernels = self.param("hetero_kernel", nn.initializers.glorot_uniform(),
                             (self.num_node_types, x.shape[-1], c))
        biases = self.param("hetero_bias", nn.initializers.zeros,
                            (self.num_node_types, c))
        k = kernels[node_type]                                     # [B, N, in, C]
        xp = jnp.einsum("bni,bnic->bnc", x, k) + biases[node_type]

        ete = nn.Embed(self.num_edge_types, self.edge_type_emb_dim,
                       embedding_init=nn.initializers.normal(1.0),
                       name="edge_type_emb")(edge_type)
        ete = jax.nn.relu(ete)
        eae = Dense(self.edge_attr_emb_dim, use_bias=False, name="edge_attr_emb")(edge_attr)

        xi = segment.gather_nodes(xp, edge_dst)
        xj = segment.gather_nodes(xp, edge_src)
        z = jnp.concatenate([xi, xj, ete, eae], axis=-1)
        z = Dense(h * c, name="att_lin")(z).reshape(*z.shape[:-1], h, c)
        z = jax.nn.leaky_relu(z, self.negative_slope)
        att = self.param("att", nn.initializers.glorot_uniform(), (1, 1, h, c))
        logits = (z * att).sum(-1)
        alpha = segment.segment_softmax(logits, edge_dst, edge_mask, n)
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - self.dropout), 0.0)
        msg = xj[..., None, :] * alpha[..., None]                  # [B, E, H, C]
        out = segment.aggregate(msg, edge_dst, edge_mask, n, self.aggr)
        if self.concat:
            return out.reshape(*out.shape[:-2], h * c)
        return out.mean(axis=-2)
