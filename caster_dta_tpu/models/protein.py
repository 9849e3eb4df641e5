"""Protein GNN zoo over padded graph batches.

Behavioral spec: reference models/protein_gnn.py. The trained/default config
is ``base_conv='lbamodel'`` (train_model.py:276-292): GVP input blocks, N
GVPConvLayers (ReLU scalar act, vector gate, aggr='sum'), final LayerNorm +
GVP down to scalars per residue.

All models take a GraphBatch whose node features are the (s, V) tuple
(node_s, node_v) and return per-residue scalar embeddings [B, N, out].
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from caster_dta_tpu.data.graphs import GraphBatch
from caster_dta_tpu.models.common import TypeEmbedding
from caster_dta_tpu.nn import gvp
from caster_dta_tpu.nn.common import select_activation

Dims = Tuple[int, int]


def _as_dims(x: Union[int, Tuple[int, int], list]) -> Dims:
    """int -> (x, 0), matching reference protein_gnn.py:312-318."""
    if isinstance(x, int):
        return (x, 0)
    return tuple(x)  # type: ignore[return-value]


class VectorProteinGNN_LBAModel(nn.Module):
    """GVP-GNN protein tower (reference protein_gnn.py:289-388).

    Forward: one-hot/embed node+edge types onto the scalar channels, input
    GVP+LayerNorm for nodes and edges, num_convs GVPConvLayers, final
    LayerNorm + GVP -> per-residue scalars.
    """

    in_channels: Dims
    edge_dim: Dims
    num_ntypes: int
    num_etypes: int
    ntype_emb_dim: Optional[int] = None
    etype_emb_dim: Optional[int] = None
    num_convs: int = 1
    hidden_channels: Union[int, Dims, None] = None
    out_channels: Union[int, Dims] = 8
    dropout_rate: float = 0.2
    activation: str = "relu"       # unused by GVP path (kept for kwargs parity)
    edge_hidden_channels: Union[int, Dims] = (32, 1)
    aggr: str = "mean"

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        hidden = _as_dims(self.hidden_channels
                          if self.hidden_channels is not None else self.out_channels)
        out_dims = _as_dims(self.out_channels)
        edge_hidden = _as_dims(self.edge_hidden_channels)

        ntype_emb = TypeEmbedding(self.num_ntypes, self.ntype_emb_dim, name="ntype_embedding")
        etype_emb = TypeEmbedding(self.num_etypes, self.etype_emb_dim, name="etype_embedding")

        x_s = jnp.concatenate([ntype_emb(g.node_type), g.node_s], axis=-1)
        e_s = jnp.concatenate([etype_emb(g.edge_type), g.edge_s], axis=-1)
        x = (x_s, g.node_v)
        eattr = (e_s, g.edge_v)

        # Input GVP + LayerNorm blocks (protein_gnn.py:325-335)
        x = gvp.GVP(hidden, activations=(None, None), vector_gate=True,
                    name="gvp_node_gvp")(x)
        x = gvp.GVPLayerNorm(name="gvp_node_norm")(x)
        eattr = gvp.GVP(edge_hidden, activations=(None, None), vector_gate=True,
                        name="gvp_edge_gvp")(eattr)
        eattr = gvp.GVPLayerNorm(name="gvp_edge_norm")(eattr)

        for i in range(self.num_convs):
            x = gvp.GVPConvLayer(
                drop_rate=self.dropout_rate,
                activations=("relu", None),
                vector_gate=True,
                aggr=self.aggr,
                name=f"conv_{i}",
            )(x, g.edge_src, g.edge_dst, g.edge_mask, eattr,
              deterministic=deterministic)

        x = gvp.GVPLayerNorm(name="gvp_norm_before_scalar")(x)
        s, _ = gvp.GVP(out_dims, activations=("relu", None), vector_gate=True,
                       name="gvp_to_scalar")(x)
        return s


class VectorProteinGNN_PocketMiner(nn.Module):
    """PocketMiner-style GVP variant (reference protein_gnn.py:392-514):
    optional initial structural projection GVP+LN for nodes/edges, then
    LN+GVP input blocks, sigmoid-default GVPConvLayers, final LN+GVP."""

    in_channels: Dims
    edge_dim: Dims
    num_ntypes: int
    num_etypes: int
    ntype_emb_dim: Optional[int] = None
    etype_emb_dim: Optional[int] = None
    num_convs: int = 1
    hidden_channels: Union[int, Dims, None] = None
    out_channels: Union[int, Dims] = 8
    dropout_rate: float = 0.2
    activation: str = "relu"
    edge_hidden_channels: Union[int, Dims] = (32, 1)
    initial_node_project_channels: Optional[Dims] = None
    initial_edge_project_channels: Optional[Dims] = None

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        hidden = _as_dims(self.hidden_channels
                          if self.hidden_channels is not None else self.out_channels)
        out_dims = _as_dims(self.out_channels)
        edge_hidden = _as_dims(self.edge_hidden_channels)

        x = (g.node_s, g.node_v)
        eattr = (g.edge_s, g.edge_v)
        if self.initial_node_project_channels is not None:
            x = gvp.GVP(tuple(self.initial_node_project_channels),
                        activations=(None, None), name="node_proj_gvp")(x)
            x = gvp.GVPLayerNorm(name="node_proj_norm")(x)
        if self.initial_edge_project_channels is not None:
            eattr = gvp.GVP(tuple(self.initial_edge_project_channels),
                            activations=(None, None), name="edge_proj_gvp")(eattr)
            eattr = gvp.GVPLayerNorm(name="edge_proj_norm")(eattr)

        ntype_emb = TypeEmbedding(self.num_ntypes, self.ntype_emb_dim, name="ntype_embedding")
        etype_emb = TypeEmbedding(self.num_etypes, self.etype_emb_dim, name="etype_embedding")
        x = (jnp.concatenate([ntype_emb(g.node_type), x[0]], -1), x[1])
        eattr = (jnp.concatenate([etype_emb(g.edge_type), eattr[0]], -1), eattr[1])

        # LN first, then GVP (protein_gnn.py:454-462 — reversed order vs LBA)
        x = gvp.GVPLayerNorm(name="gvp_node_norm")(x)
        x = gvp.GVP(hidden, activations=(None, None), name="gvp_node_gvp")(x)
        eattr = gvp.GVPLayerNorm(name="gvp_edge_norm")(eattr)
        eattr = gvp.GVP(edge_hidden, activations=(None, None), name="gvp_edge_gvp")(eattr)

        for i in range(self.num_convs):
            x = gvp.GVPConvLayer(
                drop_rate=self.dropout_rate,
                activations=(None, None),
                name=f"conv_{i}",
            )(x, g.edge_src, g.edge_dst, g.edge_mask, eattr,
              deterministic=deterministic)

        x = gvp.GVPLayerNorm(name="gvp_norm_before_scalar")(x)
        s, _ = gvp.GVP(out_dims, activations=(None, None), name="gvp_to_scalar")(x)
        return s


class VectorProteinGNN_CPDModel(nn.Module):
    """CPD-style encoder/decoder GVP (reference protein_gnn.py:518-608):
    num_convs encoder GVPConvLayers, then num_convs autoregressive decoder
    layers where node-type embeddings are masked onto edges for src >= dst."""

    in_channels: Dims
    edge_dim: Dims
    num_ntypes: int
    num_etypes: int
    ntype_emb_dim: Optional[int] = None
    etype_emb_dim: Optional[int] = None
    num_convs: int = 1
    hidden_channels: Union[int, Dims, None] = None
    out_channels: Union[int, Dims] = 8
    dropout_rate: float = 0.2
    activation: str = "relu"
    edge_hidden_channels: Union[int, Dims] = (32, 1)

    @nn.compact
    def __call__(self, g: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        hidden = _as_dims(self.hidden_channels
                          if self.hidden_channels is not None else self.out_channels)
        out_dims = _as_dims(self.out_channels)
        edge_hidden = _as_dims(self.edge_hidden_channels)

        ntype_emb = TypeEmbedding(self.num_ntypes, self.ntype_emb_dim, name="ntype_embedding")
        etype_emb = TypeEmbedding(self.num_etypes, self.etype_emb_dim, name="etype_embedding")

        # Edge types embedded up front; node types only enter via decoder
        # edges (protein_gnn.py:582-587).
        eattr = (jnp.concatenate([etype_emb(g.edge_type), g.edge_s], -1), g.edge_v)

        x = (g.node_s, g.node_v)
        x = gvp.GVP(hidden, activations=(None, None), name="W_v_gvp")(x)
        x = gvp.GVPLayerNorm(name="W_v_norm")(x)
        eattr = gvp.GVP(edge_hidden, activations=(None, None), name="W_e_gvp")(eattr)
        eattr = gvp.GVPLayerNorm(name="W_e_norm")(eattr)

        for i in range(self.num_convs):
            x = gvp.GVPConvLayer(drop_rate=self.dropout_rate, name=f"encoder_{i}")(
                x, g.edge_src, g.edge_dst, g.edge_mask, eattr,
                deterministic=deterministic)

        encoder_embeddings = x

        # Node-type embeddings of the source node, zeroed on src >= dst edges
        # (protein_gnn.py:597-601).
        from caster_dta_tpu.ops import segment
        h_s = ntype_emb(g.node_type)                              # [B, N, T]
        h_s = segment.gather_nodes(h_s, g.edge_src)               # [B, E, T]
        h_s = jnp.where((g.edge_src >= g.edge_dst)[..., None], 0.0, h_s)
        eattr_dec = (jnp.concatenate([eattr[0], h_s], -1), eattr[1])

        for i in range(self.num_convs):
            x = gvp.GVPConvLayer(drop_rate=self.dropout_rate, autoregressive=True,
                                 name=f"decoder_{i}")(
                x, g.edge_src, g.edge_dst, g.edge_mask, eattr_dec,
                autoregressive_x=encoder_embeddings, deterministic=deterministic)

        s, _ = gvp.GVP(out_dims, activations=(None, None), name="W_out")(x)
        return s


PROTEIN_MODELS = {
    "lbamodel": VectorProteinGNN_LBAModel,
    "pocketminer": VectorProteinGNN_PocketMiner,
    "cpdmodel": VectorProteinGNN_CPDModel,
    # scalar baselines registered by models/scalar_gnns.py (gatv2, heat)
}

VECTOR_MODELS = ("lbamodel", "pocketminer", "cpdmodel")


def make_protein_gnn(base_conv: str, **kwargs) -> nn.Module:
    """Selectable wrapper (reference protein_gnn.py:14-82): dispatch on
    base_conv, validating scalar vs (s, v) input typing."""
    from caster_dta_tpu.models import scalar_gnns  # registers gatv2/heat

    in_channels = kwargs.get("in_channels")
    edge_dim = kwargs.get("edge_dim")
    is_scalar = isinstance(in_channels, int)
    if type(in_channels) is not type(edge_dim):
        raise ValueError("in_channels and edge_dim must be the same type "
                         "(both int or both (scalar, vector) tuples)")
    if is_scalar and base_conv in VECTOR_MODELS:
        raise ValueError(f"Cannot use vector model {base_conv} with scalar input")
    if not is_scalar and base_conv not in VECTOR_MODELS:
        raise ValueError(f"Cannot use scalar model {base_conv} with vector input")
    if base_conv not in PROTEIN_MODELS:
        raise ValueError(f"unknown protein base_conv: {base_conv!r}")
    cls = PROTEIN_MODELS[base_conv]
    field_names = {f for f in cls.__dataclass_fields__}
    kwargs = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in kwargs.items() if k in field_names}
    return cls(**kwargs)


def protein_out_channels(base_conv: str, out_channels) -> int:
    """Scalar output width of the tower (reference joint_gnn.py:70-76)."""
    if isinstance(out_channels, (tuple, list)):
        return out_channels[0]
    return out_channels
