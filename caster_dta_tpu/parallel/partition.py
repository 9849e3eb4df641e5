"""Edge-partitioned graph parallelism: one giant protein graph across devices.

The reference is strictly single-device and *bounds* protein size instead of
scaling it (3,000-residue cap, dataset/load_data.py:218-222; SURVEY §2.4/§5).
This module is the TPU-native capability the reference lacks: a protein graph
too large for one chip is partitioned across a ``gp`` mesh axis and message
passing runs with per-layer boundary ("halo") feature exchange over ICI.

Design (SURVEY §7 step 7b):

  * **Nodes** are block-partitioned: shard ``g`` owns rows
    ``[g*Ns, (g+1)*Ns)``. All node-wise ops (input GVPs, norms, residuals,
    feedforward, output head) are embarrassingly parallel.
  * **Edges** live with the shard that owns their *destination* node. Since
    the global edge list is sorted by dst (data/graphs.py contract), each
    shard's edge block is contiguous and stays sorted — the local aggregation
    is the same sorted segment-sum as single-device, and **degree counts are
    exact** (every edge lives on exactly one shard, so no cross-partition
    normalization correction is needed for mean aggregation).
  * **Halo exchange**: before each conv layer, every shard sends the current
    features of the boundary nodes it owns to the shards whose edges read
    them, via one ``jax.lax.all_to_all`` over ICI ([G, H, F] send/recv
    buffers, send lists precomputed on host). Edge ``src`` indices are
    pre-remapped into the concatenated ``[local nodes | halo buffer]`` space,
    so the conv's gather is a plain local gather.
  * The partitioned model re-declares the same flax submodule names as
    ``VectorProteinGNN_LBAModel`` (models/protein.py), so a single-device
    parameter tree — including one transplanted from the reference's
    PyTorch checkpoint — applies unchanged. Parity is tested on a virtual
    8-device CPU mesh (tests/test_partition.py).

``jax.lax.all_to_all`` is differentiable (its transpose is the reverse
all_to_all), so gradients flow through halo exchanges; grad parity vs the
single-device model is part of the test contract.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from caster_dta_tpu.models.common import TypeEmbedding
from caster_dta_tpu.models.protein import _as_dims
from caster_dta_tpu.nn import gvp

Dims = Tuple[int, int]


@struct.dataclass
class ShardedProteinGraph:
    """One protein graph partitioned over G shards (leading axis = shard).

    Shapes: G shards, Ns nodes/shard, Es edges/shard, H halo slots/peer.
    ``edge_src_ext`` indexes the per-shard extended node array
    ``concat([local Ns rows, halo G*H rows])``; ``edge_dst`` is shard-local
    and sorted ascending. ``send_idx[g, p, :]`` lists the local rows shard g
    must ship to peer p each exchange (masked by ``send_mask``).
    """

    node_s: jnp.ndarray        # f32 [G, Ns, ds]
    node_v: jnp.ndarray        # f32 [G, Ns, dv, 3]
    node_type: jnp.ndarray     # i32 [G, Ns]
    node_mask: jnp.ndarray     # bool [G, Ns]
    edge_src_ext: jnp.ndarray  # i32 [G, Es] in [0, Ns + G*H)
    edge_dst: jnp.ndarray      # i32 [G, Es] local, sorted; pad = Ns-1
    edge_s: jnp.ndarray        # f32 [G, Es, es]
    edge_v: jnp.ndarray        # f32 [G, Es, ev, 3]
    edge_type: jnp.ndarray     # i32 [G, Es]
    edge_mask: jnp.ndarray     # bool [G, Es]
    send_idx: jnp.ndarray      # i32 [G, G, H] local node rows to send to peer
    send_mask: jnp.ndarray     # f32 [G, G, H] 1.0 for real halo slots

    @property
    def n_shards(self) -> int:
        return self.node_s.shape[0]

    @property
    def nodes_per_shard(self) -> int:
        return self.node_s.shape[1]

    @property
    def halo_per_peer(self) -> int:
        return self.send_idx.shape[2]


def partition_protein_graph(
    node_s: np.ndarray,
    node_v: np.ndarray,
    edge_index: np.ndarray,     # [2, E] (src, dst) global, real edges only
    edge_s: np.ndarray,
    edge_v: np.ndarray,
    node_type: np.ndarray,
    edge_type: np.ndarray,
    n_shards: int,
    nodes_per_shard: Optional[int] = None,
    edges_per_shard: Optional[int] = None,
    halo_per_peer: Optional[int] = None,
) -> ShardedProteinGraph:
    """Host-side partition planning for one (unpadded) protein graph.

    Pads node/edge/halo counts up to static per-shard budgets (computed from
    the graph when not given; give explicit budgets to share one compiled
    executable across graphs of a bucket).
    """
    node_s = np.asarray(node_s, np.float32)
    n = node_s.shape[0]
    g_ = n_shards
    ns = nodes_per_shard or -(-n // g_)
    if ns * g_ < n:
        raise ValueError(f"nodes_per_shard {ns} too small for {n} nodes on {g_} shards")

    edge_index = np.asarray(edge_index)
    src, dst = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    edge_s = np.asarray(edge_s, np.float32)[order]
    edge_v = np.asarray(edge_v, np.float32)[order]
    edge_type = np.asarray(edge_type, np.int64)[order]

    owner = dst // ns
    per_shard_e = np.bincount(owner, minlength=g_)
    es = edges_per_shard or int(per_shard_e.max())
    if per_shard_e.max() > es:
        raise ValueError(f"edges_per_shard {es} too small (max {per_shard_e.max()})")

    # Halo sets: for dst-shard g, the remote src nodes it reads, per owner.
    need: list[list[np.ndarray]] = []  # need[g][h] = sorted global ids
    for gsh in range(g_):
        e_sel = owner == gsh
        s_g = src[e_sel]
        row = []
        for h in range(g_):
            if h == gsh:
                row.append(np.empty(0, np.int64))
            else:
                ids = np.unique(s_g[(s_g // ns) == h])
                row.append(ids)
        need.append(row)
    h_needed = max((len(need[gsh][h]) for gsh in range(g_) for h in range(g_)),
                   default=0)
    hh = halo_per_peer if halo_per_peer is not None else max(h_needed, 1)
    if h_needed > hh:
        raise ValueError(f"halo_per_peer {hh} too small (max {h_needed})")

    ds_, dv_ = node_s.shape[1], (np.asarray(node_v).shape[1] if node_v is not None else 0)
    node_v = (np.asarray(node_v, np.float32) if node_v is not None
              else np.zeros((n, 0, 3), np.float32))
    node_type = np.asarray(node_type, np.int64)

    out = dict(
        node_s=np.zeros((g_, ns, ds_), np.float32),
        node_v=np.zeros((g_, ns, dv_, 3), np.float32),
        node_type=np.zeros((g_, ns), np.int32),
        node_mask=np.zeros((g_, ns), bool),
        edge_src_ext=np.zeros((g_, es), np.int32),
        edge_dst=np.full((g_, es), ns - 1, np.int32),
        edge_s=np.zeros((g_, es, edge_s.shape[1]), np.float32),
        edge_v=np.zeros((g_, es) + edge_v.shape[1:], np.float32),
        edge_type=np.zeros((g_, es), np.int32),
        edge_mask=np.zeros((g_, es), bool),
        send_idx=np.zeros((g_, g_, hh), np.int32),
        send_mask=np.zeros((g_, g_, hh), np.float32),
    )

    # send lists: send_idx[h, g] = local rows on h that g needs (need[g][h])
    for gsh in range(g_):
        for h in range(g_):
            ids = need[gsh][h]
            out["send_idx"][h, gsh, : len(ids)] = ids - h * ns
            out["send_mask"][h, gsh, : len(ids)] = 1.0

    for gsh in range(g_):
        lo, hi = gsh * ns, min((gsh + 1) * ns, n)
        cnt = hi - lo
        if cnt > 0:
            out["node_s"][gsh, :cnt] = node_s[lo:hi]
            out["node_v"][gsh, :cnt] = node_v[lo:hi]
            out["node_type"][gsh, :cnt] = node_type[lo:hi]
            out["node_mask"][gsh, :cnt] = True

        e_sel = np.nonzero(owner == gsh)[0]
        ne = len(e_sel)
        out["edge_dst"][gsh, :ne] = dst[e_sel] - lo
        out["edge_s"][gsh, :ne] = edge_s[e_sel]
        out["edge_v"][gsh, :ne] = edge_v[e_sel]
        out["edge_type"][gsh, :ne] = edge_type[e_sel]
        out["edge_mask"][gsh, :ne] = True

        # remap src -> extended index: local row, or Ns + owner*H + slot
        halo_pos = {}
        for h in range(g_):
            for p, u in enumerate(need[gsh][h]):
                halo_pos[int(u)] = ns + h * hh + p
        s_g = src[e_sel]
        ext = np.where(
            (s_g >= lo) & (s_g < hi),
            s_g - lo,
            np.array([halo_pos.get(int(u), 0) for u in s_g], np.int64),
        )
        out["edge_src_ext"][gsh, :ne] = ext

    return ShardedProteinGraph(**{k: jnp.asarray(v) for k, v in out.items()})


def _exchange_halo(feat: jnp.ndarray, send_idx: jnp.ndarray,
                   send_mask: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """One halo exchange inside shard_map.

    feat [1, Ns, ...] local features; send_idx/send_mask [1, G, H].
    Returns the halo buffer [1, G*H, ...] where rows ``h*H:(h+1)*H`` are the
    features shard ``h`` owns (masked slots zeroed).
    """
    buf = feat[0][send_idx[0]]                       # [G, H, ...]
    mask = send_mask[0].reshape(send_mask.shape[1:] + (1,) * (buf.ndim - 2))
    buf = buf * mask
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)
    # tiled=False with leading axis == group size: recv[h] = what h sent us
    return recv.reshape((1, -1) + recv.shape[2:])


class PartitionedLBAProteinGNN(nn.Module):
    """``VectorProteinGNN_LBAModel`` executing one graph partitioned over the
    ``axis_name`` mesh axis (call under shard_map; see run_partitioned).

    Declares identical flax submodule names to the single-device model
    (models/protein.py:33-91), so the same parameter tree applies.
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
    activation: str = "relu"
    edge_hidden_channels: Union[int, Dims] = (32, 1)
    aggr: str = "mean"
    axis_name: str = "gp"

    @nn.compact
    def __call__(self, sh: ShardedProteinGraph, deterministic: bool = True) -> jnp.ndarray:
        hidden = _as_dims(self.hidden_channels
                          if self.hidden_channels is not None else self.out_channels)
        out_dims = _as_dims(self.out_channels)
        edge_hidden = _as_dims(self.edge_hidden_channels)
        ns = sh.node_s.shape[1]

        ntype_emb = TypeEmbedding(self.num_ntypes, self.ntype_emb_dim, name="ntype_embedding")
        etype_emb = TypeEmbedding(self.num_etypes, self.etype_emb_dim, name="etype_embedding")

        x_s = jnp.concatenate([ntype_emb(sh.node_type), sh.node_s], axis=-1)
        e_s = jnp.concatenate([etype_emb(sh.edge_type), sh.edge_s], axis=-1)
        x = (x_s, sh.node_v)
        eattr = (e_s, sh.edge_v)

        x = gvp.GVP(hidden, activations=(None, None), vector_gate=True,
                    name="gvp_node_gvp")(x)
        x = gvp.GVPLayerNorm(name="gvp_node_norm")(x)
        eattr = gvp.GVP(edge_hidden, activations=(None, None), vector_gate=True,
                        name="gvp_edge_gvp")(eattr)
        eattr = gvp.GVPLayerNorm(name="gvp_edge_norm")(eattr)

        for i in range(self.num_convs):
            # refresh halo from owners, run the conv on the extended array,
            # keep only owned rows
            halo_s = _exchange_halo(x[0], sh.send_idx, sh.send_mask, self.axis_name)
            halo_v = _exchange_halo(x[1], sh.send_idx, sh.send_mask, self.axis_name)
            x_ext = (jnp.concatenate([x[0], halo_s], axis=1),
                     jnp.concatenate([x[1], halo_v], axis=1))
            y = gvp.GVPConvLayer(
                drop_rate=self.dropout_rate,
                activations=("relu", None),
                vector_gate=True,
                aggr=self.aggr,
                name=f"conv_{i}",
            )(x_ext, sh.edge_src_ext, sh.edge_dst, sh.edge_mask, eattr,
              deterministic=deterministic)
            x = (y[0][:, :ns], y[1][:, :ns])

        x = gvp.GVPLayerNorm(name="gvp_norm_before_scalar")(x)
        s, _ = gvp.GVP(out_dims, activations=("relu", None), vector_gate=True,
                       name="gvp_to_scalar")(x)
        return s


def shard_specs(axis_name: str = "gp") -> ShardedProteinGraph:
    """PartitionSpecs for shard_map in_specs (leading axis = shard)."""
    spec = P(axis_name)
    return ShardedProteinGraph(
        node_s=spec, node_v=spec, node_type=spec, node_mask=spec,
        edge_src_ext=spec, edge_dst=spec, edge_s=spec, edge_v=spec,
        edge_type=spec, edge_mask=spec, send_idx=spec, send_mask=spec)


def run_partitioned(
    model: PartitionedLBAProteinGNN,
    variables,
    sharded: ShardedProteinGraph,
    mesh: Mesh,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Apply the partitioned protein tower over ``mesh`` (axis = model.axis_name).

    Returns per-residue scalar embeddings [G*Ns, out] in global node order
    (gather of the per-shard outputs).
    """
    axis = model.axis_name

    def fn(vars_, sh):
        out = model.apply(vars_, sh, deterministic)   # [1, Ns, out] per shard
        return out

    shmap = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), shard_specs(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    out = shmap(variables, sharded)                    # [G, Ns, out] stacked
    return out.reshape(-1, out.shape[-1])
