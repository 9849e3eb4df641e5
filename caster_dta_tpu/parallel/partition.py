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
  * **Edges** live with the shard that owns their *destination* node, split
    into an **interior block** (src also local) and a **boundary block**
    (src remote). Each block stays sorted by dst, so local aggregation is
    the same sorted segment-sum as single-device, and **degree counts are
    exact** (every edge lives on exactly one shard; mean aggregation
    normalizes once over the combined interior+boundary degree).
  * **Halo exchange overlapped with compute**: before each conv layer every
    shard ships the boundary-node features it owns to the shards whose edges
    read them, via one ``jax.lax.all_to_all`` over ICI. Only the *boundary*
    edge block depends on the received halo — the interior block's message
    MLP + aggregation are issued first with no data dependency on the
    collective, so XLA's latency-hiding scheduler runs the exchange
    concurrently with the interior math (SURVEY §7.7 double-buffered design,
    expressed as a dependency split rather than manual buffers).
  * The partitioned model re-declares the same flax submodule names as
    ``VectorProteinGNN_LBAModel`` (models/protein.py), so a single-device
    parameter tree — including one transplanted from the reference's
    PyTorch checkpoint — applies unchanged.
  * **Planning is vectorized** (numpy sort/unique/searchsorted; no per-edge
    Python) so BindingDB-scale proteins partition in milliseconds, and
    explicit per-shard budgets let one compiled executable cover a bucket.

``jax.lax.all_to_all``/``all_gather`` are differentiable, so gradients flow
through halo exchanges; grad parity vs the single-device model is part of
the test contract (tests/test_partition.py).
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
from caster_dta_tpu.models.joint import JointGNN
from caster_dta_tpu.models.protein import _as_dims
from caster_dta_tpu.nn import gvp

Dims = Tuple[int, int]


@struct.dataclass
class ShardedProteinGraph:
    """One protein graph partitioned over G shards (leading axis = shard).

    Shapes: G shards, Ns nodes/shard, Ei interior edges/shard, Eb boundary
    edges/shard, H halo slots/peer. Interior edges have both endpoints local
    (``int_src`` in [0, Ns)); boundary edges read remote sources through the
    halo buffer (``bnd_src_ext`` indexes ``concat([local Ns rows, halo G*H
    rows])``). Both dst arrays are shard-local and sorted ascending (pad =
    Ns-1). ``send_idx[g, p, :]`` lists the local rows shard g must ship to
    peer p each exchange (masked by ``send_mask``).
    """

    node_s: jnp.ndarray        # f32 [G, Ns, ds]
    node_v: jnp.ndarray        # f32 [G, Ns, dv, 3]
    node_type: jnp.ndarray     # i32 [G, Ns]
    node_mask: jnp.ndarray     # bool [G, Ns]
    int_src: jnp.ndarray       # i32 [G, Ei] local
    int_dst: jnp.ndarray       # i32 [G, Ei] local, sorted; pad = Ns-1
    int_s: jnp.ndarray         # f32 [G, Ei, es]
    int_v: jnp.ndarray         # f32 [G, Ei, ev, 3]
    int_type: jnp.ndarray      # i32 [G, Ei]
    int_mask: jnp.ndarray      # bool [G, Ei]
    bnd_src_ext: jnp.ndarray   # i32 [G, Eb] in [0, Ns + G*H)
    bnd_dst: jnp.ndarray       # i32 [G, Eb] local, sorted; pad = Ns-1
    bnd_s: jnp.ndarray         # f32 [G, Eb, es]
    bnd_v: jnp.ndarray         # f32 [G, Eb, ev, 3]
    bnd_type: jnp.ndarray      # i32 [G, Eb]
    bnd_mask: jnp.ndarray      # bool [G, Eb]
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
    interior_edges_per_shard: Optional[int] = None,
    boundary_edges_per_shard: Optional[int] = None,
    halo_per_peer: Optional[int] = None,
) -> ShardedProteinGraph:
    """Host-side partition planning for one (unpadded) protein graph —
    fully vectorized (sort/bincount/unique/searchsorted; no per-edge Python).

    Pads node/edge/halo counts up to static per-shard budgets (computed from
    the graph when not given; give explicit budgets to share one compiled
    executable across the graphs of a bucket).
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

    owner = dst // ns                     # dst shard owns the edge
    src_owner = src // ns
    is_bnd = src_owner != owner

    e_int = np.bincount(owner[~is_bnd], minlength=g_)
    e_bnd = np.bincount(owner[is_bnd], minlength=g_)
    ei = interior_edges_per_shard or max(int(e_int.max()), 1)
    eb = boundary_edges_per_shard or max(int(e_bnd.max()), 1)
    if e_int.max() > ei:
        raise ValueError(f"interior_edges_per_shard {ei} too small "
                         f"(max {e_int.max()})")
    if e_bnd.max() > eb:
        raise ValueError(f"boundary_edges_per_shard {eb} too small "
                         f"(max {e_bnd.max()})")

    # ------------------------------------------------------- halo planning
    # unique (dst_shard g, src_shard h, src u) triples over boundary edges;
    # np.unique(axis=0) sorts lexicographically, so rows group by (g, h)
    # with u ascending inside each group.
    if is_bnd.any():
        triples = np.unique(np.stack(
            [owner[is_bnd], src_owner[is_bnd], src[is_bnd]], axis=1), axis=0)
        gh = triples[:, 0] * g_ + triples[:, 1]
        group_keys, group_starts, group_counts = np.unique(
            gh, return_index=True, return_counts=True)
        h_needed = int(group_counts.max())
    else:
        triples = np.zeros((0, 3), np.int64)
        group_keys = np.zeros(0, np.int64)
        group_starts = np.zeros(0, np.int64)
        group_counts = np.zeros(0, np.int64)
        h_needed = 0
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
        int_src=np.zeros((g_, ei), np.int32),
        int_dst=np.full((g_, ei), ns - 1, np.int32),
        int_s=np.zeros((g_, ei, edge_s.shape[1]), np.float32),
        int_v=np.zeros((g_, ei) + edge_v.shape[1:], np.float32),
        int_type=np.zeros((g_, ei), np.int32),
        int_mask=np.zeros((g_, ei), bool),
        bnd_src_ext=np.zeros((g_, eb), np.int32),
        bnd_dst=np.full((g_, eb), ns - 1, np.int32),
        bnd_s=np.zeros((g_, eb, edge_s.shape[1]), np.float32),
        bnd_v=np.zeros((g_, eb) + edge_v.shape[1:], np.float32),
        bnd_type=np.zeros((g_, eb), np.int32),
        bnd_mask=np.zeros((g_, eb), bool),
        send_idx=np.zeros((g_, g_, hh), np.int32),
        send_mask=np.zeros((g_, g_, hh), np.float32),
    )

    # nodes: one reshape-style block copy per shard
    for gsh in range(g_):
        lo, hi = gsh * ns, min((gsh + 1) * ns, n)
        cnt = hi - lo
        if cnt > 0:
            out["node_s"][gsh, :cnt] = node_s[lo:hi]
            out["node_v"][gsh, :cnt] = node_v[lo:hi]
            out["node_type"][gsh, :cnt] = node_type[lo:hi]
            out["node_mask"][gsh, :cnt] = True

    # send lists: slot p of (owner h, reader g) = p-th smallest needed id
    slot_of_triple = np.zeros(len(triples), np.int64)
    for k, start, cnt in zip(group_keys, group_starts, group_counts):
        slot_of_triple[start:start + cnt] = np.arange(cnt)
        gsh, h = int(k) // g_, int(k) % g_
        ids = triples[start:start + cnt, 2]
        out["send_idx"][h, gsh, :cnt] = ids - h * ns
        out["send_mask"][h, gsh, :cnt] = 1.0

    # boundary src -> extended index ns + h*H + slot, via a lex-sorted lookup
    # of (g, h, u) into the triples table
    if is_bnd.any():
        b_g, b_h, b_u = owner[is_bnd], src_owner[is_bnd], src[is_bnd]
        key_all = (triples[:, 0] * g_ + triples[:, 1]) * (n + 1) + triples[:, 2]
        key_q = (b_g * g_ + b_h) * (n + 1) + b_u
        pos = np.searchsorted(key_all, key_q)
        bnd_ext_all = ns + b_h * hh + slot_of_triple[pos]

    # per-shard edge block fill: boolean masks keep dst-sorted order
    pos_in_shard = np.empty(len(dst), np.int64)
    for gsh in range(g_):
        sel_i = np.nonzero((owner == gsh) & ~is_bnd)[0]
        out["int_src"][gsh, :len(sel_i)] = src[sel_i] - gsh * ns
        out["int_dst"][gsh, :len(sel_i)] = dst[sel_i] - gsh * ns
        out["int_s"][gsh, :len(sel_i)] = edge_s[sel_i]
        out["int_v"][gsh, :len(sel_i)] = edge_v[sel_i]
        out["int_type"][gsh, :len(sel_i)] = edge_type[sel_i]
        out["int_mask"][gsh, :len(sel_i)] = True

        sel_b = np.nonzero((owner == gsh) & is_bnd)[0]
        if len(sel_b):
            bnd_positions = np.nonzero((b_g == gsh))[0] if is_bnd.any() else []
            out["bnd_src_ext"][gsh, :len(sel_b)] = bnd_ext_all[bnd_positions]
            out["bnd_dst"][gsh, :len(sel_b)] = dst[sel_b] - gsh * ns
            out["bnd_s"][gsh, :len(sel_b)] = edge_s[sel_b]
            out["bnd_v"][gsh, :len(sel_b)] = edge_v[sel_b]
            out["bnd_type"][gsh, :len(sel_b)] = edge_type[sel_b]
            out["bnd_mask"][gsh, :len(sel_b)] = True

    return ShardedProteinGraph(**{k: jnp.asarray(v) for k, v in out.items()})


def _exchange_halo(feat: jnp.ndarray, send_idx: jnp.ndarray,
                   send_mask: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """One halo exchange inside shard_map (batched over pairs).

    feat [B, Ns, ...] local features; send_idx/send_mask [B, G, H].
    Returns the halo buffer [B, G*H, ...] where rows ``h*H:(h+1)*H`` are the
    features shard ``h`` owns (masked slots zeroed).
    """
    from caster_dta_tpu.ops import segment

    b, g, h = send_idx.shape
    buf = segment.gather_nodes(feat, send_idx.reshape(b, g * h))
    buf = buf.reshape((b, g, h) + buf.shape[2:])     # [B, G, H, ...]
    mask = send_mask.reshape((b, g, h) + (1,) * (buf.ndim - 3))
    buf = buf * mask
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=1, concat_axis=1,
                              tiled=False)
    # tiled=False with split-axis size == group size: recv[:, h] = what shard
    # h sent us
    return recv.reshape((b, g * h) + recv.shape[3:])


def _local(tree):
    """Strip the gp-sharded axis (size 1 locally): [B, 1, ...] -> [B, ...]."""
    return jax.tree_util.tree_map(lambda a: a[:, 0], tree)


class PartitionedLBAProteinGNN(nn.Module):
    """``VectorProteinGNN_LBAModel`` executing graphs partitioned over the
    ``axis_name`` mesh axis (call under shard_map; see run_partitioned).

    Input leaves are the LOCAL slices of batch-first stacked arrays
    ``[B, 1, ...]`` (global ``[B, G, ...]`` with the gp axis sharded); all
    node/edge math runs batched over the B pairs exactly like the
    single-device model over ``[B, N, ...]``.

    Declares identical flax submodule names to the single-device model
    (models/protein.py:33-91), so the same parameter tree applies. Each conv
    layer issues the halo all_to_all and the interior edge block's messages
    with no mutual dependency — the collective overlaps with interior
    compute — then adds the boundary block's contribution (shared conv
    params via GVPConvLayer's ``boundary`` argument).

    With ``n_shards`` set, dropout masks are sliced from the global-canonical
    mask (nn/gvp.py GVPDropout.shard_rows), so training with dropout is
    mathematically identical to the single-device model — partitioning never
    changes the model.
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
    n_shards: Optional[int] = None   # required for dropout (mask parity)

    @nn.compact
    def __call__(self, sh: ShardedProteinGraph, deterministic: bool = True) -> jnp.ndarray:
        hidden = _as_dims(self.hidden_channels
                          if self.hidden_channels is not None else self.out_channels)
        out_dims = _as_dims(self.out_channels)
        edge_hidden = _as_dims(self.edge_hidden_channels)
        sh = _local(sh)   # [B, 1, ...] -> [B, ...]

        ntype_emb = TypeEmbedding(self.num_ntypes, self.ntype_emb_dim, name="ntype_embedding")
        etype_emb = TypeEmbedding(self.num_etypes, self.etype_emb_dim, name="etype_embedding")

        x_s = jnp.concatenate([ntype_emb(sh.node_type), sh.node_s], axis=-1)
        x = (x_s, sh.node_v)

        # both edge blocks run through the same input GVP+norm (params shared
        # by module reuse), staying in their own static shapes
        gvp_edge = gvp.GVP(edge_hidden, activations=(None, None),
                           vector_gate=True, name="gvp_edge_gvp")
        edge_norm = gvp.GVPLayerNorm(name="gvp_edge_norm")
        ei_s = jnp.concatenate([etype_emb(sh.int_type), sh.int_s], axis=-1)
        eb_s = jnp.concatenate([etype_emb(sh.bnd_type), sh.bnd_s], axis=-1)
        eattr_i = edge_norm(gvp_edge((ei_s, sh.int_v)))
        eattr_b = edge_norm(gvp_edge((eb_s, sh.bnd_v)))

        x = gvp.GVP(hidden, activations=(None, None), vector_gate=True,
                    name="gvp_node_gvp")(x)
        x = gvp.GVPLayerNorm(name="gvp_node_norm")(x)

        shard_rows = ((self.axis_name, self.n_shards)
                      if self.n_shards is not None else None)
        if (not deterministic and self.dropout_rate > 0.0
                and shard_rows is None):
            raise ValueError(
                "partitioned training with dropout requires n_shards (the "
                "gp mesh size) so masks slice from the global-canonical "
                "pattern — otherwise every shard would draw the SAME mask "
                "from the shared key and the model would silently differ "
                "from its single-device counterpart")
        for i in range(self.num_convs):
            # issue the exchange; only the boundary block consumes it, so the
            # interior conv (inside GVPConvLayer) overlaps with the collective
            halo_s = _exchange_halo(x[0], sh.send_idx, sh.send_mask, self.axis_name)
            halo_v = _exchange_halo(x[1], sh.send_idx, sh.send_mask, self.axis_name)
            x_ext = (jnp.concatenate([x[0], halo_s], axis=1),
                     jnp.concatenate([x[1], halo_v], axis=1))
            x = gvp.GVPConvLayer(
                drop_rate=self.dropout_rate,
                activations=("relu", None),
                vector_gate=True,
                aggr=self.aggr,
                dropout_shard_rows=shard_rows,
                name=f"conv_{i}",
            )(x, sh.int_src, sh.int_dst, sh.int_mask, eattr_i,
              deterministic=deterministic,
              boundary=(x_ext, sh.bnd_src_ext, sh.bnd_dst, sh.bnd_mask,
                        eattr_b))

        x = gvp.GVPLayerNorm(name="gvp_norm_before_scalar")(x)
        s, _ = gvp.GVP(out_dims, activations=("relu", None), vector_gate=True,
                       name="gvp_to_scalar")(x)
        return s


def shard_specs(axis_name: str = "gp",
                dp_axis: Optional[str] = None) -> ShardedProteinGraph:
    """PartitionSpecs for shard_map in_specs over batch-first stacked arrays
    ``[B, G, ...]``: batch dim over ``dp_axis`` (or replicated), shard dim
    over ``axis_name``."""
    spec = P(dp_axis, axis_name)
    return ShardedProteinGraph(
        node_s=spec, node_v=spec, node_type=spec, node_mask=spec,
        int_src=spec, int_dst=spec, int_s=spec, int_v=spec,
        int_type=spec, int_mask=spec,
        bnd_src_ext=spec, bnd_dst=spec, bnd_s=spec, bnd_v=spec,
        bnd_type=spec, bnd_mask=spec, send_idx=spec, send_mask=spec)


def run_partitioned(
    model: PartitionedLBAProteinGNN,
    variables,
    sharded: ShardedProteinGraph,
    mesh: Mesh,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Apply the partitioned protein tower over ``mesh`` (axis = model.axis_name)
    to ONE graph (unbatched ``[G, ...]`` leaves).

    Returns per-residue scalar embeddings [G*Ns, out] in global node order
    (concatenation of the per-shard outputs).
    """
    axis = model.axis_name

    def fn(vars_, sh):
        return model.apply(vars_, sh, deterministic)  # [1, Ns, out] local

    shmap = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), shard_specs(axis)),
        out_specs=P(None, axis),
        check_vma=False,
    ))
    batched = jax.tree_util.tree_map(lambda a: a[None], sharded)
    out = shmap(variables, batched)                    # [1, G*Ns, out]
    return out[0]


# ---------------------------------------------------------------------------
# JointGNN integration: gp (protein partition) x dp (pairs) 2-D mesh
# ---------------------------------------------------------------------------

class PartitionedJointGNN(JointGNN):
    """JointGNN whose protein tower executes edge-partitioned over the
    ``partition_axis`` mesh axis (must be called under shard_map).

    Batched: the sharded protein input carries B pairs ([B, 1, ...] local
    leaves); the molecule GraphBatch is the usual [B, ...]. The partitioned
    tower's per-shard residue embeddings are all_gathered over the axis into
    the full [B, R, D] array; the molecule tower and the joint head then run
    replicated on every gp member (identical math — their parameter
    gradients stay exact because the train-step loss is pmean'd over the gp
    axis as well, see make_partitioned_fit_steps). The parameter tree is
    identical to the single-device JointGNN's.
    """

    partition_axis: str = "gp"
    n_shards: Optional[int] = None

    @nn.compact
    def __call__(self, sharded_protein: ShardedProteinGraph, molecule_graph,
                 deterministic: bool = True, return_attention: bool = True):
        pk = {k: v for k, v in self.protein_gnn_kwargs.items()
              if k != "base_conv"}
        if self.protein_gnn_kwargs.get("base_conv", "lbamodel") != "lbamodel":
            raise NotImplementedError(
                "partitioned protein tower supports base_conv='lbamodel'")
        tower = PartitionedLBAProteinGNN(**pk, axis_name=self.partition_axis,
                                         n_shards=self.n_shards,
                                         name="protein_gnn")
        res_local = tower(sharded_protein, deterministic)    # [B, Ns, D]
        residue_embed = jax.lax.all_gather(
            res_local, self.partition_axis, axis=1, tiled=True)  # [B, G*Ns, D]
        residue_mask = jax.lax.all_gather(
            sharded_protein.node_mask[:, 0], self.partition_axis,
            axis=1, tiled=True)                                  # [B, G*Ns]

        from caster_dta_tpu.models.molecule import make_molecule_gnn
        molecule_gnn = make_molecule_gnn(name="molecule_gnn",
                                         **self.molecule_gnn_kwargs)
        atom_embed = molecule_gnn(molecule_graph, deterministic=deterministic)
        return self._head(residue_embed, atom_embed, residue_mask,
                          molecule_graph.node_mask, deterministic,
                          return_attention)


def from_joint(model: JointGNN, axis_name: str = "gp",
               n_shards: Optional[int] = None) -> PartitionedJointGNN:
    """The partitioned twin of a JointGNN (same kwargs, same param tree)."""
    return PartitionedJointGNN(
        protein_gnn_kwargs=model.protein_gnn_kwargs,
        molecule_gnn_kwargs=model.molecule_gnn_kwargs,
        **{f: getattr(model, f) for f in _JOINT_HEAD_FIELDS},
        partition_axis=axis_name, n_shards=n_shards)


import dataclasses as _dataclasses

_JOINT_HEAD_FIELDS = tuple(
    f.name for f in _dataclasses.fields(JointGNN)
    if f.name not in ("protein_gnn_kwargs", "molecule_gnn_kwargs",
                      "parent", "name"))


def partitioned_joint_in_specs(axis_name: str = "gp", dp_axis=None):
    """(sharded_protein, molecule) in_specs for shard_map over batch-first
    arrays: sharded leaves [B, G, ...] -> P(dp, gp); molecule [B, ...] ->
    P(dp)."""
    from caster_dta_tpu.data.graphs import GraphBatch

    sh = shard_specs(axis_name, dp_axis)
    mol_spec = P(dp_axis)
    mol = jax.tree_util.tree_map(lambda _: mol_spec,
                                 GraphBatch(*([0] * 10)))
    return sh, mol


def run_partitioned_joint(model: PartitionedJointGNN, variables,
                          sharded: ShardedProteinGraph, molecule, mesh: Mesh,
                          deterministic: bool = True):
    """Forward one pair ([G, ...] sharded leaves, [1, ...] molecule):
    protein partitioned over gp, molecule replicated. Returns score [1, 1]."""
    axis = model.partition_axis
    sh_spec, mol_spec = partitioned_joint_in_specs(axis)

    def fn(vars_, sh, mol):
        score, _ = model.apply(vars_, sh, mol, deterministic)
        return score

    shmap = jax.jit(jax.shard_map(fn, mesh=mesh,
                                  in_specs=(P(), sh_spec, mol_spec),
                                  out_specs=P(), check_vma=False))
    batched = jax.tree_util.tree_map(lambda a: a[None], sharded)
    return shmap(variables, batched, molecule)


def partitioned_train_step(model: PartitionedJointGNN, tx, mesh: Mesh,
                           dp_axis: Optional[str] = "dp"):
    """Build a jitted deterministic train step over a ('dp','gp') mesh:
    sharded protein stacked [B, G, ...], molecule GraphBatch [B, ...],
    target [B]; B shards over dp (each dp member computes its local pairs
    batched). The loss is a pmean over dp of local means and a pmean over gp
    of the (gp-identical) result — the 1/G factor makes the shard_map
    transpose's psum over gp recover exact parameter gradients for the
    gp-redundant head/molecule math (verified by tests/test_partition.py
    grad parity). Training inside fit() uses make_partitioned_fit_steps
    (dropout + pair weights + lr injection) instead.
    """
    axis = model.partition_axis
    sh_spec, mol_spec = partitioned_joint_in_specs(axis, dp_axis=dp_axis)

    def loss_fn(params, sharded, molecule, target):
        def fwd(p, sh, mol, t):
            score, _ = model.apply({"params": p}, sh, mol,
                                   deterministic=True)
            err = jnp.mean((score[:, 0] - t) ** 2)
            if dp_axis is not None:
                err = jax.lax.pmean(err, dp_axis)
            return jax.lax.pmean(err, axis)

        shmap = jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), sh_spec, mol_spec, P(dp_axis)),
            out_specs=P(), check_vma=False)
        return shmap(params, sharded, molecule, target)

    @jax.jit
    def step(params, opt_state, sharded, molecule, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, sharded, molecule,
                                                  target)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_partitioned_fit_steps(model: PartitionedJointGNN, tx, mesh: Mesh,
                               extra_vars=None, dp_axis: Optional[str] = "dp"):
    """(train_step, eval_step) for fit()'s partitioned sub-epochs, mirroring
    train/loop.py's step contract.

    train_step(params, opt_state, batch, rng, lr)
        -> (params, opt_state, loss, pred, rng)
    eval_step(params, batch) -> pred [B]

    ``batch`` is a data/batching.py PartitionedPairBatch: sharded protein
    leaves [B, G, ...], molecule GraphBatch [B, ...], target/weight [B].
    Padded pairs carry weight 0 and are excluded from the loss exactly like
    the standard step. Dropout runs with the global-canonical masks
    (PartitionedLBAProteinGNN.n_shards), with the dp-row key folded by dp
    index when dp>1 so different rows draw independent masks.
    """
    import functools

    import optax

    from caster_dta_tpu.train.optim import set_learning_rate

    axis = model.partition_axis
    extra_vars = extra_vars or {}
    sh_spec, mol_spec = partitioned_joint_in_specs(axis, dp_axis=dp_axis)
    dp_size = mesh.shape[dp_axis] if dp_axis is not None else 1

    def fwd(p, sh, mol, t, w, key, deterministic):
        if key is not None and dp_size > 1:
            key = jax.random.fold_in(key, jax.lax.axis_index(dp_axis))
        rngs = {"dropout": key} if key is not None else None
        score, _ = model.apply({"params": p, **extra_vars}, sh, mol,
                               deterministic=deterministic, rngs=rngs)
        pred = score[:, 0].astype(jnp.float32)
        num = jnp.sum(w * (pred - t) ** 2)
        den = jnp.sum(w)
        if dp_axis is not None:
            num = jax.lax.psum(num, dp_axis)
            den = jax.lax.psum(den, dp_axis)
        loss = num / jnp.maximum(den, 1.0)
        # value-preserving pmean over gp: the transpose's psum over the
        # gp-redundant replicas then carries a 1/G factor -> exact grads
        loss = jax.lax.pmean(loss, axis)
        return loss, pred

    in_specs = (P(), sh_spec, mol_spec, P(dp_axis), P(dp_axis), P())
    out_specs = (P(), P(dp_axis))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 3))
    def train_step(params, opt_state, batch, rng, lr):
        rng, step_rng = jax.random.split(rng)

        def loss_fn(params):
            shmap = jax.shard_map(
                functools.partial(fwd, deterministic=False), mesh=mesh,
                in_specs=in_specs, out_specs=out_specs, check_vma=False)
            return shmap(params, batch.sharded, batch.molecule,
                         batch.target, batch.weight, step_rng)

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        set_learning_rate(opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, pred, rng

    @jax.jit
    def eval_step(params, batch):
        def fn(p, sh, mol, t, w):
            _, pred = fwd(p, sh, mol, t, w, None, True)
            return pred

        shmap = jax.shard_map(fn, mesh=mesh, in_specs=in_specs[:-1],
                              out_specs=P(dp_axis), check_vma=False)
        return shmap(params, batch.sharded, batch.molecule,
                     batch.target, batch.weight)

    return train_step, eval_step


def stack_sharded(graphs):
    """Stack B ShardedProteinGraphs (same budgets) into [B, G, ...] arrays
    (the batch-first layout consumed by the partitioned steps)."""
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *graphs)
