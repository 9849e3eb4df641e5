"""Padded, statically-shaped graph batch containers.

TPU-first redesign of the reference's ragged PyG ``Data``/``Batch`` objects
(reference: dataset/dual_dataset.py:526-547, utils/create_graphs.py:6-62).
Instead of concatenating variable-size graphs into one ragged graph (which
forces dynamic shapes and a separate ``to_dense_batch`` densification for
attention, reference models/joint_gnn.py:206-207), every graph in a batch is
padded to a shared ``(N_pad, E_pad)`` bucket:

  * node arrays are dense ``[B, N_pad, ...]`` — cross-attention consumes them
    directly, no densification step;
  * edges are COO ``[B, E_pad]`` with *per-graph local* indices, sorted by
    destination node so aggregation is a sorted segment-sum (the Pallas/XLA
    kernels in ops/segment.py exploit this);
  * padding edges carry ``dst = N_pad - 1`` (keeps sort order) and are masked.

All shapes are static per bucket, so each bucket compiles exactly one XLA
executable (replaces reference's ``torch.compile(dynamic=True)``,
train_model.py:422).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GraphBatch:
    """A batch of B graphs padded to N_pad nodes / E_pad edges each.

    Scalar/vector node features follow the GVP (s, V) convention
    (reference models/gvp_layers.py): ``node_s`` is ``[B, N, ds]`` and
    ``node_v`` is ``[B, N, dv, 3]`` (``dv`` may be 0 for scalar-only graphs,
    e.g. molecules).
    """

    node_s: jnp.ndarray            # f32 [B, N, ds]
    node_v: jnp.ndarray            # f32 [B, N, dv, 3]
    node_type: jnp.ndarray         # i32 [B, N]
    node_mask: jnp.ndarray         # bool [B, N]
    edge_src: jnp.ndarray          # i32 [B, E] (local node index)
    edge_dst: jnp.ndarray          # i32 [B, E] (sorted ascending; pad = N-1)
    edge_s: jnp.ndarray            # f32 [B, E, es]
    edge_v: jnp.ndarray            # f32 [B, E, ev, 3]
    edge_type: jnp.ndarray         # i32 [B, E]
    edge_mask: jnp.ndarray         # bool [B, E]

    @property
    def batch_size(self) -> int:
        return self.node_s.shape[0]

    @property
    def n_pad(self) -> int:
        return self.node_s.shape[1]

    @property
    def e_pad(self) -> int:
        return self.edge_src.shape[1]

    @property
    def n_node(self) -> jnp.ndarray:
        """Number of real nodes per graph, i32 [B]."""
        return self.node_mask.sum(axis=1).astype(jnp.int32)

    @property
    def n_edge(self) -> jnp.ndarray:
        """Number of real edges per graph, i32 [B]."""
        return self.edge_mask.sum(axis=1).astype(jnp.int32)


def _as2d(x: np.ndarray | None, n: int, width: int | None = None) -> np.ndarray:
    if x is None:
        return np.zeros((n, 0 if width is None else width), dtype=np.float32)
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[:, None]
    return x


def pad_graph(
    node_s: np.ndarray,
    node_v: np.ndarray | None,
    edge_index: np.ndarray,      # i64/i32 [2, E_real] rows (src, dst)
    edge_s: np.ndarray,
    edge_v: np.ndarray | None,
    node_type: np.ndarray,
    edge_type: np.ndarray,
    n_pad: int,
    e_pad: int,
) -> dict:
    """Pad one unbatched graph to (n_pad, e_pad), sorting edges by dst.

    Returns a dict of numpy arrays matching GraphBatch fields (without the
    leading batch dim). Raises if the graph exceeds the pad sizes.
    """
    node_s = np.asarray(node_s, dtype=np.float32)
    n = node_s.shape[0]
    edge_index = np.asarray(edge_index)
    e = edge_index.shape[1]
    if n > n_pad:
        raise ValueError(f"graph has {n} nodes > n_pad={n_pad}")
    if e > e_pad:
        raise ValueError(f"graph has {e} edges > e_pad={e_pad}")

    if node_v is None:
        node_v = np.zeros((n, 0, 3), dtype=np.float32)
    node_v = np.asarray(node_v, dtype=np.float32)
    if edge_v is None:
        edge_v = np.zeros((e, 0, 3), dtype=np.float32)
    edge_v = np.asarray(edge_v, dtype=np.float32)
    edge_s = _as2d(edge_s, e)

    # Sort edges by (dst, src): sorted-by-destination layout is the contract
    # the segment kernels rely on (ops/segment.py).
    src, dst = edge_index[0].astype(np.int32), edge_index[1].astype(np.int32)
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    edge_s = edge_s[order]
    edge_v = edge_v[order]
    edge_type = np.asarray(edge_type).reshape(-1)[order].astype(np.int32)

    out = {
        "node_s": np.zeros((n_pad, node_s.shape[1]), np.float32),
        "node_v": np.zeros((n_pad, node_v.shape[1], 3), np.float32),
        "node_type": np.zeros((n_pad,), np.int32),
        "node_mask": np.zeros((n_pad,), bool),
        "edge_src": np.zeros((e_pad,), np.int32),
        "edge_dst": np.full((e_pad,), max(n_pad - 1, 0), np.int32),
        "edge_s": np.zeros((e_pad, edge_s.shape[1]), np.float32),
        "edge_v": np.zeros((e_pad, edge_v.shape[1], 3), np.float32),
        "edge_type": np.zeros((e_pad,), np.int32),
        "edge_mask": np.zeros((e_pad,), bool),
    }
    out["node_s"][:n] = node_s
    out["node_v"][:n] = node_v
    out["node_type"][:n] = np.asarray(node_type).reshape(-1).astype(np.int32)
    out["node_mask"][:n] = True
    out["edge_src"][:e] = src
    out["edge_dst"][:e] = dst
    out["edge_s"][:e] = edge_s
    out["edge_v"][:e] = edge_v
    out["edge_type"][:e] = edge_type
    out["edge_mask"][:e] = True
    return out


def stack_graphs(padded: list[dict]) -> GraphBatch:
    """Stack a list of pad_graph() outputs (all same pad shape) into a batch."""
    fields = padded[0].keys()
    return GraphBatch(**{k: jnp.asarray(np.stack([p[k] for p in padded])) for k in fields})
