"""Geometric Vector Perceptron primitives, rebuilt functionally for JAX/TPU.

Behavioral spec: reference models/gvp_layers.py (itself derived from
drorlab/gvp-pytorch). Same math, new dataflow:

  * features are ``(s, v)`` tuples with ``s: [..., ns]`` and ``v: [..., nv, 3]``
    (``nv`` may be 0 — a zero-width array stands in for "no vectors");
  * graphs are the padded dense batches of data/graphs.py, so GVPConv's
    gather → message-MLP → scatter runs as static-shape batched ops: the
    per-edge message MLP is one big MXU matmul over ``[B, E, ·]`` and the
    aggregation is a sorted segment-sum (ops/segment.py);
  * dropout uses explicit flax RNG threading instead of global torch RNG.

Numerics matched to the reference:
  _norm_no_nan eps clamp 1e-8 (gvp_layers.py:79-86), vector-gate ordering
  (:158-166), LayerNorm vector RMS over channels (:240-242), vector-channel
  dropout dropping whole 3-vectors together (:177-198), message = GVP-MLP of
  cat(s_j, v_j, edge, s_i, v_i) (:303-308), mean/add scatter aggregation with
  real-edge degree counts.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from caster_dta_tpu.nn.common import Dense, select_activation, apply_act
from caster_dta_tpu.ops import segment

SV = Tuple[jnp.ndarray, jnp.ndarray]

# Gather/scatter layout for GVPConv (trace-time): merged-(s,v) endpoint rows
# (half the gather/scatter row count; see GVPConv.__call__) vs separate
# per-tensor gathers. Kept as a flag for A/B benchmarking.
_MERGED_ENDPOINT_GATHER = True

# Fused Pallas message-MLP dispatch (ops/pallas_gvp_message.py). Tri-state:
# None = auto (currently: never), True = force (tests use this on CPU via
# interpret mode), False = never. The fused kernel won when the XLA path's
# endpoint gather was pathological (elementwise take_along_axis lowering);
# with the row-gather + dense-scan-scatter segment ops the unfused path's
# single [B*E, K] message matmuls use the MXU far better than per-block
# kernel invocations — measured 2.1x faster per train step at the Davis
# (128, 768, 2048) bucket on v5e. The kernel stays available and tested.
USE_FUSED_MESSAGE = None


def _fused_message_dispatch() -> bool:
    if USE_FUSED_MESSAGE is not None:
        return USE_FUSED_MESSAGE
    return False


# Rematerialize the conv (gather -> message MLP -> scatter) in the backward
# pass instead of storing its per-edge intermediates. Measured on v5e at the
# flagship bucket (B32/N512/E4096 bf16): full remat 4.6 ms/step and
# save-only-the-gather remat 4.5 ms vs 4.3 ms without — the step is NOT
# residual-bound (XLA already fuses most per-edge intermediates away), so
# recompute only adds work. Kept as an opt-in for memory-limited configs
# (giant buckets / deeper models). Tri-state: None = auto (off).
REMAT_MESSAGE = None


def _remat_message_dispatch() -> bool:
    if REMAT_MESSAGE is not None:
        return REMAT_MESSAGE
    return False


def tuple_sum(*args: SV) -> SV:
    """Elementwise sum of (s, V) tuples (reference gvp_layers.py:39-43)."""
    s_args, v_args = zip(*args)
    return sum(s_args[1:], s_args[0]), sum(v_args[1:], v_args[0])


def tuple_cat(*args: SV, axis: int = -1) -> SV:
    """Concatenate (s, V) tuples; axis refers to the scalar tensors and maps
    to the channel axis (-2) of the vector tensors (gvp_layers.py:45-56)."""
    s_args, v_args = zip(*args)
    v_axis = axis if axis >= 0 else axis - 1
    return jnp.concatenate(s_args, axis=axis), jnp.concatenate(v_args, axis=v_axis)


def tuple_index(x: SV, idx) -> SV:
    return x[0][idx], x[1][idx]


def norm_no_nan(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    """L2 norm clamped above eps (gvp_layers.py:79-86)."""
    out = jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims), eps)
    return jnp.sqrt(out) if sqrt else out


def merge_sv(s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Flatten vector channels and append to scalars (gvp_layers.py:101-109)."""
    return jnp.concatenate([s, v.reshape(v.shape[:-2] + (3 * v.shape[-2],))], axis=-1)


def split_sv(x: jnp.ndarray, nv: int) -> SV:
    """Inverse of merge_sv (gvp_layers.py:88-99)."""
    if nv == 0:
        return x, jnp.zeros(x.shape[:-1] + (0, 3), x.dtype)
    v = x[..., -3 * nv:].reshape(x.shape[:-1] + (nv, 3))
    return x[..., : -3 * nv], v


def zeros_v(s: jnp.ndarray, nv: int) -> jnp.ndarray:
    return jnp.zeros(s.shape[:-1] + (nv, 3), s.dtype)


class GVP(nn.Module):
    """Geometric Vector Perceptron (reference gvp_layers.py:111-175).

    in dims are inferred from the input; out_dims = (n_scalar, n_vector).
    """

    out_dims: Tuple[int, int]
    h_dim: Optional[int] = None
    activations: Tuple = ("relu", "sigmoid")
    vector_gate: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: SV) -> SV:
        s, v = x
        vi = v.shape[-2]
        so, vo = self.out_dims
        scalar_act = select_activation(self.activations[0])
        vector_act = select_activation(self.activations[1])

        if vi:
            h_dim = self.h_dim or max(vi, vo)
            vt = jnp.swapaxes(v, -1, -2)                       # [..., 3, vi]
            vh = Dense(h_dim, use_bias=False, dtype=self.dtype, name="wh")(vt)
            vn = norm_no_nan(vh, axis=-2)                      # [..., h]
            s = Dense(so, dtype=self.dtype, name="ws")(jnp.concatenate([s, vn], -1))
            if vo:
                vout = Dense(vo, use_bias=False, dtype=self.dtype, name="wv")(vh)
                vout = jnp.swapaxes(vout, -1, -2)              # [..., vo, 3]
                if self.vector_gate:
                    gate_in = apply_act(vector_act, s)
                    gate = Dense(vo, dtype=self.dtype, name="wsv")(gate_in)
                    vout = vout * jax.nn.sigmoid(gate)[..., None]
                elif vector_act is not None:
                    vout = vout * vector_act(norm_no_nan(vout, axis=-1, keepdims=True))
            else:
                vout = zeros_v(s, 0)
        else:
            s = Dense(so, dtype=self.dtype, name="ws")(s)
            vout = zeros_v(s, vo)
        s = apply_act(scalar_act, s)
        return s, vout


class GVPLayerNorm(nn.Module):
    """Combined LayerNorm for (s, V): learned scalar LN (torch eps 1e-5) plus
    vector RMS-norm across channels with no learned params
    (reference gvp_layers.py:221-242)."""

    @nn.compact
    def __call__(self, x: SV) -> SV:
        s, v = x
        s = nn.LayerNorm(epsilon=1e-5, name="scalar_norm")(s)
        if v.shape[-2] == 0:
            return s, v
        vn = norm_no_nan(v, axis=-1, keepdims=True, sqrt=False)  # [..., nv, 1]
        vn = jnp.sqrt(jnp.mean(vn, axis=-2, keepdims=True))      # [..., 1, 1]
        return s, v / vn


class GVPDropout(nn.Module):
    """(s, V) dropout; whole 3-vector channels drop together
    (reference gvp_layers.py:177-219).

    ``shard_rows=(axis_name, n_shards)`` makes the mask *partition-invariant*
    for node features sharded over a mesh axis (parallel/partition.py): every
    shard draws the bernoulli mask for the GLOBAL row count ``n_shards * Ns``
    from the same key and slices its own rows, so an edge-partitioned model
    applies exactly the mask the single-device model would — dropout does not
    make the partitioned model a different model.
    """

    rate: float
    shard_rows: Optional[Tuple[str, int]] = None

    @nn.compact
    def __call__(self, x: SV, deterministic: bool) -> SV:
        s, v = x
        if self.rate == 0.0 or deterministic:
            return x
        s = _dropout(s, self.rate, self.make_rng("dropout"), s.shape,
                     self.shard_rows)
        if v.shape[-2]:
            v = _vdropout(v, self.rate, self.make_rng("dropout"),
                          self.shard_rows)
        return s, v


def _keep_mask(rng, rate, local_shape, shard_rows):
    """Bernoulli keep-mask; with shard_rows, slice the local rows (axis 1)
    out of the global-canonical mask so partitioning doesn't change it."""
    if shard_rows is None:
        return jax.random.bernoulli(rng, 1.0 - rate, local_shape)
    axis_name, n_shards = shard_rows
    ns = local_shape[1]
    full = (local_shape[0], n_shards * ns) + tuple(local_shape[2:])
    keep = jax.random.bernoulli(rng, 1.0 - rate, full)
    off = jax.lax.axis_index(axis_name) * ns
    return jax.lax.dynamic_slice_in_dim(keep, off, ns, axis=1)


def _dropout(x, rate, rng, mask_shape, shard_rows=None):
    keep = _keep_mask(rng, rate, mask_shape, shard_rows)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _vdropout(v, rate, rng, shard_rows=None):
    keep = _keep_mask(rng, rate, v.shape[:-1], shard_rows)
    return jnp.where(keep[..., None], v / (1.0 - rate), 0.0)


class GVPConv(nn.Module):
    """GVP message passing over a padded GraphBatch's edges
    (reference gvp_layers.py:244-308).

    Per edge (src=j, dst=i): message = GVP-MLP(cat((s_j, v_j), edge, (s_i, v_i)))
    aggregated at dst by `aggr` ('mean' or 'add'/'sum').
    """

    out_dims: Tuple[int, int]
    n_layers: int = 3
    aggr: str = "mean"
    activations: Tuple = ("relu", "sigmoid")
    vector_gate: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: SV, edge_src, edge_dst, edge_mask, edge_attr: SV,
                 message_mask=None) -> SV:
        s, v = x
        from caster_dta_tpu.nn.common import get_compute_dtype
        cd = get_compute_dtype()
        so, vo = self.out_dims
        nv_in = v.shape[-2]
        e = edge_src.shape[1]
        eff_mask = edge_mask if message_mask is None else (edge_mask & message_mask)
        num_nodes = s.shape[1]

        fused_ok = (
            _MERGED_ENDPOINT_GATHER and self.vector_gate
            and nv_in > 0 and vo > 0 and edge_attr[1].shape[-2] > 0
            and all(a in ("relu", "sigmoid", None) for a in self.activations)
            and not self.is_initializing()
            and 2 * e * (s.shape[-1] + 3 * nv_in) * 4 <= 4_000_000
            and _fused_message_dispatch())

        # Mixed precision: cast the conv inputs once, BEFORE the endpoint
        # gather, instead of letting each message Dense cast per edge. The
        # first op the features hit is that Dense's matmul anyway, so the
        # numerics are unchanged — but the gather moves half the bytes and
        # the one-hot gather/scatter kernels take 1 exact bf16 MXU pass
        # instead of the 3-pass f32 mantissa split. NOT on the fused path:
        # layout_pin must pin an f32 node table (this XLA build's row gather
        # is ~2x faster on f32 rows, and a bf16 cotangent flips the backward
        # scatter-add to a slower lowering); fused_message_mlp casts its
        # inputs internally.
        if cd is not None and self.dtype is None and not fused_ok:
            s, v = s.astype(cd), v.astype(cd)
            edge_attr = (edge_attr[0].astype(cd), edge_attr[1].astype(cd))

        if _MERGED_ENDPOINT_GATHER:
            # One merged-(s,v) gather per edge endpoint instead of four
            # narrow ones: the XLA gather kernel is per-row latency-bound
            # (profiled at ~160 GB/s effective on 32-byte rows), so halving
            # the row count by widening rows to ns+3nv columns nearly halves
            # gather time — the train step's dominant cost on TPU.
            sv = merge_sv(s, v)                        # [B, N, ns+3nv]
            if fused_ok:
                # pin the node table row-major so the gather reads whole
                # rows (see ops/pallas_gvp_message.layout_pin). NOTE: keep
                # f32 here — this XLA build's row-gather custom is ~2x
                # faster on f32 rows than bf16 (and a bf16 cotangent flips
                # the backward scatter-add to a slower sort-based lowering)
                from caster_dta_tpu.ops.pallas_gvp_message import layout_pin
                sv = layout_pin(sv)
            # ... and one gather for both endpoints (backward then emits a
            # single 2E-row scatter-add instead of two E-row ones)
            both = segment.gather_nodes(
                sv, jnp.concatenate([edge_src, edge_dst], axis=1))
            # named residual: under the remat'd conv (GVPConvLayer), the
            # policy saves this gather output but recomputes the per-edge
            # message-MLP intermediates in the backward pass
            from jax.ad_checkpoint import checkpoint_name
            both = checkpoint_name(both, "gathered_endpoints")

        if fused_ok:
            # Fused Pallas message MLP: all three gated GVPs in one kernel,
            # intermediates in VMEM (see ops/pallas_gvp_message.py). Params
            # are READ from self.variables (created by the module path at
            # init), so the checkpoint tree is identical on both paths.
            from caster_dta_tpu.ops.pallas_gvp_message import fused_message_mlp
            from caster_dta_tpu.nn.common import get_compute_dtype as _gcd

            params = self.variables["params"]
            merged = fused_message_mlp(
                both, edge_attr[0], edge_attr[1],
                [params[f"message_{k}"] for k in range(self.n_layers)],
                ns=s.shape[-1], nv=nv_in,
                v_parts=(nv_in, edge_attr[1].shape[-2], nv_in),
                activations=self.activations, compute_dtype=_gcd())
            out = segment.aggregate(merged, edge_dst, eff_mask, num_nodes,
                                    self.aggr)
            return split_sv(out, vo)

        if _MERGED_ENDPOINT_GATHER:
            s_j, v_j = split_sv(both[:, :e], nv_in)
            s_i, v_i = split_sv(both[:, e:], nv_in)
        else:
            s_j = segment.gather_nodes(s, edge_src)
            v_j = segment.gather_nodes(v, edge_src)
            s_i = segment.gather_nodes(s, edge_dst)
            v_i = segment.gather_nodes(v, edge_dst)
        msg = tuple_cat((s_j, v_j), edge_attr, (s_i, v_i))

        gvp_kwargs = dict(activations=self.activations, vector_gate=self.vector_gate,
                          dtype=self.dtype)
        if self.n_layers == 1:
            msg = GVP(self.out_dims, activations=(None, None),
                      vector_gate=self.vector_gate, dtype=self.dtype, name="message_0")(msg)
        else:
            msg = GVP(self.out_dims, **gvp_kwargs, name="message_0")(msg)
            for i in range(self.n_layers - 2):
                msg = GVP(self.out_dims, **gvp_kwargs, name=f"message_{i + 1}")(msg)
            msg = GVP(self.out_dims, activations=(None, None),
                      vector_gate=self.vector_gate, dtype=self.dtype,
                      name=f"message_{self.n_layers - 1}")(msg)

        m_s, m_v = msg
        if _MERGED_ENDPOINT_GATHER:
            # single merged scatter (same row-count argument as the gathers)
            merged = merge_sv(m_s, m_v)                # [B, E, so+3vo]
            out = segment.aggregate(merged, edge_dst, eff_mask, num_nodes,
                                    self.aggr)
            return split_sv(out, vo)
        out_s = segment.aggregate(m_s, edge_dst, eff_mask, num_nodes, self.aggr)
        out_v = segment.aggregate(m_v, edge_dst, eff_mask, num_nodes, self.aggr)
        return out_s, out_v


class GVPConvLayer(nn.Module):
    """Residual GVP conv block: conv → add+norm → GVP feedforward → add+norm,
    with optional autoregressive src/dst edge split and node_mask partial
    update (reference gvp_layers.py:311-415)."""

    n_message: int = 3
    n_feedforward: int = 2
    drop_rate: float = 0.1
    autoregressive: bool = False
    activations: Tuple = ("relu", "sigmoid")
    vector_gate: bool = False
    aggr: Optional[str] = None
    # (axis_name, n_shards) when node rows are partitioned over a mesh axis:
    # dropout masks become partition-invariant (see GVPDropout.shard_rows)
    dropout_shard_rows: Optional[Tuple[str, int]] = None

    @nn.compact
    def __call__(self, x: SV, edge_src, edge_dst, edge_mask, edge_attr: SV,
                 autoregressive_x: Optional[SV] = None, node_mask=None,
                 deterministic: bool = True, boundary=None) -> SV:
        """boundary: optional second edge block
        ``(x_ext SV, src, dst, mask, edge_attr SV)`` whose messages gather
        from an EXTENDED node array (local rows + halo rows appended) and
        aggregate into the same local destinations — the edge-partitioned
        execution path (parallel/partition.py). The interior block's conv is
        issued FIRST and does not depend on the halo exchange feeding
        ``x_ext``, so XLA's latency-hiding scheduler overlaps the collective
        with the interior message math (SURVEY §7.7). Both blocks share the
        same message-GVP parameters; mean aggregation normalizes by the
        combined in-degree."""
        node_dims = (x[0].shape[-1], x[1].shape[-2])
        aggr = self.aggr
        if self.autoregressive:
            if aggr is not None and aggr != "add":
                raise ValueError("autoregressive GVPConvLayer requires aggr='add'")
            aggr = "add"
        elif aggr is None:
            aggr = "mean"

        # with a split edge set, aggregate both blocks with 'add' and apply
        # the mean normalization once over the combined degree (same pattern
        # as the reference's autoregressive branch, gvp_layers.py:382-398)
        conv_aggr = "add" if (boundary is not None and aggr == "mean") else aggr
        conv_cls = (nn.remat(GVPConv,
                             policy=jax.checkpoint_policies.save_only_these_names(
                                 "gathered_endpoints"))
                    if _remat_message_dispatch() and not self.is_initializing()
                    else GVPConv)
        conv = conv_cls(node_dims, n_layers=self.n_message, aggr=conv_aggr,
                        activations=self.activations, vector_gate=self.vector_gate,
                        name="conv")

        if boundary is not None:
            if autoregressive_x is not None:
                raise ValueError("boundary and autoregressive are exclusive")
            x_ext, b_src, b_dst, b_mask, b_eattr = boundary
            ns = x[0].shape[1]
            dh_i = conv(x, edge_src, edge_dst, edge_mask, edge_attr)
            dh_b = conv(x_ext, b_src, b_dst, b_mask, b_eattr)
            dh = tuple_sum(dh_i, (dh_b[0][:, :ns], dh_b[1][:, :ns]))
            if aggr == "mean":
                count = (segment.segment_degree(edge_dst, edge_mask, ns)
                         + segment.segment_degree(b_dst, b_mask, ns))
                count = jnp.maximum(count, 1.0)
                dh = (dh[0] / count[..., None], dh[1] / count[..., None, None])
        elif autoregressive_x is not None:
            # Messages on forward edges (src < dst) use current embeddings x;
            # backward edges (src >= dst) use autoregressive_x; summed then
            # normalized by the full in-degree (gvp_layers.py:382-398).
            fwd = edge_src < edge_dst
            dh_f = conv(x, edge_src, edge_dst, edge_mask, edge_attr, message_mask=fwd)
            dh_b = conv(autoregressive_x, edge_src, edge_dst, edge_mask, edge_attr,
                        message_mask=~fwd)
            dh = tuple_sum(dh_f, dh_b)
            count = segment.segment_degree(edge_dst, edge_mask, x[0].shape[1])
            count = jnp.maximum(count, 1.0)
            dh = (dh[0] / count[..., None], dh[1] / count[..., None, None])
        else:
            dh = conv(x, edge_src, edge_dst, edge_mask, edge_attr)

        x_in = x
        dh = GVPDropout(self.drop_rate, shard_rows=self.dropout_shard_rows,
                        name="dropout0")(dh, deterministic)
        h = GVPLayerNorm(name="norm0")(tuple_sum(x, dh))

        ff = h
        gvp_kwargs = dict(activations=self.activations, vector_gate=self.vector_gate)
        if self.n_feedforward == 1:
            ff = GVP(node_dims, activations=(None, None),
                     vector_gate=self.vector_gate, name="ff_0")(ff)
        else:
            hid_dims = (4 * node_dims[0], 2 * node_dims[1])
            ff = GVP(hid_dims, **gvp_kwargs, name="ff_0")(ff)
            for i in range(self.n_feedforward - 2):
                ff = GVP(hid_dims, **gvp_kwargs, name=f"ff_{i + 1}")(ff)
            ff = GVP(node_dims, activations=(None, None), vector_gate=self.vector_gate,
                     name=f"ff_{self.n_feedforward - 1}")(ff)

        ff = GVPDropout(self.drop_rate, shard_rows=self.dropout_shard_rows,
                        name="dropout1")(ff, deterministic)
        out = GVPLayerNorm(name="norm1")(tuple_sum(h, ff))

        if node_mask is not None:
            m = node_mask[..., None]
            out = (jnp.where(m, out[0], x_in[0]),
                   jnp.where(m[..., None], out[1], x_in[1]))
        return out
