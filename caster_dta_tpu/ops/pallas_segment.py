"""Pallas TPU kernel: sorted segment-sum as blocked one-hot matmuls.

This is the framework's native replacement for the reference's torch_scatter
aggregation (models/gvp_layers.py:37, PyG MessagePassing scatter). The edges
of every graph are sorted by destination (data/graphs.py contract), so the
scatter becomes a *segmented reduction over a contiguous edge range per
destination-row block*, which maps onto the MXU:

  for each (graph b, dst-row block r of BN rows):
    for each CE-edge chunk overlapping the block's contiguous edge range:
      onehot[d, e] = (dst[e] == r*BN + d)          # [BN, CE] on the VPU
      acc += onehot @ messages[chunk]              # [BN, F] on the MXU

The per-block edge ranges come from a scalar-prefetched row-pointer array
(block_ptr = searchsorted(dst, block boundaries)); message and dst chunks are
DMA'd HBM->VMEM at CE-aligned offsets (chunks may straddle block boundaries;
out-of-block edges contribute zero rows in the one-hot). Padded edges carry
dst = N-1 but their messages are zeroed by the wrapper, so padding never
pollutes sums; mean normalization uses real-edge degrees (ops/segment.py).

The backward pass of a segment-sum is a gather, provided via custom_vjp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caster_dta_tpu.ops import segment as xla_segment

BN = 128   # destination rows per block (sorted/windowed kernels)
CE = 512   # edges per chunk (sorted/windowed kernels)
BND = 256  # destination rows per block, dense-scan kernel (fewer passes)
CED = 1024  # edges per chunk, dense-scan kernel (fewer DMA round trips)

# Element dtype for the one-hot build (iota == ids compare). The build is
# the dominant cost of these kernels at the training shapes (~1e12 compare
# elements/s measured on v5e with int32); int16 doubles VPU lanes per cycle.
# Values compared are node indices: int16 is exact to 32767 (safely above
# the 4,608-node ladder rung), but float16 is exact only to 2048 — BELOW the
# top protein rung, so f16 would silently produce multi-hot columns at
# KIBA/Metz shapes (the committed f16 A/B was bitwise-exact only because it
# ran at N=512). Patched by scripts/bench_segment_kernels.py for A/B.
OH_DTYPE = jnp.int32


def _onehot_bf16(ids_row, iota):
    """(ids == iota) in OH_DTYPE -> bf16 one-hot. ids_row [1, C] int32 from
    VMEM broadcasts against iota [R, C] built in OH_DTYPE by the caller."""
    return (ids_row.astype(iota.dtype) == iota).astype(jnp.bfloat16)


def _block_ptr(dst_sorted: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Row-pointer array for the windowed kernels: flat [B*(nb+1)] int32 with
    ptr[b, r] = #(dst[b] < r*BN). Equivalent to
    vmap(searchsorted)(dst, arange(nb+1)*BN, 'left') but as ONE bucket-count
    + cumsum fusion instead of a vmapped binary-search while-loop (the two
    while ops were 44 us/step of the flagship profile, PROFILE_r5.md)."""
    bucket = dst_sorted // BN                                    # [B, E]
    counts = jnp.sum(
        bucket[:, None, :] == jnp.arange(nb, dtype=bucket.dtype)[None, :, None],
        axis=-1, dtype=jnp.int32)                                # [B, nb]
    ptr = jnp.concatenate(
        [jnp.zeros((dst_sorted.shape[0], 1), jnp.int32),
         jnp.cumsum(counts, axis=1, dtype=jnp.int32)], axis=1)   # [B, nb+1]
    return ptr.reshape(-1)


def _segment_kernel(block_ptr_ref, dst_ref, msgs_ref, out_ref,
                    acc_ref, msg_vmem, dst_vmem, msg_sem, dst_sem):
    """Double-buffered: chunk k+1's HBM->VMEM DMA overlaps chunk k's
    one-hot matmul (msg_vmem/dst_vmem/sems carry a leading [2] buffer dim)."""
    b = pl.program_id(0)
    r = pl.program_id(1)
    nb = pl.num_programs(1)

    start = block_ptr_ref[b * (nb + 1) + r]
    end = block_ptr_ref[b * (nb + 1) + r + 1]
    aligned_start = (start // CE) * CE
    n_chunks = (end - aligned_start + CE - 1) // CE

    acc_ref[...] = jnp.zeros_like(acc_ref)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BN, CE), 0) + r * BN

    def start_copy(k, slot):
        offset = aligned_start + k * CE
        c_msg = pltpu.make_async_copy(
            msgs_ref.at[b, pl.ds(offset, CE), :], msg_vmem.at[slot], msg_sem.at[slot])
        c_msg.start()
        c_dst = pltpu.make_async_copy(
            dst_ref.at[b, 0:1, pl.ds(offset, CE)], dst_vmem.at[slot], dst_sem.at[slot])
        c_dst.start()
        return c_msg, c_dst

    @pl.when(n_chunks > 0)
    def _():
        start_copy(0, 0)

    def body(k, carry):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            start_copy(k + 1, 1 - slot)

        # wait on this slot's DMAs (reconstruct the copy descriptors)
        offset = aligned_start + k * CE
        pltpu.make_async_copy(
            dst_ref.at[b, 0:1, pl.ds(offset, CE)], dst_vmem.at[slot],
            dst_sem.at[slot]).wait()
        pltpu.make_async_copy(
            msgs_ref.at[b, pl.ds(offset, CE), :], msg_vmem.at[slot],
            msg_sem.at[slot]).wait()
        onehot = (dst_vmem[slot] == row_ids).astype(jnp.float32)
        # HIGHEST precision: default f32 dot lowers to ONE bf16 MXU pass,
        # which rounds the messages' mantissa (~2^-8 relative error observed
        # on v5e). The one-hot operand is exact either way; full-precision
        # passes keep the segment-sum bit-comparable to XLA segment_sum.
        acc_ref[...] += jax.lax.dot(
            onehot, msg_vmem[slot], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0, :, :] = acc_ref[...]


def _segment_kernel_t(block_ptr_ref, dst_ref, msgs_ref, out_ref,
                      acc_ref, msg_vmem, dst_vmem, msg_sem, dst_sem,
                      *, n_split: int = 3):
    """Feature-major variant: messages arrive [B, Fp, E] so each chunk DMA
    moves [Fp, CE] — no 128-lane feature padding (the row-major layout pads
    F to 128 lanes, a 4.5x traffic blowup at F=28). The one-hot contraction
    runs over the edge axis: acc[Fp, BN] += msg[Fp, CE] . onehot[BN, CE]."""
    b = pl.program_id(0)
    r = pl.program_id(1)
    nb = pl.num_programs(1)

    start = block_ptr_ref[b * (nb + 1) + r]
    end = block_ptr_ref[b * (nb + 1) + r + 1]
    aligned_start = (start // CE) * CE
    n_chunks = (end - aligned_start + CE - 1) // CE

    acc_ref[...] = jnp.zeros_like(acc_ref)
    row_ids = (jax.lax.broadcasted_iota(OH_DTYPE, (BN, CE), 0)
               + (r * BN).astype(OH_DTYPE))

    def start_copy(k, slot):
        offset = aligned_start + k * CE
        pltpu.make_async_copy(
            msgs_ref.at[b, :, pl.ds(offset, CE)], msg_vmem.at[slot],
            msg_sem.at[slot]).start()
        pltpu.make_async_copy(
            dst_ref.at[b, 0:1, pl.ds(offset, CE)], dst_vmem.at[slot],
            dst_sem.at[slot]).start()

    @pl.when(n_chunks > 0)
    def _():
        start_copy(0, 0)

    def body(k, carry):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            start_copy(k + 1, 1 - slot)

        offset = aligned_start + k * CE
        pltpu.make_async_copy(
            dst_ref.at[b, 0:1, pl.ds(offset, CE)], dst_vmem.at[slot],
            dst_sem.at[slot]).wait()
        pltpu.make_async_copy(
            msgs_ref.at[b, :, pl.ds(offset, CE)], msg_vmem.at[slot],
            msg_sem.at[slot]).wait()
        # exact mantissa split (1 pass for bf16 inputs, 3 for f32):
        # see _segment_kernel_dense
        oh_bf16 = _onehot_bf16(dst_vmem[slot], row_ids)
        dims = (((1,), (1,)), ((), ()))
        for part in _mantissa_parts(msg_vmem[slot], n_split):
            acc_ref[...] += jax.lax.dot_general(
                part, oh_bf16, dims, preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0, :, :] = acc_ref[...]


def _segment_kernel_dense(dst_ref, msgs_ref, out_ref,
                          acc_ref, msg_vmem, dst_vmem, msg_sem, dst_sem,
                          *, n_chunks: int):
    """Unsorted-ids variant: every (graph, node-block) scans ALL edge chunks.
    No sort/permute of the 59 MB row array is needed — the rows stream
    sequentially at HBM bandwidth (random row permutes measured ~10 GB/s on
    v5e, ~6x slower than the nb redundant streaming passes this costs)."""
    b = pl.program_id(0)
    r = pl.program_id(1)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    row_ids = (jax.lax.broadcasted_iota(OH_DTYPE, (BND, CED), 0)
               + (r * BND).astype(OH_DTYPE))

    def start_copy(k, slot):
        offset = k * CED
        pltpu.make_async_copy(
            msgs_ref.at[b, :, pl.ds(offset, CED)], msg_vmem.at[slot],
            msg_sem.at[slot]).start()
        pltpu.make_async_copy(
            dst_ref.at[b, 0:1, pl.ds(offset, CED)], dst_vmem.at[slot],
            dst_sem.at[slot]).start()

    start_copy(0, 0)

    def body(k, carry):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            start_copy(k + 1, 1 - slot)

        offset = k * CED
        pltpu.make_async_copy(
            dst_ref.at[b, 0:1, pl.ds(offset, CED)], dst_vmem.at[slot],
            dst_sem.at[slot]).wait()
        pltpu.make_async_copy(
            msgs_ref.at[b, :, pl.ds(offset, CED)], msg_vmem.at[slot],
            msg_sem.at[slot]).wait()
        # Three bf16 passes via an exact 8+8+8-bit mantissa split instead
        # of HIGHEST's six: the one-hot operand is exact in bf16, so
        # splitting only the f32 rows reproduces the full 24-bit mantissa
        # while halving MXU time. Mosaic lacks Precision.HIGH, hence the
        # manual split.
        msg = msg_vmem[slot]
        hi = msg.astype(jnp.bfloat16)
        r1 = msg - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        oh_bf16 = _onehot_bf16(dst_vmem[slot], row_ids)
        dims = (((1,), (1,)), ((), ()))
        acc_ref[...] += (
            jax.lax.dot_general(hi, oh_bf16, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(mid, oh_bf16, dims,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(lo, oh_bf16, dims,
                                  preferred_element_type=jnp.float32))
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0, :, :] = acc_ref[...]


def _mantissa_parts(x: jnp.ndarray, n_split: int):
    """Exact bf16 decomposition of x (f32: 3 parts reproduce the full 24-bit
    mantissa; bf16 input: 1 part, exact by construction)."""
    if n_split == 1:
        return [x.astype(jnp.bfloat16)]
    x = x.astype(jnp.float32)
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return [hi, mid, lo]


def _scatter_fullN_kernel(ids_ref, msgs_ref, out_ref, acc_ref,
                          msg_vmem, ids_vmem, msg_sem, ids_sem,
                          *, n_chunks: int, np_: int, n_split: int):
    """Single-pass unsorted scatter: acc[Fp, Np] lives in VMEM for the whole
    graph; every edge chunk is streamed exactly once (the dense-scan kernel
    streams all edges once per 256-row node block, i.e. Np/256 times)."""
    b = pl.program_id(0)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    row_ids = jax.lax.broadcasted_iota(OH_DTYPE, (np_, CED), 0)

    def start_copy(k, slot):
        offset = k * CED
        pltpu.make_async_copy(
            msgs_ref.at[b, :, pl.ds(offset, CED)], msg_vmem.at[slot],
            msg_sem.at[slot]).start()
        pltpu.make_async_copy(
            ids_ref.at[b, 0:1, pl.ds(offset, CED)], ids_vmem.at[slot],
            ids_sem.at[slot]).start()

    start_copy(0, 0)

    def body(k, carry):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            start_copy(k + 1, 1 - slot)

        offset = k * CED
        pltpu.make_async_copy(
            ids_ref.at[b, 0:1, pl.ds(offset, CED)], ids_vmem.at[slot],
            ids_sem.at[slot]).wait()
        pltpu.make_async_copy(
            msgs_ref.at[b, :, pl.ds(offset, CED)], msg_vmem.at[slot],
            msg_sem.at[slot]).wait()
        onehot = _onehot_bf16(ids_vmem[slot], row_ids)             # [Np, CED]
        dims = (((1,), (1,)), ((), ()))  # contract the edge axis
        for part in _mantissa_parts(msg_vmem[slot], n_split):
            acc_ref[...] += jax.lax.dot_general(
                part, onehot, dims, preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0, :, :] = acc_ref[...]


def unsorted_segment_sum_rows(rows: jnp.ndarray, ids: jnp.ndarray,
                              num_segments: int) -> jnp.ndarray:
    """Sum rows [B, E, F] into [B, num_segments, F] by UNSORTED per-graph ids
    (no masking — every row contributes; the transpose of a row gather).

    bf16 rows use a single exact MXU pass; f32 rows use the exact 3-pass
    mantissa split. When the whole [Fp, Np] accumulator fits in VMEM the
    single-pass full-N kernel streams every edge chunk exactly once;
    otherwise the dense-scan kernel makes Np/256 passes. f32 accumulation
    either way; result in f32."""
    b, e, f_in = rows.shape
    if rows.dtype not in (jnp.bfloat16, jnp.float32):
        rows = rows.astype(jnp.float32)
    n_split = 1 if rows.dtype == jnp.bfloat16 else 3
    # bf16 VMEM blocks need 16-sublane tiling (f32 is fine at 8)
    sub = 16 if rows.dtype == jnp.bfloat16 else 8
    fp = max(((f_in + sub - 1) // sub) * sub, sub)
    n_pad = ((num_segments + BND - 1) // BND) * BND
    nb = n_pad // BND
    e_pad = ((e + CED - 1) // CED) * CED
    msgs_t = jnp.pad(rows, ((0, 0), (0, e_pad - e), (0, fp - f_in)))
    msgs_t = msgs_t.transpose(0, 2, 1)                      # [B, Fp, E_pad]
    # slack rows are zero, so their id can collide with a real segment
    ids = jnp.pad(ids, ((0, 0), (0, e_pad - e)), constant_values=0)

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    n_chunks = e_pad // CED
    itemsize = 2 if rows.dtype == jnp.bfloat16 else 4
    # VMEM budget for the full-N kernel (~16 MB/core total on v5e):
    # f32 accumulator + the [Np, CED] one-hot build chain (int32 iota 4B +
    # broadcast/compare intermediate ~4B + bool 1B + bf16 onehot 2B ≈ 11B/el)
    # + double-buffered input chunks + the mantissa-part bf16 copies of each
    # chunk that _mantissa_parts keeps live for f32 rows (+ one f32 temp)
    mant_vmem = 0 if n_split == 1 else fp * CED * (2 * n_split + 4)
    fulln_vmem = (fp * n_pad * 4 + n_pad * CED * 11
                  + 2 * fp * CED * itemsize + mant_vmem + 2 * CED * 4)
    if fulln_vmem <= 8_000_000:
        out = pl.pallas_call(
            functools.partial(_scatter_fullN_kernel, n_chunks=n_chunks,
                              np_=n_pad, n_split=n_split),
            out_shape=jax.ShapeDtypeStruct((b, fp, n_pad), jnp.float32),
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, fp, n_pad), lambda bi: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((fp, n_pad), jnp.float32),
                pltpu.VMEM((2, fp, CED), rows.dtype),
                pltpu.VMEM((2, 1, CED), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(ids[:, None, :], msgs_t)
        return out.transpose(0, 2, 1)[:, :num_segments, :f_in]

    out = pl.pallas_call(
        functools.partial(_segment_kernel_dense, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((b, fp, n_pad), jnp.float32),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, fp, BND), lambda bi, ri: (bi, 0, ri)),
        scratch_shapes=[
            pltpu.VMEM((fp, BND), jnp.float32),
            pltpu.VMEM((2, fp, CED), jnp.float32),
            pltpu.VMEM((2, 1, CED), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ids[:, None, :], msgs_t.astype(jnp.float32))
    return out.transpose(0, 2, 1)[:, :num_segments, :f_in]


def _pallas_segment_sum_2d_t(messages: jnp.ndarray, dst: jnp.ndarray,
                             num_nodes: int) -> jnp.ndarray:
    """Feature-major path: messages [B, E, F] (masked; bf16 takes one exact
    MXU pass, f32 the exact 3-pass mantissa split), dst [B, E] sorted
    -> [B, N, F] f32. Transposes to [B, Fp, E] (Fp = F rounded to 8 sublanes,
    a ~1.1x pad at F=28 vs 4.5x for 128-lane padding) before the kernel."""
    b, e, f_in = messages.shape
    if messages.dtype not in (jnp.bfloat16, jnp.float32):
        messages = messages.astype(jnp.float32)
    n_split = 1 if messages.dtype == jnp.bfloat16 else 3
    # bf16 VMEM blocks need 16-sublane tiling (f32 is fine at 8)
    sub = 16 if messages.dtype == jnp.bfloat16 else 8
    fp = max(((f_in + sub - 1) // sub) * sub, sub)
    n_pad = ((num_nodes + BN - 1) // BN) * BN
    nb = n_pad // BN
    e_pad = ((e + CE - 1) // CE) * CE + CE
    msgs_t = jnp.pad(messages, ((0, 0), (0, e_pad - e), (0, fp - f_in)))
    msgs_t = msgs_t.transpose(0, 2, 1)                      # [B, Fp, E_pad]
    dst = jnp.pad(dst, ((0, 0), (0, e_pad - e)), constant_values=num_nodes - 1)

    block_ptr = _block_ptr(dst, nb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # dst stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # messages stay in HBM
        ],
        out_specs=pl.BlockSpec((1, fp, BN), lambda bi, ri, ptr: (bi, 0, ri),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((fp, BN), jnp.float32),
            pltpu.VMEM((2, fp, CE), msgs_t.dtype),
            pltpu.VMEM((2, 1, CE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    out = pl.pallas_call(
        functools.partial(_segment_kernel_t, n_split=n_split),
        out_shape=jax.ShapeDtypeStruct((b, fp, n_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_ptr, dst[:, None, :], msgs_t)
    return out.transpose(0, 2, 1)[:, :num_nodes, :f_in]


def _pallas_segment_sum_2d(messages: jnp.ndarray, dst: jnp.ndarray,
                           num_nodes: int) -> jnp.ndarray:
    """messages [B, E, F] f32 (already masked), dst [B, E] sorted -> [B, N, F]."""
    b, e, f_in = messages.shape
    # Mosaic requires HBM DMA slices 128-aligned on the lane (last) dim
    f = ((f_in + 127) // 128) * 128
    n_pad = ((num_nodes + BN - 1) // BN) * BN
    nb = n_pad // BN
    e_pad = ((e + CE - 1) // CE) * CE + CE   # slack so aligned DMA stays in range
    messages = jnp.pad(messages, ((0, 0), (0, e_pad - e), (0, f - f_in)))
    # keep padded dst in-range but pointing at the last real node row; their
    # messages are zero so the one-hot contribution is zero anyway
    dst = jnp.pad(dst, ((0, 0), (0, e_pad - e)), constant_values=num_nodes - 1)

    block_ptr = _block_ptr(dst, nb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # dst stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # messages stay in HBM
        ],
        out_specs=pl.BlockSpec((1, BN, f), lambda bi, ri, ptr: (bi, ri, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BN, f), jnp.float32),
            pltpu.VMEM((2, CE, f), jnp.float32),
            pltpu.VMEM((2, 1, CE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    out = pl.pallas_call(
        _segment_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, f), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_ptr, dst[:, None, :], messages)
    return out[:, :num_nodes, :f_in]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_segment_sum(messages, dst, edge_mask, num_nodes: int):
    """Drop-in for ops.segment.segment_sum on [B, E, F] f32 messages."""
    masked = jnp.where(edge_mask[..., None], messages, 0.0)
    return _pallas_segment_sum_2d_t(masked, dst, num_nodes)


def sorted_segment_sum_rows(rows: jnp.ndarray, ids_sorted: jnp.ndarray,
                            num_segments: int) -> jnp.ndarray:
    """Sum rows [B, E, F] into [B, num_segments, F] by per-graph sorted ids
    (NO masking — every row contributes, matching a scatter-add transpose).
    Feature-major Pallas kernel; used by ops.segment gather backward.
    Accumulation is always f32 (kernel scratch dtype)."""
    return _pallas_segment_sum_2d_t(rows, ids_sorted, num_segments)


def _fwd(messages, dst, edge_mask, num_nodes):
    # zero-size sentinel carries the message dtype (a raw dtype is not a
    # valid custom_vjp residual)
    return (pallas_segment_sum(messages, dst, edge_mask, num_nodes),
            (dst, edge_mask, jnp.zeros((0,), messages.dtype)))


def _bwd(num_nodes, res, g):
    dst, edge_mask, mdt_arr = res
    mdt = mdt_arr.dtype
    # cast the cotangent down to the message dtype BEFORE the gather: the
    # values carry message precision anyway and a bf16 gather takes one
    # exact one-hot MXU pass instead of the 3-pass f32 mantissa split
    grad_msgs = xla_segment.gather_nodes(g.astype(mdt), dst)
    grad_msgs = jnp.where(edge_mask[..., None], grad_msgs, 0.0)
    return grad_msgs.astype(mdt), None, None


pallas_segment_sum.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# One-hot MXU gather: out[b, e, :] = table[b, idx[b, e], :]
#
# XLA's row gather is per-row latency-bound (~2 ns/row on v5e regardless of
# dtype or index order — 259 us for 131K 56-byte rows). Reformulated as a
# blocked one-hot matmul with the whole (feature-major) node table resident
# in VMEM, the same gather is MXU-bound: ~E*Np*Fp MACs per graph, tens of us
# at the training bucket shapes. bf16 tables take one exact pass; f32 tables
# use the exact 3-pass bf16 mantissa split (the one-hot operand selects a
# single row, so each pass is exact and the f32 sum reconstructs the value).
# ---------------------------------------------------------------------------

CEG = 512  # edges per output block for the one-hot gather


def _onehot_gather_kernel(idx_ref, table_ref, out_ref, *, np_: int,
                          n_split: int):
    idx = idx_ref[0]                                          # [1, CEG]
    iota = jax.lax.broadcasted_iota(OH_DTYPE, (np_, CEG), 0)
    onehot = _onehot_bf16(idx, iota)                          # [Np, CEG]
    t = table_ref[0]                                          # [Fp, Np]
    # natural matmul form (lhs contracts its LAST dim, rhs its FIRST):
    # Mosaic inserts no operand relayouts. Output stays feature-major
    # [Fp, CEG]; the wrapper transposes outside (measured 174 us total vs
    # 412 us for the lhs-transposed row-major variant at B32/N512/E8192).
    dims = (((1,), (0,)), ((), ()))
    acc = jnp.zeros((t.shape[0], CEG), jnp.float32)
    for part in _mantissa_parts(t, n_split):
        acc += jax.lax.dot_general(part, onehot, dims,
                                   preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def onehot_gather_fits(n: int, f_flat: int, dtype) -> bool:
    """Whether the one-hot gather kernel dispatch is profitable/feasible."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    np_ = ((n + 127) // 128) * 128
    sub = 16 if dtype == jnp.bfloat16 else 8
    fp = max(((f_flat + sub - 1) // sub) * sub, sub)
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    n_split = 1 if dtype == jnp.bfloat16 else 3
    # table block + one-hot build chain (int32 iota 4B + compare
    # intermediate ~4B + bool 1B + bf16 onehot 2B ≈ 11B/el) + acc/out
    # + mantissa-part bf16 copies of the table block for f32
    mant = 0 if n_split == 1 else fp * np_ * (2 * n_split + 4)
    vmem = (fp * np_ * itemsize          # resident table block
            + np_ * CEG * 11             # iota/compare/bool/onehot chain
            + mant
            + CEG * fp * 8)              # acc + out block
    # past ~500K MAC/row-gathered the MXU passes lose to XLA's ~2ns/row
    return vmem <= 8_000_000 and np_ * fp * n_split <= 1_500_000


def onehot_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of table [B, N, F] by idx [B, E] -> [B, E, F] as blocked
    one-hot matmuls on the MXU (forward only; pair with
    unsorted_segment_sum_rows for the VJP)."""
    b, n, f_in = table.shape
    e = idx.shape[1]
    dtype = table.dtype
    n_split = 1 if dtype == jnp.bfloat16 else 3
    # must match onehot_gather_fits (bf16 blocks tile at 16 sublanes)
    sub = 16 if dtype == jnp.bfloat16 else 8
    fp = max(((f_in + sub - 1) // sub) * sub, sub)
    np_ = ((n + 127) // 128) * 128
    e_pad = ((e + CEG - 1) // CEG) * CEG
    t = jnp.pad(table, ((0, 0), (0, np_ - n), (0, fp - f_in)))
    t = t.transpose(0, 2, 1)                                  # [B, Fp, Np]
    idx_p = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, e_pad - e)))

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    out = pl.pallas_call(
        functools.partial(_onehot_gather_kernel, np_=np_, n_split=n_split),
        out_shape=jax.ShapeDtypeStruct((b, fp, e_pad), dtype),
        grid=(b, e_pad // CEG),
        in_specs=[
            pl.BlockSpec((1, 1, CEG), lambda bi, k: (bi, 0, k)),
            pl.BlockSpec((1, fp, np_), lambda bi, k: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, fp, CEG), lambda bi, k: (bi, 0, k)),
        interpret=interpret,
    )(idx_p[:, None, :], t)
    return out.transpose(0, 2, 1)[:, :e, :f_in]


# ---------------------------------------------------------------------------
# Window-adaptive one-hot gather: out[b, e, :] = table[b, idx[b, e], :]
#
# The fixed onehot_gather above contracts the FULL node axis for every edge
# chunk: MACs = Np * E * Fp with the MXU at fp/128 row occupancy — measured
# MXU-bound at the training shapes (171 us for [32,512x28] x 8192 idx; the
# 1/4-occupancy roofline predicts 174 us; docs/bench/segment_kernels_r5.json
# shows compare dtype and chunk size change nothing). This kernel instead
# scans, per edge chunk, ONLY the node-row windows the chunk's indices
# actually span (scalar-prefetched window start + count, computed from
# per-chunk min/max): sorted indices (the dst endpoint; data/graphs.py sorts
# edges by dst) span ~W rows per chunk -> Np/W fewer MACs and compares;
# unsorted indices degrade gracefully to the full scan.
#
# MEASURED OFF (v5e, docs/bench/gather_windowed_r5.json): 169-491 us vs the
# fixed kernel's 89-171 us at the flagship shapes. The MAC savings are real
# but the per-cell window DMA waits (the table block is no longer
# pipeline-resident) and, in the 3D-grid variant tried first, per-cell grid
# overhead cost more than the saved MXU passes. The fixed resident-table
# kernel is the production dispatch; this stays as the documented-off
# alternative (same pattern as REMAT_MESSAGE / pallas_gvp_message /
# TrainConfig.flat_params).
# ---------------------------------------------------------------------------

WG = 128   # node rows per window (lane-tile aligned; also the MXU K tile)
CEW = 512  # edges per output block


def _gather_window_kernel(win_ref, idx_ref, table_ref, out_ref,
                          acc_ref, t_vmem, t_sem, *, n_split: int):
    """Grid (b, edge-chunk). Per cell, loop over ONLY the node-row windows
    the chunk's indices span (scalar-prefetched start + count); each
    window's [fp, WG] table slice is DMA'd HBM->VMEM (double-buffered, the
    proven dynamic-lane-offset DMA pattern of the segment kernels — Mosaic
    rejects dynamic in-kernel VMEM slicing). Matmul in natural form
    (lhs contracts last dim, rhs first): no operand relayouts."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    # window start is prefetched in BLOCK units and multiplied by the
    # constant WG here so Mosaic can prove the lane offset divisible by the
    # 128 tiling (a pre-multiplied runtime scalar fails that proof)
    win0 = win_ref[b * 2 * nc + 2 * c] * WG
    n_win = win_ref[b * 2 * nc + 2 * c + 1]

    idx = idx_ref[0]                                      # [1, CEW] int32
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def start_copy(j, slot):
        w = win0 + j * WG
        pltpu.make_async_copy(
            table_ref.at[b, :, pl.ds(w, WG)], t_vmem.at[slot],
            t_sem.at[slot]).start()

    start_copy(0, 0)

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_win)
        def _():
            start_copy(j + 1, 1 - slot)

        w = win0 + j * WG
        pltpu.make_async_copy(
            table_ref.at[b, :, pl.ds(w, WG)], t_vmem.at[slot],
            t_sem.at[slot]).wait()
        iota = (jax.lax.broadcasted_iota(OH_DTYPE, (WG, CEW), 0)
                + w.astype(OH_DTYPE))
        onehot = _onehot_bf16(idx, iota)                  # [WG, CEW]
        dims = (((1,), (0,)), ((), ()))                   # natural form
        for part in _mantissa_parts(t_vmem[slot], n_split):
            acc_ref[...] += jax.lax.dot_general(
                part, onehot, dims, preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, n_win, body, 0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def gather_windowed(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of table [B, N, F] by idx [B, E] -> [B, E, F] scanning
    only the spanned node windows per edge chunk (forward only; pair with
    a segment-sum for the VJP)."""
    b, n, f_in = table.shape
    e = idx.shape[1]
    dtype = table.dtype
    n_split = 1 if dtype == jnp.bfloat16 else 3
    sub = 16 if dtype == jnp.bfloat16 else 8
    fp = max(((f_in + sub - 1) // sub) * sub, sub)
    np_ = ((n + WG - 1) // WG) * WG
    e_pad = ((e + CEW - 1) // CEW) * CEW
    t = jnp.pad(table, ((0, 0), (0, np_ - n), (0, fp - f_in)))
    t = t.transpose(0, 2, 1)                             # [B, fp, Np]
    idx_p = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, e_pad - e)))

    # per-chunk window start/count from chunk min/max (one tiny XLA fusion)
    nc = e_pad // CEW
    chunks = idx_p.reshape(b, nc, CEW)
    lo_blk = jnp.min(chunks, axis=2) // WG               # [B, nc], block units
    n_win = jnp.max(chunks, axis=2) // WG - lo_blk + 1
    win = jnp.stack([lo_blk, n_win], axis=2).astype(jnp.int32).reshape(-1)

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, CEW), lambda bi, c, win: (bi, 0, c)),
            pl.BlockSpec(memory_space=pl.ANY),    # table stays in HBM
        ],
        out_specs=pl.BlockSpec((1, fp, CEW), lambda bi, c, win: (bi, 0, c)),
        scratch_shapes=[
            pltpu.VMEM((fp, CEW), jnp.float32),
            pltpu.VMEM((2, fp, WG), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_window_kernel, n_split=n_split),
        out_shape=jax.ShapeDtypeStruct((b, fp, e_pad), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(win, idx_p[:, None, :], t)
    return out.transpose(0, 2, 1)[:, :e, :f_in]
