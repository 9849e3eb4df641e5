"""Pallas TPU kernel: blockwise masked multi-head attention (flash-style).

The reference's cross-attention densifies to [B, R, A] score matrices through
``nn.MultiheadAttention`` (joint_gnn.py:321-408); our XLA path
(nn/attention.py) does the same fused-but-materialized computation. For very
large residue counts the [B, H, R, A] logit tensor dominates memory — this
kernel computes attention output blockwise with a running softmax
(never materializing logits beyond a [BQ, BK] tile), the SURVEY §2.4 plan
("masked dense attention is blockwise-tiled in Pallas if R×A exceeds VMEM").

Semantics match nn/attention.py exactly: scale 1/sqrt(hd), key padding mask
adds -1e9 (so a fully-masked row degrades to uniform weights, same as the
XLA softmax over constant logits), f32 accumulation.

Entry point: ``masked_mha`` — forward-only streaming kernel for
inference/screening on very large proteins.

A differentiable ``flash_mha`` (custom-VJP, whole-K/V-resident backward
kernel) existed through round 4 and was RETIRED after measurement: it lost
the fwd+bwd A/B at every production tier where it compiled (0.49x/0.58x at
the flagship tiers) and its backward exceeded VMEM at the KIBA tier
(Lk=4608, Mosaic compile failure) — docs/bench/bench_attention_r4_full.out,
RESULTS.md "Flash attention A/B". XLA's fused materialized-logits softmax
is the training path (nn/attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128   # query rows per block
BK = 128   # key rows per chunk
_NEG = -1e9


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, h, lk, hd,
                precision):
    # One program = one (batch, query-block): all heads processed here so the
    # per-program work amortizes grid/launch overhead (hd is small, the MXU
    # tiles are thin either way). precision=HIGHEST keeps the f32 numerics
    # of the XLA/CPU reference path (the retired flash training path used
    # default precision with bf16 operands and f32 accumulation).
    nk = lk // BK
    for head in range(h):
        q = q_ref[0, head]                         # [BQ, hd]

        m0 = jnp.full((BQ, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((BQ, 1), jnp.float32)
        acc0 = jnp.zeros((BQ, hd), jnp.float32)

        def body(c, carry):
            m, l, acc = carry
            k = k_ref[0, head, pl.ds(c * BK, BK), :]   # [BK, hd]
            v = v_ref[0, head, pl.ds(c * BK, BK), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision) * scale           # [BQ, BK] f32
            # 0 = real, 1 = user-masked (-1e9 like the XLA path),
            # 2 = structural block padding (strictly lower, so a fully
            # user-masked row still matches XLA's uniform-over-real-keys
            # degenerate behavior)
            pad = mask_ref[0, 0, pl.ds(c * BK, BK)]    # [BK] i32
            s = jnp.where(pad[None, :] == 1, _NEG, s)
            s = jnp.where(pad[None, :] == 2, 2.0 * _NEG, s)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                        preferred_element_type=jnp.float32,
                                        precision=precision)
            return m_new, l, acc

        m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
        o_ref[0, head] = acc / jnp.maximum(l, 1e-30)


@functools.partial(jax.jit, static_argnames=("interpret", "highest"))
def _mha(q, k, v, pad_mask, interpret=False, highest=True):
    b, h, lq, hd = q.shape
    lk = k.shape[2]
    scale = 1.0 / float(hd) ** 0.5
    grid = (b, lq // BQ)
    precision = jax.lax.Precision.HIGHEST if highest else None
    kernel = functools.partial(_mha_kernel, scale=scale, h=h, lk=lk, hd=hd,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, lq, hd), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, h, BQ, hd), lambda bi, qi: (bi, 0, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, lk, hd), lambda bi, qi: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, lk, hd), lambda bi, qi: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                # [B, 1, Lk] so the block's last two dims equal the array's
                # (Mosaic requires (8,128)-divisible or full-dim blocks)
                pl.BlockSpec((1, 1, lk), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, BQ, hd),
                                   lambda bi, qi: (bi, 0, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q, k, v, pad_mask[:, None, :])


def _pad_inputs(q, k, v, key_padding_mask, dtype=None):
    b, h, lq, hd = q.shape
    lk = k.shape[2]
    lq_p = pl.cdiv(lq, BQ) * BQ
    lk_p = pl.cdiv(lk, BK) * BK
    dtype = dtype or q.dtype
    qp = jnp.pad(q.astype(dtype), ((0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    kp = jnp.pad(k.astype(dtype), ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
    vp = jnp.pad(v.astype(dtype), ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
    if key_padding_mask is None:
        pad = jnp.zeros((b, lk), jnp.int32)
    else:
        pad = key_padding_mask.astype(jnp.int32)
    pad = jnp.pad(pad, ((0, 0), (0, lk_p - lk)), constant_values=2)
    return qp, kp, vp, pad[:, None, :]


def _interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def masked_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               key_padding_mask=None) -> jnp.ndarray:
    """Blockwise masked attention output.

    q: [B, H, Lq, hd]; k/v: [B, H, Lk, hd]; key_padding_mask: bool [B, Lk]
    with True marking PADDING keys (torch convention, nn/attention.py:58).
    Returns [B, H, Lq, hd]. Lq/Lk are padded internally to block multiples
    (padded keys are masked; padded query rows are dropped).
    """
    lq = q.shape[2]
    qp, kp, vp, pad = _pad_inputs(q, k, v, key_padding_mask,
                                  dtype=jnp.float32)
    out = _mha(qp, kp, vp, pad[:, 0, :], interpret=_interpret())
    return out[:, :, :lq, :]
