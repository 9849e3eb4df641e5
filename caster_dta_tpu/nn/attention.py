"""Multi-head attention with torch.nn.MultiheadAttention-compatible math.

The reference's cross-attention block (models/joint_gnn.py:321-408) is built
on ``nn.MultiheadAttention(embed_dim, kdim=..., vdim=..., batch_first=True)``
with a ``key_padding_mask`` and head-averaged attention weights returned. This
module reproduces those semantics exactly (so transplanted reference weights
produce identical outputs) while running as one fused dense attention over the
padded [B, L, D] batches — no ragged densification needed.

For very large R×A products the Pallas blockwise-masked attention kernel in
ops/pallas_attention.py can be swapped in; this XLA version is the reference
path (XLA already fuses the softmax chain well at these sizes).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from caster_dta_tpu.nn.common import Dense

_NEG = -1e9  # large negative for masked logits (bf16-safe; torch uses -inf)

# TRAINING dispatch note: a differentiable flash path (custom-VJP Pallas
# kernel, gated by a USE_FLASH_NO_WEIGHTS tri-state here) existed through
# round 4 and was RETIRED after measurement (scripts/archive/
# bench_attention_kiba.py on v5e, bf16, fwd+bwd over q/k/v —
# docs/bench/bench_attention_r4_full.out):
#   flagship res->atoms [32,8,512x64]: XLA 0.96 ms vs flash 1.97 ms (0.49x)
#   flagship atoms->res [32,8,64x512]: XLA 0.97 ms vs flash 1.66 ms (0.58x)
#   kiba [4,8,4608x384 / 384x4608]: flash loses the forward too (2.2 ms vs
#   1.2/1.4 ms XLA) and the flash BACKWARD kernel failed to compile in both
#   directions (Mosaic VMEM at Lk=4608).
# At every production tier the materialized-logits tensor is <=113 MB and
# XLA's fused softmax chain wins, so training always takes the XLA route;
# the forward-only masked_mha kernel (use_pallas=True) remains the
# inference/screening path for very large proteins.


class MultiheadAttention(nn.Module):
    """batch_first torch MHA: query [B,Lq,E], key/value [B,Lk,Dk].

    Returns (out [B,Lq,E], attn_weights [B,Lq,Lk] averaged over heads).
    key_padding_mask marks PADDING keys True (torch convention).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: object = None
    # Pallas blockwise path (ops/pallas_attention.py): computes the output
    # without materializing [B, H, Lq, Lk] logits — for inference/screening
    # on very large proteins. Returns weights=None, so only usable where the
    # caller does not consume attention maps.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None,
                 deterministic: bool = True, need_weights: bool = True):
        e, h = self.embed_dim, self.num_heads
        assert e % h == 0, "embed_dim must divide num_heads"
        hd = e // h
        b, lq, _ = query.shape
        lk = key.shape[1]

        q = Dense(e, dtype=self.dtype, name="q_proj")(query)
        k = Dense(e, dtype=self.dtype, name="k_proj")(key)
        v = Dense(e, dtype=self.dtype, name="v_proj")(value)

        q = q.reshape(b, lq, h, hd).transpose(0, 2, 1, 3)   # [B,H,Lq,hd]
        k = k.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, hd).transpose(0, 2, 1, 3)

        if self.use_pallas and (self.dropout == 0.0 or deterministic):
            from caster_dta_tpu.ops.pallas_attention import masked_mha

            out = masked_mha(q, k, v, key_padding_mask)
            out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
            out = Dense(e, dtype=self.dtype, name="out_proj")(out)
            return out, None

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], _NEG, logits)
        # softmax in f32 regardless of compute dtype (bf16 logits lose the
        # exp/sum precision); weights cast back for the PV matmul
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        weights = weights.astype(v.dtype)
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, weights.shape)
            weights_used = jnp.where(keep, weights / (1.0 - self.dropout), 0.0)
        else:
            weights_used = weights

        out = jnp.einsum("bhqk,bhkd->bhqd", weights_used, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
        out = Dense(e, dtype=self.dtype, name="out_proj")(out)
        return out, weights.mean(axis=1)  # torch averages over heads
