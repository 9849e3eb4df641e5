"""Blockwise Pallas attention vs the XLA reference math (interpret mode on
CPU; the real-TPU path is probed by the bench/verify scripts)."""
import jax
import jax.numpy as jnp
import numpy as np

from caster_dta_tpu.ops.pallas_attention import masked_mha

_NEG = -1e9


def _xla_ref(q, k, v, pad_mask):
    hd = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
    if pad_mask is not None:
        logits = jnp.where(pad_mask[:, None, None, :], _NEG, logits)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_unmasked_matches_xla(rng):
    q, k, v = (_rand(rng, 2, 4, 200, 16), _rand(rng, 2, 4, 300, 16),
               _rand(rng, 2, 4, 300, 16))
    got = masked_mha(q, k, v)
    want = _xla_ref(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_key_padding_mask(rng):
    b, h, lq, lk, hd = 2, 2, 130, 150, 8
    q, k, v = _rand(rng, b, h, lq, hd), _rand(rng, b, h, lk, hd), _rand(rng, b, h, lk, hd)
    pad = jnp.asarray(rng.random((b, lk)) < 0.4)
    got = masked_mha(q, k, v, pad)
    want = _xla_ref(q, k, v, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fully_masked_row_degrades_to_uniform(rng):
    """All keys padded -> same uniform-weights behavior as XLA softmax over
    constant -1e9 logits (real-key mean of v)."""
    b, h, lq, lk, hd = 1, 1, 8, 16, 8
    q, k, v = _rand(rng, b, h, lq, hd), _rand(rng, b, h, lk, hd), _rand(rng, b, h, lk, hd)
    pad = jnp.ones((b, lk), bool)
    got = masked_mha(q, k, v, pad)
    want = _xla_ref(q, k, v, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_long_kv_chunked(rng):
    """Lk spanning multiple BK=128 chunks exercises the running softmax."""
    b, h, lq, lk, hd = 1, 2, 64, 700, 16
    q, k, v = _rand(rng, b, h, lq, hd), _rand(rng, b, h, lk, hd), _rand(rng, b, h, lk, hd)
    pad = jnp.asarray(rng.random((b, lk)) < 0.2)
    got = masked_mha(q, k, v, pad)
    want = _xla_ref(q, k, v, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_mha_module_pallas_path_matches(rng):
    """nn.MultiheadAttention(use_pallas=True) output == standard path with
    the same parameters (weights output becomes None)."""
    from caster_dta_tpu.nn.attention import MultiheadAttention

    b, lq, lk, e, h = 2, 70, 40, 32, 4
    q = _rand(rng, b, lq, e)
    kv = _rand(rng, b, lk, e)
    pad = jnp.asarray(rng.random((b, lk)) < 0.3)

    ref = MultiheadAttention(e, h)
    variables = ref.init(jax.random.PRNGKey(0), q, kv, kv, pad)
    out_ref, w_ref = ref.apply(variables, q, kv, kv, pad)
    fast = MultiheadAttention(e, h, use_pallas=True)
    out_fast, w_fast = fast.apply(variables, q, kv, kv, pad)
    assert w_fast is None and w_ref is not None
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_masked_mha_non_block_multiple_shapes(rng):
    """masked_mha composes with jit and non-multiple-of-block lengths.
    (The differentiable flash_mha these cases used to cover was retired
    after the round-4 A/B — nn/attention.py header note.)"""
    from caster_dta_tpu.ops.pallas_attention import masked_mha

    q, k, v = (_rand(rng, 1, 2, 130, 16), _rand(rng, 1, 2, 33, 16),
               _rand(rng, 1, 2, 33, 16))
    out = jax.jit(lambda q, k, v: masked_mha(q, k, v, None))(q, k, v)
    want = _xla_ref(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
