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


def test_flash_mha_forward_and_grads_match_xla(rng):
    """flash_mha (custom VJP) forward and q/k/v gradients match the XLA
    reference, including a degenerate batch where every key is masked."""
    from caster_dta_tpu.ops.pallas_attention import flash_mha

    b, h, lq, lk, hd = 3, 4, 160, 70, 16
    q, k, v = (_rand(rng, b, h, lq, hd), _rand(rng, b, h, lk, hd),
               _rand(rng, b, h, lk, hd))
    mask = np.asarray(rng.random((b, lk)) < 0.3)
    mask[1, :] = True                       # degenerate: all keys masked
    mask = jnp.asarray(mask)

    np.testing.assert_allclose(np.asarray(flash_mha(q, k, v, mask)),
                               np.asarray(_xla_ref(q, k, v, mask)),
                               rtol=2e-5, atol=2e-5)

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

    g_flash = jax.grad(loss(lambda q, k, v: flash_mha(q, k, v, mask)),
                       argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(lambda q, k, v: _xla_ref(q, k, v, mask)),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_flash_tristate_dispatch_in_mha_module(rng, monkeypatch):
    """USE_FLASH_NO_WEIGHTS=True routes the need_weights=False call through
    flash_mha (weights=None) with the same output as the XLA path — the
    training-step dispatch the Trainer enables via return_attention=False."""
    from caster_dta_tpu.nn import attention as attn_mod
    from caster_dta_tpu.nn.attention import MultiheadAttention

    b, lq, lk, e, h = 2, 40, 30, 32, 4
    q = _rand(rng, b, lq, e)
    kv = _rand(rng, b, lk, e)
    pad = jnp.asarray(rng.random((b, lk)) < 0.3)

    mha = MultiheadAttention(e, h)
    variables = mha.init(jax.random.PRNGKey(0), q, kv, kv, pad)
    out_ref, w_ref = mha.apply(variables, q, kv, kv, pad)
    assert w_ref is not None

    monkeypatch.setattr(attn_mod, "USE_FLASH_NO_WEIGHTS", True)
    out_flash, w_flash = mha.apply(variables, q, kv, kv, pad,
                                   need_weights=False)
    assert w_flash is None
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)

    # False forces the XLA path even with need_weights=False (which still
    # produces weights — unused ones are dead-code-eliminated under jit)
    monkeypatch.setattr(attn_mod, "USE_FLASH_NO_WEIGHTS", False)
    out_xla, _ = mha.apply(variables, q, kv, kv, pad, need_weights=False)
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)


def test_flash_mha_under_jit_and_vmap_shapes(rng):
    """flash_mha composes with jit and non-multiple-of-block lengths."""
    from caster_dta_tpu.ops.pallas_attention import flash_mha

    q, k, v = (_rand(rng, 1, 2, 130, 16), _rand(rng, 1, 2, 33, 16),
               _rand(rng, 1, 2, 33, 16))
    out = jax.jit(lambda q, k, v: flash_mha(q, k, v, None))(q, k, v)
    want = _xla_ref(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
