"""Segment op correctness vs naive numpy loops (SURVEY.md §4: unit tests for
each kernel vs reference semantics)."""
import jax
import numpy as np
import jax.numpy as jnp

from caster_dta_tpu.ops import segment


def _random_graph(rng, b=3, n=11, e=29, f=5):
    dst = np.sort(rng.integers(0, n, size=(b, e)), axis=1).astype(np.int32)
    mask = rng.random((b, e)) < 0.8
    # emulate the sorted-pad layout: masked-out edges still have valid ids
    msgs = rng.normal(size=(b, e, f)).astype(np.float32)
    return msgs, dst, mask


def _naive(msgs, dst, mask, n, mode):
    b, e, f = msgs.shape
    out = np.zeros((b, n, f), np.float32)
    cnt = np.zeros((b, n), np.float32)
    mx = np.full((b, n, f), -np.inf, np.float32)
    for bi in range(b):
        for ei in range(e):
            if mask[bi, ei]:
                out[bi, dst[bi, ei]] += msgs[bi, ei]
                cnt[bi, dst[bi, ei]] += 1
                mx[bi, dst[bi, ei]] = np.maximum(mx[bi, dst[bi, ei]], msgs[bi, ei])
    if mode == "sum":
        return out
    if mode == "mean":
        return out / np.maximum(cnt, 1)[..., None]
    if mode == "max":
        return np.where(np.isfinite(mx), mx, 0.0)


def test_segment_sum_mean_max(rng):
    msgs, dst, mask = _random_graph(rng)
    n = 11
    for mode in ["sum", "mean", "max"]:
        got = np.asarray(segment.aggregate(jnp.asarray(msgs), jnp.asarray(dst),
                                           jnp.asarray(mask), n, mode))
        want = _naive(msgs, dst, mask, n, mode)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_trailing_dims(rng):
    b, e, n = 2, 13, 7
    msgs = rng.normal(size=(b, e, 4, 3)).astype(np.float32)
    dst = np.sort(rng.integers(0, n, size=(b, e)), axis=1).astype(np.int32)
    mask = np.ones((b, e), bool)
    got = np.asarray(segment.segment_sum(jnp.asarray(msgs), jnp.asarray(dst),
                                         jnp.asarray(mask), n))
    want = _naive(msgs.reshape(b, e, 12), dst, mask, n, "sum").reshape(b, n, 4, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gather_nodes(rng):
    b, n, e, f = 2, 6, 9, 4
    feat = rng.normal(size=(b, n, f)).astype(np.float32)
    idx = rng.integers(0, n, size=(b, e)).astype(np.int32)
    got = np.asarray(segment.gather_nodes(jnp.asarray(feat), jnp.asarray(idx)))
    for bi in range(b):
        np.testing.assert_allclose(got[bi], feat[bi][idx[bi]])


def test_segment_softmax_sums_to_one(rng):
    b, e, n, h = 2, 17, 5, 3
    logits = rng.normal(size=(b, e, h)).astype(np.float32) * 4
    dst = np.sort(rng.integers(0, n, size=(b, e)), axis=1).astype(np.int32)
    mask = rng.random((b, e)) < 0.7
    w = np.asarray(segment.segment_softmax(jnp.asarray(logits), jnp.asarray(dst),
                                           jnp.asarray(mask), n))
    assert np.all(w[~mask] == 0)
    sums = _naive(w, dst, mask, n, "sum")
    for bi in range(b):
        for ni in range(n):
            if (mask[bi] & (dst[bi] == ni)).any():
                np.testing.assert_allclose(sums[bi, ni], 1.0, rtol=1e-5)


def test_pallas_dispatch_parity(rng):
    """Forced-Pallas segment_sum/mean (interpret mode on CPU) matches the XLA
    path, including 4D vector-channel messages and gradients."""
    b, e, n = 2, 40, 9
    msgs3 = rng.normal(size=(b, e, 7)).astype(np.float32)
    msgs4 = rng.normal(size=(b, e, 4, 3)).astype(np.float32)
    dst = np.sort(rng.integers(0, n, size=(b, e)), axis=1).astype(np.int32)
    mask = rng.random((b, e)) < 0.8

    args3 = (jnp.asarray(msgs3), jnp.asarray(dst), jnp.asarray(mask), n)
    args4 = (jnp.asarray(msgs4), jnp.asarray(dst), jnp.asarray(mask), n)
    try:
        segment.USE_PALLAS = False
        want3 = np.asarray(segment.segment_sum(*args3))
        want4 = np.asarray(segment.segment_mean(*args4))
        gw = jax.grad(lambda m: segment.segment_sum(m, *args3[1:]).sum())(args3[0])
        segment.USE_PALLAS = True
        got3 = np.asarray(segment.segment_sum(*args3))
        got4 = np.asarray(segment.segment_mean(*args4))
        gg = jax.grad(lambda m: segment.segment_sum(m, *args3[1:]).sum())(args3[0])
    finally:
        segment.USE_PALLAS = None
    np.testing.assert_allclose(got3, want3, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got4, want4, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), rtol=1e-5, atol=1e-5)
