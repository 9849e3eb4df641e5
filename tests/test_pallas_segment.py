"""Pallas segment-sum kernel vs the XLA reference path (interpret mode on
CPU; the same code compiles with Mosaic on TPU — benchmarked in bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from caster_dta_tpu.ops import segment
from caster_dta_tpu.ops.pallas_segment import pallas_segment_sum


def _case(rng, b, e, n, f):
    dst = np.sort(rng.integers(0, n, size=(b, e)), axis=1).astype(np.int32)
    mask = rng.random((b, e)) < 0.85
    msgs = rng.normal(size=(b, e, f)).astype(np.float32)
    return jnp.asarray(msgs), jnp.asarray(dst), jnp.asarray(mask)


def test_pallas_matches_xla(rng):
    for (b, e, n, f) in [(2, 200, 70, 12), (1, 515, 300, 28), (3, 64, 130, 5)]:
        msgs, dst, mask = _case(rng, b, e, n, f)
        want = segment.segment_sum(msgs, dst, mask, n)
        got = pallas_segment_sum(msgs, dst, mask, n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_grad_matches_xla(rng):
    msgs, dst, mask = _case(rng, 2, 150, 64, 8)
    n = 64

    def f_pallas(m):
        return pallas_segment_sum(m, dst, mask, n).sum() * 0.5

    def f_xla(m):
        return segment.segment_sum(m, dst, mask, n).sum() * 0.5

    g1 = jax.grad(f_pallas)(msgs)
    g2 = jax.grad(f_xla)(msgs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)
