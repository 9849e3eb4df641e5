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


def test_onehot_gather_exact(rng):
    """One-hot MXU gather returns bitwise-exact rows for f32 (3-pass exact
    mantissa split) and bf16 (single exact pass) tables."""
    from caster_dta_tpu.ops.pallas_segment import onehot_gather
    from caster_dta_tpu.ops.segment import _gather_rows

    for (b, n, e, f) in [(2, 70, 130, 13), (1, 300, 515, 28), (3, 130, 64, 5)]:
        table = rng.normal(size=(b, n, f)).astype(np.float32) * 50
        idx = rng.integers(0, n, (b, e)).astype(np.int32)
        for dt in (jnp.float32, jnp.bfloat16):
            t = jnp.asarray(table).astype(dt)
            got = onehot_gather(t, jnp.asarray(idx))
            want = _gather_rows(t, jnp.asarray(idx))
            assert got.dtype == dt
            assert bool(jnp.all(got == want)), (b, n, e, f, dt)


def test_fullN_scatter_matches_xla(rng):
    """Single-pass full-N VMEM-accumulator scatter vs XLA scatter-add, for
    bf16 (1 MXU pass) and f32 (3-pass split) rows."""
    from caster_dta_tpu.ops.pallas_segment import unsorted_segment_sum_rows

    b, n, e, f = 2, 120, 300, 11
    rows = rng.normal(size=(b, e, f)).astype(np.float32)
    ids = rng.integers(0, n, (b, e)).astype(np.int32)
    gidx = (ids + n * np.arange(b)[:, None]).reshape(-1)
    for dt in (jnp.float32, jnp.bfloat16):
        r = jnp.asarray(rows).astype(dt)
        want = jnp.zeros((b * n, f), jnp.float32).at[gidx].add(
            r.astype(jnp.float32).reshape(b * e, f)).reshape(b, n, f)
        got = unsorted_segment_sum_rows(r, jnp.asarray(ids), n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_gather_nodes_grad_uses_scatter(rng):
    """gather_nodes VJP (dense one-hot scatter path) matches the XLA
    transpose at both dtypes."""
    b, n, e, f = 2, 90, 200, 7
    table = rng.normal(size=(b, n, f)).astype(np.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, e)).astype(np.int32))
    ct = rng.normal(size=(b, e, f)).astype(np.float32)

    old = segment.USE_PALLAS
    segment.USE_PALLAS = True  # force the Pallas path (interpret mode on CPU)
    try:
        _run_gather_grad_cases(rng, b, n, e, f, table, idx, ct)
    finally:
        segment.USE_PALLAS = old


def _run_gather_grad_cases(rng, b, n, e, f, table, idx, ct):
    for dt in (jnp.float32, jnp.bfloat16):
        t = jnp.asarray(table).astype(dt)
        ctd = jnp.asarray(ct).astype(dt)

        def f_seg(t):
            return (segment.gather_nodes(t, idx) * ctd).sum()

        def f_ref(t):
            out = jnp.take(t.reshape(b * n, f),
                           (idx + n * jnp.arange(b)[:, None]).reshape(-1),
                           axis=0).reshape(b, e, f)
            return (out * ctd).sum()

        g1 = jax.grad(f_seg)(t)
        g2 = jax.grad(f_ref)(t)
        np.testing.assert_allclose(
            np.asarray(g1, np.float32), np.asarray(g2, np.float32),
            rtol=2e-2 if dt == jnp.bfloat16 else 1e-5,
            atol=2e-2 if dt == jnp.bfloat16 else 1e-5)


def test_gather_windowed_exact(rng):
    """Window-adaptive gather (measured-off alternative, kept documented)
    matches a plain row gather bitwise for sorted and unsorted indices."""
    import jax
    import jax.numpy as jnp

    from caster_dta_tpu.ops import pallas_segment as ps

    for dt in (jnp.float32, jnp.bfloat16):
        table = jnp.asarray(rng.normal(size=(3, 96, 12))).astype(dt)
        src = jnp.asarray(rng.integers(0, 96, (3, 200)).astype(np.int32))
        dst = jnp.asarray(np.sort(src, axis=1))
        for idx in (src, dst):
            got = np.asarray(ps.gather_windowed(table, idx))
            want = np.asarray(jax.vmap(lambda t, i: t[i])(table, idx))
            assert np.array_equal(got, want)


def test_block_ptr_matches_searchsorted(rng):
    """The bucket-count block_ptr equals vmap(searchsorted) on sorted dst
    (incl. the padded tail pinned at num_nodes-1)."""
    import jax
    import jax.numpy as jnp

    from caster_dta_tpu.ops import pallas_segment as ps

    n, nb = 96, (96 + ps.BN - 1) // ps.BN
    dst = np.sort(rng.integers(0, n, (4, 300)).astype(np.int32), axis=1)
    dst[:, -37:] = n - 1   # padded tail
    want = jax.vmap(lambda d: jnp.searchsorted(
        d, jnp.arange(nb + 1, dtype=jnp.int32) * ps.BN, side="left"))(
        jnp.asarray(dst)).astype(jnp.int32).reshape(-1)
    got = ps._block_ptr(jnp.asarray(dst), nb)
    assert np.array_equal(np.asarray(got), np.asarray(want))
