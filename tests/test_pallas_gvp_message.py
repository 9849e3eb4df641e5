"""Fused Pallas GVP message MLP (ops/pallas_gvp_message.py) vs the module
path (nn/gvp.GVPConv), interpret mode on CPU. The fused path must be a
drop-in: same param tree, same outputs, same gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caster_dta_tpu.nn import gvp as gvpmod


def _graph(rng, B=2, N=16, E=64, ns=16, nv=4, se=32, ve=1):
    s = jnp.asarray(rng.normal(size=(B, N, ns)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, nv, 3)), jnp.float32)
    src = jnp.asarray(rng.integers(0, N, (B, E)), jnp.int32)
    dst = jnp.asarray(np.sort(rng.integers(0, N, (B, E)), axis=1), jnp.int32)
    mask = jnp.asarray(rng.random((B, E)) < 0.8)
    es = jnp.asarray(rng.normal(size=(B, E, se)), jnp.float32)
    ev = jnp.asarray(rng.normal(size=(B, E, ve, 3)), jnp.float32)
    return (s, v), src, dst, mask, (es, ev)


def _run(conv, variables, graph, fused):
    x, src, dst, mask, eattr = graph
    old = gvpmod.USE_FUSED_MESSAGE
    gvpmod.USE_FUSED_MESSAGE = fused
    try:
        def f(variables):
            os_, ov = conv.apply(variables, x, src, dst, mask, eattr)
            return jnp.sum(jnp.sin(os_)) + jnp.sum(jnp.cos(ov)), (os_, ov)
        (loss, outs), grads = jax.value_and_grad(f, has_aux=True)(variables)
    finally:
        gvpmod.USE_FUSED_MESSAGE = old
    return loss, outs, grads


@pytest.mark.parametrize("n_layers,acts,aggr", [
    (3, ("relu", "sigmoid"), "sum"),      # flagship lbamodel config
    (3, ("sigmoid", "sigmoid"), "mean"),  # pocketminer-style
    (2, ("relu", "sigmoid"), "mean"),
    (1, ("relu", "sigmoid"), "sum"),
])
def test_fused_matches_module_path(rng, n_layers, acts, aggr):
    graph = _graph(rng)
    conv = gvpmod.GVPConv((16, 4), n_layers=n_layers, aggr=aggr,
                          activations=acts, vector_gate=True)
    variables = conv.init(jax.random.PRNGKey(0), *graph)

    l0, (s0, v0), g0 = _run(conv, variables, graph, fused=False)
    l1, (s1, v1), g1 = _run(conv, variables, graph, fused=True)

    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=1e-5, atol=1e-5)
    for (k0, a), (k1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(k0))


def test_fused_equivariance(rng):
    """Rotating input vectors rotates the fused conv's vector output and
    leaves scalars unchanged (SO(3) property, as for the module path)."""
    from scipy.spatial.transform import Rotation

    graph = _graph(rng)
    (s, v), src, dst, mask, (es, ev) = graph
    conv = gvpmod.GVPConv((16, 4), n_layers=3, aggr="sum",
                          activations=("relu", "sigmoid"), vector_gate=True)
    variables = conv.init(jax.random.PRNGKey(0), *graph)
    R = jnp.asarray(Rotation.random(random_state=0).as_matrix(), jnp.float32)

    old = gvpmod.USE_FUSED_MESSAGE
    gvpmod.USE_FUSED_MESSAGE = True
    try:
        s1, v1 = conv.apply(variables, (s, v), src, dst, mask, (es, ev))
        s2, v2 = conv.apply(variables, (s, v @ R.T), src, dst, mask,
                            (es, ev @ R.T))
    finally:
        gvpmod.USE_FUSED_MESSAGE = old
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v1 @ R.T), np.asarray(v2),
                               rtol=2e-4, atol=2e-4)


def test_layout_pin_is_identity_with_cast(rng):
    from caster_dta_tpu.ops.pallas_gvp_message import layout_pin

    x = jnp.asarray(rng.normal(size=(3, 8, 28)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(layout_pin(x)), np.asarray(x))
    y = layout_pin(x, jnp.bfloat16)
    assert y.dtype == jnp.bfloat16
    g = jax.grad(lambda x: jnp.sum(layout_pin(x).astype(jnp.float32) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), rtol=1e-6)
