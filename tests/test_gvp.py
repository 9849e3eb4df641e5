"""GVP property tests: SO(3) equivariance of vector channels, invariance of
scalar channels (SURVEY.md §4), plus layer shape/semantics checks."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from caster_dta_tpu.nn import gvp


def _rand_sv(rng, shape, ns, nv):
    s = jnp.asarray(rng.normal(size=shape + (ns,)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape + (nv, 3)).astype(np.float32))
    return s, v


def _rotate(v, R):
    return jnp.einsum("...ci,ij->...cj", v, jnp.asarray(R, dtype=v.dtype))


def test_gvp_equivariance(rng):
    R = Rotation.random(random_state=0).as_matrix().astype(np.float32)
    model = gvp.GVP(out_dims=(8, 5), vector_gate=True)
    x = _rand_sv(rng, (10,), 6, 4)
    params = model.init(jax.random.PRNGKey(0), x)
    s1, v1 = model.apply(params, x)
    s2, v2 = model.apply(params, (x[0], _rotate(x[1], R)))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(_rotate(v1, R)), np.asarray(v2),
                               rtol=2e-5, atol=2e-5)


def test_gvp_no_vector_gate_equivariance(rng):
    R = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    model = gvp.GVP(out_dims=(8, 5), vector_gate=False)
    x = _rand_sv(rng, (10,), 6, 4)
    params = model.init(jax.random.PRNGKey(0), x)
    s1, v1 = model.apply(params, x)
    s2, v2 = model.apply(params, (x[0], _rotate(x[1], R)))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(_rotate(v1, R)), np.asarray(v2),
                               rtol=2e-5, atol=2e-5)


def test_gvp_scalar_only_output(rng):
    model = gvp.GVP(out_dims=(8, 0), activations=("relu", None), vector_gate=True)
    x = _rand_sv(rng, (10,), 6, 4)
    params = model.init(jax.random.PRNGKey(0), x)
    s, v = model.apply(params, x)
    assert s.shape == (10, 8) and v.shape == (10, 0, 3)
    assert np.all(np.asarray(s) >= 0)  # relu applied


def test_gvp_scalar_only_input(rng):
    model = gvp.GVP(out_dims=(8, 3))
    x = _rand_sv(rng, (10,), 6, 0)
    params = model.init(jax.random.PRNGKey(0), x)
    s, v = model.apply(params, x)
    assert s.shape == (10, 8) and v.shape == (10, 3, 3)
    np.testing.assert_allclose(np.asarray(v), 0.0)  # torch zeros vector out


def test_layernorm_semantics(rng):
    model = gvp.GVPLayerNorm()
    x = _rand_sv(rng, (7,), 5, 4)
    params = model.init(jax.random.PRNGKey(0), x)
    s, v = model.apply(params, x)
    # scalar LN: zero mean / unit var rows
    np.testing.assert_allclose(np.asarray(s.mean(-1)), 0.0, atol=1e-5)
    # vector RMS across channels == 1 after normalization
    vn = np.sqrt((np.asarray(v) ** 2).sum(-1).mean(-1))
    np.testing.assert_allclose(vn, 1.0, rtol=1e-4)


def _tiny_graph_batch(rng, b=2, n=6, e=12, ns=7, nv=3, es=4, ev=1):
    from caster_dta_tpu.data.graphs import pad_graph, stack_graphs
    graphs = []
    for _ in range(b):
        n_real = int(rng.integers(3, n + 1))
        e_real = int(rng.integers(2, e + 1))
        ei = rng.integers(0, n_real, size=(2, e_real))
        graphs.append(pad_graph(
            node_s=rng.normal(size=(n_real, ns)).astype(np.float32),
            node_v=rng.normal(size=(n_real, nv, 3)).astype(np.float32),
            edge_index=ei,
            edge_s=rng.normal(size=(e_real, es)).astype(np.float32),
            edge_v=rng.normal(size=(e_real, ev, 3)).astype(np.float32),
            node_type=np.zeros(n_real), edge_type=np.zeros(e_real),
            n_pad=n, e_pad=e))
    return stack_graphs(graphs)


def test_gvp_conv_layer_equivariance(rng):
    R = Rotation.random(random_state=2).as_matrix().astype(np.float32)
    g = _tiny_graph_batch(rng)
    layer = gvp.GVPConvLayer(vector_gate=True, activations=("relu", None), aggr="sum")
    x = (g.node_s, g.node_v)
    ea = (g.edge_s, g.edge_v)
    params = layer.init(jax.random.PRNGKey(0), x, g.edge_src, g.edge_dst,
                        g.edge_mask, ea)
    s1, v1 = layer.apply(params, x, g.edge_src, g.edge_dst, g.edge_mask, ea)
    xr = (x[0], _rotate(x[1], R))
    ear = (ea[0], _rotate(ea[1], R))
    s2, v2 = layer.apply(params, xr, g.edge_src, g.edge_dst, g.edge_mask, ear)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(_rotate(v1, R)), np.asarray(v2),
                               rtol=5e-4, atol=5e-5)


def test_gvp_conv_padding_invariance(rng):
    """Padding nodes/edges must not change real-node outputs."""
    from caster_dta_tpu.data.graphs import pad_graph, stack_graphs
    n_real, e_real, ns, nv, es, ev = 5, 9, 7, 3, 4, 1
    ei = rng.integers(0, n_real, size=(2, e_real))
    kwargs = dict(
        node_s=rng.normal(size=(n_real, ns)).astype(np.float32),
        node_v=rng.normal(size=(n_real, nv, 3)).astype(np.float32),
        edge_index=ei,
        edge_s=rng.normal(size=(e_real, es)).astype(np.float32),
        edge_v=rng.normal(size=(e_real, ev, 3)).astype(np.float32),
        node_type=np.zeros(n_real), edge_type=np.zeros(e_real))
    g_tight = stack_graphs([pad_graph(**kwargs, n_pad=n_real, e_pad=e_real)])
    g_loose = stack_graphs([pad_graph(**kwargs, n_pad=n_real + 3, e_pad=e_real + 7)])

    layer = gvp.GVPConvLayer(vector_gate=True, aggr="mean")
    x = (g_tight.node_s, g_tight.node_v)
    params = layer.init(jax.random.PRNGKey(0), x, g_tight.edge_src, g_tight.edge_dst,
                        g_tight.edge_mask, (g_tight.edge_s, g_tight.edge_v))
    out_t = layer.apply(params, x, g_tight.edge_src, g_tight.edge_dst,
                        g_tight.edge_mask, (g_tight.edge_s, g_tight.edge_v))
    out_l = layer.apply(params, (g_loose.node_s, g_loose.node_v), g_loose.edge_src,
                        g_loose.edge_dst, g_loose.edge_mask,
                        (g_loose.edge_s, g_loose.edge_v))
    np.testing.assert_allclose(np.asarray(out_t[0][0]), np.asarray(out_l[0][0, :n_real]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t[1][0]), np.asarray(out_l[1][0, :n_real]),
                               rtol=1e-5, atol=1e-5)


def test_gvp_conv_layer_remat_parity(rng):
    """REMAT_MESSAGE=True must match the default path exactly (values and
    gradients) — remat only changes what's stored for backward."""
    g = _tiny_graph_batch(rng)
    layer = gvp.GVPConvLayer(vector_gate=True, aggr="mean")
    x = (g.node_s, g.node_v)
    ea = (g.edge_s, g.edge_v)
    params = layer.init(jax.random.PRNGKey(0), x, g.edge_src, g.edge_dst,
                        g.edge_mask, ea)

    def loss(p):
        s, v = layer.apply(p, x, g.edge_src, g.edge_dst, g.edge_mask, ea)
        return jnp.sum(s ** 2) + jnp.sum(v ** 2)

    try:
        gvp.REMAT_MESSAGE = False
        l0, g0 = jax.value_and_grad(loss)(params)
        gvp.REMAT_MESSAGE = True
        l1, g1 = jax.value_and_grad(loss)(params)
    finally:
        gvp.REMAT_MESSAGE = None
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)
