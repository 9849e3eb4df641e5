"""Smoke tests across the full protein and molecule model zoos: every model
family constructs, runs in eval+train mode, and emits finite [B, N, out]."""
import numpy as np
import jax
import pytest

from caster_dta_tpu.models.protein import make_protein_gnn
from caster_dta_tpu.models.molecule import make_molecule_gnn
from tests.test_joint import _protein_batch, _molecule_batch

PROT_COMMON = dict(num_ntypes=20, num_etypes=1, ntype_emb_dim=None,
                   etype_emb_dim=None, num_convs=2, out_channels=12,
                   dropout_rate=0.2, activation="leaky_relu")
MOL_COMMON = dict(in_channels=41, edge_dim=9, num_ntypes=11, num_etypes=5,
                  ntype_emb_dim=None, etype_emb_dim=None, num_convs=2,
                  hidden_channels=16, out_channels=12, dropout_rate=0.2,
                  activation="leaky_relu", aggr="sum")


@pytest.mark.parametrize("base_conv,extra", [
    ("lbamodel", dict(in_channels=(17, 3), edge_dim=(32, 1),
                      hidden_channels=(16, 4), edge_hidden_channels=(32, 1),
                      aggr="sum")),
    ("pocketminer", dict(in_channels=(17, 3), edge_dim=(32, 1),
                         hidden_channels=(16, 4), edge_hidden_channels=(32, 1),
                         initial_node_project_channels=(16, 8),
                         initial_edge_project_channels=(32, 4))),
    ("cpdmodel", dict(in_channels=(17, 3), edge_dim=(32, 1),
                      hidden_channels=(16, 4), edge_hidden_channels=(32, 1))),
    ("gatv2", dict(in_channels=26, edge_dim=48, hidden_channels=16, heads=2)),
    ("heat", dict(in_channels=26, edge_dim=48, hidden_channels=16,
                  eattr_emb_dim=8, heads=2)),
])
def test_protein_zoo(base_conv, extra):
    rng = np.random.default_rng(0)
    kwargs = {**PROT_COMMON, **extra}
    model = make_protein_gnn(base_conv, **kwargs)
    if isinstance(kwargs["in_channels"], tuple):
        g = _protein_batch(rng)
    else:
        # scalar models: flatten features into node_s (ds=26 = 17 + 3*3)
        g = _protein_batch(rng)
        ns = np.concatenate([np.asarray(g.node_s),
                             np.asarray(g.node_v).reshape(2, 12, 9)], -1)
        es = np.concatenate([np.asarray(g.edge_s),
                             np.asarray(g.edge_v).reshape(2, 40, 3)], -1)
        es = np.concatenate([es, np.zeros((2, 40, 48 - es.shape[-1]), np.float32)], -1)
        g = g.replace(node_s=ns, node_v=np.zeros((2, 12, 0, 3), np.float32),
                      edge_s=es, edge_v=np.zeros((2, 40, 0, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), g)
    out = model.apply(params, g)
    # HEAT with concat=True outputs heads*out_channels (PyG semantics)
    exp_out = 24 if base_conv == "heat" else 12
    assert out.shape == (2, 12, exp_out)
    assert np.all(np.isfinite(np.asarray(out)))
    out_t = model.apply(params, g, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.all(np.isfinite(np.asarray(out_t)))


@pytest.mark.parametrize("base_conv,extra", [
    ("gine", dict(gin_trainable_eps=True)),
    ("gin", dict()),
    ("gatv2", dict(heads=2, concat=False)),
    ("attentivefp", dict()),
    ("gps", dict(pe_dim=8)),
    ("pna", dict(degree_hist=(0, 5, 9, 4, 2), towers=4, out_channels=12,
                 hidden_channels=16)),
    ("heat", dict(eattr_emb_dim=8, heads=2)),
])
def test_molecule_zoo(base_conv, extra):
    rng = np.random.default_rng(0)
    kwargs = {**MOL_COMMON, **extra}
    model = make_molecule_gnn(base_conv, **kwargs)
    g = _molecule_batch(rng)
    init_kw = {}
    params = model.init(jax.random.PRNGKey(0), g)
    if base_conv == "gps":
        out = model.apply(params, g, mutable=["batch_stats"])[0]
    else:
        out = model.apply(params, g)
    exp_out = 24 if base_conv == "heat" else 12
    assert out.shape == (2, 9, exp_out)
    assert np.all(np.isfinite(np.asarray(out)))
