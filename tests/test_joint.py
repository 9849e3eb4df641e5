"""JointGNN structural parity: the trained reference config must reproduce the
published parameter count (764,396; reference
pretrained_model_downstream/model_summary.txt) and produce correct shapes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caster_dta_tpu.data.graphs import pad_graph, stack_graphs
from caster_dta_tpu.models.joint import make_joint_gnn

# Exact values from the reference's pretrained model_kwargs.json
PROTEIN_KWARGS = dict(
    base_conv="lbamodel", in_channels=(17, 3), edge_dim=(32, 1),
    num_ntypes=20, num_etypes=1, ntype_emb_dim=None, etype_emb_dim=None,
    num_convs=2, hidden_channels=(16, 4), edge_hidden_channels=(32, 1),
    out_channels=64, dropout_rate=0.2, activation="leaky_relu", aggr="sum")
MOLECULE_KWARGS = dict(
    base_conv="gine", in_channels=41, edge_dim=9, num_ntypes=11, num_etypes=5,
    ntype_emb_dim=None, etype_emb_dim=None, num_convs=2, hidden_channels=16,
    out_channels=64, dropout_rate=0.2, activation="leaky_relu", aggr="sum",
    gin_trainable_eps=True)
JOINT_KWARGS = dict(
    residue_lin_depth=1, atom_lin_depth=1, n_attention_heads=8,
    attention_dropout=0.0, protein_lin_depth=1, molecule_lin_depth=1,
    pairwise_embedding_dim=512, out_lin_depth=1, out_lin_factor=0.5,
    out_lin_norm_type=None, activation="leaky_relu", dropout=0.1,
    element_pooling="mean", include_residual_stream=True,
    residual_dim_ff_scale=2, num_cross_attn_layers=1,
    include_post_pool_layernorm=False)


def _protein_batch(rng, b=2, n=12, e=40):
    gs = []
    for _ in range(b):
        n_real = int(rng.integers(6, n + 1))
        e_real = int(rng.integers(10, e + 1))
        gs.append(pad_graph(
            node_s=rng.normal(size=(n_real, 17)).astype(np.float32),
            node_v=rng.normal(size=(n_real, 3, 3)).astype(np.float32),
            edge_index=rng.integers(0, n_real, size=(2, e_real)),
            edge_s=rng.normal(size=(e_real, 32)).astype(np.float32),
            edge_v=rng.normal(size=(e_real, 1, 3)).astype(np.float32),
            node_type=rng.integers(0, 20, n_real),
            edge_type=np.zeros(e_real), n_pad=n, e_pad=e))
    return stack_graphs(gs)


def _molecule_batch(rng, b=2, n=9, e=30):
    gs = []
    for _ in range(b):
        n_real = int(rng.integers(4, n + 1))
        e_real = int(rng.integers(6, e + 1))
        gs.append(pad_graph(
            node_s=rng.normal(size=(n_real, 41)).astype(np.float32),
            node_v=None,
            edge_index=rng.integers(0, n_real, size=(2, e_real)),
            edge_s=rng.normal(size=(e_real, 9)).astype(np.float32),
            edge_v=None,
            node_type=rng.integers(0, 11, n_real),
            edge_type=rng.integers(0, 5, e_real), n_pad=n, e_pad=e))
    return stack_graphs(gs)


@pytest.fixture(scope="module")
def model_and_params():
    rng = np.random.default_rng(0)
    model = make_joint_gnn(PROTEIN_KWARGS, MOLECULE_KWARGS, **JOINT_KWARGS)
    pg = _protein_batch(rng)
    mg = _molecule_batch(rng)
    params = model.init(jax.random.PRNGKey(0), pg, mg)
    return model, params, pg, mg


def test_param_count_matches_reference(model_and_params):
    _, params, _, _ = model_and_params
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert n == 764_396, f"param count {n} != reference 764,396"


def test_forward_shapes(model_and_params):
    model, params, pg, mg = model_and_params
    score, attn = model.apply(params, pg, mg)
    assert score.shape == (2, 1)
    assert len(attn) == 1
    w1, w2 = attn[0]
    assert w1.shape == (2, 12, 9)   # residues attend to atoms
    assert w2.shape == (2, 9, 12)   # atoms attend to residues
    # attention rows over real keys sum to 1
    np.testing.assert_allclose(np.asarray(w1.sum(-1)), 1.0, rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(score)))


def test_forward_padding_invariance():
    """Same pair, different bucket sizes -> identical score."""
    rng = np.random.default_rng(3)
    model = make_joint_gnn(PROTEIN_KWARGS, MOLECULE_KWARGS, **JOINT_KWARGS)
    n_r, e_r = 7, 21
    pkw = dict(node_s=rng.normal(size=(n_r, 17)).astype(np.float32),
               node_v=rng.normal(size=(n_r, 3, 3)).astype(np.float32),
               edge_index=rng.integers(0, n_r, size=(2, e_r)),
               edge_s=rng.normal(size=(e_r, 32)).astype(np.float32),
               edge_v=rng.normal(size=(e_r, 1, 3)).astype(np.float32),
               node_type=rng.integers(0, 20, n_r), edge_type=np.zeros(e_r))
    n_m, e_m = 5, 12
    mkw = dict(node_s=rng.normal(size=(n_m, 41)).astype(np.float32), node_v=None,
               edge_index=rng.integers(0, n_m, size=(2, e_m)),
               edge_s=rng.normal(size=(e_m, 9)).astype(np.float32), edge_v=None,
               node_type=rng.integers(0, 11, n_m),
               edge_type=rng.integers(0, 5, e_m))
    pg_t = stack_graphs([pad_graph(**pkw, n_pad=n_r, e_pad=e_r)])
    mg_t = stack_graphs([pad_graph(**mkw, n_pad=n_m, e_pad=e_m)])
    pg_l = stack_graphs([pad_graph(**pkw, n_pad=n_r + 5, e_pad=e_r + 11)])
    mg_l = stack_graphs([pad_graph(**mkw, n_pad=n_m + 3, e_pad=e_m + 6)])

    params = model.init(jax.random.PRNGKey(1), pg_t, mg_t)
    s_t, _ = model.apply(params, pg_t, mg_t)
    s_l, _ = model.apply(params, pg_l, mg_l)
    np.testing.assert_allclose(np.asarray(s_t), np.asarray(s_l), rtol=1e-4, atol=1e-5)


def test_training_mode_runs(model_and_params):
    model, params, pg, mg = model_and_params
    score, _ = model.apply(params, pg, mg, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.all(np.isfinite(np.asarray(score)))


def test_return_attention_false_same_score(model_and_params):
    """return_attention=False (the training-loss path) must produce the
    identical score with attn=None. (The differentiable flash dispatch that
    used to be exercised here was retired after the round-4 A/B — see
    nn/attention.py header note; masked_mha stays covered by
    tests/test_pallas_attention.py.)"""
    model, params, pg, mg = model_and_params
    s_ref, attn = model.apply(params, pg, mg)
    assert attn is not None
    s_no, attn_no = model.apply(params, pg, mg, return_attention=False)
    assert attn_no is None
    np.testing.assert_allclose(np.asarray(s_no), np.asarray(s_ref), rtol=1e-6)
