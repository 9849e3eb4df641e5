"""Edge-partitioned protein-graph parallelism: forward and gradient parity
between the single-device LBA tower and the G-shard partitioned execution
(halo exchange over a virtual CPU mesh; SURVEY §4 multi-host test strategy),
plus the partitioned JointGNN train step on a ('dp','gp') 2-D mesh.

The default ("fast") parametrization keeps the suite under the 5-minute
budget; `-m slow` additionally runs the full-size configuration.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from caster_dta_tpu.data.graphs import pad_graph, stack_graphs
from caster_dta_tpu.models.protein import VectorProteinGNN_LBAModel
from caster_dta_tpu.parallel import mesh as pmesh
from caster_dta_tpu.parallel.partition import (
    PartitionedJointGNN, PartitionedLBAProteinGNN, partition_protein_graph,
    partitioned_train_step, run_partitioned, run_partitioned_joint,
    shard_specs, stack_sharded)

DS, DV, ES, EV = 17, 3, 32, 1

# fast: small graph, 2 shards, MEAN aggregation (exercises the combined
# interior+boundary degree normalization); full: original round-1 sizes, SUM
CONFIGS = {
    "fast": dict(n=32, g=2, kw=dict(
        in_channels=(DS, DV), edge_dim=(ES, EV), num_ntypes=20, num_etypes=1,
        ntype_emb_dim=None, etype_emb_dim=None, num_convs=2,
        hidden_channels=(8, 2), edge_hidden_channels=(8, 1), out_channels=16,
        dropout_rate=0.2, aggr="mean")),
    "full": dict(n=64, g=4, kw=dict(
        in_channels=(DS, DV), edge_dim=(ES, EV), num_ntypes=20, num_etypes=1,
        ntype_emb_dim=None, etype_emb_dim=None, num_convs=2,
        hidden_channels=(16, 4), edge_hidden_channels=(32, 1), out_channels=64,
        dropout_rate=0.2, aggr="sum")),
}


def _random_graph(rng, n, ds=DS):
    # ~9 neighbours per node, window offsets like a contact graph
    dst = np.repeat(np.arange(n), 9)
    src = np.clip(dst + rng.integers(-12, 13, dst.shape), 0, n - 1)
    return dict(
        node_s=rng.normal(size=(n, ds)).astype(np.float32),
        node_v=rng.normal(size=(n, DV, 3)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_s=rng.normal(size=(len(dst), ES)).astype(np.float32),
        edge_v=rng.normal(size=(len(dst), EV, 3)).astype(np.float32),
        node_type=rng.integers(0, 20, n),
        edge_type=np.zeros(len(dst)),
    )


@pytest.fixture(scope="module", params=[
    pytest.param("fast", id="fast"),
    pytest.param("full", id="full", marks=pytest.mark.slow)])
def setup(request):
    cfg = CONFIGS[request.param]
    n, g, kw = cfg["n"], cfg["g"], cfg["kw"]
    rng = np.random.default_rng(7)
    raw = _random_graph(rng, n)
    e = raw["edge_index"].shape[1]

    single = stack_graphs([pad_graph(**raw, n_pad=n, e_pad=e)])
    sharded = partition_protein_graph(
        raw["node_s"], raw["node_v"], raw["edge_index"], raw["edge_s"],
        raw["edge_v"], raw["node_type"], raw["edge_type"], n_shards=g)

    ref_model = VectorProteinGNN_LBAModel(**kw)
    variables = jax.jit(ref_model.init)(jax.random.PRNGKey(0), single)
    part_model = PartitionedLBAProteinGNN(**kw, axis_name="gp")
    mesh = pmesh.make_mesh(g, axis_name="gp")
    return n, g, kw, raw, single, sharded, ref_model, part_model, variables, mesh


def test_forward_parity(setup):
    _, _, _, _, single, sharded, ref_model, part_model, variables, mesh = setup
    ref = np.asarray(ref_model.apply(variables, single))[0]      # [N, out]
    part = np.asarray(run_partitioned(part_model, variables, sharded, mesh))
    assert part.shape == ref.shape
    np.testing.assert_allclose(part, ref, rtol=2e-5, atol=2e-5)


def test_param_tree_identical(setup):
    from jax.sharding import PartitionSpec as P

    _, _, _, _, single, sharded, ref_model, part_model, variables, mesh = setup
    # init must run with the mesh axis bound (all_to_all inside __call__)
    init = jax.jit(jax.shard_map(
        lambda rng, sh: part_model.init(rng, sh), mesh=mesh,
        in_specs=(P(), shard_specs("gp")), out_specs=P(), check_vma=False))
    part_vars = init(jax.random.PRNGKey(1), stack_sharded([sharded]))
    ref_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_flatten_with_path(variables)[0]}
    part_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_flatten_with_path(part_vars)[0]}
    assert ref_paths == part_paths


@pytest.mark.slow
def test_gradient_parity(setup):
    _, _, _, _, single, sharded, ref_model, part_model, variables, mesh = setup

    def loss_ref(v):
        out = ref_model.apply(v, single)[0]
        return jnp.sum(out ** 2)

    def loss_part(v):
        out = run_partitioned(part_model, v, sharded, mesh)
        return jnp.sum(out ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(variables)
    g_part = jax.jit(jax.grad(loss_part))(variables)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_part = jax.tree_util.tree_leaves(g_part)
    for a, b in zip(flat_ref, flat_part):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_halo_budget_reuse(setup):
    """Explicit static budgets (bucket reuse across graphs) stay correct."""
    n, g, kw, _, _, sharded, ref_model, part_model, variables, mesh = setup
    ns = -(-(n - 8) // g) + 2   # deliberately different from n//g
    rng = np.random.default_rng(11)
    raw = _random_graph(rng, n - 8)  # smaller graph -> interior padding
    sh2 = partition_protein_graph(
        raw["node_s"], raw["node_v"], raw["edge_index"], raw["edge_s"],
        raw["edge_v"], raw["node_type"], raw["edge_type"], n_shards=g,
        nodes_per_shard=ns,
        interior_edges_per_shard=sharded.int_src.shape[1] + 64,
        boundary_edges_per_shard=sharded.bnd_src_ext.shape[1] + 64,
        halo_per_peer=sharded.halo_per_peer + 8)

    e = raw["edge_index"].shape[1]
    single2 = stack_graphs([pad_graph(**raw, n_pad=g * ns, e_pad=e)])
    ref = np.asarray(ref_model.apply(variables, single2))[0]
    part = np.asarray(run_partitioned(part_model, variables, sh2, mesh))
    for gi in range(g):
        lo = gi * ns
        real = min(max(0, (n - 8) - lo), ns)
        if real:
            np.testing.assert_allclose(part[lo:lo + real], ref[lo:lo + real],
                                       rtol=2e-5, atol=2e-5)


def test_budget_violations_raise(setup):
    _, g, _, raw, *_ = setup
    with pytest.raises(ValueError, match="interior_edges_per_shard"):
        partition_protein_graph(
            raw["node_s"], raw["node_v"], raw["edge_index"], raw["edge_s"],
            raw["edge_v"], raw["node_type"], raw["edge_type"], n_shards=g,
            interior_edges_per_shard=1)
    with pytest.raises(ValueError, match="halo_per_peer"):
        partition_protein_graph(
            raw["node_s"], raw["node_v"], raw["edge_index"], raw["edge_s"],
            raw["edge_v"], raw["node_type"], raw["edge_type"], n_shards=g,
            halo_per_peer=1)


# ---------------------------------------------------------------- JointGNN

def _mol_batch(rng, b=1):
    gs = []
    for _ in range(b):
        n, e = 7, 18
        gs.append(pad_graph(
            node_s=rng.normal(size=(n, 41)).astype(np.float32), node_v=None,
            edge_index=rng.integers(0, n, size=(2, e)),
            edge_s=rng.normal(size=(e, 9)).astype(np.float32), edge_v=None,
            node_type=rng.integers(0, 11, n),
            edge_type=rng.integers(0, 5, e), n_pad=8, e_pad=24))
    return stack_graphs(gs)


def _joint_kwargs(prot_kw):
    mk = dict(base_conv="gine", in_channels=41, edge_dim=9, num_ntypes=11,
              num_etypes=5, ntype_emb_dim=None, etype_emb_dim=None,
              num_convs=1, hidden_channels=8, out_channels=16,
              dropout_rate=0.0, activation="relu", aggr="sum")
    jk = dict(residue_lin_depth=1, atom_lin_depth=1, n_attention_heads=2,
              attention_dropout=0.0, protein_lin_depth=1, molecule_lin_depth=1,
              pairwise_embedding_dim=32, out_lin_depth=1, dropout=0.0,
              num_cross_attn_layers=1)
    pk = dict(prot_kw, base_conv="lbamodel", activation="relu")
    return pk, mk, jk


@pytest.mark.slow
def test_partitioned_joint_forward_and_grad_parity(setup):
    """Full JointGNN with the protein tower partitioned over gp must match
    the single-device JointGNN — prediction and parameter gradients.

    Slow-marked (85s: six joint-model compiles over the mesh); the default
    suite still pins gp correctness through test_forward_parity /
    test_param_tree_identical here and the fit()-level loss-trajectory
    parity in test_gp_fit.py, which a grad divergence would break."""
    from caster_dta_tpu.models.joint import make_joint_gnn

    n, g, kw, raw, single, sharded, *_ , mesh = setup
    pk, mk, jk = _joint_kwargs({**kw, "num_convs": 1})
    rng = np.random.default_rng(3)
    mol = _mol_batch(rng)
    target = np.asarray([1.3], np.float32)

    ref_model = make_joint_gnn(pk, mk, **jk)
    variables = jax.jit(ref_model.init)(jax.random.PRNGKey(0), single, mol)
    part_model = PartitionedJointGNN(
        protein_gnn_kwargs=pk, molecule_gnn_kwargs=mk, **jk,
        partition_axis="gp")

    score_ref = np.asarray(ref_model.apply(variables, single, mol)[0])
    score_part = np.asarray(run_partitioned_joint(
        part_model, variables, sharded, mol, mesh))
    np.testing.assert_allclose(score_part, score_ref, rtol=1e-5, atol=1e-5)

    # gradient parity through the (gp-only) train-step loss
    tx = optax.adam(1e-3)
    step = partitioned_train_step(part_model, tx, mesh, dp_axis=None)
    params = variables["params"]
    opt_state = tx.init(params)

    def loss_ref(p):
        s, _ = ref_model.apply({"params": p}, single, mol)
        return (s[0, 0] - target[0]) ** 2

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    new_params, _, loss = step(params, opt_state, stack_sharded([sharded]),
                               mol, jnp.asarray(target))
    np.testing.assert_allclose(float(loss),
                               float(loss_ref(params)), rtol=1e-5)
    # recover grads from the Adam update relation is messy; instead compare
    # grads directly through the step's loss
    from caster_dta_tpu.parallel.partition import partitioned_joint_in_specs
    g_part = jax.jit(jax.grad(lambda p: _part_loss(
        part_model, p, sharded, mol, target, mesh)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_part)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


def _part_loss(model, params, sharded, mol, target, mesh):
    from jax.sharding import PartitionSpec as P

    from caster_dta_tpu.parallel.partition import partitioned_joint_in_specs

    sh_spec, mol_spec = partitioned_joint_in_specs(model.partition_axis)

    def fwd(p, sh, m, t):
        score, _ = model.apply({"params": p}, sh, m, deterministic=True)
        err = (score[0, 0] - t[0]) ** 2
        return jax.lax.pmean(err, (model.partition_axis,))

    return jax.shard_map(fwd, mesh=mesh,
                         in_specs=(P(), sh_spec, mol_spec, P()),
                         out_specs=P(), check_vma=False)(
        params, stack_sharded([sharded]), mol, jnp.asarray(target))


@pytest.mark.slow
def test_partitioned_joint_2d_mesh_train(setup):
    """('dp','gp') 2-D mesh: two pairs train in parallel, each protein graph
    partitioned over gp; the loss decreases over a few steps."""
    n, g, kw, raw, single, sharded, *_ = setup
    if 2 * g > len(jax.devices()):
        pytest.skip("needs 2*gp devices")
    pk, mk, jk = _joint_kwargs({**kw, "num_convs": 1})
    mesh2 = pmesh.make_2d_mesh(2, g)
    rng = np.random.default_rng(5)

    raw2 = _random_graph(rng, n)
    # shared generous budgets so both graphs stack into one executable
    budgets = dict(nodes_per_shard=sharded.nodes_per_shard,
                   interior_edges_per_shard=sharded.int_src.shape[1] + 32,
                   boundary_edges_per_shard=sharded.bnd_src_ext.shape[1] + 32,
                   halo_per_peer=sharded.halo_per_peer + 8)
    sh_a = partition_protein_graph(
        raw["node_s"], raw["node_v"], raw["edge_index"], raw["edge_s"],
        raw["edge_v"], raw["node_type"], raw["edge_type"], n_shards=g,
        **budgets)
    sh_b = partition_protein_graph(
        raw2["node_s"], raw2["node_v"], raw2["edge_index"], raw2["edge_s"],
        raw2["edge_v"], raw2["node_type"], raw2["edge_type"], n_shards=g,
        **budgets)
    stacked = stack_sharded([sh_a, sh_b])
    mols = _mol_batch(rng, b=2)
    targets = jnp.asarray([0.7, -0.4], jnp.float32)

    part_model = PartitionedJointGNN(
        protein_gnn_kwargs=pk, molecule_gnn_kwargs=mk, **jk,
        partition_axis="gp")
    ref_model_init = part_model  # same params as single-device JointGNN
    from caster_dta_tpu.models.joint import make_joint_gnn
    variables = jax.jit(make_joint_gnn(pk, mk, **jk).init)(
        jax.random.PRNGKey(0), single, _mol_batch(np.random.default_rng(1)))
    params = variables["params"]
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)
    step = partitioned_train_step(part_model, tx, mesh2, dp_axis="dp")
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, stacked, mols,
                                       targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
