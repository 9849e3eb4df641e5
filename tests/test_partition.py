"""Edge-partitioned protein-graph parallelism: forward and gradient parity
between the single-device LBA tower and the G-shard partitioned execution
(halo exchange over a virtual CPU mesh; SURVEY §4 multi-host test strategy).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caster_dta_tpu.data.graphs import pad_graph, stack_graphs
from caster_dta_tpu.models.protein import VectorProteinGNN_LBAModel
from caster_dta_tpu.parallel import mesh as pmesh
from caster_dta_tpu.parallel.partition import (
    PartitionedLBAProteinGNN, partition_protein_graph, run_partitioned)

N, G = 64, 4
DS, DV, ES, EV = 17, 3, 32, 1

MODEL_KW = dict(
    in_channels=(DS, DV), edge_dim=(ES, EV), num_ntypes=20, num_etypes=1,
    ntype_emb_dim=None, etype_emb_dim=None, num_convs=2,
    hidden_channels=(16, 4), edge_hidden_channels=(32, 1), out_channels=64,
    dropout_rate=0.2, aggr="sum")


def _random_graph(rng, n=N):
    # ~9 neighbours per node, window offsets like a contact graph
    dst = np.repeat(np.arange(n), 9)
    src = np.clip(dst + rng.integers(-12, 13, dst.shape), 0, n - 1)
    return dict(
        node_s=rng.normal(size=(n, DS)).astype(np.float32),
        node_v=rng.normal(size=(n, DV, 3)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_s=rng.normal(size=(len(dst), ES)).astype(np.float32),
        edge_v=rng.normal(size=(len(dst), EV, 3)).astype(np.float32),
        node_type=rng.integers(0, 20, n),
        edge_type=np.zeros(len(dst)),
    )


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    raw = _random_graph(rng)
    e = raw["edge_index"].shape[1]

    single = stack_graphs([pad_graph(**raw, n_pad=N, e_pad=e)])
    sharded = partition_protein_graph(
        raw["node_s"], raw["node_v"], raw["edge_index"], raw["edge_s"],
        raw["edge_v"], raw["node_type"], raw["edge_type"], n_shards=G)

    ref_model = VectorProteinGNN_LBAModel(**MODEL_KW)
    variables = ref_model.init(jax.random.PRNGKey(0), single)
    part_model = PartitionedLBAProteinGNN(**MODEL_KW, axis_name="gp")
    mesh = pmesh.make_mesh(G, axis_name="gp")
    return single, sharded, ref_model, part_model, variables, mesh


def test_forward_parity(setup):
    single, sharded, ref_model, part_model, variables, mesh = setup
    ref = np.asarray(ref_model.apply(variables, single))[0]      # [N, out]
    part = np.asarray(run_partitioned(part_model, variables, sharded, mesh))
    assert part.shape == ref.shape
    np.testing.assert_allclose(part, ref, rtol=2e-5, atol=2e-5)


def test_param_tree_identical(setup):
    from jax.sharding import PartitionSpec as P
    from caster_dta_tpu.parallel.partition import shard_specs

    single, sharded, ref_model, part_model, variables, mesh = setup
    # init must run with the mesh axis bound (all_to_all inside __call__)
    init = jax.shard_map(
        lambda rng, sh: part_model.init(rng, sh), mesh=mesh,
        in_specs=(P(), shard_specs("gp")), out_specs=P(), check_vma=False)
    part_vars = init(jax.random.PRNGKey(1), sharded)
    ref_paths = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_flatten_with_path(variables)[0]}
    part_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_flatten_with_path(part_vars)[0]}
    assert ref_paths == part_paths


def test_gradient_parity(setup):
    single, sharded, ref_model, part_model, variables, mesh = setup

    def loss_ref(v):
        out = ref_model.apply(v, single)[0]
        return jnp.sum(out ** 2)

    def loss_part(v):
        out = run_partitioned(part_model, v, sharded, mesh)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref)(variables)
    g_part = jax.grad(loss_part)(variables)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_part = jax.tree_util.tree_leaves(g_part)
    for a, b in zip(flat_ref, flat_part):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_halo_budget_reuse(setup):
    """Explicit static budgets (bucket reuse across graphs) stay correct."""
    single, sharded, ref_model, part_model, variables, mesh = setup
    rng = np.random.default_rng(11)
    raw = _random_graph(rng, n=56)  # not divisible by G -> interior padding
    sh2 = partition_protein_graph(
        raw["node_s"], raw["node_v"], raw["edge_index"], raw["edge_s"],
        raw["edge_v"], raw["node_type"], raw["edge_type"], n_shards=G,
        nodes_per_shard=16, edges_per_shard=sharded.edge_src_ext.shape[1] + 64,
        halo_per_peer=sharded.halo_per_peer + 8)

    e = raw["edge_index"].shape[1]
    single2 = stack_graphs([pad_graph(**raw, n_pad=G * 16, e_pad=e)])
    ref = np.asarray(ref_model.apply(variables, single2))[0]
    part = np.asarray(run_partitioned(part_model, variables, sh2, mesh))
    ns = 16
    for g in range(G):
        lo, hi = g * ns, min((g + 1) * ns, 56)
        if hi > lo:
            np.testing.assert_allclose(
                part[g * ns: g * ns + (hi - lo)], ref[lo:hi],
                rtol=2e-4, atol=2e-4)
