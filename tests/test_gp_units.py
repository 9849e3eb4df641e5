"""Unit tests for the gp-in-fit building blocks: partition-invariant dropout
masks (nn/gvp.py GVPDropout.shard_rows) and the ladder-overflow
PartitionedLoader (data/batching.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from caster_dta_tpu.nn import gvp
from caster_dta_tpu.parallel import mesh as pmesh


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_shard_rows_dropout_matches_global_mask():
    """Each shard's dropout mask must equal its row-slice of the mask the
    single-device module draws from the same key — so partitioning never
    changes which units drop."""
    G, NS, D, NV = 4, 8, 6, 3
    rate = 0.5
    rng = np.random.default_rng(0)
    s = rng.normal(size=(2, G * NS, D)).astype(np.float32)
    v = rng.normal(size=(2, G * NS, NV, 3)).astype(np.float32)

    glob = gvp.GVPDropout(rate)
    s_ref, v_ref = glob.apply({}, (jnp.asarray(s), jnp.asarray(v)), False,
                              rngs={"dropout": jax.random.PRNGKey(3)})

    mesh = pmesh.make_mesh(4, axis_name="gp")
    shard = gvp.GVPDropout(rate, shard_rows=("gp", G))

    def fn(s_loc, v_loc):
        return shard.apply({}, (s_loc, v_loc), False,
                           rngs={"dropout": jax.random.PRNGKey(3)})

    # each shard gets its contiguous row block of axis 1 via P(None, 'gp')
    out_s, out_v = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(P(None, "gp"), P(None, "gp")),
        out_specs=(P(None, "gp"), P(None, "gp")), check_vma=False))(
        jnp.asarray(s), jnp.asarray(v))
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(v_ref))


def _tiny_dataset(tmp_path_factory):
    from caster_dta_tpu.data.pairs import ProteinMoleculeDataset
    from caster_dta_tpu.data import synthetic
    from tests.test_pipeline import DATASET_KWARGS

    out = tmp_path_factory.mktemp("gpu_synth")
    df = synthetic.make_synthetic_dataframe(str(out), n_proteins=4,
                                            n_molecules=4, n_pairs=24,
                                            res_range=(40, 60), seed=6)
    return ProteinMoleculeDataset(df, **DATASET_KWARGS)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    return _tiny_dataset(tmp_path_factory)


def test_split_overflow_indices(dataset):
    from caster_dta_tpu.data.batching import split_overflow_indices

    within, overflow = split_overflow_indices(
        dataset, None, protein_node_ladder=(16, 48))
    assert sorted(within + overflow) == list(range(len(dataset)))
    for i in within:
        assert dataset[i][0]["n_nodes"] <= 48
    for i in overflow:
        assert dataset[i][0]["n_nodes"] > 48


def test_partitioned_loader_batches(dataset):
    from caster_dta_tpu.data.batching import (PartitionedLoader,
                                              split_overflow_indices)

    _, overflow = split_overflow_indices(dataset, None,
                                         protein_node_ladder=(16, 32))
    assert overflow, "fixture should overflow a (16, 32) ladder"
    dl = PartitionedLoader(dataset, overflow, gp=2, max_num=10 ** 9,
                           max_batch_size=3, shuffle=False,
                           protein_node_ladder=(16, 32, 64),
                           batch_multiple=1)
    seen = []
    for batch in dl:
        B = batch.target.shape[0]
        # batch-first stacked shards [B, G, ...]
        assert batch.sharded.node_s.shape[:2] == (B, 2)
        assert batch.molecule.node_s.shape[0] == B
        assert batch.weight.shape == (B,)
        seen.extend(batch.pair_idx[batch.weight > 0].tolist())
        # per-pair reconstruction: masked node rows match the raw graph
        for j in range(B):
            if batch.weight[j] == 0:
                continue
            pg = dataset[int(batch.pair_idx[j])][0]
            flat = np.asarray(batch.sharded.node_s[j]).reshape(
                -1, batch.sharded.node_s.shape[-1])
            mask = np.asarray(batch.sharded.node_mask[j]).reshape(-1)
            np.testing.assert_allclose(flat[mask], pg["node_s"], rtol=1e-6)
    assert sorted(seen) == sorted(overflow)     # every overflow pair covered
    assert len(dl) == sum(1 for _ in iter(dl.iter_index_batches()))
    # shuffle epoch-indexing: same (seed, epoch) -> same order
    d1 = PartitionedLoader(dataset, overflow, gp=2, max_num=10 ** 9,
                           max_batch_size=3, shuffle=True, seed=5,
                           protein_node_ladder=(16, 32, 64))
    d2 = PartitionedLoader(dataset, overflow, gp=2, max_num=10 ** 9,
                           max_batch_size=3, shuffle=True, seed=5,
                           protein_node_ladder=(16, 32, 64))
    o1 = [q for _, q in d1.iter_index_batches()]
    o2 = [q for _, q in d2.iter_index_batches()]
    assert o1 == o2
