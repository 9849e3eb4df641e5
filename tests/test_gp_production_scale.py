"""Graph-partition at the PRODUCTION ladders (VERDICT r03 weak #6): a
protein LARGER than the 4,608-residue production rung — the size the gp
feature exists for — must route through PartitionedLoader -> fit() with the
default ladders, land on sane plan/halo rungs, and reproduce the loss
trajectory of a single-device run whose ladder was extended to hold it.

The reference refuses such proteins outright (3,000-residue cap,
dataset/load_data.py:218-222).
"""
import numpy as np
import pytest

from caster_dta_tpu.data import synthetic
from caster_dta_tpu.data.batching import (HALO_LADDER, PROTEIN_NODE_LADDER,
                                          PartitionedLoader,
                                          split_overflow_indices)
from caster_dta_tpu.data.pairs import ProteinMoleculeDataset
from caster_dta_tpu.models.joint import make_joint_gnn
from caster_dta_tpu.train.loop import TrainConfig, fit

DATASET_KWARGS = dict(
    protein_dist_units="angstroms", protein_edge_thresh=4,
    protein_thresh_type="dist", protein_keep_selfloops=True,
    protein_vector_features=True, molecule_include_selfloops=True,
    scale_output=["standardize"], n_workers=0)

GP = 2
# gp=2 on a 4,700-5,400-residue protein -> ceil(n/2) <= 2,700 nodes/shard,
# laddered to the production 3,072 rung; global node space 2*3,072 = 6,144.
# The single-device comparison run needs a 6,144 rung appended to hold the
# same proteins (and to make the global-canonical dropout masks bitwise
# comparable, as in test_gp_fit.py).
EXTENDED_LADDER = PROTEIN_NODE_LADDER + (6144,)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("gp_prod")
    df = synthetic.make_synthetic_dataframe(str(out), n_proteins=2,
                                            n_molecules=3, n_pairs=12,
                                            res_range=(4700, 5400), seed=5)
    return ProteinMoleculeDataset(df, **DATASET_KWARGS)


def _model(dataset, dropout=0.2):
    md = dataset.metadata_dict
    return make_joint_gnn(
        dict(base_conv="lbamodel", in_channels=md["protein_node_features"],
             edge_dim=md["protein_edge_features"],
             num_ntypes=md["protein_node_types"],
             num_etypes=md["protein_edge_types"],
             ntype_emb_dim=None, etype_emb_dim=None, num_convs=1,
             hidden_channels=(8, 2), edge_hidden_channels=(16, 1),
             out_channels=16, dropout_rate=dropout, activation="leaky_relu",
             aggr="sum"),
        dict(base_conv="gine", in_channels=md["molecule_node_features"],
             edge_dim=md["molecule_edge_features"],
             num_ntypes=md["molecule_node_types"],
             num_etypes=md["molecule_edge_types"],
             ntype_emb_dim=None, etype_emb_dim=None, num_convs=1,
             hidden_channels=8, out_channels=16, dropout_rate=dropout,
             activation="leaky_relu", aggr="sum"),
        residue_lin_depth=1, atom_lin_depth=1, n_attention_heads=4,
        attention_dropout=0.0, protein_lin_depth=1, molecule_lin_depth=1,
        pairwise_embedding_dim=64, out_lin_depth=1, activation="leaky_relu",
        dropout=dropout / 2, num_cross_attn_layers=1)


@pytest.mark.slow
def test_production_ladder_overflow_plans(dataset):
    """PartitionedLoader with the DEFAULT ladders: every pair overflows the
    4,608 rung, plans land on the 3,072 nodes/shard rung, and halo slots sit
    on a real HALO_LADDER rung far below the node count (a helix's shard
    boundary is a thin interface, not the whole graph)."""
    within, overflow = split_overflow_indices(dataset)
    assert within == [] and len(overflow) == len(dataset)

    dl = PartitionedLoader(dataset, overflow, gp=GP,
                           max_num=8_000_000, max_batch_size=64)
    assert len(dl) > 0
    for bucket in dl.buckets():
        ns, ei, eb, hh, n_m, e_m = bucket
        assert ns == 3072                      # production rung, minimal
        assert ns in PROTEIN_NODE_LADDER
        assert hh in HALO_LADDER and hh <= 256  # thin boundary interface
        assert ei >= eb                        # interior edges dominate

    batch = next(iter(dl))
    b, g, n = batch.sharded.node_s.shape[:3]
    assert (g, n) == (GP, 3072)
    # real (unpadded) rows account for the protein's full residue count
    pgs = [dataset[int(i)][0]["n_nodes"] for i in batch.pair_idx]
    assert max(pgs) > PROTEIN_NODE_LADDER[-1]


@pytest.mark.slow
def test_production_scale_gp_fit_parity(dataset, tmp_path):
    """fit() with gp=2 and PRODUCTION ladders on >4,608-residue proteins
    matches the loss trajectory of a single-device run with an extended
    ladder, dropout ON (global-canonical masks)."""
    cfg = dict(n_epochs=2, lr=1e-2, seed=0, scheduler=None,
               print_unscaled_loss=False, device_data_budget=None,
               save_state_every=0)
    run_gp = fit(_model(dataset), dataset, "synthetic",
                 str(tmp_path / "gp"), TrainConfig(gp=GP, **cfg),
                 max_num=8_000_000, max_batch_size=64, verbose=False)
    run_1d = fit(_model(dataset), dataset, "synthetic",
                 str(tmp_path / "flat"), TrainConfig(**cfg),
                 max_num=8_000_000, max_batch_size=64, verbose=False,
                 ladder_kwargs={"protein_node_ladder": EXTENDED_LADDER})

    assert run_gp["overflow_pairs"]["train"] > 0
    assert run_1d["overflow_pairs"]["train"] == 0
    t_gp = [h["train"] for h in run_gp["history"]]
    t_1d = [h["train"] for h in run_1d["history"]]
    v_gp = [h["val"] for h in run_gp["history"]]
    v_1d = [h["val"] for h in run_1d["history"]]
    np.testing.assert_allclose(t_gp, t_1d, rtol=2e-3)
    np.testing.assert_allclose(v_gp, v_1d, rtol=2e-3)
