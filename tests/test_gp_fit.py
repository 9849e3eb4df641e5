"""Graph-partition parallelism as a fit() FEATURE (VERDICT round-2 item 2):
proteins larger than the bucket ladder train through the edge-partitioned
executor (parallel/partition.py) with dropout on, padded-pair weighting, and
multiple pairs per dp row — and the resulting loss trajectory matches a
single-device run whose ladder was extended to fit the same graphs.

The reference has no such capability: it CAPS protein size instead
(dataset/load_data.py:218-222).
"""
import numpy as np
import pytest

from caster_dta_tpu.data import synthetic
from caster_dta_tpu.data.pairs import ProteinMoleculeDataset
from caster_dta_tpu.models.joint import make_joint_gnn
from caster_dta_tpu.train.loop import TrainConfig, fit

DATASET_KWARGS = dict(
    protein_dist_units="angstroms", protein_edge_thresh=4,
    protein_thresh_type="dist", protein_keep_selfloops=True,
    protein_vector_features=True, molecule_include_selfloops=True,
    scale_output=["standardize"], n_workers=0)

# all proteins are 40-55 residues: every one OVERFLOWS the tiny (16, 32)
# ladder used by the gp run, and fits the (16, 32, 64) ladder of the
# single-device comparison run. gp=2 with nodes_per_shard laddered to 32
# gives a 64-row global node space == the comparison run's pad, which makes
# the global-canonical dropout masks (nn/gvp.py GVPDropout.shard_rows)
# bitwise comparable.
GP = 2
SMALL_LADDER = (16, 32)
BIG_LADDER = (16, 32, 64)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("gp_synth")
    df = synthetic.make_synthetic_dataframe(str(out), n_proteins=3,
                                            n_molecules=5, n_pairs=30,
                                            res_range=(40, 56), seed=2)
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


def _cfg(**kw):
    base = dict(n_epochs=3, lr=1e-2, seed=0, scheduler=None,
                early_stop_epochs=100, print_unscaled_loss=False,
                device_data_budget=None, save_state_every=0)
    base.update(kw)
    return TrainConfig(**base)


def test_ladder_overflow_trains_via_fit_with_dropout_parity(dataset, tmp_path):
    """fit() with gp=2 on an ALL-overflow dataset must produce the same
    per-epoch train/val losses as a single-device run with an extended
    ladder — WITH dropout active (global-canonical masks) and padded
    partial batches (weight masking)."""
    run_gp = fit(_model(dataset), dataset, "synthetic",
                 str(tmp_path / "gp"), _cfg(gp=GP),
                 max_num=1_000_000_000, max_batch_size=2, verbose=False,
                 ladder_kwargs={"protein_node_ladder": SMALL_LADDER})
    run_1d = fit(_model(dataset), dataset, "synthetic",
                 str(tmp_path / "flat"), _cfg(),
                 max_num=1_000_000_000, max_batch_size=2, verbose=False,
                 ladder_kwargs={"protein_node_ladder": BIG_LADDER})

    assert run_gp["overflow_pairs"]["train"] > 0
    assert run_1d["overflow_pairs"]["train"] == 0
    t_gp = [h["train"] for h in run_gp["history"]]
    t_1d = [h["train"] for h in run_1d["history"]]
    v_gp = [h["val"] for h in run_gp["history"]]
    v_1d = [h["val"] for h in run_1d["history"]]
    np.testing.assert_allclose(t_gp, t_1d, rtol=2e-3)
    np.testing.assert_allclose(v_gp, v_1d, rtol=2e-3)
    np.testing.assert_allclose(run_gp["test_metrics"]["mse"],
                               run_1d["test_metrics"]["mse"], rtol=5e-3)


def test_mixed_standard_and_overflow_with_dp(dataset, tmp_path):
    """dp=2 x gp=2 mesh: standard buckets shard over all four devices while
    overflow pairs run partitioned (2 pairs per dp row); training is finite
    and the test report covers every pair."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    # (16, 32, 48) ladder: the 40-55-residue proteins overflow, but pairs
    # with the smallest protein... all proteins here are >= 40, so instead
    # mix by molecule only — use a ladder where SOME proteins fit.
    ladder = (16, 48)   # proteins <= 48 fit; 49+ overflow
    sizes = sorted({len(seq) for seq in
                    dataset.dataframe["protein_sequence"].unique()})
    if not (sizes[0] <= 48 < sizes[-1]):
        pytest.skip("fixture sizes do not straddle the ladder top")
    res = fit(_model(dataset, dropout=0.1), dataset, "synthetic",
              str(tmp_path / "mixed"), _cfg(n_dp=2, gp=GP, n_epochs=4),
              max_num=1_000_000_000, max_batch_size=4, verbose=False,
              ladder_kwargs={"protein_node_ladder": ladder})
    assert res["overflow_pairs"]["train"] > 0
    # the leakage report (and hence the split) covers standard + overflow
    total = sum(res["leakage"][s]["n_pairs"] for s in ("train", "val", "test"))
    assert total == len(dataset)
    assert np.isfinite([h["train"] for h in res["history"]]).all()
    assert np.isfinite([h["val"] for h in res["history"]]).all()
    assert np.isfinite(res["test_metrics"]["mse"])
