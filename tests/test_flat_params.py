"""TrainConfig.flat_params (the flat f32 vector step carry, a documented
escape hatch measured as a wash on chip — docs/bench/flat_ab_r5.json) must
stay interchangeable with the default pytree carry: bitwise-equal loss
trajectories, round-trippable params, and cross-compatible train-state
resumes. Previously only the TPU-exclusive A/B script exercised this path."""
import jax
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


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_flat")
    df = synthetic.make_synthetic_dataframe(str(out), n_proteins=3,
                                            n_molecules=4, n_pairs=24, seed=7)
    return ProteinMoleculeDataset(df, **DATASET_KWARGS)


def _model(dataset):
    md = dataset.metadata_dict
    pk = dict(base_conv="lbamodel", in_channels=md["protein_node_features"],
              edge_dim=md["protein_edge_features"],
              num_ntypes=md["protein_node_types"],
              num_etypes=md["protein_edge_types"], ntype_emb_dim=None,
              etype_emb_dim=None, num_convs=1, hidden_channels=(8, 2),
              edge_hidden_channels=(8, 1), out_channels=16,
              dropout_rate=0.1, activation="relu", aggr="sum")
    mk = dict(base_conv="gine", in_channels=md["molecule_node_features"],
              edge_dim=md["molecule_edge_features"],
              num_ntypes=md["molecule_node_types"],
              num_etypes=md["molecule_edge_types"], ntype_emb_dim=None,
              etype_emb_dim=None, num_convs=1, hidden_channels=8,
              out_channels=16, dropout_rate=0.1, activation="relu",
              aggr="sum")
    return make_joint_gnn(pk, mk, residue_lin_depth=1, atom_lin_depth=1,
                          n_attention_heads=2, attention_dropout=0.0,
                          protein_lin_depth=1, molecule_lin_depth=1,
                          pairwise_embedding_dim=32, out_lin_depth=1,
                          dropout=0.1, num_cross_attn_layers=1)


def _cfg(flat, **kw):
    return TrainConfig(n_epochs=2, seed=11, scheduler=None,
                       early_stop_epochs=100, save_state_every=1,
                       flat_params=flat, **kw)


def _fit(dataset, folder, flat, n_epochs=2, resume=False):
    return fit(_model(dataset), dataset, "synthetic", str(folder),
               _cfg(flat, resume=resume), max_num=100_000, max_batch_size=8,
               n_epochs=n_epochs, verbose=False)


@pytest.mark.slow
def test_flat_matches_pytree_trajectory(dataset, tmp_path):
    base = _fit(dataset, tmp_path / "pytree", flat=False)
    flat = _fit(dataset, tmp_path / "flat", flat=True)
    b = [h["train"] for h in base["history"]]
    f = [h["train"] for h in flat["history"]]
    assert len(b) == len(f) == 2
    # the step math is identical up to XLA scheduling; on the CPU backend the
    # trajectories come out bitwise equal (matching the on-chip A/B record)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(b))


def test_flat_params_round_trip(dataset):
    from caster_dta_tpu.data.batching import BucketedLoader
    from caster_dta_tpu.train.loop import Trainer

    loader = BucketedLoader(dataset, max_num=100_000, max_batch_size=8,
                            shuffle=False)
    batch = next(iter(loader))
    trainer = Trainer(_model(dataset), _cfg(True), batch)
    assert trainer._flat and trainer.params.ndim == 1
    tree = trainer.params_pytree()
    flat_before = np.asarray(trainer.params)
    trainer.set_params(jax.tree.map(lambda x: x, tree))
    np.testing.assert_array_equal(np.asarray(trainer.params), flat_before)


@pytest.mark.slow
def test_flat_state_resumes_as_pytree(dataset, tmp_path):
    """A train_state.msgpack written by a flat run must restore into a
    pytree-carry run (and vice versa) and continue the exact trajectory."""
    folder = tmp_path / "cross"
    _fit(dataset, folder, flat=True, n_epochs=1)
    res = _fit(dataset, folder, flat=False, n_epochs=2, resume=True)
    ref = _fit(dataset, tmp_path / "straight", flat=False, n_epochs=2)
    np.testing.assert_array_equal(
        np.asarray([h["train"] for h in res["history"]]),
        np.asarray([h["train"] for h in ref["history"]]))
