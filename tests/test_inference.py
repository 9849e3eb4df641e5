"""Integration tests of the inference + analysis layers: save a checkpoint
with the reference artifact contract, reload it, run batched evaluation with
attention + explanations, and run the binder-screen task end-to-end on
synthetic structures."""
import json
import os

import numpy as np
import jax
import pytest

from caster_dta_tpu.data import synthetic
from caster_dta_tpu.data.pairs import ProteinMoleculeDataset
from caster_dta_tpu.models.joint import make_joint_gnn
from caster_dta_tpu.train import checkpoints
from tests.test_pipeline import DATASET_KWARGS


def _small_model_kwargs(md):
    pk = dict(base_conv="lbamodel", in_channels=md["protein_node_features"],
              edge_dim=md["protein_edge_features"],
              num_ntypes=md["protein_node_types"],
              num_etypes=md["protein_edge_types"], ntype_emb_dim=None,
              etype_emb_dim=None, num_convs=1, hidden_channels=(8, 2),
              edge_hidden_channels=(16, 1), out_channels=16, dropout_rate=0.0,
              activation="leaky_relu", aggr="sum")
    mk = dict(base_conv="gine", in_channels=md["molecule_node_features"],
              edge_dim=md["molecule_edge_features"],
              num_ntypes=md["molecule_node_types"],
              num_etypes=md["molecule_edge_types"], ntype_emb_dim=None,
              etype_emb_dim=None, num_convs=1, hidden_channels=8,
              out_channels=16, dropout_rate=0.0, activation="leaky_relu",
              aggr="sum")
    jk = dict(residue_lin_depth=1, atom_lin_depth=1, n_attention_heads=4,
              attention_dropout=0.0, protein_lin_depth=1, molecule_lin_depth=1,
              pairwise_embedding_dim=64, out_lin_depth=1,
              activation="leaky_relu", dropout=0.0, num_cross_attn_layers=1)
    return pk, mk, jk


@pytest.fixture(scope="module")
def checkpoint_folder(tmp_path_factory):
    """A trained-artifact folder: four JSONs + a bestvalmodel checkpoint."""
    out = tmp_path_factory.mktemp("ckpt")
    data_dir = tmp_path_factory.mktemp("pdbs")
    df = synthetic.make_synthetic_dataframe(str(data_dir), n_proteins=3,
                                            n_molecules=4, n_pairs=16, seed=2)
    ds = ProteinMoleculeDataset(df, **DATASET_KWARGS)
    pk, mk, jk = _small_model_kwargs(ds.metadata_dict)
    model = make_joint_gnn(pk, mk, **jk)

    from caster_dta_tpu.data.batching import BucketedLoader
    loader = BucketedLoader(ds, max_num=100_000, max_batch_size=4, shuffle=False)
    batch = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(0), batch.protein, batch.molecule)

    checkpoints.save_run_artifacts(str(out), dict(DATASET_KWARGS),
                                   ds._report_scale_data(), pk, mk, jk,
                                   checkpoints.param_summary(variables["params"]))
    checkpoints.save_params(variables["params"], os.path.join(
        out, checkpoints.best_checkpoint_name("val", "synthetic", 0.5, 3)))
    return str(out), df, str(data_dir)


def test_checkpoint_reload_and_eval(checkpoint_folder):
    folder, df, _ = checkpoint_folder
    from caster_dta_tpu.inference.checkpoint import (
        create_dataset_with_checkpoint_params, load_model_from_checkpoint)
    from caster_dta_tpu.inference.evaluation import run_model_on_dataset

    model, variables, model_kwargs = load_model_from_checkpoint(folder)
    assert model_kwargs["protein_gnn_kwargs"]["base_conv"] == "lbamodel"

    ds = create_dataset_with_checkpoint_params(df, folder)
    parsed = run_model_on_dataset(model, variables, ds, max_batch_size=4,
                                  max_num=100_000, do_explainer=True,
                                  explainer_epochs=2)
    assert len(parsed) == len(df)
    row = parsed.iloc[0]
    assert len(row["protein_attention"]) == row["protein_len"]
    assert len(row["molecule_attention"]) == row["molecule_len"]
    assert row["prot_mol_attention"].shape == (row["molecule_len"],
                                              row["protein_len"])
    np.testing.assert_allclose(row["protein_explanation"].sum(), 1.0, rtol=1e-5)
    # edge masks (pyg GNNExplainer learns node AND edge masks,
    # reference explanation/explain_wrapper.py:61-93): in (0,1), one per
    # real edge
    assert row["protein_edge_explanation"].ndim == 1
    assert row["molecule_edge_explanation"].ndim == 1
    for em in (row["protein_edge_explanation"],
               row["molecule_edge_explanation"]):
        assert ((em > 0) & (em < 1)).all()
    assert np.isfinite(row["affinity_score"])
    # deterministic order: pair_idx strictly increasing
    assert (np.diff(parsed["pair_idx"].values) > 0).all()


def test_binder_screen_task(checkpoint_folder, tmp_path):
    folder, df, data_dir = checkpoint_folder
    from caster_dta_tpu.analysis.binders import run_protein_binders

    protids_to_files = {f"prot{i}": os.path.join(data_dir, f"prot{i}.pdb")
                        for i in range(3)}
    drugs = {f"drug{i}": smi for i, smi in
             enumerate(synthetic.SMILES_POOL[:5])}
    results, topk = run_protein_binders(
        folder, protids_to_files, drugs, str(tmp_path / "res"),
        str(tmp_path / "data"), max_batch_size=4, k_drugs=2)
    assert len(results) == 15  # 3 proteins x 5 drugs
    assert set(topk.groupby("protein_id").size()) == {2}
    assert os.path.exists(tmp_path / "res" / "ad_raw_results.pkl")
