"""Smoke tests of the BioLIP binding-site and PharmGKB variation analysis
tasks on fully offline synthetic inputs (reference test_biolip_binding.py and
test_dta_variation.py behaviors: table parsing, vocab sanity filters,
structure lookup skipping pre-existing files, ref/alt delta computation)."""
import hashlib
import os

import jax
import numpy as np
import pandas as pd
import pytest

from caster_dta_tpu.data import synthetic
from caster_dta_tpu.data.pairs import ProteinMoleculeDataset
from caster_dta_tpu.models.joint import make_joint_gnn
from caster_dta_tpu.train import checkpoints
from tests.test_inference import _small_model_kwargs
from tests.test_pipeline import DATASET_KWARGS

SEQ_POOL = ["ACDEFGHIKLMNPQRSTVWY" * 2, "MKVLAWFQRDENSTGHYCIP" * 2,
            "GGSSAAPPLLIIVVFFWWYY" * 2]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    out = tmp_path_factory.mktemp("ackpt")
    data_dir = tmp_path_factory.mktemp("apdbs")
    df = synthetic.make_synthetic_dataframe(str(data_dir), n_proteins=3,
                                            n_molecules=4, n_pairs=16, seed=4)
    ds = ProteinMoleculeDataset(df, **DATASET_KWARGS)
    pk, mk, jk = _small_model_kwargs(ds.metadata_dict)
    model = make_joint_gnn(pk, mk, **jk)
    from caster_dta_tpu.data.batching import BucketedLoader
    batch = next(iter(BucketedLoader(ds, max_num=100_000, max_batch_size=4,
                                     shuffle=False)))
    variables = model.init(jax.random.PRNGKey(0), batch.protein,
                           batch.molecule)
    checkpoints.save_run_artifacts(str(out), dict(DATASET_KWARGS),
                                   ds._report_scale_data(), pk, mk, jk)
    checkpoints.save_params(variables["params"], os.path.join(
        out, checkpoints.best_checkpoint_name("val", "synthetic", 0.5, 3)))
    return str(out)


def _write_helix(path, seq, seed):
    rng = np.random.default_rng(seed)
    coords = synthetic.helix_backbone(len(seq), rng)
    synthetic.write_pdb(path, coords, seq)


def test_biolip_binding_offline(ckpt, tmp_path):
    from caster_dta_tpu.analysis.biolip import run_biolip_binding

    # BioLiP_nr-format TSV: 21 unnamed columns; we populate 4 (#CCD),
    # 8 (binding residues), 17 (uniprot), 20 (sequence)
    rows = []
    for i, seq in enumerate(SEQ_POOL):
        row = [""] * 21
        row[4] = f"LIG{i % 2}"
        row[8] = "A1 C3 F5"
        row[17] = f"P{10000 + i}"
        row[20] = seq
        rows.append(row)
    biolip_file = tmp_path / "BioLiP_nr.txt"
    pd.DataFrame(rows).to_csv(biolip_file, sep="\t", header=False, index=False)

    lig_file = tmp_path / "ligand.tsv"
    pd.DataFrame({"#CCD": ["LIG0", "LIG1", "BAD"],
                  "SMILES": [synthetic.SMILES_POOL[0],
                             synthetic.SMILES_POOL[1] + "; " +
                             synthetic.SMILES_POOL[2], ""],
                  "name": ["drug a", "drug b", "no smiles"]}).to_csv(
        lig_file, sep="\t", index=False)

    # pre-place structures so the AF2 lookup is a pure file hit
    base = tmp_path / "adata"
    pdb_dir = base / "pdb_files"
    os.makedirs(pdb_dir)
    for i, seq in enumerate(SEQ_POOL):
        _write_helix(str(pdb_dir / f"P{10000 + i}.pdb"), seq, seed=i)

    results = run_biolip_binding(ckpt, str(biolip_file), str(lig_file),
                                 str(tmp_path / "res"), str(base),
                                 max_batch_size=4, do_api=False)
    assert len(results) == 3   # one valid ligand per protein row
    assert np.isfinite(results["affinity_score"]).all()
    # per-residue attention profiles cover each protein's full length
    assert (results["protein_attention"].map(len).values
            == results["protein_sequence"].map(len).values).all()
    assert os.path.exists(tmp_path / "res" / "biolip_raw_results.pkl")


def test_dta_variation_offline(ckpt, tmp_path):
    from caster_dta_tpu.analysis.variation import run_dta_variation

    ref_seq, alt_seq = SEQ_POOL[0], SEQ_POOL[0][:10] + "W" + SEQ_POOL[0][11:]
    pairs = {"varDRUG0": {"ref_seq": ref_seq, "alt_seq": alt_seq}}

    base = tmp_path / "vdata"
    pdb_dir = base / "pdb_files"
    os.makedirs(pdb_dir)
    for seq in (ref_seq, alt_seq):
        pid = hashlib.sha256(seq.encode()).hexdigest()
        _write_helix(str(pdb_dir / f"{pid}.pdb"), seq, seed=0)

    drugs = {"DRUG0": synthetic.SMILES_POOL[0],
             "other": synthetic.SMILES_POOL[1]}
    results, deltas = run_dta_variation(
        ckpt, {}, drugs, str(tmp_path / "vres"), str(base),
        test_sequence_pairs=pairs, max_batch_size=4)
    assert len(results) == 4   # 2 proteins x 2 drugs
    assert len(deltas) == 2    # 1 variant x 2 drugs
    assert np.isfinite(deltas["delta_affinity"]).all()
    # the alt allele differs from ref -> deltas are real numbers, and the
    # drug-name matching flag works (variant 'varDRUG0' contains 'drug0')
    assert deltas.set_index("molecule_id")["match_drug"].to_dict() == {
        "DRUG0": True, "other": False}
    assert os.path.exists(tmp_path / "vres" / "pgx_delta_results.pkl")