"""BioLIP binding-site recovery task.

Behavioral spec: reference test_biolip_binding.py — load the BioLIP
non-redundant table + ligand table, SMILES validation (single-fragment),
model-vocabulary sanity filters, AF2-by-UniProt structure lookup, cross-merge
to protein-ligand pairs, batched model evaluation with attention and
explanations, pickled raw results.
"""
from __future__ import annotations

import hashlib
import os

import pandas as pd

from caster_dta_tpu.analysis import common
from caster_dta_tpu.inference.checkpoint import (
    create_dataset_with_checkpoint_params, load_model_from_checkpoint)
from caster_dta_tpu.inference.evaluation import run_model_on_dataset


def load_biolip_tables(biolip_file: str, biolip_ligand_file: str):
    """BioLiP_nr.txt.gz + ligand.tsv.gz -> (protein rows, ligand rows)
    (reference test_biolip_binding.py:39-120)."""
    biolip_df = pd.read_csv(biolip_file, sep="\t", compression="infer",
                            header=None)
    lig_df = pd.read_csv(biolip_ligand_file, sep="\t", compression="infer",
                         on_bad_lines="skip")

    lig_df["SMILES"] = lig_df["SMILES"].str.split("; ")
    lig_df = lig_df.dropna(subset=["SMILES"])
    lig_df["SMILES"] = lig_df["SMILES"].map(
        lambda x: x[0] if isinstance(x, list) else x)
    lig_df = lig_df[["#CCD", "SMILES", "name"]].rename(
        columns={"#CCD": "id", "SMILES": "smiles"})
    lig_df["smiles"] = lig_df["smiles"].replace("", pd.NA)
    lig_df = lig_df.dropna(subset=["smiles"])
    lig_df = lig_df[lig_df["smiles"].map(common.validate_smiles_strict)]

    # columns: 4=#CCD, 8=binding residues, 17=uniprot, 20=sequence
    prot_df = biolip_df[[4, 8, 17, 20]].rename(columns={
        4: "#CCD", 8: "binding_residues", 17: "protein_id", 20: "seq"})
    prot_df = prot_df.dropna(subset=["protein_id"])
    prot_df["protein_id"] = prot_df["protein_id"].str.split(",").map(
        lambda x: x[0] if isinstance(x, list) else x)
    return prot_df, lig_df


def run_biolip_binding(model_folder: str, biolip_file: str,
                       biolip_ligand_file: str, results_dir: str,
                       base_data_dir: str, max_batch_size: int = 16,
                       do_api: bool = False, n_workers=0) -> pd.DataFrame:
    os.makedirs(results_dir, exist_ok=True)
    pdb_dir = os.path.join(base_data_dir, "pdb_files")
    other_dir = os.path.join(base_data_dir, "other_data")
    os.makedirs(pdb_dir, exist_ok=True)
    os.makedirs(other_dir, exist_ok=True)

    prot_df, drug_df = load_biolip_tables(biolip_file, biolip_ligand_file)
    model, variables, model_kwargs = load_model_from_checkpoint(model_folder)
    prot_df, drug_df = common.apply_vocab_sanity_filters(
        prot_df, drug_df, model_kwargs, seq_col="seq", smiles_col="smiles")

    prot_df = prot_df.rename(columns={"seq": "protein_sequence",
                                      "#CCD": "molecule_id"})
    drug_df = drug_df.rename(columns={"id": "molecule_id",
                                      "smiles": "molecule_smiles",
                                      "name": "molecule_name"})
    combined = prot_df.merge(drug_df, on="molecule_id", how="inner")
    combined["affinity_score"] = 0.0
    combined = combined.dropna()

    # AF2-by-UniProt structure acquisition (predownloaded or API)
    from caster_dta_tpu.inference.structures import get_af2_from_uniprot_accession
    base = combined[["protein_id", "protein_sequence"]].drop_duplicates(
        subset=["protein_id"]).rename(columns={"protein_id": "id",
                                               "protein_sequence": "seq"})
    base["file"] = [os.path.join(pdb_dir, f"{x}.pdb") for x in base["id"]]
    base = base.dropna().sort_values(by=["id", "seq"]).reset_index(drop=True)
    success = get_af2_from_uniprot_accession(
        base, local_predownload=os.path.join(base_data_dir,
                                             "predownloaded_AF_preds"),
        do_api=do_api)

    combined = combined.merge(success, left_on=["protein_id", "protein_sequence"],
                              right_on=["id", "seq"], how="inner")
    combined = combined.drop(columns=["id", "seq"]).rename(
        columns={"file": "protein_file"})
    combined = combined.sort_values(by=["protein_id", "molecule_id"]).reset_index(drop=True)
    hashes = combined["protein_sequence"].map(
        lambda x: hashlib.md5(x.encode()).hexdigest())
    combined["protein_id"] = combined["protein_id"] + "__" + hashes
    combined = combined.drop_duplicates(subset=["protein_id", "molecule_id"],
                                        keep=False)

    dataset = create_dataset_with_checkpoint_params(combined, model_folder,
                                                    cache_dir=other_dir,
                                                    n_workers=n_workers)
    parsed = run_model_on_dataset(model, variables, dataset,
                                  max_batch_size=max_batch_size)
    results = combined.drop(columns=["affinity_score"]).merge(
        parsed, on=["protein_id", "molecule_id"], how="left")
    results.to_pickle(os.path.join(results_dir, "biolip_raw_results.pkl"))
    return results
