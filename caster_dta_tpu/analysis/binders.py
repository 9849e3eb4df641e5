"""Virtual binder-screen task (DrugBank × fixed protein structure list).

Behavioral spec: reference test_protein_binders.py — sequences extracted from
local PDB files, DrugBank (or explicit SMILES dict) drug list with
approved-only filtering, model-vocabulary sanity filters, cross-product
evaluation without the explainer, pickled raw results + top-k ranking.
"""
from __future__ import annotations

import os

import pandas as pd

from caster_dta_tpu.analysis import common
from caster_dta_tpu.inference.checkpoint import (
    create_dataset_with_checkpoint_params, load_model_from_checkpoint)
from caster_dta_tpu.inference.evaluation import run_model_on_dataset


def drugs_from_drugbank(drugbank_file: str, only_approved: bool = True) -> dict:
    """DrugBank XML -> {name: smiles} (reference test_protein_binders.py
    drug assembly with approved-only filter)."""
    from caster_dta_tpu.inference.load_drugbank import load_drugbank
    db = load_drugbank(drugbank_file)
    db = db[db["smiles"].map(lambda s: isinstance(s, str) and len(s) > 0)]
    if only_approved:
        db = db[db["groups"].map(lambda g: "approved" in g and "withdrawn" not in g)]
    return dict(zip(db["name"], db["smiles"]))


def run_protein_binders(model_folder: str, protids_to_files: dict,
                        test_drugs: dict, results_dir: str,
                        base_data_dir: str, max_batch_size: int = 16,
                        k_drugs: int = 10, higher_is_better: bool = True,
                        n_workers=0):
    os.makedirs(results_dir, exist_ok=True)
    other_dir = os.path.join(base_data_dir, "other_data")
    os.makedirs(other_dir, exist_ok=True)

    if not isinstance(protids_to_files, dict):
        protids_to_files = {os.path.basename(x): x for x in protids_to_files}

    protid_seq = {pid: common.sequence_from_pdb(path)
                  for pid, path in protids_to_files.items()}
    prot_df = pd.DataFrame({"id": list(protid_seq.keys()),
                            "seq": list(protid_seq.values()),
                            "file": [protids_to_files[p] for p in protid_seq]})
    drug_df = pd.DataFrame(test_drugs.items(), columns=["id", "smiles"])

    model, variables, model_kwargs = load_model_from_checkpoint(model_folder)
    prot_df, drug_df = common.apply_vocab_sanity_filters(
        prot_df, drug_df, model_kwargs)

    combined = (prot_df.rename(columns={"id": "protein_id",
                                        "seq": "protein_sequence",
                                        "file": "protein_file"})
                .merge(drug_df.rename(columns={"id": "molecule_id",
                                               "smiles": "molecule_smiles"}),
                       how="cross"))
    combined["affinity_score"] = 0.0
    combined = combined.sort_values(by=["protein_id", "molecule_id"]).reset_index(drop=True)

    dataset = create_dataset_with_checkpoint_params(combined, model_folder,
                                                    cache_dir=other_dir,
                                                    n_workers=n_workers)
    parsed = run_model_on_dataset(model, variables, dataset,
                                  max_batch_size=max_batch_size,
                                  do_explainer=False)
    results = combined.drop(columns=["affinity_score"]).merge(
        parsed, on=["protein_id", "molecule_id"], how="left")
    results.to_pickle(os.path.join(results_dir, "ad_raw_results.pkl"))

    ordered = results.sort_values("affinity_score",
                                  ascending=not higher_is_better)
    topk = ordered.groupby("protein_id").head(k_drugs)
    topk.to_pickle(os.path.join(results_dir, "ad_topk_results.pkl"))
    return results, topk
