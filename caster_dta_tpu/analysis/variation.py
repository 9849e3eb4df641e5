"""PharmGKB variant-effect task: ref-vs-alt affinity and attention deltas.

Behavioral spec: reference test_dta_variation.py — rsID -> ref/alt protein
sequences (Ensembl/Mutalyzer with caches), optional manually-specified
sequence pairs (sha256-keyed), structure acquisition, protein × drug cross
product, batched evaluation, and per-variant ref/alt delta computation with
"smarter" ref∈alt matching.
"""
from __future__ import annotations

import hashlib
import os
from functools import partial

import numpy as np
import pandas as pd

from caster_dta_tpu.inference.checkpoint import (
    create_dataset_with_checkpoint_params, load_model_from_checkpoint)
from caster_dta_tpu.inference.evaluation import run_model_on_dataset
from caster_dta_tpu.inference.structures import acquire_pdbs
from caster_dta_tpu.inference.variant_to_protein import variant_to_protein_seq


def compute_refalt_deltas(results_df, var_protid_map, protid_seq_map,
                          variant_drug_df, attn_type="attention",
                          attempt_smarter_matching=True) -> pd.DataFrame:
    """Ref-vs-alt statistics per variant-drug pair
    (reference test_dta_variation.py:226-319)."""
    rows = []
    for _, row in variant_drug_df.iterrows():
        var_id, mol_id = row["variant_id"], row["molecule_id"]
        code = row["variant_code"]
        ref_ids = var_protid_map[var_id]["ref_id"]
        alt_ids = var_protid_map[var_id]["alt_id"]
        ref_data = results_df[results_df["protein_id"].isin(ref_ids)
                              & (results_df["molecule_id"] == mol_id)]
        alt_data = results_df[results_df["protein_id"].isin(alt_ids)
                              & (results_df["molecule_id"] == mol_id)]
        for _, ref_row in ref_data.iterrows():
            for _, alt_row in alt_data.iterrows():
                ref_id, alt_id = ref_row["protein_id"], alt_row["protein_id"]
                ref_seq, alt_seq = protid_seq_map[ref_id], protid_seq_map[alt_id]
                if attempt_smarter_matching and code != "manual":
                    if ref_id not in alt_id or ref_seq == alt_seq:
                        continue
                ref_pattn = ref_row[f"protein_{attn_type}"]
                alt_pattn = alt_row[f"protein_{attn_type}"]
                ref_mattn = ref_row[f"molecule_{attn_type}"]
                alt_mattn = alt_row[f"molecule_{attn_type}"]
                delta_p = (ref_pattn - alt_pattn
                           if len(ref_pattn) == len(alt_pattn) else np.nan)
                rows.append({
                    "variant_id": var_id, "molecule_id": mol_id,
                    "variant_code": code,
                    "molecule_smiles": row["molecule_smiles"],
                    "ref_id": ref_id, "alt_id": alt_id,
                    "ref_affinity": ref_row["affinity_score"],
                    "alt_affinity": alt_row["affinity_score"],
                    "delta_affinity": alt_row["affinity_score"] - ref_row["affinity_score"],
                    f"ref_prot_{attn_type}": ref_pattn,
                    f"alt_prot_{attn_type}": alt_pattn,
                    f"delta_prot_{attn_type}": delta_p,
                    f"ref_mol_{attn_type}": ref_mattn,
                    f"alt_mol_{attn_type}": alt_mattn,
                    f"delta_mol_{attn_type}": alt_mattn - ref_mattn,
                    "ref_file": ref_row["protein_file"],
                    "alt_file": alt_row["protein_file"],
                    "ref_len": len(ref_pattn), "alt_len": len(alt_pattn),
                    "ref_seq": ref_seq, "alt_seq": alt_seq,
                })
    return pd.DataFrame(rows)


def run_dta_variation(model_folder: str, test_variants: dict,
                      test_drugs: dict, results_dir: str, base_data_dir: str,
                      test_sequence_pairs: dict | None = None,
                      max_batch_size: int = 8, n_workers=0):
    os.makedirs(results_dir, exist_ok=True)
    pdb_dir = os.path.join(base_data_dir, "pdb_files")
    other_dir = os.path.join(base_data_dir, "other_data")
    os.makedirs(pdb_dir, exist_ok=True)
    os.makedirs(other_dir, exist_ok=True)
    test_sequence_pairs = test_sequence_pairs or {}

    if not isinstance(test_variants, dict):
        test_variants = {x: x for x in test_variants}
    if not isinstance(test_drugs, dict):
        test_drugs = {x: x for x in test_drugs}

    var_protid_map, protid_seq_map = variant_to_protein_seq(
        test_variants, other_dir, force_requery=False)
    for k, v in test_sequence_pairs.items():
        ref_id = hashlib.sha256(v["ref_seq"].encode()).hexdigest()
        alt_id = hashlib.sha256(v["alt_seq"].encode()).hexdigest()
        protid_seq_map[ref_id] = v["ref_seq"]
        protid_seq_map[alt_id] = v["alt_seq"]
        var_protid_map[k] = {"ref_id": [ref_id], "alt_id": [alt_id]}

    prot_df = pd.DataFrame({
        "id": list(protid_seq_map.keys()),
        "seq": list(protid_seq_map.values()),
        "file": [os.path.join(pdb_dir, f"{x}.pdb") for x in protid_seq_map]})
    prot_df = acquire_pdbs(prot_df, pdb_dir, require_completeness=False)

    drug_df = pd.DataFrame(test_drugs.items(), columns=["id", "smiles"])
    combined = (prot_df.rename(columns={"id": "protein_id",
                                        "seq": "protein_sequence",
                                        "file": "protein_file"})
                .merge(drug_df.rename(columns={"id": "molecule_id",
                                               "smiles": "molecule_smiles"}),
                       how="cross"))
    combined["affinity_score"] = 0.0
    combined = combined.sort_values(by=["protein_id", "molecule_id"]).reset_index(drop=True)

    model, variables, _ = load_model_from_checkpoint(model_folder)
    dataset = create_dataset_with_checkpoint_params(combined, model_folder,
                                                    cache_dir=other_dir,
                                                    n_workers=n_workers)
    parsed = run_model_on_dataset(model, variables, dataset,
                                  max_batch_size=max_batch_size)
    results = combined.drop(columns=["affinity_score"]).merge(
        parsed, on=["protein_id", "molecule_id"], how="left")
    results.to_pickle(os.path.join(results_dir, "pgx_raw_results.pkl"))

    all_variants = {k: "manual" for k in test_sequence_pairs}
    all_variants.update(test_variants)
    var_col = pd.DataFrame(all_variants.items(),
                           columns=["variant_id", "variant_code"])
    drug_col = pd.DataFrame(test_drugs.items(),
                            columns=["molecule_id", "molecule_smiles"])
    vd_df = var_col.merge(drug_col, how="cross")

    deltas_attn = compute_refalt_deltas(results, var_protid_map, protid_seq_map,
                                        vd_df, "attention")
    deltas_expl = compute_refalt_deltas(results, var_protid_map, protid_seq_map,
                                        vd_df, "explanation")
    extra = deltas_expl.columns.difference(deltas_attn.columns).tolist()
    if len(deltas_attn):
        deltas_attn[extra] = deltas_expl[extra]
        deltas_attn["match_drug"] = deltas_attn.apply(
            lambda x: x["molecule_id"].lower() in x["variant_id"].lower(), axis=1)
    deltas = deltas_attn.reset_index(drop=True)
    deltas.to_pickle(os.path.join(results_dir, "pgx_delta_results.pkl"))
    return results, deltas
