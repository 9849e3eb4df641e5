"""Virtual binder-screen driver (reference test_protein_binders.py).

Screens DrugBank small molecules (or an explicit SMILES dict) against a fixed
list of protein structures (Alzheimer's/influenza targets in the reference).
"""
import os

from caster_dta_tpu.analysis.binders import (drugs_from_drugbank,
                                             run_protein_binders)

if __name__ == "__main__":
    ## USER INPUTS ##
    results_dir = "./ad_results/default_run"
    base_data_dir = "./data/ad_data/"
    model_folder = "pretrained_model_downstream"
    drugbank_file = "./data/full database.xml"   # or .zip
    only_approved_drugs = True

    # protein_id -> local PDB structure path (reference lists ~30 AD/flu
    # structures, test_protein_binders.py:38-193)
    pdb_dir = os.path.join(base_data_dir, "pdb_files")
    protids_to_files = {
        os.path.basename(f).replace(".pdb", ""): os.path.join(pdb_dir, f)
        for f in (os.listdir(pdb_dir) if os.path.isdir(pdb_dir) else [])
        if f.endswith(".pdb")
    }
    ## END USER INPUTS ##

    if os.path.exists(drugbank_file):
        test_drugs = drugs_from_drugbank(drugbank_file, only_approved_drugs)
    else:
        raise FileNotFoundError(
            f"DrugBank file {drugbank_file} not found (requires a license); "
            "pass an explicit dict of SMILES to run_protein_binders instead")

    results, topk = run_protein_binders(model_folder, protids_to_files,
                                        test_drugs, results_dir, base_data_dir,
                                        max_batch_size=16, k_drugs=10)
    print(f"Screened {len(results)} pairs; top-k saved to {results_dir}")
