"""BioLIP binding-site recovery driver (reference test_biolip_binding.py).

Evaluates a trained checkpoint on BioLIP protein-ligand pairs, saving raw
predictions + attention for visualize_biolip_results.py.
"""
import os

from caster_dta_tpu.analysis.biolip import run_biolip_binding

if __name__ == "__main__":
    ## USER INPUTS ##
    results_dir = "./biolip_results/default_run"
    base_data_dir = "./data/biolip_data/"
    model_folder = "pretrained_model_downstream"
    biolip_file = "./data/biolip_data/BioLiP_nr.txt.gz"
    biolip_ligand_file = "./data/biolip_data/ligand.tsv.gz"
    ## END USER INPUTS ##

    os.makedirs(base_data_dir, exist_ok=True)
    results = run_biolip_binding(model_folder, biolip_file, biolip_ligand_file,
                                 results_dir, base_data_dir,
                                 max_batch_size=16)
    print(f"Saved {len(results)} rows to {results_dir}/biolip_raw_results.pkl")
