"""PharmGKB variant-effect driver (reference test_dta_variation.py).

Converts rsIDs to ref/alt protein sequences, acquires structures, evaluates
every variant-drug pair, and computes ref-vs-alt deltas of affinity,
attention, and explanation.
"""
from caster_dta_tpu.analysis.variation import run_dta_variation

if __name__ == "__main__":
    ## USER INPUTS ##
    results_dir = "./pgx_results/default_run"
    base_data_dir = "./data/pgx_data/"
    model_folder = "pretrained_model_downstream"

    # PharmGKB VIP coding variants (reference test_dta_variation.py:29-50)
    test_variants = {
        "SLCO1B1_var1_atorvastatin-simvastatin-pravastatin-rosuvastatin": "rs4149056",
        "SLCO1B1_var2_atorvastatin-rosuvastatin-methotrexate-pravastatin": "rs2306283",
        "TPMT_var1_mercaptopurine": "rs1800462",
        "VKORC1_var_warfarin": "rs61742245",
    }
    test_sequence_pairs = {}

    # FDA-approved drug SMILES (reference test_dta_variation.py:74-95)
    test_drugs = {
        "Rosuvastatin": r"O[C@@H](C[C@H](CC(=O)O)O)/C=C/c1c(nc(nc1c1ccc(cc1)F)N(S(=O)(=O)C)C)C(C)C",
        "Methotrexate": r"OC(=O)CC[C@@H](C(=O)O)NC(=O)c1ccc(cc1)N(Cc1cnc2c(n1)c(N)nc(n2)N)C",
        "Sunitinib": r"CCN(CCNC(=O)c1c(C)[nH]c(c1C)/C=C/1\C(=O)Nc2c1cc(F)cc2)CC",
        "Metoprolol": r"COCCc1ccc(cc1)OCC(CNC(C)C)O",
        "Clopidogrel": r"COC(=O)[C@H](c1ccccc1Cl)N1CCc2c(C1)ccs2",
        "Efavirenz": r"FC([C@@]1(C#CC2CC2)OC(=O)Nc2c1cc(Cl)cc2)(F)F",
        "Warfarin": r"CC(=O)C[C@@H](C1=CC=CC=C1)C2=C(C3=CC=CC=C3OC2=O)O",
        "Mercaptopurine": r"Sc1ncnc2c1nc[nH]2",
        "Atorvastatin": r"O[C@@H](C[C@H](CC(=O)O)O)CCn1c(C(C)C)c(c(c1c1ccc(cc1)F)c1ccccc1)C(=O)Nc1ccccc1",
        "Pravastatin": r"CC[C@@H](C(=O)O[C@H]1C[C@H](O)C=C2[C@H]1[C@@H](CC[C@H](C[C@H](CC(=O)O)O)O)[C@H](C=C2)C)C",
        "Azathioprine": r"Cn1cnc(c1Sc1ncnc2c1nc[nH]2)N(=O)=O",
        "Midazolam": r"Clc1ccc2c(c1)C(=NCc1n2c(C)nc1)c1ccccc1F",
        "Risperidone": r"Fc1ccc2c(c1)onc2C1CCN(CC1)CCc1c(C)nc2n(c1=O)CCCC2",
    }
    ## END USER INPUTS ##

    results, deltas = run_dta_variation(model_folder, test_variants,
                                        test_drugs, results_dir, base_data_dir,
                                        test_sequence_pairs=test_sequence_pairs)
    print(f"Saved {len(results)} raw rows and {len(deltas)} ref/alt deltas "
          f"to {results_dir}")
