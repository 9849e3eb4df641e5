"""Run the three downstream analysis tasks END-TO-END with the REAL
reference pretrained checkpoint (BindingDB Kd CASTER-DTA(2,2),
/root/reference/pretrained_model_downstream — loaded through
interop.torch_import's .pt transplant path), committing result pickles and
figures under analysis_results/.

Offline substitutions (this sandbox has no network):
  * protein sequences and ligand SMILES are REAL (Davis kinases and drugs
    from the reference's own deepdta_data); BioLIP/PharmGKB/DrugBank input
    TABLES are synthesized in their exact file formats from that real data.
  * structures are synthetic helix backbones (the same --synthetic-structures
    substitution the training runs document in RESULTS.md).

Mirrors: reference test_biolip_binding.py / test_dta_variation.py /
test_protein_binders.py + the three visualize_* drivers.

Usage: python scripts/run_downstream_pretrained.py [out_dir]
"""
import jax

jax.config.update("jax_platforms", "cpu")   # TPU chip is exclusive; CPU here

import hashlib
import json
import os
import sys

import numpy as np
import pandas as pd

from caster_dta_tpu.data import synthetic

REF_MODEL = "/root/reference/pretrained_model_downstream"
DAVIS = "/root/reference/data/deepdta_data/davis"


def davis_inputs(max_len=420, n_prot=6, n_drug=24):
    with open(os.path.join(DAVIS, "proteins.txt")) as f:
        prots = json.load(f)
    with open(os.path.join(DAVIS, "ligands_iso.txt")) as f:
        drugs = json.load(f)
    prots = {k: v for k, v in sorted(prots.items()) if len(v) <= max_len}
    prots = dict(list(prots.items())[:n_prot])
    drugs = dict(list(sorted(drugs.items()))[:n_drug])
    return prots, drugs


def write_helices(pdb_dir, named_seqs, seed=0):
    os.makedirs(pdb_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for pid, seq in named_seqs.items():
        path = os.path.join(pdb_dir, f"{pid}.pdb")
        if not os.path.exists(path):
            synthetic.write_pdb(path, synthetic.helix_backbone(len(seq), rng),
                                seq)


def main(out_root="analysis_results/pretrained_bindingdb"):
    os.makedirs(out_root, exist_ok=True)
    prots, drugs = davis_inputs()
    drug_items = list(drugs.items())
    print(f"inputs: {len(prots)} Davis kinases (real sequences), "
          f"{len(drugs)} real drug SMILES; model = reference pretrained .pt")

    # ---------------------------------------------------------- 1. BioLIP
    biolip_dir = os.path.join(out_root, "biolip")
    base = os.path.join(biolip_dir, "data")
    rows, lig_rows = [], []
    for i, (pid, seq) in enumerate(prots.items()):
        row = [""] * 21
        row[4] = f"LIG{i % 4}"
        # plausible binding-site annotation: every 13th residue
        row[8] = " ".join(f"{seq[j]}{j + 1}" for j in range(0, len(seq), 13))
        row[17] = pid
        row[20] = seq
        rows.append(row)
    for j in range(4):
        lig_rows.append({"#CCD": f"LIG{j}", "SMILES": drug_items[j][1],
                         "name": drug_items[j][0]})
    os.makedirs(base, exist_ok=True)
    biolip_file = os.path.join(base, "BioLiP_nr.txt")
    pd.DataFrame(rows).to_csv(biolip_file, sep="\t", header=False, index=False)
    lig_file = os.path.join(base, "ligand.tsv")
    pd.DataFrame(lig_rows).to_csv(lig_file, sep="\t", index=False)
    write_helices(os.path.join(base, "pdb_files"), prots)

    from caster_dta_tpu.analysis.biolip import run_biolip_binding
    results = run_biolip_binding(REF_MODEL, biolip_file, lig_file,
                                 biolip_dir, base, max_batch_size=4,
                                 do_api=False)
    print(f"[biolip] {len(results)} protein-ligand rows -> "
          f"{biolip_dir}/biolip_raw_results.pkl")

    from caster_dta_tpu.analysis.visualize import visualize_biolip_results
    stats = visualize_biolip_results(results, os.path.join(biolip_dir,
                                                           "figures"))
    with open(os.path.join(biolip_dir, "stats.json"), "w") as f:
        json.dump({k: (float(v) if np.isscalar(v) else str(v))
                   for k, v in stats.items()}, f, indent=2, default=str)
    print(f"[biolip] figures + t-test stats: {stats}")

    # ------------------------------------------------------- 2. variation
    pgx_dir = os.path.join(out_root, "pgx")
    vbase = os.path.join(pgx_dir, "data")
    # two point variants of the first two kinases (PharmGKB-style ref/alt)
    pairs = {}
    for i, (pid, seq) in enumerate(list(prots.items())[:2]):
        mid = len(seq) // 2
        alt = seq[:mid] + ("W" if seq[mid] != "W" else "F") + seq[mid + 1:]
        pairs[f"rs_{pid}_{drug_items[i][0]}"] = {"ref_seq": seq,
                                                 "alt_seq": alt}
    seqs = {}
    for v in pairs.values():
        for s in (v["ref_seq"], v["alt_seq"]):
            seqs[hashlib.sha256(s.encode()).hexdigest()] = s
    write_helices(os.path.join(vbase, "pdb_files"), seqs)
    vdrugs = dict(drug_items[:4])

    from caster_dta_tpu.analysis.variation import run_dta_variation
    vres, deltas = run_dta_variation(REF_MODEL, {}, vdrugs, pgx_dir, vbase,
                                     test_sequence_pairs=pairs,
                                     max_batch_size=4)
    print(f"[pgx] {len(vres)} predictions, {len(deltas)} ref/alt deltas -> "
          f"{pgx_dir}/pgx_delta_results.pkl")

    from caster_dta_tpu.analysis.visualize import visualize_variation_results
    outs = visualize_variation_results(deltas, os.path.join(pgx_dir,
                                                            "figures"))
    print(f"[pgx] {len(outs)} variant-drug figure sets")

    # --------------------------------------------------------- 3. binders
    ad_dir = os.path.join(out_root, "binders")
    abase = os.path.join(ad_dir, "data")
    pdbs = os.path.join(abase, "pdb_files")
    write_helices(pdbs, prots)
    prot_files = {pid: os.path.join(pdbs, f"{pid}.pdb") for pid in prots}

    from caster_dta_tpu.analysis.binders import run_protein_binders
    top = run_protein_binders(REF_MODEL, prot_files, drugs, ad_dir, abase,
                              max_batch_size=4, k_drugs=5)
    print(f"[binders] screen of {len(prots)}x{len(drugs)} pairs -> "
          f"{ad_dir}/ad_raw_results.pkl; top-5 per protein saved")

    from caster_dta_tpu.analysis.visualize import visualize_binder_results
    raw = pd.read_pickle(os.path.join(ad_dir, "ad_raw_results.pkl"))
    top_df, drawn = visualize_binder_results(raw, os.path.join(ad_dir,
                                                               "figures"),
                                             percentile=90.0)
    print(f"[binders] {len(top_df)} pairs above p90, {len(drawn)} drawings")
    print("DONE:", out_root)


if __name__ == "__main__":
    main(*sys.argv[1:])
