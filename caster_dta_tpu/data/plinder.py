"""PLINDER dataset parser.

Behavioral spec: reference dataset/get_plinder.py:6-184 — query the PLINDER
index for single-protein/single-ligand systems passing validation with
binding affinities across the predefined train/val/test splits, link to
apo/pred structures, and build the canonical DataFrame with a 'split' column.
Gated on the optional `plinder` package (network-heavy; not in this image);
processed CSVs are cached and loaded without the dependency.
"""
from __future__ import annotations

import hashlib
import os

import pandas as pd


def parse_plinder(dataset_dir: str, save_to_csv: bool = True,
                  force_reparse: bool = False, need_structures: bool = False,
                  dedupe_systems: bool = True) -> pd.DataFrame:
    data_csv_path = os.path.join(dataset_dir, "processed_data_plinderdl.csv")
    if os.path.exists(data_csv_path) and not force_reparse:
        return pd.read_csv(data_csv_path)

    try:
        import plinder.core  # noqa: F401
        from plinder.core import PlinderSystem
        from plinder.core.scores import query_index, query_links
    except ImportError as e:
        raise ImportError(
            "The optional `plinder` package is required to (re)parse PLINDER; "
            "a previously processed CSV can be used without it") from e

    os.environ["PLINDER_MOUNT"] = dataset_dir
    os.environ["PLINDER_LOG_LEVEL"] = "40"

    plindex = query_index(
        filters=[("system_num_ligand_chains", "==", 1),
                 ("system_num_protein_chains", "==", 1),
                 ("system_pass_validation_criteria", "==", True),
                 ("ligand_is_proper", "==", True),
                 ("system_has_binding_affinity", "==", True)],
        splits=["train", "val", "test"],
        columns=["system_id", "ligand_id", "entry_pdb_id", "ligand_smiles",
                 "ligand_binding_affinity"])
    links = query_links(
        filters=[("reference_system_id", "in", set(plindex.system_id))],
        columns=["reference_system_id", "id", "target_id", "receptor_file",
                 "kind"]).rename(columns={
        "reference_system_id": "system_id", "id": "linked_structure_id",
        "target_id": "target_structure_id", "kind": "linked_structure_type"})
    plindex = plindex.merge(links, on="system_id", how="left",
                            suffixes=("", "_linked"))
    plindex = plindex.sort_values(by=plindex.columns.tolist())
    if need_structures:
        plindex = plindex.dropna(subset=["linked_structure_id"])
    if dedupe_systems and not need_structures:
        plindex = plindex.drop_duplicates(
            subset=["entry_pdb_id", "ligand_smiles", "ligand_binding_affinity"])

    def get_data_from_system(row):
        plsys = PlinderSystem(system_id=row["system_id"])
        protein_seq = list(plsys.sequences.values())[0]
        if need_structures:
            input_file = plsys.get_linked_structure(
                row["linked_structure_type"], row["linked_structure_id"])
        else:
            input_file = "NOSTRUCTREQUESTED"
        smiles = list(plsys.smiles.values())[0]
        return pd.Series({
            "protein_id": row["linked_structure_id"],
            "protein_sequence": protein_seq,
            "protein_file": input_file,
            "molecule_id": hashlib.sha1(smiles.encode()).hexdigest(),
            "molecule_smiles": smiles,
            "affinity_score": row["ligand_binding_affinity"],
            "complex_id": row["system_id"],
            "complex_file": plsys.system_cif,
            "split": row["split"],
        })

    data = plindex.apply(get_data_from_system, axis=1)
    cols = ["protein_id", "protein_sequence", "molecule_id",
            "molecule_smiles", "affinity_score", "split"]
    if need_structures:
        cols += ["protein_file", "complex_file", "complex_id"]
    data = data[cols]
    data["protein_id"] = data["protein_id"].fillna(
        data["protein_sequence"].map(
            lambda x: hashlib.sha1(x.encode()).hexdigest()))
    data = data.drop_duplicates(subset=["protein_id", "molecule_id"]).reset_index(drop=True)
    if save_to_csv:
        data.to_csv(data_csv_path, index=False)
    return data
