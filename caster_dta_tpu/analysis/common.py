"""Shared pieces of the downstream scientific tasks: model-vocabulary sanity
filters and sequence extraction.

Behavioral spec: reference test_biolip_binding.py:145-196 and
test_protein_binders.py:250-301 — when a model was trained without the
"unknown" residue/atom/bond classes, drop inputs that would need them.
"""
from __future__ import annotations

import networkx as nx
import pandas as pd

from caster_dta_tpu.data.featurize import definitions as defs
from caster_dta_tpu.data.featurize.chem import mol_from_smiles


def validate_smiles_strict(smiles: str, allow_fragments: bool = False) -> bool:
    """Parse + optional single-fragment requirement
    (reference test_biolip_binding.py:65-79)."""
    try:
        mol = mol_from_smiles(smiles)
    except Exception:
        return False
    if allow_fragments:
        return True
    g = nx.Graph()
    g.add_nodes_from(range(mol.GetNumAtoms()))
    g.add_edges_from((b.a1, b.a2) for b in mol.bonds)
    return nx.number_connected_components(g) == 1


def has_unknown_residue(seq: str) -> bool:
    unk = defs.PROTEIN_1LETTER_INT_MAP["X"]
    return any(defs.PROTEIN_1LETTER_INT_MAP.get(c, unk) == unk for c in seq)


def has_unknown_atom(smiles: str) -> bool:
    try:
        mol = mol_from_smiles(smiles)
    except Exception:
        return True
    keep = set(defs.SELECT_ATOMICNUMS_TO_KEEP)
    return any(a.GetAtomicNum() not in keep for a in mol.GetAtoms())


def has_unknown_bond(smiles: str) -> bool:
    try:
        mol = mol_from_smiles(smiles)
    except Exception:
        return True
    return any(str(b.GetBondType()) not in defs.SMILES_BOND_MAP
               for b in mol.GetBonds())


def apply_vocab_sanity_filters(prot_df: pd.DataFrame, drug_df: pd.DataFrame,
                               model_kwargs: dict,
                               seq_col="seq", smiles_col="smiles"):
    """Drop proteins/drugs whose types the trained model has no embedding for
    (reference test_biolip_binding.py:140-196)."""
    pk = model_kwargs["protein_gnn_kwargs"]
    mk = model_kwargs["molecule_gnn_kwargs"]
    unk_res_val = defs.PROTEIN_1LETTER_INT_MAP["X"]
    if pk["num_ntypes"] == unk_res_val:
        keep = ~prot_df[seq_col].map(has_unknown_residue)
        prot_df = prot_df[keep]
    unk_atom_val = len(defs.SELECT_ATOMICNUMS_TO_KEEP)  # "other" bucket index
    if mk["num_ntypes"] == unk_atom_val:
        drug_df = drug_df[~drug_df[smiles_col].map(has_unknown_atom)]
    unk_bond_val = defs.SMILES_BOND_MAP["X"] + 1  # +1 for self-loop offset
    if mk["num_etypes"] == unk_bond_val:
        drug_df = drug_df[~drug_df[smiles_col].map(has_unknown_bond)]
    return prot_df, drug_df


def sequence_from_pdb(pdb_file: str) -> str:
    """Protein sequence from a structure file (replaces the reference's
    mdtraj residue iteration, test_protein_binders.py:213-225)."""
    from caster_dta_tpu.data.featurize.pdb import load_backbone_coords
    _, res_names = load_backbone_coords(pdb_file)
    return "".join(defs.PROTEIN_3LETTER_1LETTER_MAP[r] for r in res_names)
