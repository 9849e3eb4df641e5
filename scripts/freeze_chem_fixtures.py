"""Freeze the from-scratch chem featurizer's output for every ligand the
committed models were trained on (VERDICT r04 next-round #3).

RDKit does not exist in this sandbox, so featurize/chem cannot be
golden-checked against the reference's RDKit perception + Gasteiger stack
(/root/reference/utils/create_smiles_features.py:7-111). This script builds
the only guard available instead: a per-ligand content hash of the full
molecule featurization (atom features, bond features, node/edge types) for
every unique SMILES in Davis + KIBA + Metz under the training config
(driver DEFAULT_DATASET_KWARGS molecule flags), committed as a fixture.
tests/test_chem_golden.py then asserts byte-stability, so any refactor that
silently shifts the features the committed checkpoints were trained on
fails CI.

Usage: python scripts/freeze_chem_fixtures.py [out_json]
(CPU-only; reads the reference data CSVs for the SMILES lists.)
"""
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

FEATURIZE_KW = dict(molecule_full_atomtype=False,
                    one_hot_ordinal_feats=False,
                    molecule_include_selfloops=True)


def feature_hash(smiles: str) -> str:
    """Content hash of the complete featurization of one SMILES."""
    from caster_dta_tpu.data.featurize import smiles as smiles_feat

    nf, ef, nt, et = smiles_feat.process_smiles(
        smiles,
        FEATURIZE_KW["molecule_full_atomtype"],
        FEATURIZE_KW["one_hot_ordinal_feats"],
        FEATURIZE_KW["molecule_include_selfloops"])
    h = hashlib.sha256()
    for arr in (np.asarray(nf, np.float64), np.asarray(ef, np.float64),
                np.asarray(nt, np.int64), np.asarray(et, np.float64)):
        h.update(str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def main():
    from caster_dta_tpu.data.datasets import load_dataset

    out_json = (sys.argv[1] if len(sys.argv) > 1
                else "tests/fixtures/chem_feature_hashes.json")
    fixture = {"featurize_kwargs": FEATURIZE_KW, "datasets": {}}
    for ds in ("davis", "kiba", "metz"):
        df = load_dataset(ds, data_root="/root/reference/data",
                          structures_dir=None)
        smiles = sorted(set(df["molecule_smiles"]))
        hashes = {}
        for s in smiles:
            hashes[hashlib.sha256(s.encode()).hexdigest()[:16]] = \
                feature_hash(s)
        combined = hashlib.sha256(
            json.dumps(hashes, sort_keys=True).encode()).hexdigest()
        fixture["datasets"][ds] = {"n_ligands": len(smiles),
                                   "combined": combined,
                                   "per_ligand": hashes}
        print(f"{ds}: {len(smiles)} ligands, combined {combined[:16]}...",
              flush=True)
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as fh:
        json.dump(fixture, fh, indent=0, sort_keys=True)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
