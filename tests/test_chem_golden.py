"""Byte-stability guard for the from-scratch chem featurizer.

RDKit is absent in this sandbox, so featurize/chem cannot be compared
against the reference's RDKit stack (create_smiles_features.py:7-111)
directly; instead scripts/freeze_chem_fixtures.py froze a content hash of
the complete featurization of every unique ligand in Davis + KIBA + Metz
(the molecules all committed checkpoints were trained on). These tests
recompute and compare — any refactor that silently shifts atom/bond
features, node/edge types, or array shapes fails here.
"""
import hashlib
import json
import os

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "chem_feature_hashes.json")
DATA_ROOT = "/root/reference/data"


def _load_fixture():
    with open(FIXTURE) as fh:
        return json.load(fh)


def _dataset_smiles(name):
    from caster_dta_tpu.data.datasets import load_dataset
    df = load_dataset(name, data_root=DATA_ROOT, structures_dir=None)
    return sorted(set(df["molecule_smiles"]))


def _check(smiles_list, per_ligand):
    from scripts.freeze_chem_fixtures import feature_hash
    mismatches = []
    for s in smiles_list:
        key = hashlib.sha256(s.encode()).hexdigest()[:16]
        assert key in per_ligand, f"ligand not in fixture: {s[:60]}"
        if feature_hash(s) != per_ligand[key]:
            mismatches.append(s)
    assert not mismatches, (
        f"{len(mismatches)} ligand featurizations drifted from the frozen "
        f"fixture (first: {mismatches[0][:80]}). If the change is "
        f"intentional, re-freeze with scripts/freeze_chem_fixtures.py and "
        f"note that ALL committed checkpoints were trained on the old "
        f"features.")


@pytest.mark.parametrize("ds", ["davis", "kiba", "metz"])
def test_chem_features_frozen_sample(ds):
    """Fast guard: a deterministic 25-ligand stride through each dataset."""
    fx = _load_fixture()["datasets"][ds]
    smiles = _dataset_smiles(ds)
    assert len(smiles) == fx["n_ligands"]
    stride = max(len(smiles) // 25, 1)
    _check(smiles[::stride], fx["per_ligand"])


@pytest.mark.slow
@pytest.mark.parametrize("ds", ["davis", "kiba", "metz"])
def test_chem_features_frozen_full(ds):
    """Every unique ligand in the dataset, byte-stable."""
    fx = _load_fixture()["datasets"][ds]
    smiles = _dataset_smiles(ds)
    _check(smiles, fx["per_ligand"])
    combined = hashlib.sha256(json.dumps(
        fx["per_ligand"], sort_keys=True).encode()).hexdigest()
    assert combined == fx["combined"]
