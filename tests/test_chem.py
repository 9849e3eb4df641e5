"""Chem module tests: SMILES parsing, perception, Gasteiger charges, and
SMILES featurization shapes/semantics against known chemistry."""
import numpy as np
import pytest

from caster_dta_tpu.data.featurize.chem import mol_from_smiles
from caster_dta_tpu.data.featurize.chem.gasteiger import compute_gasteiger_charges
from caster_dta_tpu.data.featurize import smiles as smiles_feat


def test_ethanol():
    m = mol_from_smiles("CCO")
    assert m.GetNumAtoms() == 3
    hs = [a.GetTotalNumHs() for a in m.atoms]
    assert hs == [3, 2, 1]
    assert [a.GetDegree() for a in m.atoms] == [1, 2, 1]
    assert all(a.GetHybridization() == "SP3" for a in m.atoms)
    assert not any(a.IsInRing() for a in m.atoms)


def test_benzene_aromatic_and_kekule():
    for smi in ["c1ccccc1", "C1=CC=CC=C1"]:
        m = mol_from_smiles(smi)
        assert m.GetNumAtoms() == 6
        assert all(a.GetIsAromatic() for a in m.atoms), smi
        assert all(a.GetTotalNumHs() == 1 for a in m.atoms), smi
        assert all(a.GetHybridization() == "SP2" for a in m.atoms), smi
        assert all(b.GetBondType() == "AROMATIC" for b in m.bonds), smi
        assert all(b.GetIsConjugated() for b in m.bonds), smi
        assert all(b.IsInRing() for b in m.bonds), smi


def test_naphthalene_kekule_fused():
    m = mol_from_smiles("C1=CC2=CC=CC=C2C=C1")
    assert m.GetNumAtoms() == 10
    assert all(a.GetIsAromatic() for a in m.atoms)


def test_pyridine_pyrrole():
    pyr = mol_from_smiles("c1ccncc1")
    n = [a for a in pyr.atoms if a.symbol == "N"][0]
    assert n.GetIsAromatic() and n.GetTotalNumHs() == 0

    pyrrole = mol_from_smiles("c1cc[nH]c1")
    n = [a for a in pyrrole.atoms if a.symbol == "N"][0]
    assert n.GetIsAromatic() and n.GetTotalNumHs() == 1


def test_nitrile_sp():
    m = mol_from_smiles("CC#N")
    assert m.atoms[1].GetHybridization() == "SP"
    assert m.atoms[2].GetHybridization() == "SP"
    assert m.atoms[0].GetHybridization() == "SP3"


def test_carbonyl_sp2_and_conjugation():
    m = mol_from_smiles("CC(=O)O")  # acetic acid
    assert m.atoms[1].GetHybridization() == "SP2"
    assert m.atoms[2].GetHybridization() == "SP2"   # =O
    assert [a.GetTotalNumHs() for a in m.atoms] == [3, 0, 0, 1]
    co_single = m.bond_between(1, 3)
    assert co_single.GetIsConjugated()              # ester/acid resonance
    cc = m.bond_between(0, 1)
    assert not cc.GetBondType() == "AROMATIC"


def test_charges_and_quaternary_n():
    m = mol_from_smiles("C[N+](C)(C)C")
    n = m.atoms[1]
    assert n.GetFormalCharge() == 1
    assert n.GetTotalNumHs() == 0
    assert n.GetDegree() == 4
    assert n.GetHybridization() == "SP3"

    m2 = mol_from_smiles("[O-]C(=O)C")
    assert m2.atoms[0].GetFormalCharge() == -1
    assert m2.atoms[0].GetTotalNumHs() == 0


def test_double_bond_stereo():
    e = mol_from_smiles("F/C=C/F")
    db = [b for b in e.bonds if b.bond_type == "DOUBLE"][0]
    assert db.GetStereo() == "STEREOE"
    z = mol_from_smiles("F/C=C\\F")
    db = [b for b in z.bonds if b.bond_type == "DOUBLE"][0]
    assert db.GetStereo() == "STEREOZ"


def test_chirality_tags():
    m = mol_from_smiles("N[C@@H](C)C(=O)O")  # L-alanine
    c = m.atoms[1]
    assert c.GetChiralTag() == "CHI_TETRAHEDRAL_CW"
    assert c.GetTotalNumHs() == 1
    m2 = mol_from_smiles("N[C@H](C)C(=O)O")
    assert m2.atoms[1].GetChiralTag() == "CHI_TETRAHEDRAL_CCW"


def test_ring_closures_and_branches():
    m = mol_from_smiles("C1CC1")  # cyclopropane
    assert all(a.IsInRing() for a in m.atoms)
    assert all(b.IsInRing() for b in m.bonds)
    m2 = mol_from_smiles("CC(C)(C)C")  # neopentane
    assert m2.atoms[1].GetDegree() == 4
    m3 = mol_from_smiles("C%10CCCCC%10")  # %nn closure
    assert m3.GetNumAtoms() == 6


def test_disconnected_components():
    m = mol_from_smiles("CC.O")
    assert m.GetNumAtoms() == 3
    assert len(m.bonds) == 1


def test_caffeine_parses():
    m = mol_from_smiles("Cn1cnc2c1c(=O)n(C)c(=O)n2C")
    assert m.GetNumAtoms() == 14
    arom = [a for a in m.atoms if a.GetIsAromatic()]
    assert len(arom) >= 5  # imidazole ring at minimum


def test_gasteiger_ethanol():
    m = mol_from_smiles("CCO")
    q = compute_gasteiger_charges(m)
    # O strongly negative, adjacent C positive, terminal C near zero
    assert q[2] < -0.3
    assert q[1] > 0.0
    assert abs(q[0]) < 0.1
    assert np.all(np.isfinite(q))


def test_gasteiger_charge_ordering():
    """More electronegative environments pull more charge."""
    m = mol_from_smiles("CF")
    q = compute_gasteiger_charges(m)
    assert q[1] < -0.2 and q[0] > 0.0


def test_atom_features_shape_and_content():
    nf, ef, nt, et = smiles_feat.process_smiles(
        "CC(=O)Oc1ccccc1C(=O)O",  # aspirin
        molecule_full_atomtype=False, one_hot_ordinal_feats=False,
        molecule_include_selfloops=True)
    assert nf.shape == (13, 41)
    assert ef.shape == (13, 13, 9)
    assert len(nt) == 13
    # C=6 -> type 1 in the select map; O=8 -> type 3
    assert nt[0] == 1 and nt[2] == 3
    # self-loop edge types are 0, bonds offset by 1
    assert et[0, 0] == 0
    assert et[0, 1] == 1  # single bond + offset
    # aromatic ring bond type = 3 + 1
    ring_atoms = [i for i, a in enumerate(nf[:, -2]) if a == 1]
    assert len(ring_atoms) == 6
    # one-hot ordinal variant widens features
    nf2, _, _, _ = smiles_feat.process_smiles(
        "CC(=O)Oc1ccccc1C(=O)O", molecule_full_atomtype=False,
        one_hot_ordinal_feats=True, molecule_include_selfloops=False)
    assert nf2.shape == (13, 49)


def test_validate_smiles():
    assert smiles_feat.validate_smiles("CCO")
    assert not smiles_feat.validate_smiles("C1CC")     # unclosed ring
    assert not smiles_feat.validate_smiles("C(")       # bad paren
    assert not smiles_feat.validate_smiles("Xx")       # unknown element
