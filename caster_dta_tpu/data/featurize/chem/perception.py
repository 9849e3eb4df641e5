"""Molecular perception: rings, aromaticity, implicit hydrogens, radicals,
hybridization, conjugation, and double-bond stereo.

Implements the standard published algorithms (OpenSMILES normal-valence
implicit-H rule, Hückel 4n+2 aromaticity over the ring basis, steric-number
hybridization). Property semantics follow what the reference reads off RDKit
atoms/bonds (utils/create_smiles_features.py).

Documented divergences from RDKit (tested in tests/test_chem.py):
  * chiral tags are kept as written (RDKit's AssignStereochemistry may strip
    chemically-meaningless tags);
  * aromaticity is the classic Hückel model per ring + fused-pair pass, close
    to but not bit-identical with RDKit's default model on exotic systems.
"""
from __future__ import annotations

import networkx as nx

from caster_dta_tpu.data.featurize.chem.mol import Mol, Atom


def sanitize(mol: Mol) -> Mol:
    perceive_rings(mol)
    compute_implicit_hydrogens(mol)
    perceive_aromaticity(mol)
    compute_radicals(mol)
    compute_hybridization(mol)
    perceive_conjugation(mol)
    assign_double_bond_stereo(mol)
    return mol


def _graph(mol: Mol) -> nx.Graph:
    g = nx.Graph()
    g.add_nodes_from(range(len(mol.atoms)))
    for b in mol.bonds:
        g.add_edge(b.a1, b.a2)
    return g


def perceive_rings(mol: Mol) -> None:
    g = _graph(mol)
    bridges = set(frozenset(e) for e in nx.bridges(g))
    ring_atoms = set()
    for b in mol.bonds:
        b.in_ring = frozenset((b.a1, b.a2)) not in bridges
        if b.in_ring:
            ring_atoms.update((b.a1, b.a2))
    for a in mol.atoms:
        a.in_ring = a.idx in ring_atoms
    mol.rings = [list(c) for c in nx.minimum_cycle_basis(g)]


def _effective_valences(atom: Atom):
    """Charge-adjusted normal valences (OpenSMILES + common charge rules)."""
    q = atom.formal_charge
    base = atom.default_valences
    if atom.symbol == "B":
        return tuple(max(0, v - q) for v in base)
    if atom.symbol == "C":
        return tuple(max(0, v - abs(q)) for v in base)
    return tuple(max(0, v + q) for v in base)


def compute_implicit_hydrogens(mol: Mol) -> None:
    for a in mol.atoms:
        if a.explicit_hs is not None:        # bracket atom: H count is explicit
            a.implicit_hs = 0
            continue
        # connection count: aromatic bonds count 1 each plus one shared pi
        if a.aromatic and any(b.bond_type == "AROMATIC" for b in a.bonds):
            conn = sum(1 if b.bond_type == "AROMATIC" else b.order for b in a.bonds)
            conn += 1
        else:
            conn = a.bond_order_sum()
        conn = int(conn + 0.5)  # round up x.5 from odd aromatic counts
        for v in _effective_valences(a):
            if conn <= v:
                a.implicit_hs = v - conn
                break
        else:
            a.implicit_hs = 0


def compute_radicals(mol: Mol) -> None:
    for a in mol.atoms:
        if a.explicit_hs is None:
            a.radicals = 0                   # implicit H filled the valence
            continue
        used = a.bond_order_sum() + a.explicit_hs
        if a.aromatic and any(b.bond_type == "AROMATIC" for b in a.bonds):
            used += 1
        used = int(used + 0.5)
        vals = _effective_valences(a)
        for v in vals:
            if used <= v:
                a.radicals = v - used
                break
        else:
            a.radicals = 0


def _pi_electrons(mol: Mol, atom: Atom, ring: set) -> int | None:
    """Hückel pi-electron contribution of `atom` within `ring`;
    None -> atom cannot participate (sp3-like), ring not aromatic."""
    in_ring_double = exo_double = False
    for b in atom.bonds:
        other = b.other(atom.idx).idx
        if b.bond_type in ("DOUBLE", "AROMATIC"):
            if other in ring:
                in_ring_double = True
            else:
                exo_double = True
        elif b.bond_type == "TRIPLE":
            return None
    if atom.aromatic or in_ring_double:
        return 1
    if exo_double:
        return 0                              # e.g. quinone carbonyl carbon
    # saturated atom: heteroatom lone pair may contribute 2 (pyrrole N,
    # furan O, thiophene S); carbanion 2; carbocation 0
    q = atom.formal_charge
    if atom.symbol == "C":
        if q == 1:
            return 0
        if q == -1:
            return 2
        return None
    lp = (atom.valence_electrons - q - int(atom.bond_order_sum() + 0.5)
          - atom.implicit_hs - (atom.explicit_hs or 0)) // 2
    if lp > 0:
        return 2
    return None


def perceive_aromaticity(mol: Mol) -> None:
    """Hückel 4n+2 over basis rings, iterated to fixpoint, then over fused
    pairs (covers naphthalene-like systems written Kekulé)."""
    rings = [set(r) for r in mol.rings]
    changed = True
    guard = 0
    while changed and guard < 10:
        guard += 1
        changed = False
        candidates = list(rings)
        # fused pairs: union of two basis rings sharing an edge
        for i in range(len(rings)):
            for j in range(i + 1, len(rings)):
                if len(rings[i] & rings[j]) >= 2:
                    candidates.append(rings[i] | rings[j])
        for ring in candidates:
            if len(ring) < 3:
                continue
            if all(mol.atoms[a].aromatic for a in ring):
                continue
            pis = [_pi_electrons(mol, mol.atoms[a], ring) for a in ring]
            if any(p is None for p in pis):
                continue
            if sum(pis) % 4 == 2:
                for a in ring:
                    mol.atoms[a].aromatic = True
                changed = True
    # bonds between aromatic atoms within a ring become AROMATIC
    for b in mol.bonds:
        if (b.in_ring and mol.atoms[b.a1].aromatic and mol.atoms[b.a2].aromatic
                and _share_ring(mol, b.a1, b.a2)):
            b.bond_type = "AROMATIC"


def _share_ring(mol: Mol, a1: int, a2: int) -> bool:
    return any(a1 in r and a2 in r for r in mol.rings)


def compute_hybridization(mol: Mol) -> None:
    for a in mol.atoms:
        if a.aromatic:
            a.hybridization = "SP2"
            continue
        order_sum = int(a.bond_order_sum() + 0.5) + a.implicit_hs + (a.explicit_hs or 0)
        nonbonded = a.valence_electrons - a.formal_charge - order_sum - a.radicals
        lp = max(0, nonbonded // 2)
        sigma = a.total_sigma()
        # multiple bonds consume p orbitals: steric number = sigma + lone pairs
        sn = sigma + lp
        # sp-like corrections: cumulated/triple bonds
        n_double = sum(1 for b in a.bonds if b.bond_type == "DOUBLE")
        n_triple = sum(1 for b in a.bonds if b.bond_type == "TRIPLE")
        if n_triple or n_double >= 2:
            sn = min(sn, 2)
        elif n_double == 1:
            sn = min(sn, max(sigma + lp - 1, 3)) if sigma + lp > 3 else sn
            sn = min(sn, 3) if sigma <= 3 else sn
        a.hybridization = {0: "S", 1: "S", 2: "SP", 3: "SP2", 4: "SP3",
                           5: "SP3D", 6: "SP3D2"}.get(sn, "UNSPECIFIED")


def _can_conjugate(atom: Atom) -> bool:
    if atom.aromatic:
        return True
    if any(b.bond_type in ("DOUBLE", "TRIPLE", "AROMATIC") for b in atom.bonds):
        return True
    if atom.symbol in ("N", "O", "S", "P"):
        order_sum = int(atom.bond_order_sum() + 0.5) + atom.implicit_hs + (atom.explicit_hs or 0)
        lp = (atom.valence_electrons - atom.formal_charge - order_sum) // 2
        return lp > 0
    return False


def perceive_conjugation(mol: Mol) -> None:
    """RDKit-style: a bond is conjugated when both ends can hold an aligned
    p orbital (multiple bond / aromatic / heteroatom lone pair), and for a
    single bond at least one end has a multiple bond so there is actually an
    adjacent pi system."""
    for b in mol.bonds:
        a1, a2 = mol.atoms[b.a1], mol.atoms[b.a2]
        if b.bond_type == "AROMATIC":
            b.conjugated = True
            continue
        if not (_can_conjugate(a1) and _can_conjugate(a2)):
            b.conjugated = False
            continue
        if b.bond_type in ("DOUBLE", "TRIPLE"):
            # conjugated if an adjacent bond continues the pi system
            b.conjugated = any(
                ob is not b and ob.bond_type in ("DOUBLE", "TRIPLE", "AROMATIC")
                or (ob is not b and _can_conjugate(ob.other(end.idx)))
                for end in (a1, a2) for ob in end.bonds)
        else:
            has_pi = lambda atom: atom.aromatic or any(
                ob.bond_type in ("DOUBLE", "TRIPLE", "AROMATIC") for ob in atom.bonds)
            b.conjugated = has_pi(a1) or has_pi(a2)


def assign_double_bond_stereo(mol: Mol) -> None:
    """E/Z from directional single bonds (/ and \\), RDKit STEREOE/STEREOZ."""
    for b in mol.bonds:
        if b.bond_type != "DOUBLE" or b.in_ring:
            continue
        s1 = _end_direction(mol, b.a1, b)
        s2 = _end_direction(mol, b.a2, b)
        if s1 == 0 or s2 == 0:
            continue
        b.stereo = "STEREOE" if s1 * s2 < 0 else "STEREOZ"


def _end_direction(mol: Mol, atom_idx: int, dbond) -> int:
    for nb in mol.atoms[atom_idx].bonds:
        if nb is dbond or nb.direction == "NONE":
            continue
        sign = 1 if nb.direction == "ENDUPRIGHT" else -1
        # '/' means "up toward a2"; flip if the stereo atom is the bond start
        if nb.a1 == atom_idx:
            sign = -sign
        return sign
    return 0
