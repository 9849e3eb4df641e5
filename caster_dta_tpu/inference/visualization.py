"""Attention/explanation visualization.

Behavioral spec: reference inference/visualization_utils.py — 2D molecule
drawings with per-atom attention highlighting, protein renders colored by
per-residue attention, and ref/alt/difference grids.

The reference depends on RDKit drawing and headless PyMOL; neither is in this
image, so both are optional backends: if importable they are used (same
behavior), otherwise portable matplotlib fallbacks render (2D molecule layout
from a force-directed embedding of the bond graph; protein as a 3D CA trace
colored by attention).
"""
from __future__ import annotations

import numpy as np


def _mol_layout(mol):
    """2D coordinates for atoms via force-directed layout of the bond graph."""
    import networkx as nx
    g = nx.Graph()
    g.add_nodes_from(range(mol.GetNumAtoms()))
    g.add_edges_from((b.a1, b.a2) for b in mol.bonds)
    pos = nx.kamada_kawai_layout(g) if g.number_of_edges() else \
        {i: (i, 0.0) for i in g.nodes}
    return np.asarray([pos[i] for i in range(mol.GetNumAtoms())])


def draw_mol_with_attn(smiles: str, attn_weights, out_file: str,
                       cmap: str = "Reds"):
    """2D molecule drawing with per-atom attention alpha
    (reference visualization_utils.py:10-23)."""
    attn = np.asarray(attn_weights, dtype=float)
    attn = attn / max(attn.max(), 1e-12)
    try:
        from rdkit import Chem
        from rdkit.Chem.Draw import rdMolDraw2D
        mol = Chem.MolFromSmiles(smiles)
        d = rdMolDraw2D.MolDraw2DCairo(600, 600)
        colors = {i: (1.0, 1.0 - a, 1.0 - a, 0.6) for i, a in enumerate(attn)}
        rdMolDraw2D.PrepareAndDrawMolecule(
            d, mol, highlightAtoms=list(range(len(attn))),
            highlightAtomColors={i: c[:3] for i, c in colors.items()})
        d.FinishDrawing()
        with open(out_file, "wb") as f:
            f.write(d.GetDrawingText())
        return out_file
    except ImportError:
        pass

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from caster_dta_tpu.data.featurize.chem import mol_from_smiles

    mol = mol_from_smiles(smiles)
    pos = _mol_layout(mol)
    fig, ax = plt.subplots(figsize=(6, 6))
    for b in mol.bonds:
        p, q = pos[b.a1], pos[b.a2]
        lw = {"SINGLE": 1.5, "DOUBLE": 3.0, "TRIPLE": 4.0, "AROMATIC": 2.5}.get(
            b.bond_type, 1.5)
        ax.plot([p[0], q[0]], [p[1], q[1]], color="0.3", lw=lw, zorder=1)
    sc = ax.scatter(pos[:, 0], pos[:, 1], c=attn[:len(pos)], cmap=cmap,
                    s=420, zorder=2, edgecolors="k")
    for i, a in enumerate(mol.GetAtoms()):
        ax.annotate(a.symbol, pos[i], ha="center", va="center", zorder=3)
    fig.colorbar(sc, ax=ax, label="attention")
    ax.set_axis_off()
    fig.savefig(out_file, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_file


def draw_protein_with_attn(pdb_file: str, attn_weights, out_file: str,
                           cmap: str = "Reds"):
    """Protein render colored by per-residue attention; PyMOL B-factor
    spectrum when available (reference visualization_utils.py:26-78), else a
    matplotlib 3D CA trace."""
    attn = np.asarray(attn_weights, dtype=float)
    try:
        import pymol2
        with pymol2.PyMOL() as p:
            p.cmd.load(pdb_file, "prot")
            p.cmd.alter("prot", "b=0.0")
            for i, a in enumerate(attn):
                p.cmd.alter(f"prot and resi {i + 1}", f"b={float(a)}")
            p.cmd.spectrum("b", "white_red", "prot")
            p.cmd.show_as("cartoon", "prot")
            p.cmd.set("ray_opaque_background", 0)
            p.cmd.png(out_file, width=1200, height=1200, dpi=150, ray=1)
        return out_file
    except ImportError:
        pass

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from caster_dta_tpu.data.featurize.pdb import load_backbone_coords

    coords, _ = load_backbone_coords(pdb_file)
    ca = coords[:, 1, :] * 10
    n = min(len(ca), len(attn))
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    ax.plot(ca[:, 0], ca[:, 1], ca[:, 2], color="0.6", lw=1)
    sc = ax.scatter(ca[:n, 0], ca[:n, 1], ca[:n, 2], c=attn[:n], cmap=cmap,
                    s=30)
    fig.colorbar(sc, ax=ax, shrink=0.6, label="attention")
    ax.set_axis_off()
    fig.savefig(out_file, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_file


def draw_protein_difference(ref_file: str, alt_file: str, ref_attn, alt_attn,
                            out_file: str, top_k_labels: int = 5):
    """Ref/alt/difference grid with top-residue labels
    (reference visualization_utils.py:81-191)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from caster_dta_tpu.data.featurize.pdb import load_backbone_coords

    ref_attn = np.asarray(ref_attn, float)
    alt_attn = np.asarray(alt_attn, float)
    n = min(len(ref_attn), len(alt_attn))
    diff = alt_attn[:n] - ref_attn[:n]

    fig = plt.figure(figsize=(18, 6))
    for j, (f, a, title, cmap) in enumerate([
            (ref_file, ref_attn, "reference", "Reds"),
            (alt_file, alt_attn, "alternate", "Reds"),
            (alt_file, diff, "difference (alt - ref)", "coolwarm")]):
        coords, _ = load_backbone_coords(f)
        ca = coords[:, 1, :] * 10
        m = min(len(ca), len(a))
        ax = fig.add_subplot(1, 3, j + 1, projection="3d")
        ax.plot(ca[:, 0], ca[:, 1], ca[:, 2], color="0.7", lw=1)
        sc = ax.scatter(ca[:m, 0], ca[:m, 1], ca[:m, 2], c=a[:m], cmap=cmap, s=25)
        top = np.argsort(-np.abs(a[:m]))[:top_k_labels]
        for t in top:
            ax.text(ca[t, 0], ca[t, 1], ca[t, 2], str(t + 1), fontsize=8)
        ax.set_title(title)
        ax.set_axis_off()
        fig.colorbar(sc, ax=ax, shrink=0.5)
    fig.savefig(out_file, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_file
