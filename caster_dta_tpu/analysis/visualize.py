"""Result visualization drivers for the three downstream tasks.

Behavioral spec: reference visualize_biolip_results.py (binding vs
non-binding attention paired t-tests + histograms + length scatterplots),
visualize_variation_results.py (ref/alt/diff structure grids + molecule
attention drawings per variant-drug pair), visualize_binder_results.py
(percentile filtering of screen scores + per-protein top-drug rendering).
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
from scipy import stats

from caster_dta_tpu.inference import visualization as viz


def visualize_biolip_results(results_df: pd.DataFrame, output_dir: str,
                             base_score: str = "attention",
                             num_bins: int = 41) -> dict:
    """Binding-site recovery statistics (reference
    visualize_biolip_results.py:40-156). Returns the t-test results."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_dir = os.path.join(output_dir, base_score)
    os.makedirs(output_dir, exist_ok=True)
    df = results_df.copy()

    df["binding_residues"] = df["binding_residues"].str.split(" ")
    df["binding_residue_pos"] = df["binding_residues"].map(
        lambda x: [int(y[1:]) for y in x if y != ""])

    def binding_scores(row):
        attn = row[f"protein_{base_score}"]
        return np.array([attn[i - 1] for i in row["binding_residue_pos"]
                         if 0 < i <= len(attn)])

    def nonbinding_scores(row):
        attn = row[f"protein_{base_score}"]
        pos = set(row["binding_residue_pos"])
        return np.array([attn[i - 1] for i in range(1, len(attn) + 1)
                         if i not in pos])

    df["bind_scores"] = df.apply(binding_scores, axis=1)
    df["nonbind_scores"] = df.apply(nonbinding_scores, axis=1)
    df = df[df["bind_scores"].map(len) > 0]
    df["mean_bind"] = df["bind_scores"].map(np.mean)
    df["mean_nonbind"] = df["nonbind_scores"].map(np.mean)
    plen = df["protein_sequence"].str.len()
    df["mean_bind_scaled"] = df.apply(
        lambda r: np.mean(np.log10(r["bind_scores"] * len(r["protein_sequence"])
                                   + 1e-30)), axis=1)
    df["mean_nonbind_scaled"] = df.apply(
        lambda r: np.mean(np.log10(r["nonbind_scores"] * len(r["protein_sequence"])
                                   + 1e-30)), axis=1)

    out = {}
    for suffix, a, b in [("", "mean_bind", "mean_nonbind"),
                         ("_scaled", "mean_bind_scaled", "mean_nonbind_scaled")]:
        t, p = stats.ttest_rel(df[a], df[b])
        out[f"ttest{suffix}"] = {"t": float(t), "p": float(p)}
        diff = df[a] - df[b]
        absmax = abs(diff.max()) if len(diff) else 1.0
        fig, ax = plt.subplots()
        ax.hist(diff, bins=np.linspace(-absmax, absmax, num_bins))
        ax.axvline(diff.mean(), color="k", linestyle="dashed", linewidth=1.2)
        ax.text(0.7, 0.9, f"Paired t-test\nt = {t:.4f}\np = {p:.3e}",
                ha="left", va="top", transform=ax.transAxes)
        ax.set_xlabel("Difference")
        ax.set_ylabel("Frequency")
        ax.set_title("Difference in Average Attention (Binding - Nonbinding)")
        fig.savefig(os.path.join(
            output_dir, f"diff_binding_nonbinding_residue_{base_score}{suffix}_hist.png"),
            dpi=300)
        plt.close(fig)

        fig, ax = plt.subplots()
        ax.scatter(plen, diff, alpha=0.5, s=5)
        ax.set_xlabel("Protein Length")
        ax.set_ylabel("Difference (Binding - Nonbinding)")
        fig.savefig(os.path.join(
            output_dir,
            f"diff_binding_nonbinding_residue_{base_score}{suffix}_vs_protein_length.png"),
            dpi=300)
        plt.close(fig)
    return out


def visualize_variation_results(delta_df: pd.DataFrame, output_dir: str,
                                attn_type: str = "attention",
                                max_pairs: int | None = None):
    """Ref/alt/diff grids + molecule attention drawings per variant-drug pair
    (reference visualize_variation_results.py)."""
    os.makedirs(output_dir, exist_ok=True)
    rows = delta_df if max_pairs is None else delta_df.head(max_pairs)
    outputs = []
    for _, row in rows.iterrows():
        tag = f"{row['variant_id']}__{row['molecule_id']}"
        grid = os.path.join(output_dir, f"{tag}_structures.png")
        viz.draw_protein_difference(
            row["ref_file"], row["alt_file"],
            row[f"ref_prot_{attn_type}"], row[f"alt_prot_{attn_type}"], grid)
        mol_png = os.path.join(output_dir, f"{tag}_molecule.png")
        viz.draw_mol_with_attn(row["molecule_smiles"],
                               row[f"alt_mol_{attn_type}"], mol_png)
        outputs.append((grid, mol_png))
    return outputs


def visualize_binder_results(results_df: pd.DataFrame, output_dir: str,
                             percentile: float = 99.0,
                             draw_top: int = 3):
    """Percentile filtering of screen scores + top-drug renders
    (reference visualize_binder_results.py:64-82)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    thresh = np.percentile(results_df["affinity_score"], percentile)
    top_df = results_df[results_df["affinity_score"] >= thresh]
    top_df.to_csv(os.path.join(output_dir, "top_percentile_binders.csv"),
                  index=False)

    fig, ax = plt.subplots()
    ax.hist(results_df["affinity_score"], bins=50)
    ax.axvline(thresh, color="r", linestyle="dashed",
               label=f"{percentile}th percentile")
    ax.set_xlabel("Predicted affinity")
    ax.set_ylabel("Count")
    ax.legend()
    fig.savefig(os.path.join(output_dir, "affinity_histogram.png"), dpi=300)
    plt.close(fig)

    drawn = []
    for _, row in top_df.nlargest(draw_top, "affinity_score").iterrows():
        if row.get("molecule_attention") is None:
            continue
        png = os.path.join(
            output_dir, f"{row['protein_id']}__{row['molecule_id']}.png")
        viz.draw_mol_with_attn(row["molecule_smiles"],
                               row["molecule_attention"], png)
        drawn.append(png)
    return top_df, drawn
