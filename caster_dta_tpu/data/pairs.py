"""Protein-molecule pair dataset: dedup graph stores, target scaling,
feature metadata.

Behavioral spec: reference dataset/dual_dataset.py:25-399
(ProteinMoleculeDataset). Same canonical 6-column DataFrame contract
(protein_id, protein_sequence, protein_file, molecule_id, molecule_smiles,
affinity_score), same composable standardize/minmax/log target scaling with
the same JSON artifact schema, same metadata dict keys consumed by model
constructors (train_model.py:277-299). Graphs are stored unpadded (numpy) and
padded per bucket at batch time (data/batching.py).
"""
from __future__ import annotations

import multiprocessing
from functools import partial
from typing import Optional

import numpy as np

from caster_dta_tpu.data import build
from caster_dta_tpu.data.featurize import pdb as pdb_feat
from caster_dta_tpu.data.featurize import smiles as smiles_feat


def _protein_file_to_graph(protein_file, dist_units, edge_thresh, thresh_type,
                           keep_self_loops, vectorize_features, add_esm2_embeds,
                           add_residue_posenc, include_aa_props):
    # native fused path: C++ threshold+featurize emitting COO directly
    # (csrc/caster_host.cpp), avoiding the dense n*n edge tensors
    g = build.protein_graph_fused(
        protein_file, dist_units, edge_thresh, thresh_type, keep_self_loops,
        vectorize_features, add_esm2_embeds, add_residue_posenc, include_aa_props)
    if g is not None:
        return g
    nf, ef, nt, et = pdb_feat.process_pdb(
        protein_file, dist_units, edge_thresh, thresh_type, keep_self_loops,
        vectorize_features, add_esm2_embeds, add_residue_posenc, include_aa_props)
    return build.dense_to_graph(nf, ef, nt, et)


def _molecule_smiles_to_graph(smiles, molecule_full_atomtype,
                              molecule_onehot_ordinal_feats,
                              molecule_include_selfloops):
    nf, ef, nt, et = smiles_feat.process_smiles(
        smiles, molecule_full_atomtype, molecule_onehot_ordinal_feats,
        molecule_include_selfloops)
    return build.dense_to_graph(nf, ef, nt, et)


class ProteinMoleculeDataset:
    """Dedup'd protein/molecule graph stores + pair index + scaled targets."""

    def __init__(self, paired_dataframe, sparse_edges=False,
                 protein_dist_units="nanometers",
                 protein_edge_thresh=1.0, protein_thresh_type="dist",
                 protein_keep_selfloops=False,
                 protein_vector_features=True,
                 protein_include_esm2=False,
                 protein_include_residue_posenc=False,
                 protein_include_aa_props=True,
                 molecule_full_atomtype=False,
                 molecule_onehot_ordinal_feats=False,
                 molecule_include_selfloops=False,
                 scale_output=None,
                 n_workers: Optional[int] = None):
        df = paired_dataframe.reset_index(drop=True)
        self.dataframe = df
        self.scale_output = [scale_output] if isinstance(scale_output, str) else scale_output
        self.sparse_edges = sparse_edges  # kept for kwargs-schema parity
        self.protein_dist_units = protein_dist_units
        self.protein_edge_thresh = protein_edge_thresh
        self.protein_thresh_type = protein_thresh_type
        self.protein_keep_selfloops = protein_keep_selfloops
        self.protein_vector_features = protein_vector_features
        self.protein_include_esm2 = protein_include_esm2
        self.protein_include_residue_posenc = protein_include_residue_posenc
        self.protein_include_aa_props = protein_include_aa_props
        self.molecule_full_atomtype = molecule_full_atomtype
        self.molecule_onehot_ordinal_feats = molecule_onehot_ordinal_feats
        self.molecule_include_selfloops = molecule_include_selfloops

        mol_fn = partial(_molecule_smiles_to_graph,
                         molecule_full_atomtype=molecule_full_atomtype,
                         molecule_onehot_ordinal_feats=molecule_onehot_ordinal_feats,
                         molecule_include_selfloops=molecule_include_selfloops)
        prot_fn = partial(_protein_file_to_graph,
                          dist_units=protein_dist_units,
                          edge_thresh=protein_edge_thresh,
                          thresh_type=protein_thresh_type,
                          keep_self_loops=protein_keep_selfloops,
                          vectorize_features=protein_vector_features,
                          add_esm2_embeds=protein_include_esm2,
                          add_residue_posenc=protein_include_residue_posenc,
                          include_aa_props=protein_include_aa_props)

        mol_df = df[["molecule_id", "molecule_smiles"]].drop_duplicates()
        self.molecule_data = dict(zip(
            mol_df["molecule_id"],
            _parallel_map(mol_fn, mol_df["molecule_smiles"].tolist(), n_workers)))
        prot_df = df[["protein_id", "protein_sequence", "protein_file"]].drop_duplicates()
        self.protein_data = dict(zip(
            prot_df["protein_id"],
            _parallel_map(prot_fn, prot_df["protein_file"].tolist(), n_workers)))
        # sorted stores for run-to-run consistency (dual_dataset.py:352-353,391-392)
        self.molecule_data = {k: self.molecule_data[k] for k in sorted(self.molecule_data)}
        self.protein_data = {k: self.protein_data[k] for k in sorted(self.protein_data)}

        self.affinity_data = np.asarray(df["affinity_score"].values, np.float32)
        self.pair_indices = {i: (p, m) for i, (p, m) in
                             enumerate(zip(df["protein_id"], df["molecule_id"]))}
        self.idx_protein_strat = df["protein_id"].astype("category").cat.codes.values
        self.idx_molecule_strat = df["molecule_id"].astype("category").cat.codes.values

        if self.scale_output is not None:
            self._init_scale_target()
        self.metadata_dict = self._get_feature_metadata()

    # ------------------------------------------------------------------ basic
    def __len__(self):
        return len(self.affinity_data)

    def __getitem__(self, idx):
        pid, mid = self.pair_indices[idx]
        return self.protein_data[pid], self.molecule_data[mid], self.affinity_data[idx]

    def __str__(self):
        md = self.metadata_dict
        aff = self.affinity_data
        return (
            "ProteinMoleculeDataset:\n"
            f"\t{len(self)} protein-molecule pairs and targets\n"
            f"\t{len(self.protein_data)} unique proteins\n"
            f"\t{len(self.molecule_data)} unique molecules\n"
            f"\tProtein edge threshold (type): {self.protein_edge_thresh} "
            f"({self.protein_thresh_type})\n"
            f"\tFeature metadata: {md}\n"
            f"\ttarget rescaling: {self.scale_output}; "
            f"min {aff.min():.4f} max {aff.max():.4f} "
            f"mean {aff.mean():.4f} std {aff.std(ddof=1):.4f}\n")

    # ---------------------------------------------------------------- scaling
    def _init_scale_target(self):
        for scale_type in self.scale_output:
            self._perform_scale_type(scale_type)

    def _perform_scale_type(self, scale_type):
        a = self.affinity_data
        if scale_type == "standardize":
            self.scale_mean_factor = float(np.mean(a))
            std = float(np.std(a, ddof=1))  # torch.std is unbiased
            # constant targets (e.g. inference cross-products filled with 0.0)
            # would otherwise produce NaNs; the real factors are re-loaded from
            # the checkpoint's rescale params in that case
            self.scale_std_factor = std if std > 0 else 1.0
            self.affinity_data = (a - self.scale_mean_factor) / self.scale_std_factor
        if scale_type == "minmax":
            self.scale_min_factor = float(np.min(a))
            self.scale_max_factor = float(np.max(a))
            a = (a - self.scale_min_factor) / (self.scale_max_factor - self.scale_min_factor)
            self.affinity_data = a * 2 - 1
        if scale_type == "log":
            self.affinity_data = np.log1p(a)

    def unscale_target(self, values):
        values = np.asarray(values)
        for scale_type in self.scale_output[::-1]:
            if scale_type == "standardize":
                values = values * self.scale_std_factor + self.scale_mean_factor
            if scale_type == "minmax":
                values = (values + 1) * 0.5
                values = values * (self.scale_max_factor - self.scale_min_factor) \
                    + self.scale_min_factor
            if scale_type == "log":
                values = np.expm1(values)
        return values

    def _report_scale_data(self) -> dict:
        """Same JSON schema as reference dataset_rescale_params.json
        (dual_dataset.py:219-243)."""
        out = {"scale_output": self.scale_output}
        for scale_type in self.scale_output:
            d = {}
            if scale_type == "standardize":
                d = {"scale_mean_factor": self.scale_mean_factor,
                     "scale_std_factor": self.scale_std_factor}
            if scale_type == "minmax":
                d = {"scale_min_factor": self.scale_min_factor,
                     "scale_max_factor": self.scale_max_factor}
            out[scale_type] = d
        return out

    def _load_scale_data_from_dict(self, scale_data_dict):
        self.scale_output = scale_data_dict["scale_output"]
        for scale_type in self.scale_output:
            d = scale_data_dict[scale_type]
            if scale_type == "standardize":
                self.scale_mean_factor = float(d["scale_mean_factor"])
                self.scale_std_factor = float(d["scale_std_factor"])
            if scale_type == "minmax":
                self.scale_min_factor = float(d["scale_min_factor"])
                self.scale_max_factor = float(d["scale_max_factor"])

    # --------------------------------------------------------------- metadata
    def _get_feature_metadata(self) -> dict:
        pg = next(iter(self.protein_data.values()))
        mg = next(iter(self.molecule_data.values()))
        (p_ns, p_nv), (p_es, p_ev) = build.graph_feature_shapes(pg)
        (m_ns, m_nv), (m_es, m_ev) = build.graph_feature_shapes(mg)

        def _shape(s, v):
            return (s, v) if v else s

        return {
            "protein_node_features": _shape(p_ns, p_nv),
            "protein_edge_features": _shape(p_es, p_ev),
            "molecule_node_features": _shape(m_ns, m_nv),
            "molecule_edge_features": _shape(m_es, m_ev),
            "protein_node_types": self._num_types("protein", "node"),
            "protein_edge_types": self._num_types("protein", "edge"),
            "molecule_node_types": self._num_types("molecule", "node"),
            "molecule_edge_types": self._num_types("molecule", "edge"),
        }

    def _num_types(self, graph_type, entity_type):
        store = self.protein_data if graph_type == "protein" else self.molecule_data
        key = f"{entity_type}_type"
        return int(max(int(g[key].max()) if g[key].size else 0
                       for g in store.values())) + 1


def _parallel_map(fn, items, n_workers):
    if n_workers == 0 or len(items) < 8:
        return [fn(x) for x in items]
    with multiprocessing.Pool(n_workers) as pool:
        return list(pool.imap(fn, items, chunksize=8))
