"""Batched model evaluation over a dataset -> tidy results DataFrame.

Behavioral spec: reference inference/evaluation.py:9-125 — unscaled
predictions, per-pair cross-attention matrices trimmed to real lengths (both
directions), mean/max-pooled per-node attention profiles, optional node-mask
explanations softmaxed per graph. Unlike the reference (whose loader shuffles
even with shuffle=False due to the sampler-arg swap noted at its lines 12-14),
iteration order is deterministic here.
"""
from __future__ import annotations

import jax
import numpy as np
import pandas as pd

from caster_dta_tpu.data.batching import BucketedLoader
from caster_dta_tpu.inference.explain import DTAModelExplainer


def run_model_on_dataset(model, variables, dataset, max_batch_size: int = 8,
                         max_num: int = 4_000_000, do_explainer: bool = True,
                         explainer_epochs: int = 10) -> pd.DataFrame:
    loader = BucketedLoader(dataset, max_num=max_num,
                            max_batch_size=max_batch_size, shuffle=False)
    explainer = DTAModelExplainer(model, n_epochs=explainer_epochs) \
        if do_explainer else None

    @jax.jit
    def forward(variables, protein, molecule):
        return model.apply(variables, protein, molecule, deterministic=True)

    rows = {k: [] for k in [
        "protein_id", "molecule_id", "affinity_score", "protein_attention",
        "molecule_attention", "max_protein_attention", "max_molecule_attention",
        "prot_mol_attention", "mol_prot_attention", "protein_explanation",
        "molecule_explanation", "protein_edge_explanation",
        "molecule_edge_explanation", "protein_len", "molecule_len",
        "pair_idx"]}

    for batch in loader:
        pred, attn = forward(variables, batch.protein, batch.molecule)
        pred = dataset.unscale_target(np.asarray(pred)[:, 0])
        # first cross-attn layer weights (reference evaluation.py:56-57):
        # w_rd = residues->atoms [B, R, A]; w_dr = atoms->residues [B, A, R]
        w_rd, w_dr = (np.asarray(w) for w in attn[0])
        p_lens = np.asarray(batch.protein.n_node)
        m_lens = np.asarray(batch.molecule.n_node)

        exp = None
        if explainer is not None:
            exp = explainer.explain_model(variables, batch.protein, batch.molecule)

        for k in range(len(pred)):
            if batch.weight[k] == 0:
                continue
            i = int(batch.pair_idx[k])
            pid, mid = dataset.pair_indices[i]
            plen, mlen = int(p_lens[k]), int(m_lens[k])
            # reference naming: prot_drug_attns = attn_mats[0][1] (atoms->res),
            # drug_prot_attns = attn_mats[0][0] (res->atoms), then sliced
            pd_attn = w_dr[k][:mlen, :plen]     # [A, R]
            dp_attn = w_rd[k][:plen, :mlen]     # [R, A]
            rows["protein_id"].append(pid)
            rows["molecule_id"].append(mid)
            rows["affinity_score"].append(float(pred[k]))
            rows["protein_attention"].append(pd_attn.mean(axis=0))
            rows["molecule_attention"].append(dp_attn.mean(axis=0))
            rows["max_protein_attention"].append(pd_attn.max(axis=0))
            rows["max_molecule_attention"].append(dp_attn.max(axis=0))
            rows["prot_mol_attention"].append(pd_attn)
            rows["mol_prot_attention"].append(dp_attn)
            if exp is not None:
                pm = np.asarray(exp["protein"][k][:plen])
                mm = np.asarray(exp["molecule"][k][:mlen])
                rows["protein_explanation"].append(_softmax(pm))
                rows["molecule_explanation"].append(_softmax(mm))
                pelen = int(np.asarray(batch.protein.n_edge)[k])
                melen = int(np.asarray(batch.molecule.n_edge)[k])
                rows["protein_edge_explanation"].append(
                    np.asarray(exp["protein_edges"][k][:pelen]))
                rows["molecule_edge_explanation"].append(
                    np.asarray(exp["molecule_edges"][k][:melen]))
            else:
                rows["protein_explanation"].append(None)
                rows["molecule_explanation"].append(None)
                rows["protein_edge_explanation"].append(None)
                rows["molecule_edge_explanation"].append(None)
            rows["protein_len"].append(plen)
            rows["molecule_len"].append(mlen)
            rows["pair_idx"].append(i)

    df = pd.DataFrame(rows).sort_values("pair_idx").reset_index(drop=True)
    df["max_protein_explanation"] = df["protein_explanation"]
    df["max_molecule_explanation"] = df["molecule_explanation"]
    return df


def _softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()
