"""Variant (rsID) -> protein reference/alternate sequences.

Behavioral spec: reference inference/variant_to_protein.py:6-163. Network
workflow reproduced: Ensembl variant_recoder POST for rsID -> protein HGVS
(NP_ accessions), Mutalyzer GET for HGVS -> mutated sequence (ref uses
':p.='), with per-variant JSON and per-sequence text caches for offline
resumability, and '*'-termination trimming.
"""
from __future__ import annotations

import json
import os

ENSEMBL_RECODER = "https://rest.ensembl.org/variant_recoder/homo_sapiens"
MUTALYZER_MUTATE = "https://mutalyzer.nl/api/mutate/"


def process_seq(seq: str) -> str:
    """Trim at the termination character (reference :154-163)."""
    return seq.split("*")[0]


def variant_to_protein_seq(var_dict: dict, cache_dir: str,
                           force_requery: bool = False):
    """var_dict: {variant_name: rsID}. Returns
    ({variant_name: {ref_id: [...], alt_id: [...]}}, {protein_id: sequence})."""
    import requests

    var_cache = os.path.join(cache_dir, "variants")
    seq_cache = os.path.join(cache_dir, "sequences")
    os.makedirs(var_cache, exist_ok=True)
    os.makedirs(seq_cache, exist_ok=True)

    var_ids = sorted(set(var_dict.values()))
    all_var, uniq_seq = {}, {}

    pending = []
    for var_id in var_ids:
        f = os.path.join(var_cache, f"{var_id}.json")
        if not force_requery and os.path.exists(f):
            with open(f) as fh:
                all_var[var_id] = json.load(fh)
        else:
            pending.append(var_id)

    if pending:
        resp = requests.post(
            ENSEMBL_RECODER, headers={"Content-Type": "application/json",
                                      "Accept": "application/json"},
            data=json.dumps({"ids": pending}), timeout=120)
        resp.raise_for_status()
        for var_id, var_resp in zip(pending, resp.json()):
            alt_ids = []
            for _, allele in var_resp.items():
                if not isinstance(allele, dict):
                    continue
                alt_ids.extend(x for x in allele.get("hgvsp", [])
                               if x.startswith("NP_"))
            alt_ids = sorted(set(alt_ids))
            ref_ids = sorted(set(x.split(":")[0] for x in alt_ids))
            all_var[var_id] = {"ref_id": ref_ids, "alt_id": alt_ids}

    ref_ids = sorted(set(x for v in all_var.values() for x in v["ref_id"]))
    alt_ids = sorted(set(x for v in all_var.values() for x in v["alt_id"]))

    def fetch(pid, hgvs):
        f = os.path.join(seq_cache, f"{pid}.txt")
        if not force_requery and os.path.exists(f):
            with open(f) as fh:
                return fh.read()
        r = requests.get(MUTALYZER_MUTATE + hgvs,
                         headers={"accept": "application/json"}, timeout=120)
        return process_seq(r.json()["sequence"]["seq"])

    for rid in ref_ids:
        uniq_seq[rid] = fetch(rid, f"{rid}:p.=")
    for aid in alt_ids:
        uniq_seq[aid] = fetch(aid, aid)

    for var_id, data in all_var.items():
        f = os.path.join(var_cache, f"{var_id}.json")
        if not os.path.exists(f) or force_requery:
            with open(f, "w") as fh:
                json.dump(data, fh)
    for pid, seq in uniq_seq.items():
        f = os.path.join(seq_cache, f"{pid}.txt")
        if not os.path.exists(f) or force_requery:
            with open(f, "w") as fh:
                fh.write(seq)

    ids_to_name = {v: k for k, v in var_dict.items()}
    return ({ids_to_name[k]: v for k, v in all_var.items()}, uniq_seq)
