"""Inference-time structure acquisition.

Behavioral spec: reference inference/download_utils.py — acquire_pdbs (search
+ download + optional AF2 folding, subsetting the protein table to structures
that exist) and get_af2_from_uniprot_accession (AlphaFoldDB API or local
predownloaded AF-<acc>-F1 files, with sequence-offset subsetting; failed
lookups leave *_failed.txt marker files so reruns skip them).

The mdtraj-based sequence subsetting of the reference (:133-166) is replaced
by text-level PDB residue filtering using the in-tree parser.
"""
from __future__ import annotations

import glob
import gzip
import os
import shutil

import numpy as np
import pandas as pd

from caster_dta_tpu.data.acquire import create_comp_models, download_pdb_files
from caster_dta_tpu.data.featurize import definitions as defs

AF2_API = "https://alphafold.ebi.ac.uk/api/prediction/"


def acquire_pdbs(prot_df: pd.DataFrame, pdb_data_dir: str,
                 verbose_print: bool = False, do_comp_folds: bool = True,
                 require_completeness: bool = False) -> pd.DataFrame:
    """Download + optionally fold; subset to proteins with structure files
    (reference download_utils.py:14-60)."""
    download_pdb_files(prot_df["id"], prot_df["seq"], prot_df["file"],
                       overwrite=False, verbose_pdb_dl=verbose_print)
    if do_comp_folds:
        have = glob.glob(os.path.join(pdb_data_dir, "*.pdb"))
        missing = prot_df[~prot_df["file"].isin(have)]
        if len(missing):
            create_comp_models(missing["id"], missing["seq"], missing["file"],
                               verbose_comp_fold=verbose_print)
    have_ids = [os.path.basename(x).replace(".pdb", "")
                for x in glob.glob(os.path.join(pdb_data_dir, "*.pdb"))]
    still_missing = prot_df[~prot_df["id"].isin(have_ids)]
    if len(still_missing):
        if require_completeness:
            raise ValueError("Some proteins are still missing structures and "
                             "require_completeness is set")
        prot_df = prot_df[prot_df["id"].isin(have_ids)]
    return prot_df


def _pdb_sequence_and_residue_keys(pdb_text: str):
    """Per-residue (1-letter, residue key) in file order from ATOM records."""
    seq, keys, seen = [], [], set()
    for line in pdb_text.splitlines():
        if line[:6] not in ("ATOM  ", "HETATM"):
            continue
        if line[12:16].strip() != "CA":
            continue
        key = (line[21], line[22:26].strip(), line[26].strip())
        if key in seen:
            continue
        seen.add(key)
        seq.append(defs.PROTEIN_3LETTER_1LETTER_MAP[line[17:20].strip()])
        keys.append(key)
    return "".join(seq), keys


def _subset_pdb_from_residue(pdb_text: str, keep_keys: set) -> str:
    out = []
    for line in pdb_text.splitlines():
        if line[:6] in ("ATOM  ", "HETATM", "TER   "):
            key = (line[21], line[22:26].strip(), line[26].strip())
            if key not in keep_keys:
                continue
        out.append(line)
    return "\n".join(out) + "\n"


def get_af2_from_uniprot_accession(df: pd.DataFrame,
                                   local_predownload="./data/predownloaded_AF_preds",
                                   do_api: bool = True) -> pd.DataFrame:
    """AF2 structures by UniProt accession, subset to the requested sequence
    (reference download_utils.py:66-183)."""
    successful_rows = []
    for idx, row in df.iterrows():
        accession, sequence, out_file = row["id"], row["seq"], row["file"]
        split_dir, split_base = os.path.split(out_file)
        tmp_outfile = os.path.join(split_dir, f"tmp_{split_base}")
        failed_file = out_file.replace(".pdb", "_failed.txt")

        if os.path.exists(out_file):
            successful_rows.append(idx)
            continue
        if os.path.exists(failed_file):
            continue

        success = True
        predl = os.path.join(local_predownload,
                             f"AF-{accession}-F1-model_v4.pdb.gz")
        if os.path.exists(predl):
            with gzip.open(predl, "rb") as f_in, open(tmp_outfile, "wb") as f_out:
                shutil.copyfileobj(f_in, f_out)
        elif do_api:
            try:
                import requests
                resp = requests.get(AF2_API + accession, timeout=10)
                result = resp.json() if resp.status_code == 200 else []
                if not result:
                    success = False
                else:
                    dl = requests.get(result[0]["pdbUrl"], timeout=10)
                    with open(tmp_outfile, "wb") as f:
                        f.write(dl.content)
            except Exception:
                success = False
        else:
            continue  # no flag file when API disabled (reference :128-131)

        sub_text = None
        if success:
            with open(tmp_outfile) as f:
                pdb_text = f.read()
            md_seq, keys = _pdb_sequence_and_residue_keys(pdb_text)
            offset = md_seq.find(sequence)
            if offset == -1:
                success = False
            else:
                keep = set(keys[offset:])
                sub_text = _subset_pdb_from_residue(pdb_text, keep)

        if success and sub_text is not None:
            with open(out_file, "w") as f:
                f.write(sub_text)
            successful_rows.append(idx)
        else:
            with open(failed_file, "w") as f:
                f.write("Failed to download and acquire sequence as requested "
                        "from AF2 API or from local copy")
        if os.path.isfile(tmp_outfile):
            os.remove(tmp_outfile)
    return df.loc[successful_rows]
