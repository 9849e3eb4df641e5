"""Dataset registry: davis, kiba, metz, bindingdb[_kd/ki/ic50/ec50], belka,
plinder -> canonical 6-column DataFrame.

Behavioral spec: reference dataset/load_data.py:28-389. Columns:
protein_id, protein_sequence, protein_file, molecule_id, molecule_smiles,
affinity_score (+ optional 'split'). Network acquisition of structures is a
separate layer (data/acquire.py); loaders here accept a structures_dir of
pre-downloaded PDB files and drop proteins whose structure is missing
(mirroring process_data.py:133-143).
"""
from __future__ import annotations

import hashlib
import json
import os
import pickle
from collections import OrderedDict
from typing import Optional

import numpy as np
import pandas as pd

from caster_dta_tpu.data.featurize.smiles import validate_smiles


def _affinity_to_dataframe(proteins: "OrderedDict", ligands: "OrderedDict",
                           affinity: np.ndarray, structures_dir: Optional[str],
                           skip_missing_structures: bool = True) -> pd.DataFrame:
    """(proteins, ligands, ligand×protein affinity matrix) -> canonical rows
    (reference process_data.py:55-78 builds the same full_data frame)."""
    rows = []
    prot_ids = list(proteins.keys())
    lig_ids = list(ligands.keys())
    affinity = np.asarray(affinity, dtype=np.float64)
    lig_idx, prot_idx = np.nonzero(~np.isnan(affinity))
    for li, pi in zip(lig_idx, prot_idx):
        pid, mid = prot_ids[pi], lig_ids[li]
        pfile = (os.path.join(structures_dir, f"{pid}.pdb")
                 if structures_dir else "")
        rows.append((pid, proteins[pid], pfile, mid, ligands[mid],
                     float(affinity[li, pi])))
    df = pd.DataFrame(rows, columns=["protein_id", "protein_sequence",
                                     "protein_file", "molecule_id",
                                     "molecule_smiles", "affinity_score"])
    if structures_dir and skip_missing_structures:
        exists = df["protein_file"].map(os.path.exists)
        df = df[exists].reset_index(drop=True)
    return df


def load_davis_kiba(name: str, data_root: str, structures_dir=None,
                    transform_davis_y: bool = True):
    """DeepDTA-format davis/kiba (reference load_data.py:86-91). The Davis Y
    matrix is Kd in nM; the standard transform is -log10(Kd/1e9) (the vendored
    Y file is already transformed)."""
    path = os.path.join(data_root, name)
    proteins = json.load(open(os.path.join(path, "proteins.txt")),
                         object_pairs_hook=OrderedDict)
    ligands = json.load(open(os.path.join(path, "ligands_iso.txt")),
                        object_pairs_hook=OrderedDict)
    with open(os.path.join(path, "Y"), "rb") as f:
        affinity = pickle.load(f, encoding="latin1")
    return _affinity_to_dataframe(proteins, ligands, np.asarray(affinity),
                                  structures_dir)


def load_metz(data_root: str, structures_dir=None):
    """Metz interaction CSVs (reference load_data.py:94-129)."""
    path = os.path.join(data_root, "metz")
    inter = pd.read_csv(os.path.join(path, "Metz_interaction.csv"))
    prot = pd.read_csv(os.path.join(path, "prot_info.csv"))
    drug_cols = ["PUBCHEM_SID", "Canonical_Smiles"]
    prot_cols = prot["name"].tolist()
    inter = inter.dropna(subset=drug_cols)[drug_cols + prot_cols]
    inter["PUBCHEM_SID"] = inter["PUBCHEM_SID"].astype(int).astype(str)
    ligands = OrderedDict(zip(inter["PUBCHEM_SID"], inter["Canonical_Smiles"]))
    proteins = OrderedDict(zip(prot["name"], prot["sequence"]))
    vals = inter.drop(columns=drug_cols).replace("<", np.nan, regex=True).astype(float)
    return _affinity_to_dataframe(proteins, ligands, vals.values, structures_dir)


def load_bindingdb(data_root: str, task: str = "kd", structures_dir=None,
                   min_len: int = 25, max_len: int = 3000):
    """BindingDB_All.tsv parse (reference load_data.py:132-252): -log10(nM/1e9)
    transform, SMILES validation, dupe-pair mean-averaging, name+hash ids,
    25<=len<=3000 protein filter."""
    path = os.path.join(data_root, "bindingdb")
    col = {"kd": "Kd (nM)", "ki": "Ki (nM)", "ic50": "IC50 (nM)",
           "ec50": "EC50 (nM)"}[task]
    cache = os.path.join(path, f"BindingDB_All.tsv_parsed_{task}.pkl")
    if os.path.exists(cache):
        bdb = pd.read_pickle(cache)
    else:
        tsv = os.path.join(path, "BindingDB_All.tsv")
        if not os.path.exists(tsv):
            raise FileNotFoundError(
                f"{tsv} not present — the raw BindingDB dump (~1 GB) is not "
                "vendored and this sandbox has no network egress, so the "
                "bindingdb datasets cannot be built here. Download "
                "BindingDB_All.tsv from bindingdb.org into that directory "
                "(or point --data-root at a tree that has it), or use one of "
                "davis/kiba/metz instead.")
        bdb = pd.read_csv(tsv, sep="\t",
                          on_bad_lines="skip", low_memory=False)
        keep = ["BindingDB Ligand Name", "Ligand SMILES", "Target Name",
                "BindingDB Target Chain Sequence", col]
        bdb = bdb[keep]
        bdb[col] = pd.to_numeric(bdb[col], errors="coerce")
        bdb = bdb.dropna(subset=[col])
        bdb[col] = -np.log10(bdb[col] / 1e9)
        bdb = bdb[np.isfinite(bdb[col])]
        bdb = bdb[bdb["Ligand SMILES"].map(validate_smiles)]
        nodupe = bdb.drop_duplicates(
            subset=["Ligand SMILES", "BindingDB Target Chain Sequence"], keep="first")
        meaned = bdb.groupby(["Ligand SMILES", "BindingDB Target Chain Sequence"])[
            col].mean().reset_index()
        bdb = nodupe.drop(columns=[col]).merge(
            meaned, on=["Ligand SMILES", "BindingDB Target Chain Sequence"], how="left")
        bdb = bdb.sort_values(by=["BindingDB Ligand Name", "Target Name"]
                              ).reset_index(drop=True)
        sha = lambda s: hashlib.sha1(s.encode()).hexdigest()
        bdb["BindingDB Ligand Name"] = (bdb["BindingDB Ligand Name"] + "__"
                                        + bdb["Ligand SMILES"].map(sha))
        bdb["Target Name"] = (bdb["Target Name"] + "__"
                              + bdb["BindingDB Target Chain Sequence"].map(sha))
        bdb.to_pickle(cache)

    seqlen = bdb["BindingDB Target Chain Sequence"].str.len()
    bdb = bdb[(seqlen >= min_len) & (seqlen <= max_len)]
    bdb["BindingDB Target Chain Sequence"] = \
        bdb["BindingDB Target Chain Sequence"].str.upper()
    ligands = OrderedDict(bdb[["BindingDB Ligand Name", "Ligand SMILES"]]
                          .drop_duplicates().values)
    proteins = OrderedDict(bdb[["Target Name", "BindingDB Target Chain Sequence"]]
                           .drop_duplicates().values)
    pivot = bdb.pivot(index="BindingDB Ligand Name", columns="Target Name",
                      values=col)
    pivot = pivot.reindex(index=ligands.keys())[list(proteins.keys())]
    return _affinity_to_dataframe(proteins, ligands, pivot.values, structures_dir)


# BELKA's three fixed targets (public sequences; reference
# load_data.py:268-273 hard-codes the same) and their known structures.
BELKA_PROTEINS = OrderedDict([
    ("BRD4", "GPMEQLKCCSGILKEMFAKKHAAYAWPFYKPVDVEALGLHDYCDIIKHPMDMSTIKSKLE"
             "AREYRDAQEFGADVRLMFSNCYKYNPPDHEVVAMARKLQDVFEMRFAKM"),
    ("HSA", "DAHKSEVAHRFKDLGEENFKALVLIAFAQYLQQCPFEDHVKLVNEVTEFAKTCVADESAENC"
            "DKSLHTLFGDKLCTVATLRETYGEMADCCAKQEPERNECFLQHKDDNPNLPRLVRPEVDVMC"
            "TAFHDNEETFLKKYLYEIARRHPYFYAPELLFFAKRYKAAFTECCQAADKAACLLPKLDELR"
            "DEGKASSAKQRLKCASLQKFGERAFKAWAVARLSQRFPKAEFAEVSKLVTDLTKVHTECCHG"
            "DLLECADDRADLAKYICENQDSISSKLKECCEKPLLEKSHCIAEVENDEMPADLPSLAADFV"
            "ESKDVCKNYAEAKDVFLGMFLYEYARRHPDYSVVLLLRLAKTYETTLEKCCAAADPHECYAK"
            "VFDEFKPLVEEPQNLIKQNCELFEQLGEYKFQNALLVRYTKKVPQVSTPTLVEVSRNLGKVG"
            "SKCCKHPEAKRMPCAEDYLSVVLNQLCVLHEKTPVSDRVTKCCTESLVNRRPCFSALEVDET"
            "YVPKEFNAETFTFHADICTLSEKERQIKKQTALVELVKHKPKATKEQLKAVMDDFAAFVEKC"
            "CKADDKETCFAEEGKKLVAASQAALGL"),
    ("sEH", "MTLRAAVFDLDGVLALPAVFGVLGRTEEALALPRGLLNDAFQKGGPEGATTRLMKGEITLSQ"
            "WIPLMEENCRKCSETAKVCLPKNFSIKEIFDKAISARKINRPMLQAALMLRKKGFTTAILTN"
            "TWLDDRAERDGLAQLMCELKMHFDFLIESCQVGMVKPEPQIYKFLLDTLKASPSEVVFLDDI"
            "GANLKPARDLGMVTILVQDTDTALKELEKVTGIQLLNTPAPLPTSCNPSDMSHGYVTVKPRV"
            "RLHFVELGSGPAVCLCHGFPESWYSWRYQIPALAQAGYRVLAMDMKGYGESSAPPEIEEYCM"
            "EVLCKEMVTFLDKLGLSQAVFIGHDWGGMLVWYMALFYPERVRAVASLNTPFIPANPNMSPL"
            "ESIKANPVFDYQLYFQEPGVAEAELEQNLSRTFKSLFRASDESVLSMHKVCEAGGLFVNSPE"
            "EPSLSRMVTEEEIQFYVQQFKKSGFRGPLNWYRNMERNWKWACKSLGRKILIPALMVTAEKD"
            "FVLVPQMSQHMEDWIPHLKRGHIEDCGHWTQMDKPTEVNQILIKWLDSDARNPPVVSKM"),
])
BELKA_KNOWN_PDB_IDS = {"BRD4": "7USK", "HSA": "1AO6", "sEH": "3i28"}


def load_belka(data_root: str, structures_dir=None,
               affinity_fname: str = "train.parquet"):
    """Leash BELKA binary-binding dataset (reference load_data.py:254-344):
    parquet of (molecule_smiles, protein_name, binds) against 3 fixed
    targets, SMILES-validated, pivoted to a ligand x protein matrix, then
    long-form canonical rows. Parsed results are pickled beside the parquet
    for resumability, mirroring the reference's cache files."""
    path = os.path.join(data_root, "belka")
    fp = os.path.join(path, affinity_fname)
    if not os.path.exists(fp):
        raise FileNotFoundError(f"Could not locate BELKA affinity file {fp}")

    cache_piv = os.path.join(path, f"{affinity_fname}_parsed_pivot.pkl")
    if os.path.exists(cache_piv):
        pivot = pd.read_pickle(cache_piv)
    else:
        df = pd.read_parquet(fp)[["molecule_smiles", "protein_name", "binds"]]
        df = df[df["molecule_smiles"].map(validate_smiles)]
        pivot = df.pivot(index="molecule_smiles", columns="protein_name",
                         values="binds")
        pivot = pivot[[c for c in BELKA_PROTEINS if c in pivot.columns]]
        pivot.to_pickle(cache_piv)

    sha = lambda s: hashlib.sha1(s.encode()).hexdigest()
    ligands = OrderedDict((f"belka__{sha(s)}", s) for s in pivot.index)
    proteins = OrderedDict((k, BELKA_PROTEINS[k]) for k in pivot.columns)
    return _affinity_to_dataframe(proteins, ligands,
                                  pivot.values.astype(np.float64),
                                  structures_dir)


def apply_mostcommon_filter(df: pd.DataFrame, thresh: float = 0.1) -> pd.DataFrame:
    """Downsample overrepresented filler values (load_data.py:347-356; e.g.
    Davis' 75% filler 5.0)."""
    counts = df["affinity_score"].value_counts(normalize=True)
    over = counts[counts > thresh]
    if len(over):
        df = df[~df["affinity_score"].isin(over.index)].reset_index(drop=True)
    return df


def apply_proteinseqdupe_filter(df: pd.DataFrame) -> pd.DataFrame:
    """Keep only the protein with the most distinct affinities per duplicated
    sequence (load_data.py:361-386)."""
    prot_seqs = df.groupby("protein_id")["protein_sequence"].first().reset_index()
    dupes = prot_seqs["protein_sequence"].value_counts()
    for seq in dupes[dupes > 1].index:
        dupe_prots = prot_seqs[prot_seqs["protein_sequence"] == seq]["protein_id"]
        counts = df[df["protein_id"].isin(dupe_prots)].groupby(
            "protein_id")["affinity_score"].nunique()
        best = counts.idxmax()
        drop = dupe_prots[dupe_prots != best]
        df = df[~df["protein_id"].isin(drop)]
    return df.reset_index(drop=True)


def load_dataset(dataset_name: str, data_root: str = "./data",
                 structures_dir: Optional[str] = None,
                 do_mostcommon_filter: bool = False,
                 do_proteinseqdupe_filter: bool = False,
                 **kwargs) -> pd.DataFrame:
    """Name-dispatched loader (reference load_data.py:28-96 interface)."""
    name = dataset_name.lower()
    if name in ("davis", "kiba"):
        df = load_davis_kiba(name, os.path.join(data_root, "deepdta_data"),
                             structures_dir)
    elif name == "metz":
        df = load_metz(os.path.join(data_root, "other_data"), structures_dir)
    elif name.startswith("bindingdb"):
        task = name.split("_")[-1] if "_" in name else "kd"
        df = load_bindingdb(os.path.join(data_root, "other_data"), task,
                            structures_dir)
    elif "belka" in name:
        df = load_belka(os.path.join(data_root, "belka_data"), structures_dir,
                        **kwargs)
    elif name == "plinder":
        from caster_dta_tpu.data.plinder import parse_plinder
        df = parse_plinder(os.path.join(data_root, "plinder_data"), **kwargs)
    elif name == "synthetic":
        # offline end-to-end runs: on-disk helix-backbone PDBs + pool SMILES
        # with a size-dependent affinity signal (data/synthetic.py)
        from caster_dta_tpu.data.synthetic import make_synthetic_dataframe
        df = make_synthetic_dataframe(
            os.path.join(data_root, "synthetic_pdbs"),
            **{k: v for k, v in kwargs.items()
               if k in ("n_proteins", "n_molecules", "n_pairs", "res_range",
                        "seed")})
    else:
        raise ValueError(f"Dataset name {dataset_name!r} not recognized")
    if do_mostcommon_filter:
        df = apply_mostcommon_filter(df)
    if do_proteinseqdupe_filter:
        df = apply_proteinseqdupe_filter(df)
    return df
