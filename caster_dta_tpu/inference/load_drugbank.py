"""DrugBank XML -> DataFrame of small-molecule drugs with human protein
targets/enzymes.

Behavioral spec: reference inference/load_drugbank.py:7-161 — same column
set (drugbank_id, name, groups, smiles, target_*/enzyme_* lists), zip-or-xml
input handling, humans-only target filter, FASTA header stripping.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile

import pandas as pd


def load_drugbank(drugbank_file: str) -> pd.DataFrame:
    if drugbank_file.endswith(".zip"):
        with zipfile.ZipFile(drugbank_file) as z:
            xml_names = [n for n in z.namelist() if n.endswith(".xml")]
            if not xml_names:
                raise ValueError("No XML file found in the ZIP archive")
            with z.open(xml_names[0]) as f:
                tree = ET.parse(f)
    else:
        tree = ET.parse(drugbank_file)

    root = tree.getroot()
    ns = root.tag.split("}")[0] + "}"

    rows = []
    for drug in root:
        if drug.get("type") != "small molecule":
            continue
        d = {
            "drugbank_id": drug.findtext(f"{ns}drugbank-id[@primary='true']"),
            "name": drug.findtext(f"{ns}name"),
            "groups": [g.text for g in drug.findall(f"{ns}groups/{ns}group")],
        }
        props = drug.findall(f"{ns}calculated-properties/{ns}property")
        smiles = [p.findtext(f"{ns}value") for p in props
                  if p.findtext(f"{ns}kind") == "SMILES"]
        d["smiles"] = smiles[0] if len(smiles) == 1 else ("" if not smiles else smiles)

        for field, tag in [("target", "targets"), ("enzyme", "enzymes")]:
            info = get_all_target_info(drug.findall(f"{ns}{tag}/"), ns=ns)
            d[f"{field}_superid"] = [x[0] for x in info]
            d[f"{field}_supername"] = [x[1] for x in info]
            d[f"{field}_id"] = [x[2] for x in info]
            d[f"{field}_source"] = [x[3] for x in info]
            d[f"{field}_name"] = [x[4] for x in info]
            d[f"{field}_sequence"] = [x[5] for x in info]
        rows.append(d)
    return pd.DataFrame(rows)


def get_all_target_info(targets, ns="{http://www.drugbank.ca}"):
    out = []
    for parent in targets:
        if parent.findtext(f"{ns}organism") != "Humans":
            continue
        parent_id = parent.findtext(f"{ns}id")
        parent_name = parent.findtext(f"{ns}name")
        for poly in parent.findall(f"{ns}polypeptide"):
            out.append((parent_id, parent_name,
                        *get_single_target_info(poly, ns=ns)))
    return out


def get_single_target_info(el, ns="{http://www.drugbank.ca}"):
    seq = el.findtext(f"{ns}amino-acid-sequence") or ""
    seq = "".join(x for x in seq.split("\n") if not x.startswith(">"))
    return el.get("id"), el.get("source"), el.findtext(f"{ns}name"), seq
