#!/usr/bin/env python
"""Rebuild the embedded ``interpro.json`` from InterPro XML + GO OBO.

Reference equivalent: ``setup.py update_interpro``
(``/root/reference/setup.py:77-180``): parses the InterPro release XML
and the Gene Ontology OBO file, keeps each entry's member signatures
and GO terms, and derives "go_functions" — the top-level
``molecular_function`` superclasses (direct children of the MF root
``GO:0003674``) reachable from the entry's GO terms — used by
``Domain.go_functions`` style metadata downstream.

This environment has no network egress, so the tool takes LOCAL copies
of ``interpro.xml(.gz)`` and ``go.obo(.gz)``.

Usage:  python tools/update_interpro.py interpro.xml.gz go.obo [DATA_DIR]
"""

import gzip
import json
import os
import sys
import xml.etree.ElementTree as etree
from typing import Dict, List, Set, Tuple

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gecco_tpu", "data",
)

MF_ROOT = "GO:0003674"


def _zopen(path: str):
    return gzip.open(path, "rt") if path.endswith(".gz") else open(path)


def parse_obo(path: str) -> Dict[str, dict]:
    """Minimal OBO parser: id -> {name, namespace, parents}."""
    terms: Dict[str, dict] = {}
    cur = None
    with _zopen(path) as f:
        for line in f:
            line = line.strip()
            if line == "[Term]":
                cur = {"id": None, "name": None, "namespace": None,
                       "parents": []}
            elif not line and cur is not None:
                if cur["id"]:
                    terms[cur["id"]] = cur
                cur = None
            elif cur is not None and ": " in line:
                key, _, value = line.partition(": ")
                if key == "id":
                    cur["id"] = value
                elif key == "name":
                    cur["name"] = value
                elif key == "namespace":
                    cur["namespace"] = value
                elif key == "is_a":
                    cur["parents"].append(value.split(" ! ")[0])
                elif key == "alt_id":
                    terms[value] = cur
    if cur is not None and cur.get("id"):
        terms[cur["id"]] = cur
    return terms


def function_families(go_id: str, terms: Dict[str, dict],
                      cache: Dict[str, Set[str]]) -> Set[str]:
    """Top-level molecular_function superclasses of ``go_id``."""
    if go_id in cache:
        return cache[go_id]
    cache[go_id] = set()  # cycle guard
    term = terms.get(go_id)
    if term is None or term["namespace"] != "molecular_function":
        return set()
    out: Set[str] = set()
    for parent in term["parents"]:
        if parent == MF_ROOT:
            out.add(go_id)
        else:
            out |= function_families(parent, terms, cache)
    cache[go_id] = out
    return out


def update_interpro(xml_path: str, obo_path: str,
                    data_dir: str = DATA_DIR) -> str:
    terms = parse_obo(obo_path)
    cache: Dict[str, Set[str]] = {}
    entries: List[dict] = []
    with _zopen(xml_path) as f:
        tree = etree.parse(f)
    for entry in tree.iter("interpro"):
        accession = entry.get("id")
        name_el = entry.find("name")
        member_dbs = ("PFAM", "PROFILE", "PROSITE", "SMART", "TIGRFAMs",
                      "NCBIFAM")
        members = [
            m.get("dbkey")
            for m in entry.iter("db_xref")
            if m.get("db") in member_dbs
        ] + [
            m.get("dbkey") for m in entry.iter("member") if m.get("dbkey")
        ]
        databases = sorted({
            m.get("db") for m in entry.iter("db_xref")
            if m.get("db") in member_dbs
        })
        go_ids = [
            c.get("id") for c in entry.iter("classification")
            if c.get("class_type") == "GO"
        ]
        go_terms = []
        families: Set[str] = set()
        for gid in go_ids:
            t = terms.get(gid)
            if t is None:
                continue
            go_terms.append({
                "accession": gid, "name": t["name"],
                "namespace": t["namespace"],
            })
            families |= function_families(gid, terms, cache)
        go_functions = [
            {"accession": gid, "name": terms[gid]["name"]}
            for gid in sorted(families)
        ]
        entries.append({
            "accession": accession,
            "name": name_el.text if name_el is not None else accession,
            "type": entry.get("type"),
            "databases": databases,
            "members": sorted(set(m for m in members if m)),
            "go_terms": go_terms,
            "go_functions": go_functions,
        })
    os.makedirs(data_dir, exist_ok=True)
    out_path = os.path.join(data_dir, "interpro.json.gz")
    with gzip.open(out_path, "wt") as f:
        json.dump(entries, f)
    print(f"wrote {len(entries)} entries -> {out_path!r}")
    return out_path


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    update_interpro(
        sys.argv[1], sys.argv[2],
        sys.argv[3] if len(sys.argv) > 3 else DATA_DIR,
    )
