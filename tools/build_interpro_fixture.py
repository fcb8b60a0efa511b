"""Rebuild the embedded ``interpro.json`` subset from reference test data.

The reference ships a full ``gecco/interpro/interpro.json`` database
(built by ``setup.py update_interpro`` from the InterPro XML + GO OBO,
``/root/reference/setup.py:77-180``) — but that file is a git-LFS blob
missing from the mounted checkout, so the mapping cannot be copied or
regenerated offline.  What IS in-tree is the golden cluster GenBank
(``tests/test_cli/data/BGC0001866.1_cluster_1.gbk``), whose
``misc_feature`` qualifiers record, for every Pfam domain of the test
genome, exactly the InterPro metadata the reference pipeline attached:
the InterPro accession (``/db_xref="InterPro:..."``), the entry name
(``/function=...``) and the GO term accessions (``/db_xref="GO:..."``)
(written at ``gecco/hmmer/__init__.py:155-176`` +
``gecco/model.py:182-196``).

This tool recovers those entries into ``gecco_tpu/data/interpro.json``
(same JSON schema the reference loader consumes,
``gecco/interpro/__init__.py:66-83``).  GO term names/namespaces and the
top-level molecular-function ancestors ("go_functions": binding GO:0005488,
catalytic activity GO:0003824, transporter activity GO:0005215) come from
the static table below — standard Gene Ontology facts.  The result is
self-verified: replaying the reference's qualifier logic over the golden
``features.tsv`` must reproduce the golden GBK's per-CDS ``/function``
sets and per-domain db_xref lists exactly.

For a full database, run ``tools/update_interpro.py`` against a real
InterPro XML release; this fixture only covers the Pfams of the test
corpus (enough for the golden byte-parity tests and the GO-term flow).

Usage: python tools/build_interpro_fixture.py
"""

import json
import os
import re
import sys

GOLDEN_GBK = "/root/reference/tests/test_cli/data/BGC0001866.1_cluster_1.gbk"
DST = "gecco_tpu/data/interpro.json"

# Gene Ontology facts for every GO accession appearing in the golden:
# accession -> (name, namespace, top-level molecular_function ancestor or None)
GO_TABLE = {
    "GO:0005507": ("copper ion binding", "molecular_function", "GO:0005488"),
    "GO:0016491": ("oxidoreductase activity", "molecular_function", "GO:0003824"),
    "GO:0008171": ("O-methyltransferase activity", "molecular_function", "GO:0003824"),
    "GO:0004499": ("N,N-dimethylaniline monooxygenase activity", "molecular_function", "GO:0003824"),
    "GO:0050660": ("flavin adenine dinucleotide binding", "molecular_function", "GO:0005488"),
    "GO:0050661": ("NADP binding", "molecular_function", "GO:0005488"),
    "GO:0022857": ("transmembrane transporter activity", "molecular_function", "GO:0005215"),
    "GO:0055085": ("transmembrane transport", "biological_process", None),
    "GO:0003677": ("DNA binding", "molecular_function", "GO:0005488"),
    "GO:0005634": ("nucleus", "cellular_component", None),
    "GO:0006355": ("regulation of DNA-templated transcription", "biological_process", None),
    "GO:0045122": ("aflatoxin biosynthetic process", "biological_process", None),
    "GO:0008168": ("methyltransferase activity", "molecular_function", "GO:0003824"),
    "GO:0009058": ("biosynthetic process", "biological_process", None),
}

TOP_FUNCTIONS = {
    "GO:0005488": "binding",
    "GO:0003824": "catalytic activity",
    "GO:0005215": "transporter activity",
}


def parse_golden(path: str = GOLDEN_GBK):
    """Parse CDS / misc_feature qualifiers out of the golden GenBank."""
    text = open(path).read()
    body = text.split("FEATURES")[1].split("ORIGIN")[0]
    features = re.split(r"\n     (?=\S)", body)
    genes = []  # [(locus_tag, function set, [misc dicts])]
    for feature in features:
        head = feature.strip().split()
        if not head:
            continue
        flat = feature.replace("\n                     ", " ")
        quals = {}
        for key, quoted, bare in re.findall(r'/(\w+)=(?:"([^"]*)"|(\S+))', flat):
            quals.setdefault(key, []).append(quoted or bare)
        if head[0] == "CDS":
            genes.append((quals["locus_tag"][0], quals.get("function", []), []))
        elif head[0] == "misc_feature":
            genes[-1][2].append(quals)
    return genes


def build(dst: str = DST) -> None:
    genes = parse_golden()
    entries = {}
    order = []
    for _, _, miscs in genes:
        for quals in miscs:
            xrefs = quals.get("db_xref", [])
            pfam = [x.split(":", 1)[1] for x in xrefs if x.startswith("PFAM:")]
            ipr = [x.split(":", 1)[1] for x in xrefs if x.startswith("InterPro:")]
            gos = [x for x in xrefs if x.startswith("GO:")]
            if not pfam or not ipr:
                continue  # no InterPro entry for this Pfam (e.g. PF13489)
            name = quals.get("function", [None])[0]
            go_terms = []
            go_functions = {}
            for accession in gos:
                go_name, namespace, ancestor = GO_TABLE[accession]
                go_terms.append(
                    {"accession": accession, "name": go_name, "namespace": namespace})
                if ancestor is not None:
                    go_functions[ancestor] = {
                        "accession": ancestor, "name": TOP_FUNCTIONS[ancestor]}
            entry = {
                "accession": ipr[0],
                "members": [pfam[0]],
                "name": name,
                "databases": ["pfam"],
                "type": "domain",
                "go_terms": go_terms,
                "go_functions": list(go_functions.values()),
            }
            if pfam[0] in entries:
                assert entries[pfam[0]] == entry, pfam[0]
            else:
                entries[pfam[0]] = entry
                order.append(pfam[0])

    # --- self-verification: the reference computes each CDS's /function
    # qualifiers as the sorted union of its domains' go_function names,
    # "unknown" when empty (gecco/model.py:346-386); replay that and
    # require equality with the golden per-CDS sets
    for locus_tag, functions, miscs in genes:
        replayed = set()
        for quals in miscs:
            xrefs = quals.get("db_xref", [])
            pfam = [x.split(":", 1)[1] for x in xrefs if x.startswith("PFAM:")]
            if pfam and pfam[0] in entries:
                replayed.update(
                    t["name"] for t in entries[pfam[0]]["go_functions"])
        if not replayed:
            replayed.add("unknown")
        assert sorted(replayed) == functions, (locus_tag, sorted(replayed), functions)

    payload = [entries[k] for k in order]
    with open(dst, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(f"wrote {dst}: {len(payload)} entries, "
          f"verified against {len(genes)} golden CDS function sets")


if __name__ == "__main__":
    build(*sys.argv[1:])
