"""Tests for table round-trips against the reference golden TSVs.

Mirrors the intent of the reference ``tests/test_model/test_genetable.py``
/ ``test_clustertable.py``: schema-typed load/dump with NaN elision.
"""

import math

from gecco_tpu.model import ClusterTable, FeatureTable, GeneTable

from conftest import reference_path

GENES = reference_path("test_cli", "data", "BGC0001866.genes.tsv")
FEATURES = reference_path("test_cli", "data", "BGC0001866.features.tsv")
CLUSTERS = reference_path("test_cli", "data", "BGC0001866.clusters.tsv")


def test_gene_table_roundtrip_bitexact():
    with open(GENES, "rb") as f:
        original = f.read()
    table = GeneTable.loads(original)
    assert len(table) == 23
    assert table.protein_id[0] == "BGC0001866.1_1"
    assert table.dumps() == original


def test_feature_table_roundtrip_bitexact():
    with open(FEATURES, "rb") as f:
        original = f.read()
    table = FeatureTable.loads(original)
    assert len(table) == 37
    assert table.dumps() == original


def test_cluster_table_roundtrip_bitexact():
    with open(CLUSTERS, "rb") as f:
        original = f.read()
    table = ClusterTable.loads(original)
    assert len(table) == 1
    assert table.dumps() == original


def test_gene_table_to_genes():
    table = GeneTable.load(GENES)
    genes = list(table.to_genes())
    assert len(genes) == 23
    assert genes[0].start == 347
    assert genes[0].end == 1489
    assert genes[0].strand.sign == "-"
    assert abs(genes[0].average_probability - 0.9791890143072265) < 1e-15


def test_feature_table_to_genes():
    table = FeatureTable.load(FEATURES)
    genes = list(table.to_genes())
    # 16 of the 23 genes carry domains
    assert len(genes) == 16
    by_id = {g.protein.id: g for g in genes}
    gene = by_id["BGC0001866.1_1"]
    assert [d.name for d in gene.protein.domains] == ["PF00394", "PF07731"]
    assert gene.protein.domains[0].start == 1
    assert gene.protein.domains[0].end == 63


def test_gene_table_probability_elision():
    table = GeneTable(
        {
            "sequence_id": ["s1"],
            "protein_id": ["p1"],
            "start": [1],
            "end": [30],
            "strand": ["+"],
            "average_p": [math.nan],
            "max_p": [math.nan],
        }
    )
    text = table.dumps().decode()
    # all-NaN probability columns are elided on dump (gecco/_base.py:133-151)
    assert text.splitlines()[0] == "sequence_id\tprotein_id\tstart\tend\tstrand"


def test_table_concat():
    t1 = GeneTable.load(GENES)
    t2 = GeneTable.load(GENES)
    t1 += t2
    assert len(t1) == 46
