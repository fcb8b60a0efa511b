"""Cluster refinement + type classification parity tests (golden clusters.tsv)."""

import math
import os

import numpy
import pytest

from gecco_tpu.crf import ClusterCRF
from gecco_tpu.model import ClusterTable, Domain, Gene, Protein, Strand
from gecco_tpu.refine import BIO_PFAMS, ClusterRefiner, GeneGrouper
from gecco_tpu.seq import Seq, SeqRecord
from gecco_tpu.types import TypeBinarizer, TypeClassifier
from gecco_tpu.model import ClusterType

from conftest import reference_path
from test_crf import load_annotated_genes

CLUSTERS = reference_path("test_cli", "data", "BGC0001866.clusters.tsv")


def _gene(pid, start, end, probability, domains=()):
    source = SeqRecord(id="seq1", seq=Seq(""))
    protein = Protein(pid, Seq("M"), [
        Domain(name, 1, 10, "Pfam", 1e-10, 1e-12) for name in domains
    ])
    return Gene(source, start, end, Strand.Coding, protein, _probability=probability)


def test_bio_pfams_count():
    assert len(BIO_PFAMS) == 130


def test_gene_grouper_carries_state():
    grouper = GeneGrouper(0.5)
    genes = [
        _gene("g1", 1, 10, 0.9),
        _gene("g2", 11, 20, None),  # inherits in-cluster state
        _gene("g3", 21, 30, 0.2),
    ]
    assert [grouper(g) for g in genes] == [True, True, False]


def test_refiner_extracts_run():
    genes = (
        [_gene(f"a{i}", i * 10, i * 10 + 9, 0.1) for i in range(3)]
        + [_gene(f"b{i}", 100 + i * 10, 109 + i * 10, 0.95, ["PF00001"]) for i in range(5)]
        + [_gene(f"c{i}", 200 + i * 10, 209 + i * 10, 0.1) for i in range(3)]
    )
    refiner = ClusterRefiner(threshold=0.8, n_cds=3)
    clusters = list(refiner.iter_clusters(genes))
    assert len(clusters) == 1
    assert clusters[0].id == "seq1_cluster_1"
    assert len(clusters[0].genes) == 5


def test_refiner_trims_unannotated_edges():
    genes = (
        [_gene("e0", 1, 9, 0.95)]  # unannotated edge gene
        + [_gene(f"m{i}", 10 + i * 10, 19 + i * 10, 0.95, ["PF00001"]) for i in range(5)]
        + [_gene("e1", 100, 109, 0.95)]  # unannotated edge gene
        + [_gene("tail", 200, 209, 0.1)]
    )
    clusters = list(ClusterRefiner(threshold=0.8, n_cds=3).iter_clusters(genes))
    assert len(clusters) == 1
    assert [g.id for g in clusters[0].genes] == [f"m{i}" for i in range(5)]


def test_refiner_cds_criterion():
    genes = [_gene(f"m{i}", 10 + i * 10, 19 + i * 10, 0.95, ["PF00001"]) for i in range(2)]
    assert list(ClusterRefiner(n_cds=3).iter_clusters(genes)) == []
    assert len(list(ClusterRefiner(n_cds=2).iter_clusters(genes))) == 1


def test_type_binarizer_roundtrip():
    binarizer = TypeBinarizer(["NRP", "Polyketide", "Terpene"])
    types = [ClusterType("Polyketide", "NRP"), ClusterType()]
    matrix = binarizer.transform(types)
    assert matrix.tolist() == [[1.0, 1.0, 0.0], [0.0, 0.0, 0.0]]
    back = binarizer.inverse_transform(matrix > 0.5)
    assert back == types


def test_cluster_table_golden_parity():
    """Full resume path: golden features → CRF → refine → types → clusters.tsv.

    Coordinates, ids, proteins and domains must be byte-identical to the
    golden; probabilities are float-tolerance checked (the CRF engine and
    forest differ from the reference's CRFsuite/sklearn binaries in last
    ulps / tree construction respectively).
    """
    genes, _ = load_annotated_genes()
    crf = ClusterCRF.trained()
    predicted = crf.predict_probabilities(genes, batch_decode=False)
    refiner = ClusterRefiner(threshold=0.8, criterion="gecco", n_cds=3)
    clusters = list(refiner.iter_clusters(predicted))
    classifier = TypeClassifier.trained()
    classifier.predict_types(clusters)

    mine = ClusterTable.from_clusters(clusters)
    golden = ClusterTable.load(CLUSTERS)
    assert len(mine) == len(golden) == 1
    for column in ("sequence_id", "cluster_id", "start", "end", "type", "proteins", "domains"):
        assert getattr(mine, column) == getattr(golden, column), column
    assert mine.average_p[0] == pytest.approx(golden.average_p[0], abs=1e-12)
    assert mine.max_p[0] == pytest.approx(golden.max_p[0], abs=1e-12)
    # forest probabilities: BIT-EQUAL — forest.npz is the one-time export
    # of the reference's sklearn RandomForestClassifier(random_state=0)
    # refit and Forest.predict_proba replays its exact float arithmetic
    for cls in ("alkaloid", "nrp", "polyketide", "ripp", "saccharide", "terpene"):
        column = f"{cls}_probability"
        assert getattr(mine, column)[0] == getattr(golden, column)[0], column


def test_forest_bit_equal_to_sklearn_fixture():
    """Forest inference is bit-equal to sklearn's predict_proba.

    The fixture holds 65 MIBiG composition rows with the expected
    positive-class probabilities computed by the reference's exact flow
    (``RandomForestClassifier(random_state=0)`` refit at load,
    ``types/__init__.py:86-92,121-128``) under sklearn 1.9; equality is
    exact, not approximate.
    """
    from gecco_tpu.types.forest import Forest

    payload = numpy.load(
        os.path.join(os.path.dirname(__file__), "data", "sklearn_forest_fixture.npz"))
    forest = Forest.load()
    ours = forest.predict_proba(payload["x"])
    assert numpy.array_equal(ours, payload["expected"])


def test_forest_training_accuracy():
    """The built-in forest trainer fits the embedded data non-trivially."""
    from gecco_tpu.types.forest import Forest, train_forest

    forest = Forest.load()
    rng = numpy.random.default_rng(0)
    # small synthetic multi-label problem
    x = rng.random((200, 10))
    y = numpy.stack([
        (x[:, 0] > 0.5).astype(float),
        ((x[:, 1] + x[:, 2]) > 1.0).astype(float),
    ], axis=1)
    model = train_forest(x, y, ["a", "b"], [f"f{i}" for i in range(10)], n_trees=20)
    predictions = model.predict_proba(x) > 0.5
    accuracy = (predictions == (y > 0.5)).mean()
    assert accuracy > 0.95
    assert forest.n_trees == 100
    assert forest.n_outputs == 6
