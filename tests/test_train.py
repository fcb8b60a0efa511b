"""Tests for CRF training, Fisher selection, and CV splitters."""

import math
import warnings

import numpy
import pytest

from gecco_tpu.crf import ClusterCRF
from gecco_tpu.crf.cv import LeaveOneGroupOut, kfold
from gecco_tpu.crf.select import (
    fisher_exact_two_tailed,
    fisher_significance,
    significance_correction,
)
from gecco_tpu.model import Domain, Gene, Protein, Strand
from gecco_tpu.seq import Seq, SeqRecord


def test_fisher_exact_matches_scipy():
    import scipy.stats

    rng = numpy.random.default_rng(0)
    for _ in range(50):
        a, b, c, d = rng.integers(0, 40, size=4)
        mine = fisher_exact_two_tailed(int(a), int(b), int(c), int(d))
        theirs = scipy.stats.fisher_exact([[a, b], [c, d]], alternative="two-sided").pvalue
        assert mine == pytest.approx(theirs, rel=1e-9), (a, b, c, d)


def test_fdr_bh_matches_reference_example():
    s = {"A": 0.6, "B": 0.05, "C": 1.0, "D": 0.0}
    corrected = significance_correction(s, method="fdr_bh")
    assert corrected["A"] == pytest.approx(0.8)
    assert corrected["B"] == pytest.approx(0.1)
    assert corrected["C"] == pytest.approx(1.0)
    assert corrected["D"] == pytest.approx(0.0)


def test_fisher_significance_reference_example():
    def protein(i, names, p):
        return Protein(f"prot{i}", Seq(""), [
            Domain(n, 1, 2, "Pfam", 0.0, 0.0, probability=p) for n in names
        ])

    data = [
        protein(1, "AB", 1), protein(2, "AB", 1), protein(3, "AB", 1),
        protein(4, "A", 1), protein(5, "A", 1),
        protein(6, "CB", 0), protein(7, "C", 0),
    ]
    sig = fisher_significance(data)
    assert sig["A"] == pytest.approx(0.0714285714, abs=1e-6)
    assert sig["B"] == pytest.approx(1.0)
    assert sig["C"] == pytest.approx(0.0714285714, abs=1e-6)


def test_loto_split_reference_example():
    loto = LeaveOneGroupOut()
    groups = [["a"], ["b"], ["c"], ["a", "b"]]
    splits = [(t.tolist(), s.tolist()) for t, s in loto.split(range(4), groups=groups)]
    assert splits == [([1, 2], [0]), ([0, 2], [1]), ([0, 1, 3], [2])]
    assert loto.get_n_splits(groups=groups) == 3


def test_kfold_partitions():
    folds = list(kfold(25, k=5))
    assert len(folds) == 5
    all_test = sorted(i for _, test in folds for i in test)
    assert all_test == list(range(25))


def _synthetic_genes(n_contigs=6, length=40, seed=1):
    """Synthetic contigs where domains D0/D1 mark cluster runs."""
    rng = numpy.random.default_rng(seed)
    genes = []
    for c in range(n_contigs):
        source = SeqRecord(id=f"ctg{c}", seq=Seq(""))
        start_run = rng.integers(5, 15)
        run_len = rng.integers(8, 15)
        for i in range(length):
            in_cluster = start_run <= i < start_run + run_len
            names = []
            if in_cluster:
                if rng.random() < 0.8:
                    names.append("CLUST%d" % rng.integers(0, 3))
            else:
                if rng.random() < 0.6:
                    names.append("BG%d" % rng.integers(0, 5))
            domains = [
                Domain(n, 1, 10, "Pfam", 1e-10, 1e-12, probability=1.0 if in_cluster else 0.0)
                for n in names
            ]
            protein = Protein(f"ctg{c}_{i+1}", Seq("M"), domains)
            genes.append(Gene(
                source, i * 100 + 1, i * 100 + 90, Strand.Coding, protein,
                _probability=1.0 if in_cluster else 0.0,
            ))
    return genes


def test_fit_and_predict_roundtrip(tmp_path):
    genes = _synthetic_genes()
    crf = ClusterCRF("protein", window_size=10, window_step=1, c1=0.05, c2=0.0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        crf.fit(genes, max_iterations=300)
    assert crf.fitted
    assert any(name.startswith("CLUST") for name in crf.attr_names)
    # cluster-marker domains must get positive weight for label '1'
    for name in crf.attr_names:
        weight = crf.state[crf.attr_names.index(name), 1]
        if name.startswith("CLUST"):
            assert weight > 0.2
    # prediction separates in-cluster from background genes
    stripped = [
        Gene(g.source, g.start, g.end, g.strand, g.protein, dict(g.qualifiers), None)
        for g in genes
    ]
    truth = {g.protein.id: g.average_probability for g in genes}
    predicted = crf.predict_probabilities(stripped)
    inside = [g.average_probability for g in predicted if truth[g.protein.id] == 1.0]
    outside = [g.average_probability for g in predicted if truth[g.protein.id] == 0.0]
    assert numpy.mean(inside) > 0.8
    assert numpy.mean(outside) < 0.2
    # save/load round trip preserves weights
    crf.save(tmp_path)
    loaded = ClusterCRF.trained(tmp_path)
    assert loaded.attr_names == crf.attr_names
    numpy.testing.assert_allclose(loaded.state, crf.state)
    numpy.testing.assert_allclose(loaded.trans, crf.trans)


def test_fit_with_selection():
    genes = _synthetic_genes()
    crf = ClusterCRF("protein", window_size=10, window_step=1, c1=0.05)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        crf.fit(genes, select=0.5, max_iterations=50)
    assert crf.significance is not None
    assert crf.significant_features is not None
    assert all(name in crf.significant_features for name in crf.attr_names)


def test_owlqn_matches_adam_optimum_and_sparsifies():
    """OWL-QN / L-BFGS (the reference's `lbfgs` algorithm): on the
    smooth strictly-convex objective (c1=0, c2>0) it reaches the same
    unique optimum as Adam; with L1 it produces genuinely sparse
    weights and a model that separates clusters from background."""
    genes = _synthetic_genes()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        crf_a = ClusterCRF("protein", window_size=10, algorithm="adam",
                           c1=0.0, c2=0.05)
        crf_b = ClusterCRF("protein", window_size=10, algorithm="lbfgs",
                           c1=0.0, c2=0.05)
        crf_a.fit(list(genes), max_iterations=4000)
        crf_b.fit(list(genes), max_iterations=300)
    assert crf_a.attr_names == crf_b.attr_names
    # OWL-QN converges at least as deep as (well-run) Adam on the
    # shared convex objective, in ~10x fewer iterations
    assert crf_b.last_objective_ <= crf_a.last_objective_ + 1e-3
    # near-flat directions keep raw weights from matching tightly;
    # the state weights (the model's substance) agree closely
    numpy.testing.assert_allclose(crf_a.state, crf_b.state, atol=0.25)

    # L1 branch: uninformative noise features get exactly zeroed
    rng = numpy.random.default_rng(9)
    noisy = []
    for g in genes:
        domains = list(g.protein.domains)
        if rng.random() < 0.5:
            domains = domains + [Domain(
                "NOISE%d" % rng.integers(0, 4), 1, 10, "Pfam", 1e-10, 1e-12,
                probability=g.average_probability,
            )]
        noisy.append(g.with_protein(g.protein.with_domains(domains)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        crf_l1 = ClusterCRF("protein", window_size=10, algorithm="lbfgs",
                            c1=0.3, c2=0.0)
        crf_l1.fit(list(noisy), max_iterations=300)
    noise_rows = [i for i, n in enumerate(crf_l1.attr_names)
                  if n.startswith("NOISE")]
    assert (numpy.abs(crf_l1.state[noise_rows]) < 1e-12).sum() > 0
    genes = noisy
    stripped = [
        Gene(g.source, g.start, g.end, g.strand, g.protein,
             dict(g.qualifiers), None)
        for g in genes
    ]
    truth = {g.protein.id: g.average_probability for g in genes}
    pred = crf_l1.predict_probabilities(stripped)
    inside = [g.average_probability for g in pred if truth[g.protein.id] == 1.0]
    outside = [g.average_probability for g in pred if truth[g.protein.id] == 0.0]
    assert numpy.mean(inside) > 0.8
    assert numpy.mean(outside) < 0.2
