"""CRF decode parity tests against the reference goldens.

The strongest numeric check in the suite: resuming from the golden
``features.tsv``/``genes.tsv`` of BGC0001866 (produced by reference
GECCO with CRFsuite), our forward–backward windowed decode must
reproduce the published per-gene probabilities (float64 path to
~1e-15; JAX float32 path to ~1e-5).
"""

import math

import numpy
import pytest

from gecco_tpu.crf import ClusterCRF
from gecco_tpu.crf.decode import marginals_jax, marginals_numpy
from gecco_tpu.model import Domain, FeatureTable, Gene, GeneTable

from conftest import reference_path

GENES = reference_path("test_cli", "data", "BGC0001866.genes.tsv")
FEATURES = reference_path("test_cli", "data", "BGC0001866.features.tsv")


def load_annotated_genes():
    """Rebuild unannotated genes + domains from the golden tables."""
    gene_table = GeneTable.load(GENES)
    feature_table = FeatureTable.load(FEATURES)
    genes = [
        Gene(g.source, g.start, g.end, g.strand, g.protein, dict(g.qualifiers), None)
        for g in gene_table.to_genes()
    ]
    rows_by_protein = {}
    for i in range(len(feature_table)):
        rows_by_protein.setdefault(feature_table.protein_id[i], []).append(i)
    for gene in genes:
        for i in rows_by_protein.get(gene.protein.id, []):
            gene.protein.domains.append(
                Domain(
                    feature_table.domain[i],
                    feature_table.domain_start[i],
                    feature_table.domain_end[i],
                    feature_table.hmm[i],
                    feature_table.i_evalue[i],
                    feature_table.pvalue[i],
                )
            )
    golden = dict(zip(gene_table.protein_id, gene_table.average_p))
    return genes, golden


def test_trained_model_metadata():
    crf = ClusterCRF.trained()
    assert crf.feature_type == "protein"
    assert crf.window_size == 20
    assert crf.window_step == 1
    assert crf.label_names == ["0", "1"]
    assert len(crf.attr_names) == 2659
    assert (crf.state != 0).sum() == 4211


def test_predict_probabilities_golden_parity_float64():
    genes, golden = load_annotated_genes()
    crf = ClusterCRF.trained()
    predicted = crf.predict_probabilities(genes, batch_decode=False)
    assert len(predicted) == 23
    for gene in predicted:
        assert gene.average_probability == pytest.approx(golden[gene.protein.id], abs=1e-12)


def test_predict_probabilities_golden_parity_jax():
    genes, golden = load_annotated_genes()
    crf = ClusterCRF.trained()
    predicted = crf.predict_probabilities(genes, batch_decode=True)
    for gene in predicted:
        assert gene.average_probability == pytest.approx(golden[gene.protein.id], abs=5e-5)


def test_cluster_weight_assignment():
    genes, _ = load_annotated_genes()
    crf = ClusterCRF.trained()
    predicted = crf.predict_probabilities(genes, batch_decode=False)
    weights = [
        d.cluster_weight
        for g in predicted
        for d in g.protein.domains
    ]
    assert all(w is None or w != 0 for w in weights)
    assert any(w is not None for w in weights)


def test_marginals_jax_matches_numpy():
    rng = numpy.random.default_rng(0)
    emissions = rng.normal(size=(16, 20, 2)) * 3.0
    trans = numpy.array([[2.67, -2.6], [-2.6, 2.57]])
    m_np = marginals_numpy(emissions, trans)
    m_jx = numpy.asarray(marginals_jax(emissions, trans))
    assert numpy.abs(m_np.sum(-1) - 1.0).max() < 1e-12
    assert numpy.abs(m_np - m_jx).max() < 1e-5


def test_marginals_bruteforce_tiny_chain():
    """Exhaustive-enumeration check of the forward-backward math."""
    rng = numpy.random.default_rng(1)
    W, L = 5, 2
    emissions = rng.normal(size=(1, W, L))
    trans = rng.normal(size=(L, L))
    m = marginals_numpy(emissions, trans)[0]
    # brute force over all 2^5 paths
    import itertools

    scores = {}
    for path in itertools.product(range(L), repeat=W):
        s = sum(emissions[0, t, y] for t, y in enumerate(path))
        s += sum(trans[path[t - 1], path[t]] for t in range(1, W))
        scores[path] = math.exp(s)
    z = sum(scores.values())
    for t in range(W):
        for y in range(L):
            marginal = sum(v for p, v in scores.items() if p[t] == y) / z
            assert m[t, y] == pytest.approx(marginal, rel=1e-10)


def test_short_contig_padding():
    """Contigs shorter than the window are padded front/back with empties."""
    genes, _ = load_annotated_genes()
    crf = ClusterCRF.trained()
    subset = genes[:7]  # < window size of 20
    with pytest.warns(UserWarning, match="padding"):
        predicted = crf.predict_probabilities(subset, batch_decode=False)
    assert len(predicted) == 7
    assert all(g.average_probability is not None for g in predicted)


def test_no_pad_skips_short_contig():
    genes, _ = load_annotated_genes()
    crf = ClusterCRF.trained()
    subset = genes[:7]
    with pytest.warns(UserWarning):
        predicted = crf.predict_probabilities(subset, pad=False, batch_decode=False)
    assert len(predicted) == 7
    assert all(g.average_probability is None for g in predicted)
