"""Gene-calling tests: CDS/GFF extraction and the de-novo scanner.

Mirrors the reference test intent (``tests/test_orf/``): CDSFinder on
an annotated MIBiG GenBank, and golden-parity of the de-novo finder
against the Prodigal-produced ``BGC0001737.faa`` fixture.
"""

import pytest

from gecco_tpu import seqio
from gecco_tpu.orf import CDSFinder, GFFFinder
from gecco_tpu.orf.scan import ScanFinder
from gecco_tpu.seq import translate

from conftest import reference_path

GBK_1377 = reference_path("test_orf", "data", "BGC0001377.gbk")
FNA_1737 = reference_path("test_orf", "data", "BGC0001737.fna")
FAA_1737 = reference_path("test_orf", "data", "BGC0001737.faa")


def test_cds_finder_counts():
    records = list(seqio.parse(GBK_1377))
    genes = list(CDSFinder().find_genes(records))
    assert len(genes) == 32
    # all genes carry protein sequences
    assert all(len(g.protein.seq) > 10 for g in genes)


def test_cds_finder_progress_callback():
    records = list(seqio.parse(GBK_1377))
    calls = []
    list(CDSFinder().find_genes(records, progress=lambda r, n: calls.append((r.id, n))))
    assert calls == [(records[0].id, 32)]


def test_cds_finder_duplicate_ids():
    records = list(seqio.parse(GBK_1377))
    doubled = [records[0], records[0]]
    with pytest.raises(ValueError, match="Duplicate"):
        list(CDSFinder().find_genes(doubled))


def _golden_coordinates():
    coords = []
    for record in seqio.parse(FAA_1737):
        parts = record.description.split(" # ")
        coords.append((int(parts[1]), int(parts[2]), int(parts[3]), str(record.seq)))
    return coords


def test_scan_finder_prodigal_parity():
    """The de-novo finder recovers the Prodigal golden gene set."""
    records = list(seqio.parse(FNA_1737))
    genes = list(ScanFinder().find_genes(records))
    golden = _golden_coordinates()

    def stop_key(start, end, strand):
        return (end, strand) if strand == 1 else (start, strand)

    golden_stops = {stop_key(b, e, s) for b, e, s, _ in golden}
    mine_stops = {stop_key(g.start, g.end, int(g.strand)) for g in genes}
    recovered = golden_stops & mine_stops
    # every golden gene recovered (same stop codon), few extras
    assert len(recovered) == len(golden_stops)
    assert len(mine_stops) - len(recovered) <= 2

    # most coordinates exact (start selection may differ on 1-2 genes)
    exact = {(b, e, s) for b, e, s, _ in golden} & {
        (g.start, g.end, int(g.strand)) for g in genes
    }
    assert len(exact) >= len(golden) - 2


def test_scan_finder_translations_match_golden():
    records = list(seqio.parse(FNA_1737))
    genes = {(g.start, g.end, int(g.strand)): g for g in ScanFinder().find_genes(records)}
    for begin, end, strand, protein in _golden_coordinates():
        gene = genes.get((begin, end, strand))
        if gene is not None:
            assert str(gene.protein.seq) == protein.rstrip("*")


def test_scan_finder_coordinate_translation_consistency():
    records = list(seqio.parse(FNA_1737))
    seq = str(records[0].seq)
    for gene in ScanFinder().find_genes(records):
        sub = seq[gene.start - 1 : gene.end]
        if int(gene.strand) == -1:
            from gecco_tpu.seq import reverse_complement

            sub = reverse_complement(sub)
        assert translate(sub, table=11).rstrip("*") == str(gene.protein.seq)


def test_native_matches_python_enumeration():
    """The C++ ORF core and the Python fallback produce identical candidates."""
    from gecco_tpu.orf import _native
    from gecco_tpu.orf import scan as scan_mod

    if _native.load() is None:
        pytest.skip("native library not built and no toolchain available")
    records = list(seqio.parse(FNA_1737))
    codes = scan_mod._encode(str(records[0].seq).upper())
    starts, ends, flags = _native.native_candidates(codes, scan_mod.MIN_GENE, scan_mod.MAX_STARTS)
    native_set = {
        (int(s), int(e), bool(f & 2), bool(f & 4))
        for s, e, f in zip(starts, ends, flags)
    }
    backup = _native.native_candidates
    _native.native_candidates = lambda *a, **k: None
    try:
        python_set = {
            (c.start, c.end, c.partial_begin, c.partial_end)
            for c in scan_mod._find_orfs(codes, 1, len(codes))
        }
    finally:
        _native.native_candidates = backup
    assert native_set == python_set

    # scoring agreement
    import numpy as np

    log_odds = np.linspace(-1, 1, 4096)
    s32 = np.fromiter((s for s, e, *_ in sorted(native_set)), dtype=np.int32)
    e32 = np.fromiter((e - 3 for s, e, *_ in sorted(native_set)), dtype=np.int32)
    native_scores = _native.native_scores(codes, log_odds, s32, e32)
    python_scores = np.array([
        scan_mod.ScanFinder._score_coding(codes, int(b), int(e), log_odds)
        for b, e in zip(s32, e32)
    ])
    assert np.allclose(native_scores, python_scores)
