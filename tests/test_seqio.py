"""Tests for FASTA/GenBank parsing and GenBank writing."""

import io

from gecco_tpu import seqio
from gecco_tpu.seq import Seq, SeqRecord

from conftest import reference_path

FNA = reference_path("test_cli", "data", "BGC0001866.fna")
GBK = reference_path("test_cli", "data", "BGC0001866.gbk")
ORF_GBK = reference_path("test_orf", "data", "BGC0001377.gbk")
GOLDEN_CLUSTER_GBK = reference_path("test_cli", "data", "BGC0001866.1_cluster_1.gbk")


def test_guess_format():
    assert seqio.guess_sequences_format(FNA) == "fasta"
    assert seqio.guess_sequences_format(GBK) == "genbank"


def test_parse_fasta():
    records = list(seqio.parse(FNA))
    assert len(records) == 1
    assert records[0].id == "BGC0001866.1"
    assert len(records[0].seq) == 33290
    assert set(records[0].seq) <= set("ACGTN")


def test_parse_genbank_features():
    record = next(seqio.parse(GBK))
    assert record.id == "BGC0001866.1"
    assert len(record.seq) == 33290
    cds = [f for f in record.features if f.type == "CDS"]
    assert len(cds) == 23
    first = cds[0]
    assert first.location.start == 347
    assert first.location.end == 1489
    assert first.location.strand == -1
    assert first.qualifiers["translation"][0].startswith("MWIYEVDGHYIEPRRADTFLIW")


def test_genbank_fasta_sequences_agree():
    fasta = next(seqio.parse(FNA))
    genbank = next(seqio.parse(GBK))
    assert str(fasta.seq) == str(genbank.seq)


def test_parse_genbank_bgc0001377():
    record = next(seqio.parse(ORF_GBK))
    cds = [f for f in record.features if f.type == "CDS"]
    assert len(cds) == 32


def test_write_fasta_roundtrip():
    record = SeqRecord(id="test_1", seq=Seq("ACGT" * 40), description="test_1 demo")
    buffer = io.StringIO()
    seqio.write_fasta([record], buffer)
    parsed = list(seqio.parse_fasta(io.BytesIO(buffer.getvalue().encode())))
    assert parsed[0].id == "test_1"
    assert str(parsed[0].seq) == "ACGT" * 40


def test_write_genbank_roundtrip():
    original = next(seqio.parse(GBK))
    buffer = io.StringIO()
    seqio.write_genbank([original], buffer)
    parsed = next(seqio.parse_genbank(io.BytesIO(buffer.getvalue().encode())))
    assert parsed.id == original.id
    assert str(parsed.seq) == str(original.seq)
    assert len(parsed.features) == len(original.features)
    cds0 = [f for f in parsed.features if f.type == "CDS"][0]
    cds0_orig = [f for f in original.features if f.type == "CDS"][0]
    assert cds0.location == cds0_orig.location
    assert cds0.qualifiers.get("translation") == cds0_orig.qualifiers.get("translation")


def test_parse_golden_cluster_gbk():
    record = next(seqio.parse(GOLDEN_CLUSTER_GBK))
    assert record.id == "BGC0001866.1_cluster_1"
    assert len(record.seq) == 32633
    cds = [f for f in record.features if f.type == "CDS"]
    misc = [f for f in record.features if f.type == "misc_feature"]
    assert len(cds) == 23
    assert len(misc) == 37  # one per features.tsv row


def test_parse_compound_locations():
    """join()/complement(join()) CDS splice their parts on extract
    (multi-exon CDS re-translation, reference `gecco/orf.py:149-201`
    via Biopython CompoundLocation; previously collapsed to the
    envelope)."""
    from gecco_tpu.seqio import _parse_location

    #            0123456789012345678
    seq =       "ATGAAATTTCCCGGGTAG"
    loc = _parse_location("join(1..6,13..18)")
    assert (loc.start, loc.end, loc.strand) == (0, 18, 1)
    assert len(loc.parts) == 2
    assert str(loc.extract(seq)) == "ATGAAAGGGTAG"
    assert len(loc) == 12

    rc = _parse_location("complement(join(1..6,13..18))")
    assert (rc.start, rc.end, rc.strand) == (0, 18, -1)
    # minus strand: parts in reverse order, each reverse-complemented
    from gecco_tpu.seq import reverse_complement

    assert str(rc.extract(seq)) == reverse_complement("ATGAAAGGGTAG")

    # offsets shift every part
    shifted = loc + 10
    assert (shifted.start, shifted.end) == (10, 28)
    assert [(p.start, p.end) for p in shifted.parts] == [(10, 16), (22, 28)]


def test_parse_origin_spanning_join():
    """Origin-wrapping joins on circular records splice in LISTED
    order, not ascending-start order (Biopython keeps file order; a
    sort would swap the segments and mistranslate)."""
    from gecco_tpu.seq import reverse_complement
    from gecco_tpu.seqio import _parse_location

    #      posn  123456789012345678
    seq =       "GGGTAGXXXXXXATGAAA"
    # gene starts at 13..18 (ATGAAA), wraps origin, ends at 1..6 (GGGTAG)
    loc = _parse_location("join(13..18,1..6)")
    assert (loc.start, loc.end, loc.strand) == (0, 18, 1)
    assert [(p.start, p.end) for p in loc.parts] == [(12, 18), (0, 6)]
    assert str(loc.extract(seq)) == "ATGAAAGGGTAG"

    rc = _parse_location("complement(join(1..6,13..18))")
    # splice order for minus strand still reverses the listed parts
    assert str(rc.extract(seq)) == reverse_complement("GGGTAGATGAAA")


def test_cds_finder_compound_translation():
    """CDSFinder re-translates a join() CDS from spliced parts when no
    `translation` qualifier is present."""
    from gecco_tpu.orf import CDSFinder
    from gecco_tpu.seq import Seq, SeqRecord
    from gecco_tpu.seqio import _parse_location

    seq = Seq("ATGAAATTTCCCGGGTAA")
    record = SeqRecord(id="x", seq=seq)
    from gecco_tpu.seq import SeqFeature

    record.features.append(SeqFeature(
        location=_parse_location("join(1..6,13..18)"), type="CDS",
        qualifiers={"locus_tag": ["x_1"]},
    ))
    (gene,) = CDSFinder().find_genes([record])
    # the stop codon translates to a trailing '*' exactly like the
    # reference's Biopython translate() on this path
    assert str(gene.protein.seq) == "MKG*"
    assert (gene.start, gene.end) == (1, 18)
