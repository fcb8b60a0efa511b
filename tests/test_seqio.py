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
