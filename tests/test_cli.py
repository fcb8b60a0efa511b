"""End-to-end CLI tests.

Mirrors the reference CLI contract (``tests/test_cli/_base.py:17-39``:
``--help`` goes to the provided stream; ``test_run.py:35-70``: an
end-to-end run produces the expected output files and one detected
cluster) using the resume (``predict``) path for golden parity since
the full Pfam library is not redistributable in this environment.
"""

import io
import json
import math
import os

import pytest

from gecco_tpu.cli import main

from conftest import reference_path

DATA = reference_path("test_cli", "data")
ORF_DATA = reference_path("test_orf", "data")
MINIPFAM = reference_path("test_hmmer", "data", "minipfam.hmm")


@pytest.mark.parametrize("command", ["annotate", "run", "predict", "train", "cv", "convert"])
def test_help_goes_to_stream(command):
    stream = io.StringIO()
    code = main([command, "--help"], stream)
    assert code == 0
    assert command in stream.getvalue() or "usage" in stream.getvalue()


def test_main_help():
    stream = io.StringIO()
    assert main(["--help"], stream) == 0
    assert "COMMAND" in stream.getvalue()


def _rows(path):
    with open(path) as f:
        return f.read().replace("\r\n", "\n").strip().split("\n")


def test_predict_golden_parity(tmp_path):
    stream = io.StringIO()
    code = main([
        "predict",
        "--genome", os.path.join(DATA, "BGC0001866.fna"),
        "-g", os.path.join(DATA, "BGC0001866.genes.tsv"),
        "-f", os.path.join(DATA, "BGC0001866.features.tsv"),
        "-o", str(tmp_path),
        "--antismash-sideload",
    ], stream)
    assert code == 0, stream.getvalue()
    for name in (
        "BGC0001866.genes.tsv", "BGC0001866.features.tsv",
        "BGC0001866.clusters.tsv", "BGC0001866.1_cluster_1.gbk",
        "BGC0001866.sideload.json",
    ):
        assert (tmp_path / name).exists(), name

    # genes.tsv probabilities within float tolerance of the golden
    mine = _rows(tmp_path / "BGC0001866.genes.tsv")
    golden = _rows(os.path.join(DATA, "BGC0001866.genes.tsv"))
    assert len(mine) == len(golden)
    for a, b in zip(mine[1:], golden[1:]):
        fa, fb = a.split("\t"), b.split("\t")
        assert fa[:5] == fb[:5]
        for x, y in zip(fa[5:], fb[5:]):
            assert abs(float(x) - float(y)) < 1e-12

    # clusters.tsv: identical coordinates / ids / membership
    mine_c = _rows(tmp_path / "BGC0001866.clusters.tsv")[1].split("\t")
    gold_c = _rows(os.path.join(DATA, "BGC0001866.clusters.tsv"))[1].split("\t")
    header = _rows(os.path.join(DATA, "BGC0001866.clusters.tsv"))[0].split("\t")
    for column, x, y in zip(header, mine_c, gold_c):
        if column in ("sequence_id", "cluster_id", "start", "end", "type", "proteins", "domains"):
            assert x == y, column

    # sideload structure matches the golden layout
    payload = json.loads((tmp_path / "BGC0001866.sideload.json").read_text())
    assert payload["records"][0]["name"] == "BGC0001866.1"
    subregion = payload["records"][0]["subregions"][0]
    assert subregion["start"] == 347
    assert subregion["end"] == 32979
    assert subregion["label"] == "Polyketide"


def test_run_fasta_end_to_end(tmp_path):
    """Full `run` on a real genome with the mini HMM library (smoke)."""
    stream = io.StringIO()
    code = main([
        "run",
        "-g", os.path.join(ORF_DATA, "BGC0001737.fna"),
        "--hmm", MINIPFAM,
        "-o", str(tmp_path),
        "--force-tsv",
    ], stream)
    assert code == 0, stream.getvalue()
    genes = _rows(tmp_path / "BGC0001737.genes.tsv")
    assert len(genes) > 5  # gene finder produced calls
    assert (tmp_path / "BGC0001737.clusters.tsv").exists()


def test_run_cds_features(tmp_path):
    """`run --cds-feature CDS` on an annotated GenBank file."""
    stream = io.StringIO()
    code = main([
        "run",
        "-g", os.path.join(ORF_DATA, "BGC0001377.gbk"),
        "--cds-feature", "CDS",
        "--hmm", MINIPFAM,
        "-o", str(tmp_path),
        "--force-tsv",
    ], stream)
    assert code == 0, stream.getvalue()
    genes = _rows(tmp_path / "BGC0001377.genes.tsv")
    assert len(genes) - 1 == 32  # all CDS features extracted


def test_convert_roundtrip(tmp_path):
    stream = io.StringIO()
    code = main([
        "predict",
        "--genome", os.path.join(DATA, "BGC0001866.fna"),
        "-g", os.path.join(DATA, "BGC0001866.genes.tsv"),
        "-f", os.path.join(DATA, "BGC0001866.features.tsv"),
        "-o", str(tmp_path),
    ], stream)
    assert code == 0, stream.getvalue()
    for fmt, expected in (
        ("fna", "BGC0001866.1_cluster_1.fna"),
        ("faa", "BGC0001866.1_cluster_1.faa"),
        ("bigslice", "BGC0001866.1.region001.gbk"),
    ):
        code = main(["convert", "gbk", "-i", str(tmp_path), "-f", fmt], stream)
        assert code == 0, stream.getvalue()
        assert (tmp_path / expected).exists(), expected
    code = main(["convert", "clusters", "-i", str(tmp_path), "-f", "gff"], stream)
    assert code == 0
    gff = (tmp_path / "BGC0001866.clusters.gff").read_text()
    assert "ID=BGC0001866.1_cluster_1" in gff


def test_predict_merge_gbk(tmp_path):
    stream = io.StringIO()
    code = main([
        "predict",
        "--genome", os.path.join(DATA, "BGC0001866.fna"),
        "-g", os.path.join(DATA, "BGC0001866.genes.tsv"),
        "-f", os.path.join(DATA, "BGC0001866.features.tsv"),
        "-o", str(tmp_path),
        "--merge-gbk",
    ], stream)
    assert code == 0, stream.getvalue()
    assert (tmp_path / "BGC0001866.clusters.gbk").exists()
