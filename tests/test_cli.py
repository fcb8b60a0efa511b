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

    # clusters.tsv: EVERY column byte-equal except average_p/max_p,
    # which carry the CRF's last-ulp float divergence from CRFsuite
    # (genes.tsv marginals match to <1e-12; the mean/max of 23 of them
    # differs in the final digit).  Type probabilities are byte-equal:
    # the frozen forest replays sklearn's exact arithmetic.
    mine_c = _rows(tmp_path / "BGC0001866.clusters.tsv")[1].split("\t")
    gold_c = _rows(os.path.join(DATA, "BGC0001866.clusters.tsv"))[1].split("\t")
    header = _rows(os.path.join(DATA, "BGC0001866.clusters.tsv"))[0].split("\t")
    assert _rows(tmp_path / "BGC0001866.clusters.tsv")[0].split("\t") == header
    for column, x, y in zip(header, mine_c, gold_c):
        if column in ("average_p", "max_p"):
            assert abs(float(x) - float(y)) < 1e-14, column
        else:
            assert x == y, column

    # sideload JSON: byte-equal after normalizing the tool identity
    # (the reference golden was written by GECCO v0.9.6)
    payload = json.loads((tmp_path / "BGC0001866.sideload.json").read_text())
    golden_payload = json.loads(
        open(os.path.join(DATA, "BGC0001866.sideload.json")).read())
    assert payload["tool"].pop("name") == "GECCO-TPU"
    golden_payload["tool"].pop("name")
    payload["tool"].pop("version"), golden_payload["tool"].pop("version")
    assert payload == golden_payload


def _normalize_gbk(text):
    """Drop the volatile lines of a GECCO cluster GenBank record.

    Normalized: the LOCUS line date, ``version``/``creation_date``
    structured-comment lines, and CDS ``/inference`` lines — genes.tsv
    does not record the calling tool, so the resume path cannot know the
    golden's ``Pyrodigal:2.0.4`` string (the reference's own loader
    loses it the same way, ``gecco/model.py:815-835``).
    """
    import re

    out = []
    for line in text.replace("\r\n", "\n").split("\n"):
        if line.startswith("LOCUS"):
            line = re.sub(r"\d{2}-[A-Z]{3}-\d{4}$", "<DATE>", line)
        if re.match(r"\s+(version|creation_date)\s+::", line):
            continue
        if '/inference="ab initio prediction:' in line:
            continue
        out.append(line)
    return "\n".join(out)


def test_predict_golden_gbk_byte_parity(tmp_path):
    """The predicted cluster GenBank matches the reference golden
    line-for-line (normalized per `_normalize_gbk`): coordinates,
    qualifiers, InterPro/GO metadata, functions, colors, translations
    and sequence block are all byte-identical."""
    stream = io.StringIO()
    code = main([
        "predict",
        "--genome", os.path.join(DATA, "BGC0001866.fna"),
        "-g", os.path.join(DATA, "BGC0001866.genes.tsv"),
        "-f", os.path.join(DATA, "BGC0001866.features.tsv"),
        "-o", str(tmp_path),
    ], stream)
    assert code == 0, stream.getvalue()
    mine = _normalize_gbk((tmp_path / "BGC0001866.1_cluster_1.gbk").read_text())
    golden = _normalize_gbk(
        open(os.path.join(DATA, "BGC0001866.1_cluster_1.gbk")).read())
    assert mine.splitlines() == golden.splitlines()


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


def test_annotate_devices_flag_matches_single(tmp_path):
    """`annotate --devices N` (single-process data parallelism over
    local devices) writes the same feature table as one device."""
    import jax

    # the comparison is only meaningful when the multi-device path
    # actually shards (conftest forces 8 virtual CPU devices)
    assert len(jax.local_devices()) >= 4
    args = [
        "annotate",
        "-g", os.path.join(ORF_DATA, "BGC0001737.fna"),
        "--hmm", MINIPFAM, "--force-tsv",
    ]
    single_dir = tmp_path / "single"
    multi_dir = tmp_path / "multi"
    assert main(args + ["-o", str(single_dir)], io.StringIO()) == 0
    assert main(args + ["-o", str(multi_dir), "--devices", "4"],
                io.StringIO()) == 0
    single = (single_dir / "BGC0001737.features.tsv").read_bytes()
    multi = (multi_dir / "BGC0001737.features.tsv").read_bytes()
    assert single == multi and len(single.splitlines()) > 1


def test_run_detects_planted_cluster(tmp_path):
    """`run` on a synthetic genome with a planted multi-gene BGC finds
    EXACTLY one cluster with the right bounds (the reference's own run
    test asserts one detected cluster on its test genome,
    `/root/reference/tests/test_cli/test_run.py:35-70`).

    The genome carries 7 consecutive genes whose proteins embed
    minipfam domains that a purpose-trained CRF weights positively,
    inside domain-free flanks; the full de-novo path runs: gene
    calling -> profile-HMM annotation -> CRF -> refinement -> typing.
    """
    import numpy

    from gecco_tpu.hmm.io import AMINO_ALPHABET, BACKGROUND_F, parse_hmmer3
    from gecco_tpu.hmm.profile import configure_local
    from gecco_tpu.model import (
        ClusterTable, Domain, FeatureTable, Gene, GeneTable, Protein, Strand)
    from gecco_tpu.seq import Seq, SeqRecord, translate

    profiles = [configure_local(p) for p in parse_hmmer3(MINIPFAM)]
    # mid-sized models: a near-full-length planted instance scores
    # far below the 1e-9 domain p-value filter
    wanted = ("PF16998", "PF00389", "PF02826")
    cluster_profiles = [
        p for p in profiles if p.accession.split(".")[0] in wanted]
    cluster_accs = [p.accession.split(".")[0] for p in cluster_profiles]

    # ---- train a model whose CRF weights those accessions positively
    rng = numpy.random.default_rng(9)
    corpus = []
    for c in range(4):
        source = SeqRecord(id=f"ctg{c}", seq=Seq(""))
        lo, hi = 10, 20
        for i in range(30):
            inside = lo <= i < hi
            domains = []
            if inside and rng.random() < 0.9:
                domains.append(Domain(
                    cluster_accs[int(rng.integers(0, 3))], 1, 10, "Pfam",
                    1e-10, 1e-12, probability=1.0))
            corpus.append(Gene(
                source, i * 100 + 1, i * 100 + 90, Strand.Coding,
                Protein(f"ctg{c}_{i+1}", Seq("M"), domains),
                _probability=1.0 if inside else 0.0,
            ))
    with open(tmp_path / "genes.tsv", "wb") as f:
        GeneTable.from_genes(corpus).dump(f)
    with open(tmp_path / "features.tsv", "wb") as f:
        FeatureTable.from_genes(corpus).dump(f)
    rows = {"sequence_id": [], "cluster_id": [], "start": [], "end": [],
            "average_p": [], "max_p": [], "type": [], "proteins": [],
            "domains": []}
    for c in range(4):
        rows["sequence_id"].append(f"ctg{c}")
        rows["cluster_id"].append(f"ctg{c}_cluster_1")
        rows["start"].append(10 * 100 + 1)
        rows["end"].append(19 * 100 + 90)
        rows["average_p"].append(1.0)
        rows["max_p"].append(1.0)
        rows["type"].append("Polyketide")
        rows["proteins"].append("")
        rows["domains"].append("")
    with open(tmp_path / "clusters.tsv", "wb") as f:
        ClusterTable(rows).dump(f)
    model_dir = tmp_path / "model"
    stream = io.StringIO()
    code = main([
        "train", "-g", str(tmp_path / "genes.tsv"),
        "-f", str(tmp_path / "features.tsv"),
        "-c", str(tmp_path / "clusters.tsv"),
        "-o", str(model_dir), "-W", "10", "--c1", "0.05", "--seed", "42",
    ], stream)
    assert code == 0, stream.getvalue()

    # ---- synthesize the genome: 8 clean flank genes, 7 planted, 8 flank
    codon_of = {}
    for a in "ACGT":
        for b in "ACGT":
            for c in "ACGT":
                codon = a + b + c
                codon_of.setdefault(translate(codon), []).append(codon)
    p_bg = BACKGROUND_F / BACKGROUND_F.sum()

    def protein_dna(planted_with=None):
        x = rng.choice(20, size=200, p=p_bg).astype(numpy.int32)
        if planted_with is not None:
            # consensus (per-node argmax) instance: an unambiguous,
            # full-strength hit (sampled emissions average only
            # ~0.3 bit/node against real Pfam match rows)
            cons = numpy.argmax(
                planted_with.hmm.match[1:, :20], axis=1)[:170]
            x[20 : 20 + len(cons)] = cons
        aas = "".join(AMINO_ALPHABET[i] for i in x)
        codons = [codon_of[aa][int(rng.integers(0, len(codon_of[aa])))]
                  for aa in aas]
        return "ATG" + "".join(codons) + "TAA"

    def spacer():
        return "".join("ACGT"[int(rng.integers(0, 4))] for _ in range(60))

    parts, gene_spans, planted_span = [], [], [None, None]
    pos = 0
    for i in range(23):
        s = spacer()
        parts.append(s)
        pos += len(s)
        gm = cluster_profiles[i % 3] if 8 <= i < 15 else None
        dna = protein_dna(gm)
        parts.append(dna)
        gene_spans.append((pos + 1, pos + len(dna)))
        if 8 <= i < 15:
            if planted_span[0] is None:
                planted_span[0] = pos + 1
            planted_span[1] = pos + len(dna)
        pos += len(dna)
    genome = "".join(parts)
    with open(tmp_path / "planted.fna", "w") as f:
        f.write(">planted\n")
        for k in range(0, len(genome), 70):
            f.write(genome[k : k + 70] + "\n")

    # ---- full de-novo run
    out_dir = tmp_path / "out"
    stream = io.StringIO()
    code = main([
        "run", "-g", str(tmp_path / "planted.fna"),
        "--hmm", MINIPFAM, "--model", str(model_dir),
        "-o", str(out_dir), "--force-tsv",
    ], stream)
    assert code == 0, stream.getvalue()
    import csv

    with open(out_dir / "planted.clusters.tsv") as f:
        clusters = list(csv.DictReader(f, delimiter="\t"))
    assert len(clusters) == 1, clusters
    (cluster,) = clusters
    start, end = int(cluster["start"]), int(cluster["end"])
    # bounds inside the planted region, within one gene+spacer of slack
    assert planted_span[0] - 700 <= start <= planted_span[0] + 700
    assert planted_span[1] - 700 <= end <= planted_span[1] + 700
    assert float(cluster["average_p"]) > 0.8
    assert cluster["proteins"].count(";") >= 3  # multi-gene cluster


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


def test_cv_end_to_end(tmp_path):
    """`gecco cv` on a synthetic corpus: k-fold fit -> held-out predict
    -> fold table with `fold`/`is_cluster` columns -> AUROC/AUPR > 0.8
    (the reference only smoke-tests `cv --help`; SURVEY.md §4 calls for
    better).  Matches `gecco/cli/commands/cv.py:175-217` behavior."""
    from gecco_tpu.model import ClusterTable, FeatureTable, GeneTable
    from test_train import _synthetic_genes

    genes = _synthetic_genes(n_contigs=6, length=40, seed=3)
    with open(tmp_path / "genes.tsv", "wb") as f:
        GeneTable.from_genes(genes).dump(f)
    with open(tmp_path / "features.tsv", "wb") as f:
        FeatureTable.from_genes(genes).dump(f)
    # cluster rows = the contiguous probability-1 runs of each contig
    rows = {"sequence_id": [], "cluster_id": [], "start": [], "end": [],
            "average_p": [], "max_p": [], "type": [],
            "proteins": [], "domains": []}
    by_source = {}
    for g in genes:
        by_source.setdefault(g.source.id, []).append(g)
    for seq_id, group in by_source.items():
        inside = [g for g in group if g.average_probability == 1.0]
        rows["sequence_id"].append(seq_id)
        rows["cluster_id"].append(f"{seq_id}_cluster_1")
        rows["start"].append(min(g.start for g in inside))
        rows["end"].append(max(g.end for g in inside))
        rows["average_p"].append(1.0)
        rows["max_p"].append(1.0)
        rows["type"].append("Polyketide")
        rows["proteins"].append(";".join(g.protein.id for g in inside))
        rows["domains"].append("")
    with open(tmp_path / "clusters.tsv", "wb") as f:
        ClusterTable(rows).dump(f)

    stream = io.StringIO()
    code = main([
        "cv",
        "-g", str(tmp_path / "genes.tsv"),
        "-f", str(tmp_path / "features.tsv"),
        "-c", str(tmp_path / "clusters.tsv"),
        "-o", str(tmp_path / "cv.tsv"),
        "--splits", "3", "-W", "10", "--c1", "0.05", "--c2", "0.0",
        "--seed", "42",
    ], stream)
    assert code == 0, stream.getvalue()

    rows = _rows(tmp_path / "cv.tsv")
    header = rows[0].split("\t")
    assert header[-2:] == ["fold", "is_cluster"]
    folds = set()
    labels, probas = [], []
    for line in rows[1:]:
        fields = line.split("\t")
        folds.add(fields[-2])
        labels.append(fields[-1] == "true")
        probas.append(float(fields[header.index("average_p")]))
    assert folds == {"1", "2", "3"}
    assert len(labels) == len(genes)  # every gene predicted exactly once

    from gecco_tpu.crf.metrics import average_precision_score, roc_auc_score

    auroc = roc_auc_score(labels, probas)
    aupr = average_precision_score(labels, probas)
    assert math.isfinite(auroc) and math.isfinite(aupr)
    assert auroc > 0.8, auroc
    assert aupr > 0.8, aupr


def test_train_end_to_end(tmp_path):
    """`gecco train` on the synthetic corpus writes a complete model
    directory that `predict --model` can consume (reference contract:
    `tests/test_cli/test_train.py` asserts the model artifacts are
    written; here the round trip is also exercised)."""
    from gecco_tpu.model import ClusterTable, FeatureTable, GeneTable
    from test_train import _synthetic_genes

    genes = _synthetic_genes(n_contigs=4, length=30, seed=7)
    with open(tmp_path / "genes.tsv", "wb") as f:
        GeneTable.from_genes(genes).dump(f)
    with open(tmp_path / "features.tsv", "wb") as f:
        FeatureTable.from_genes(genes).dump(f)
    rows = {"sequence_id": [], "cluster_id": [], "start": [], "end": [],
            "average_p": [], "max_p": [], "type": [],
            "proteins": [], "domains": []}
    by_source = {}
    for g in genes:
        by_source.setdefault(g.source.id, []).append(g)
    for seq_id, group in by_source.items():
        inside = [g for g in group if g.average_probability == 1.0]
        rows["sequence_id"].append(seq_id)
        rows["cluster_id"].append(f"{seq_id}_cluster_1")
        rows["start"].append(min(g.start for g in inside))
        rows["end"].append(max(g.end for g in inside))
        rows["average_p"].append(1.0)
        rows["max_p"].append(1.0)
        rows["type"].append("Polyketide" if seq_id < "ctg2" else "Terpene")
        rows["proteins"].append(";".join(g.protein.id for g in inside))
        rows["domains"].append("")
    with open(tmp_path / "clusters.tsv", "wb") as f:
        ClusterTable(rows).dump(f)

    model_dir = tmp_path / "model"
    stream = io.StringIO()
    code = main([
        "train",
        "-g", str(tmp_path / "genes.tsv"),
        "-f", str(tmp_path / "features.tsv"),
        "-c", str(tmp_path / "clusters.tsv"),
        "-o", str(model_dir),
        "-W", "10", "--c1", "0.05", "--c2", "0.0", "--seed", "42",
    ], stream)
    assert code == 0, stream.getvalue()
    for name in ("crf_model.npz", "crf_model.npz.sha256", "model.trans.tsv",
                 "model.state.tsv", "domains.tsv", "types.tsv",
                 "compositions.npz", "forest.npz"):
        assert (model_dir / name).exists(), name

    # the written directory round-trips as a --model input: load and
    # predict on probability-stripped genes (the synthetic corpus has no
    # genome file, so the reload is exercised at the API level)
    from gecco_tpu.crf import ClusterCRF

    crf = ClusterCRF.trained(model_dir)
    assert crf.fitted
    predicted = crf.predict_probabilities([
        g.with_probability(0.0) for g in genes
    ])
    truth = {g.protein.id: g.average_probability for g in genes}
    inside = [g.average_probability for g in predicted if truth[g.protein.id] == 1.0]
    outside = [g.average_probability for g in predicted if truth[g.protein.id] == 0.0]
    import numpy

    assert numpy.mean(inside) > 0.7
    assert numpy.mean(outside) < 0.3
