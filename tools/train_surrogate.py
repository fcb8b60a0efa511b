"""Train-quality evidence on a MIBiG-shaped surrogate corpus.

The reference's training fixture (``mibig-2.0.proG2.features.tsv``) is
a git-LFS blob missing from the checkout, so training accuracy cannot
be measured on the real features.  This script builds the closest
honest surrogate from what IS present:

* the REAL 18-contig gene table (``mibig-2.0.proG2.genes.tsv``:
  15,158 genes with real coordinates/strands) and the REAL cluster
  table (18 BGCs with their MIBiG types);
* synthetic domain annotations: in-cluster genes draw domains from the
  REAL type-conditional Pfam composition vectors shipped with the
  type classifier (``compositions.npz`` over ``types.tsv`` labels),
  background genes draw from the pooled marginal at a lower rate —
  so the class signal has the true vocabulary and skew.

It then runs the real ``train`` and ``cv`` CLI paths and reports
AUROC/AUPR and seconds per L-BFGS iteration (the reference's embedded
model logs ~6.5-7.1 s/iteration on the authors' machine; BASELINE.md).

Usage: python tools/train_surrogate.py [WORKDIR]
"""

import csv
import io
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = os.environ.get("GECCO_REFERENCE", "/root/reference")
DATA = os.path.join(REFERENCE, "tests", "test_cli", "data")


def build_corpus(workdir: str, seed: int = 17):
    import numpy
    import scipy.sparse

    genes_path = os.path.join(DATA, "mibig-2.0.proG2.genes.tsv")
    clusters_path = os.path.join(DATA, "mibig-2.0.proG2.clusters.tsv")
    with open(genes_path) as f:
        genes = list(csv.DictReader(f, delimiter="\t"))
    with open(clusters_path) as f:
        clusters = list(csv.DictReader(f, delimiter="\t"))

    data_dir = os.path.join(REPO, "gecco_tpu", "data")
    with open(os.path.join(data_dir, "domains.tsv")) as f:
        domains = [line.strip() for line in f if line.strip()]
    with open(os.path.join(data_dir, "types.tsv")) as f:
        type_rows = [
            (line.split("\t") + [""])[:2]
            for line in (l.strip() for l in f) if line
        ]
    payload = numpy.load(os.path.join(data_dir, "compositions.npz"))
    comp = scipy.sparse.coo_matrix(
        (payload["data"], (payload["row"], payload["col"])),
        shape=payload["shape"],
    ).tocsr()

    # type -> pooled domain distribution over the REAL whitelist
    by_type = {}
    for r, (_bgc, labels) in enumerate(type_rows):
        for label in labels.split(";"):
            by_type.setdefault(label, []).append(r)
    type_dist = {}
    for label, rows in by_type.items():
        v = numpy.asarray(comp[rows].sum(axis=0)).ravel()
        total = v.sum()
        if total > 0:
            type_dist[label] = v / total
    marginal = numpy.asarray(comp.sum(axis=0)).ravel()
    marginal = marginal / marginal.sum()

    cluster_of = {
        c["sequence_id"]: (int(c["start"]), int(c["end"]), c["type"])
        for c in clusters
    }
    rng = numpy.random.default_rng(seed)
    feat_rows = []
    n_inside = 0
    for g in genes:
        seq_id = g["sequence_id"]
        start, end = int(g["start"]), int(g["end"])
        span = cluster_of.get(seq_id)
        inside = span is not None and start <= span[1] and end >= span[0]
        if inside:
            n_inside += 1
            dist = None
            for label in (span[2] or "").split(";"):
                if label in type_dist:
                    dist = type_dist[label]
                    break
            if dist is None:
                dist = marginal
            n_dom = 1 + int(rng.random() < 0.35)
        else:
            dist = marginal
            n_dom = 1 if rng.random() < 0.55 else 0
        for _ in range(n_dom):
            d = int(rng.choice(len(domains), p=dist))
            feat_rows.append((
                seq_id, g["protein_id"], g["start"], g["end"], g["strand"],
                domains[d], "Pfam", "35.0", "1", "50", "1e-20", "1e-24",
                "synthetic surrogate domain",
            ))

    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "features.tsv"), "w") as f:
        f.write("sequence_id\tprotein_id\tstart\tend\tstrand\tdomain\thmm\t"
                "hmm_version\tdomain_start\tdomain_end\ti_evalue\tpvalue\t"
                "description\n")
        for row in feat_rows:
            f.write("\t".join(row) + "\n")
    # pass through genes and clusters (clusters need the table schema)
    import shutil

    shutil.copy(genes_path, os.path.join(workdir, "genes.tsv"))
    with open(os.path.join(workdir, "clusters.tsv"), "w") as f:
        f.write("sequence_id\tcluster_id\tstart\tend\taverage_p\tmax_p\t"
                "type\tproteins\tdomains\n")
        for c in clusters:
            f.write("\t".join((
                c["sequence_id"], c["cluster_id"], c["start"], c["end"],
                "1.0", "1.0", c["type"], "", "",
            )) + "\n")
    print(f"surrogate corpus: {len(genes)} genes / 18 contigs, "
          f"{n_inside} in-cluster, {len(feat_rows)} domain rows")
    return workdir


def main(workdir: str = "/tmp/gecco_surrogate") -> None:
    from gecco_tpu.cli import main as cli

    build_corpus(workdir)
    model_dir = os.path.join(workdir, "model")
    args = [
        "train",
        "-g", os.path.join(workdir, "genes.tsv"),
        "-f", os.path.join(workdir, "features.tsv"),
        "-c", os.path.join(workdir, "clusters.tsv"),
        "-o", model_dir, "--seed", "42",
    ]
    t0 = time.perf_counter()
    stream = io.StringIO()
    code = cli(["-vv"] + args, stream)
    t_train = time.perf_counter() - t0
    sys.stdout.write(stream.getvalue())
    assert code == 0, code
    match = re.search(r"(\d+) iterations", stream.getvalue())
    iters = int(match.group(1)) if match else None
    print(f"train: {t_train:.1f}s total"
          + (f", {t_train/iters:.2f}s/iteration over {iters} iterations"
             if iters else ""))

    t0 = time.perf_counter()
    stream = io.StringIO()
    code = cli([
        "-vv", "cv",
        "-g", os.path.join(workdir, "genes.tsv"),
        "-f", os.path.join(workdir, "features.tsv"),
        "-c", os.path.join(workdir, "clusters.tsv"),
        "-o", os.path.join(workdir, "cv.tsv"),
        "--seed", "42",
    ], stream)
    t_cv = time.perf_counter() - t0
    sys.stdout.write(stream.getvalue())
    assert code == 0, code
    final = re.findall(r"AUROC=([0-9.]+), AUPR=([0-9.]+)", stream.getvalue())
    assert final, "no metrics logged"
    auroc, aupr = (float(v) for v in final[-1])
    print(f"cv: {t_cv:.1f}s total; overall AUROC={auroc} AUPR={aupr}")
    assert auroc > 0.8, auroc
    assert aupr > 0.5, aupr


if __name__ == "__main__":
    main(*sys.argv[1:])
