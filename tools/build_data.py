"""Build the embedded Pfam data assets from a local Pfam release.

Reference equivalent: ``setup.py build_data``
(``/root/reference/setup.py:273-393``) — downloads ``Pfam-A.hmm.gz``
and keeps only the 2,766 whitelisted profiles (the type classifier's
``domains.tsv``), written in binary next to a ``Pfam.ini`` descriptor.

This environment has no network egress, so the tool takes a *local*
``Pfam-A.hmm(.gz)`` (or any HMMER3 ASCII library), prunes it to the
whitelist, and writes:

* ``gecco_tpu/data/Pfam.hmm.gz``  — pruned ASCII library (portable);
* the ``size`` and ``md5`` fields of ``gecco_tpu/data/Pfam.ini``
  (md5 = MD5 over the sorted per-profile CKSUM values, mirroring the
  reference's checksum-of-checksums, ``setup.py:374-379``).

Usage:  python tools/build_data.py /path/to/Pfam-A.hmm.gz [DATA_DIR]
"""

import configparser
import gzip
import hashlib
import os
import re
import sys

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "gecco_tpu", "data")


def load_whitelist(data_dir: str) -> set:
    with open(os.path.join(data_dir, "domains.tsv")) as f:
        return {line.strip() for line in f if line.strip()}


def iter_profile_blocks(handle):
    """Yield raw text blocks, one per profile, from a HMMER3 ASCII file."""
    block = []
    for line in handle:
        block.append(line)
        if line.startswith("//"):
            yield "".join(block)
            block = []


def main(source: str, data_dir: str = DATA_DIR, press: bool = False) -> None:
    whitelist = load_whitelist(data_dir)
    opener = gzip.open if source.endswith(".gz") else open
    kept = 0
    checksums = []
    out_path = os.path.join(data_dir, "Pfam.hmm.gz")
    accession_re = re.compile(r"^ACC\s+(\S+)", re.MULTILINE)
    cksum_re = re.compile(r"^CKSUM\s+(\S+)", re.MULTILINE)
    with opener(source, "rt") as src, gzip.open(out_path, "wt") as dst:
        header_written = False
        for block in iter_profile_blocks(src):
            match = accession_re.search(block)
            if match is None:
                continue
            accession = re.sub(r"(PF\d+)\.\d+", r"\1", match.group(1))
            if accession not in whitelist:
                continue
            if not header_written:
                header_written = True
            dst.write(block)
            kept += 1
            cksum = cksum_re.search(block)
            if cksum:
                checksums.append(cksum.group(1))

    hasher = hashlib.md5()
    for value in sorted(checksums):
        hasher.update(value.encode())

    ini_path = os.path.join(data_dir, "Pfam.ini")
    cfg = configparser.ConfigParser()
    cfg.read(ini_path)
    cfg["hmm"]["size"] = str(kept)
    cfg["hmm"]["md5"] = hasher.hexdigest()
    with open(ini_path, "w") as f:
        cfg.write(f)
    print(f"kept {kept}/{len(whitelist)} whitelisted profiles -> {out_path}")
    print(f"updated {ini_path} (md5 {hasher.hexdigest()})")

    if press:
        # the reference ships the pruned library PRESSED
        # (setup.py:344-372 writes binary .h3m); mirror that layout so
        # either data directory is interchangeable
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from gecco_tpu.hmm.h3m import write_h3m
        from gecco_tpu.hmm.io import parse_hmmer3

        h3m_path = os.path.join(data_dir, "Pfam.h3m")
        write_h3m(h3m_path, list(parse_hmmer3(out_path)))
        print(f"pressed binary core models -> {h3m_path}")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--press"]
    if not argv:
        sys.exit(__doc__)
    main(*argv, press="--press" in sys.argv[1:])
