"""Tests for the Pfam build tooling (reference ``setup.py build_data``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import build_data

from gecco_tpu.hmm import embedded_hmms
from gecco_tpu.hmm.io import parse_hmmer3

from conftest import reference_path

MINIPFAM = reference_path("test_hmmer", "data", "minipfam.hmm")


def test_prune_and_discover(tmp_path):
    (tmp_path / "domains.tsv").write_text("PF10417\nPF12574\nPF00244\n")
    (tmp_path / "Pfam.ini").write_text(
        "[hmm]\nid = Pfam\nversion = 35.0\nurl = x\n"
        "relabel_with = s/(PF\\d+).\\d+/\\1/\nsize = 0\n"
    )
    build_data.main(MINIPFAM, str(tmp_path))

    hmms = list(embedded_hmms(str(tmp_path)))
    assert len(hmms) == 1
    assert hmms[0].size == 3
    assert hmms[0].md5 is not None
    profiles = list(parse_hmmer3(hmms[0].path))
    assert sorted(p.accession.split(".")[0] for p in profiles) == [
        "PF00244", "PF10417", "PF12574",
    ]
    assert all(hmms[0].relabel(p.accession) in {"PF00244", "PF10417", "PF12574"} for p in profiles)


def test_embedded_whitelist_size():
    """The shipped whitelist matches the reference's 2,766 domains."""
    data_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "gecco_tpu", "data"
    )
    whitelist = build_data.load_whitelist(data_dir)
    assert len(whitelist) == 2766
