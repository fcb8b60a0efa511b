"""Tests for the Pfam build tooling (reference ``setup.py build_data``)."""

import os

import pytest
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


def test_h3m_roundtrip_matches_ascii(tmp_path):
    """Profiles pressed to binary .h3m parse back IDENTICAL to the
    ASCII originals (reference ships pressed .h3m,
    ``/root/reference/setup.py:344-372``): every probability f32-equal,
    stats/cutoffs/metadata preserved."""
    import numpy

    from gecco_tpu.hmm.h3m import read_h3m, write_h3m

    ascii_profiles = list(parse_hmmer3(MINIPFAM))
    path = str(tmp_path / "minipfam.h3m")
    write_h3m(path, ascii_profiles)
    binary_profiles = list(parse_hmmer3(path))   # io routes to read_h3m
    assert len(binary_profiles) == len(ascii_profiles)
    for a, b in zip(ascii_profiles, binary_profiles):
        assert b.name == a.name
        assert b.accession == a.accession
        assert b.length == a.length
        assert b.stats.keys() == a.stats.keys()
        for key in a.stats:
            assert b.stats[key] == pytest.approx(a.stats[key], abs=1e-5)
        assert b.cutoffs.keys() == a.cutoffs.keys()
        # binary stores f32 probabilities; ASCII-parsed values pass
        # through exp(-x) in f64 — agree to f32 resolution
        assert numpy.allclose(b.match[1:], a.match[1:], rtol=1e-6, atol=1e-9)
        assert numpy.allclose(b.insert, a.insert, rtol=1e-6, atol=1e-9)
        assert numpy.allclose(b.trans, a.trans, rtol=1e-6, atol=1e-9)
        if a.compo is not None:
            assert numpy.allclose(b.compo, a.compo, rtol=1e-6, atol=1e-9)
        assert b.map_annotation == a.map_annotation
        assert b.consensus == a.consensus


def test_h3m_search_profiles_match(tmp_path):
    """configure_local on .h3m-parsed profiles gives the same search
    scores as on the ASCII-parsed originals (end contract of VERDICT
    round-3 item 3)."""
    import numpy

    from gecco_tpu.hmm import engine
    from gecco_tpu.hmm.h3m import write_h3m
    from gecco_tpu.hmm.io import encode_sequence
    from gecco_tpu.hmm.profile import configure_local

    ascii_profiles = list(parse_hmmer3(MINIPFAM))
    path = str(tmp_path / "minipfam.h3m")
    write_h3m(path, ascii_profiles)
    binary_profiles = list(parse_hmmer3(path))
    x = encode_sequence("MKVLAADDFGHIKLMNPQRSTVWYACDEFGHIKLMNPQRST")
    for a, b in zip(ascii_profiles, binary_profiles):
        ga, gb = configure_local(a), configure_local(b)
        sa = engine.forward(ga, x).score
        sb = engine.forward(gb, x).score
        assert abs(sa - sb) < 1e-4, (a.name, sa, sb)


def test_h3m_rejects_aux_and_garbage(tmp_path):
    from gecco_tpu.hmm.h3m import read_h3m
    import pytest
    import struct

    # .h3f/.h3p style magic -> clear error naming the .h3m
    aux = tmp_path / "x.h3f"
    aux.write_bytes(struct.pack("<I", 0xB8B3E6F6) + b"\0" * 64)
    with pytest.raises(ValueError, match="h3m"):
        list(read_h3m(str(aux)))
    bad = tmp_path / "y.h3m"
    bad.write_bytes(b"\x01\x02\x03\x04" + b"\0" * 64)
    with pytest.raises(ValueError, match="magic"):
        list(read_h3m(str(bad)))


def test_build_data_press_writes_h3m(tmp_path):
    """``build_data --press`` writes the reference-layout Pfam.h3m and
    ``embedded_hmms`` discovers it when the ASCII copy is absent."""
    (tmp_path / "domains.tsv").write_text("PF10417\nPF12574\nPF00244\n")
    (tmp_path / "Pfam.ini").write_text(
        "[hmm]\nid = Pfam\nversion = 35.0\nurl = x\n"
        "relabel_with = s/(PF\\d+).\\d+/\\1/\nsize = 0\n"
    )
    build_data.main(MINIPFAM, str(tmp_path), press=True)
    assert (tmp_path / "Pfam.h3m").exists()
    (tmp_path / "Pfam.hmm.gz").unlink()
    hmms = list(embedded_hmms(str(tmp_path)))
    assert len(hmms) == 1 and hmms[0].path.endswith(".h3m")
    profiles = list(parse_hmmer3(hmms[0].path))
    assert len(profiles) == 3


def test_embedded_whitelist_size():
    """The shipped whitelist matches the reference's 2,766 domains."""
    data_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "gecco_tpu", "data"
    )
    whitelist = build_data.load_whitelist(data_dir)
    assert len(whitelist) == 2766
