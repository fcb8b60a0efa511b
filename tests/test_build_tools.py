"""Build/data tooling: update_model + update_interpro round-trips.

Reference equivalents: ``setup.py update_model`` / ``update_interpro``
(``/root/reference/setup.py:184-238`` and ``:77-180``).
"""

import gzip
import json
import os
import sys

import numpy
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "gecco_tpu", "data")


def test_update_model_roundtrip(tmp_path):
    """A trained model dir installs into a data dir and loads back."""
    import shutil

    from update_model import update_model

    import hashlib

    model_dir = tmp_path / "model"
    data_dir = tmp_path / "data"
    model_dir.mkdir()
    for name in ("crf_model.npz", "domains.tsv",
                 "types.tsv", "compositions.npz", "forest.npz"):
        shutil.copy2(os.path.join(DATA, name), model_dir / name)
    digest = hashlib.sha256((model_dir / "crf_model.npz").read_bytes())
    (model_dir / "crf_model.npz.sha256").write_text(digest.hexdigest())
    update_model(str(model_dir), str(data_dir))
    for name in ("crf_model.npz", "domains.tsv", "types.tsv",
                 "compositions.npz", "forest.npz"):
        assert (data_dir / name).exists(), name
    from gecco_tpu.crf import ClusterCRF
    from gecco_tpu.types import TypeClassifier

    assert ClusterCRF.trained(str(data_dir)) is not None
    assert TypeClassifier.trained(str(data_dir)) is not None


def test_update_model_rejects_corrupt_checksum(tmp_path):
    import shutil

    from update_model import update_model

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    for name in ("crf_model.npz", "domains.tsv", "types.tsv",
                 "compositions.npz", "forest.npz"):
        shutil.copy2(os.path.join(DATA, name), model_dir / name)
    (model_dir / "crf_model.npz.sha256").write_text("0" * 64)
    with pytest.raises(ValueError):
        update_model(str(model_dir), str(tmp_path / "data"))


INTERPRO_XML = """<?xml version="1.0"?>
<interprodb>
 <interpro id="IPR000001" type="Domain">
  <name>Kringle</name>
  <classification id="GO:0005515" class_type="GO"/>
  <member_list>
    <db_xref db="PFAM" dbkey="PF00024"/>
  </member_list>
 </interpro>
 <interpro id="IPR000002" type="Family">
  <name>Fizzy</name>
  <classification id="GO:0016301" class_type="GO"/>
  <member_list>
    <db_xref db="PFAM" dbkey="PF12894"/>
  </member_list>
 </interpro>
</interprodb>
"""

GO_OBO = """format-version: 1.2

[Term]
id: GO:0003674
name: molecular_function
namespace: molecular_function

[Term]
id: GO:0003824
name: catalytic activity
namespace: molecular_function
is_a: GO:0003674 ! molecular_function

[Term]
id: GO:0016301
name: kinase activity
namespace: molecular_function
is_a: GO:0003824 ! catalytic activity

[Term]
id: GO:0005515
name: protein binding
namespace: molecular_function
is_a: GO:0005488 ! binding

[Term]
id: GO:0005488
name: binding
namespace: molecular_function
is_a: GO:0003674 ! molecular_function
"""


def test_update_interpro_builds_loadable_json(tmp_path):
    """XML + OBO -> interpro.json.gz readable by InterPro.load, with
    go_functions resolved to top-level molecular_function classes."""
    from update_interpro import update_interpro

    xml = tmp_path / "interpro.xml"
    obo = tmp_path / "go.obo"
    xml.write_text(INTERPRO_XML)
    obo.write_text(GO_OBO)
    out = update_interpro(str(xml), str(obo), str(tmp_path / "data"))
    data = json.load(gzip.open(out, "rt"))
    assert len(data) == 2

    from gecco_tpu.interpro import InterPro

    db = InterPro.load(out)
    entry = db.by_accession["PF00024"]
    assert entry.accession == "IPR000001"
    assert entry.go_terms[0].accession == "GO:0005515"
    # protein binding -> binding (child of the MF root)
    assert [t.accession for t in entry.go_functions] == ["GO:0005488"]
    # kinase activity -> catalytic activity
    entry2 = db.by_accession["PF12894"]
    assert [t.accession for t in entry2.go_functions] == ["GO:0003824"]


def test_embedded_interpro_fixture():
    """The embedded interpro.json (rebuilt from the golden GBK by
    tools/build_interpro_fixture.py) loads and carries the GO flow:
    Pfam member -> InterPro entry -> go_terms + top-level go_functions."""
    from gecco_tpu.interpro import InterPro

    db = InterPro.load()
    assert len(db.entries) >= 24
    entry = db.by_accession["PF07731"]
    assert entry.accession == "IPR011706"
    assert entry.name == "Multicopper oxidase, C-terminal"
    assert [t.accession for t in entry.go_terms] == ["GO:0005507", "GO:0016491"]
    assert sorted(t.name for t in entry.go_functions) == [
        "binding", "catalytic activity"]
    assert all(t.namespace == "molecular_function" for t in entry.go_functions)
    # a Pfam with no InterPro entry resolves to None
    assert db.by_accession.get("PF13489") is None


def test_interpro_lookup_warns_once_on_missing_accession():
    """A miss on the fixture database warns exactly once per process
    (the shipped interpro.json covers the test corpus only; the
    recovery path is tools/update_interpro.py)."""
    import warnings

    import pytest

    from gecco_tpu.interpro import InterPro

    db = InterPro.load()
    old = InterPro._warned_missing
    try:
        InterPro._warned_missing = False
        with pytest.warns(UserWarning, match="update_interpro"):
            assert db.lookup("PF99999") is None
        with warnings.catch_warnings():
            warnings.simplefilter("error")     # a second warning would raise
            assert db.lookup("PF99998") is None
            assert db.lookup(None) is None
    finally:
        InterPro._warned_missing = old
