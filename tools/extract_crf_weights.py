"""Extract open-format CRF weights from the reference GECCO model pickle.

The reference ships its trained model as ``gecco/crf/model.pkl`` — a pickle
of ``ClusterCRF`` holding a ``sklearn_crfsuite.CRF`` whose fitted weights
live in an embedded CRFsuite binary model ("lCRF" container, see the
CRFsuite ``crf1d_model.c`` on-disk format).  This tool parses that
container *without* importing any of those libraries (they are not
installed) and writes the weights to ``gecco_tpu/data/crf_model.npz``:

* ``attr_names``   — (A,) attribute (= Pfam domain) names
* ``label_names``  — (L,) label names (``'0'``, ``'1'``)
* ``state``        — (A, L) float64 state feature weights
* ``trans``        — (L, L) float64 transition weights
* ``sig_names`` / ``sig_pvalues`` — Fisher significance map kept for
  retraining workflows (``gecco/crf/__init__.py:143``)
* scalar metadata: feature_type, window_size, window_step, algorithm, c1, c2

Usage:  python tools/extract_crf_weights.py [SRC_PKL] [DST_NPZ]
"""

import pickle
import struct
import sys

import numpy

DEFAULT_SRC = "/root/reference/gecco/crf/model.pkl"
DEFAULT_DST = "gecco_tpu/data/crf_model.npz"

FT_STATE = 0
FT_TRANS = 1


class _Stub:
    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        self.__dict__["_state"] = state


class _StubUnpickler(pickle.Unpickler):
    """Unpickle without the original class definitions installed."""

    def find_class(self, module, name):
        if module == "builtins":
            import builtins

            return getattr(builtins, name)
        return type(name, (_Stub,), {"_module": module})


def _state(obj):
    return obj.__dict__.get("_state", obj.__dict__)


def parse_cqdb(blob: bytes, offset: int):
    """Decode a CRFsuite 'constant quark database' chunk into id→string.

    Layout: header {magic 'CQDB', uint32 chunk_size, flag, byteorder,
    bwd_size, bwd_offset} then 256 hash tables; the backward array at
    ``bwd_offset`` maps each id to its record offset; records are
    {uint32 id, uint32 key_size, key bytes (NUL-terminated)}.
    """
    magic, _size, _flag, _bo, bwd_size, bwd_offset = struct.unpack_from("<4s5I", blob, offset)
    if magic != b"CQDB":
        raise ValueError(f"bad CQDB magic at {offset}: {magic!r}")
    names = {}
    positions = struct.unpack_from(f"<{bwd_size}I", blob, offset + bwd_offset)
    for ident, pos in enumerate(positions):
        rec_id, key_size = struct.unpack_from("<2I", blob, offset + pos)
        key = blob[offset + pos + 8 : offset + pos + 8 + key_size]
        names[rec_id] = key.rstrip(b"\x00").decode()
        if rec_id != ident:
            # backward array is indexed by id; trust the record's own id
            pass
    return [names[i] for i in range(len(names))]


def parse_lcrf(blob: bytes):
    """Parse an lCRF binary model into (labels, attrs, state_w, trans_w)."""
    (magic, _size, model_type, _version,
     _num_features, num_labels, num_attrs,
     off_features, off_labels, off_attrs,
     _off_labelrefs, _off_attrrefs) = struct.unpack_from("<4sI4s9I", blob, 0)
    if magic != b"lCRF" or model_type != b"FOMC":
        raise ValueError(f"not a first-order Markov CRFsuite model: {magic!r}/{model_type!r}")

    labels = parse_cqdb(blob, off_labels)
    attrs = parse_cqdb(blob, off_attrs)
    if len(labels) != num_labels or len(attrs) != num_attrs:
        raise ValueError("CQDB cardinality mismatch")

    feat_magic, _chunk_size, num = struct.unpack_from("<4s2I", blob, off_features)
    if feat_magic != b"FEAT":
        raise ValueError(f"bad FEAT magic: {feat_magic!r}")
    state = numpy.zeros((num_attrs, num_labels), dtype=numpy.float64)
    trans = numpy.zeros((num_labels, num_labels), dtype=numpy.float64)
    pos = off_features + 12
    for _ in range(num):
        ftype, src, dst = struct.unpack_from("<3I", blob, pos)
        (weight,) = struct.unpack_from("<d", blob, pos + 12)
        pos += 20
        if ftype == FT_STATE:
            state[src, dst] = weight
        elif ftype == FT_TRANS:
            trans[src, dst] = weight
        else:
            raise ValueError(f"unknown feature type {ftype}")
    return labels, attrs, state, trans


def main(src: str = DEFAULT_SRC, dst: str = DEFAULT_DST) -> None:
    with open(src, "rb") as f:
        obj = _StubUnpickler(f).load()
    top = _state(obj)
    crf = _state(top["model"])
    blob = _state(crf["modelfile"])["__FILE_RESOURCE_DATA__"]
    labels, attrs, state, trans = parse_lcrf(blob)

    significance = top.get("significance") or {}
    sig_names = numpy.array(sorted(significance), dtype=object)
    sig_pvalues = numpy.array([significance[k] for k in sig_names], dtype=numpy.float64)

    numpy.savez_compressed(
        dst,
        attr_names=numpy.array(attrs, dtype=object),
        label_names=numpy.array(labels, dtype=object),
        state=state,
        trans=trans,
        sig_names=sig_names,
        sig_pvalues=sig_pvalues,
        feature_type=numpy.array(top["feature_type"]),
        window_size=numpy.array(top["window_size"]),
        window_step=numpy.array(top["window_step"]),
        algorithm=numpy.array(top["algorithm"]),
        c1=numpy.array(crf.get("c1", 0.0)),
        c2=numpy.array(crf.get("c2", 0.0)),
    )
    active = int((state != 0).sum() + (trans != 0).sum())
    print(
        f"wrote {dst}: {len(attrs)} attrs × {len(labels)} labels, "
        f"{active} active weights, window={top['window_size']}/{top['window_step']}, "
        f"features={top['feature_type']}, c1={crf.get('c1')}, c2={crf.get('c2')}"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
