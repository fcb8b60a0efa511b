#!/usr/bin/env python
"""On-device numeric parity check for the compiled Pallas backend.

Every kernel parity test in ``tests/`` runs ``interpret=True`` on CPU
(``tests/conftest.py`` forces ``jax_platforms=cpu``); this tool runs the
SAME contracts through the *compiled* Pallas kernels on the real TPU
and asserts the results match the XLA batch engines and the float64
host engine — a Mosaic compile/layout/precision bug on the production
path fails here, not in the field.

Checks (mirroring ``tests/test_hmm.py`` and the reference contract of
``/root/reference/tests/test_hmmer/test_pyhmmer.py:38-47``):

1. **minipfam fixture** — the production ``SearchPipeline`` with
   ``backend="pallas"`` (compiled) vs ``backend="xla"``: identical
   reported (sequence, profile) hit sets, identical envelope /
   alignment coordinates, scores within f32 tolerance; the strong-hit
   set must equal the reference's expected
   ``{PF10417, PF12574, PF00244}``.
2. **host-engine cross-check** — per reported domain, the float64 host
   ``engine.define_domains`` agrees on coordinates and bit scores.
3. **synthetic multi-domain workload** — proteins carrying 2-3 planted
   copies of the same profile: compiled-Pallas envelopes vs XLA and
   host, exercising region finding + envelope splitting on-device.

Usage: ``python tools/tpu_check.py`` — prints one line per check and
exits non-zero on any mismatch.  ``bench.py`` runs this in-process and
records ``"parity": "ok"`` in its JSON line.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy

REFERENCE = os.environ.get("GECCO_REFERENCE", "/root/reference")
MINIPFAM = os.path.join(REFERENCE, "tests", "test_hmmer", "data", "minipfam.hmm")
PROTEINS = os.path.join(REFERENCE, "tests", "test_hmmer", "data", "proteins.faa")

TOL_SCORE = 5e-3   # bits, pallas f32 vs xla path (host f64 rescore)
TOL_BITS = 5e-2    # bits, per-domain


class ParityError(AssertionError):
    pass


def _require(cond, msg):
    if not cond:
        raise ParityError(msg)


def _hit_key(h):
    return (h.sequence_index, h.profile.name)


def _compare_hits(pallas_hits, xla_hits, label):
    _require(
        [_hit_key(h) for h in pallas_hits] == [_hit_key(h) for h in xla_hits],
        f"{label}: reported hit sets differ: "
        f"pallas={[_hit_key(h) for h in pallas_hits]} "
        f"xla={[_hit_key(h) for h in xla_hits]}",
    )
    for a, b in zip(pallas_hits, xla_hits):
        _require(
            abs(a.score - b.score) < TOL_SCORE,
            f"{label}: score mismatch {_hit_key(a)}: {a.score} vs {b.score}",
        )
        _require(
            len(a.domains) == len(b.domains),
            f"{label}: domain count mismatch {_hit_key(a)}: "
            f"{len(a.domains)} vs {len(b.domains)}",
        )
        for da, db in zip(a.domains, b.domains):
            coords_a = (da.ienv, da.jenv, da.target_from, da.target_to,
                        da.hmm_from, da.hmm_to)
            coords_b = (db.ienv, db.jenv, db.target_from, db.target_to,
                        db.hmm_from, db.hmm_to)
            _require(
                coords_a == coords_b,
                f"{label}: envelope/alignment mismatch {_hit_key(a)}: "
                f"{coords_a} vs {coords_b}",
            )
            _require(
                abs(da.bitscore - db.bitscore) < TOL_BITS,
                f"{label}: domain bitscore mismatch {_hit_key(a)}: "
                f"{da.bitscore} vs {db.bitscore}",
            )


def check_minipfam():
    """Compiled pipeline on the real fixture database."""
    from gecco_tpu import seqio
    from gecco_tpu.hmm.io import encode_sequence, parse_hmmer3
    from gecco_tpu.hmm.pipeline import SearchPipeline
    from gecco_tpu.hmm.profile import configure_local

    profiles = [configure_local(p) for p in parse_hmmer3(MINIPFAM)]
    xs = [
        encode_sequence(str(r.seq)) for r in seqio.parse(PROTEINS)
    ]
    pallas = SearchPipeline(profiles, Z=10, domZ=10, backend="pallas").search(xs)
    xla = SearchPipeline(profiles, Z=10, domZ=10, backend="xla").search(xs)
    _compare_hits(pallas, xla, "minipfam")
    strong = {
        (h.sequence_index, h.profile.accession.split(".")[0])
        for h in pallas if h.evalue < 1e-6
    }
    _require(
        strong == {(0, "PF10417"), (1, "PF12574"), (2, "PF00244")},
        f"minipfam: strong hit set {strong} != reference contract",
    )
    # host-engine (float64) cross-check per reported domain
    from gecco_tpu.hmm import engine

    for h in pallas:
        expected = [
            d for d in engine.define_domains(h.profile, xs[h.sequence_index])
            if d.pvalue * 10 <= 10.0
        ]
        _require(
            len(h.domains) == len(expected),
            f"minipfam/host: domain count {_hit_key(h)}: "
            f"{len(h.domains)} vs host {len(expected)}",
        )
        for da, db in zip(h.domains, expected):
            _require(
                (da.ienv, da.jenv) == (db.ienv, db.jenv)
                and (da.target_from, da.target_to) == (db.target_from, db.target_to)
                and (da.hmm_from, da.hmm_to) == (db.hmm_from, db.hmm_to),
                f"minipfam/host: coordinates {_hit_key(h)} differ",
            )
            _require(
                abs(da.bitscore - db.bitscore) < TOL_BITS,
                f"minipfam/host: bitscore {_hit_key(h)}: "
                f"{da.bitscore} vs {db.bitscore}",
            )
    return len(pallas)


def check_multidomain():
    """2-3 planted copies of one profile per protein, compiled vs host."""
    from gecco_tpu.hmm import engine
    from gecco_tpu.hmm.calibrate import calibrate
    from gecco_tpu.hmm.pipeline import SearchPipeline
    from gecco_tpu.hmm.synthetic import plant_domain, synthetic_profiles, synthetic_proteins

    profiles = synthetic_profiles(8, min_length=30, max_length=70, seed=42)
    calibrate(profiles, n=200, L=160, seed=7)
    rng = numpy.random.default_rng(3)
    seqs = synthetic_proteins(12, mean_length=420, seed=9)
    seqs = [x[:512] for x in seqs]
    for i in range(len(seqs)):
        gm = profiles[i % len(profiles)]
        copies = 2 + (i % 2)
        x = seqs[i]
        stride = max(gm.M + 20, len(x) // (copies + 1))
        for c in range(copies):
            off = 10 + c * stride
            if off + gm.M + 10 < len(x):
                x = plant_domain(x, gm, rng, offset=off, max_len=gm.M)
        seqs[i] = x
    pallas = SearchPipeline(profiles, Z=8, domZ=8, backend="pallas").search(seqs)
    xla = SearchPipeline(profiles, Z=8, domZ=8, backend="xla").search(seqs)
    _compare_hits(pallas, xla, "multidomain")
    n_multi = sum(1 for h in pallas if len(h.domains) >= 2)
    _require(
        n_multi >= 4,
        f"multidomain: expected >=4 multi-domain hits, got {n_multi} "
        "(workload no longer exercises envelope splitting)",
    )
    return len(pallas), n_multi


def check_viterbi():
    """Compiled F2 engines: full-bank + pair-dense Viterbi vs float64 host."""
    from gecco_tpu import seqio
    from gecco_tpu.hmm import engine
    from gecco_tpu.hmm.batch import ProfileBank
    from gecco_tpu.hmm.io import encode_sequence, parse_hmmer3
    from gecco_tpu.hmm.kernels import Bucketed, PairBucketed, ViterbiKernel
    from gecco_tpu.hmm.profile import configure_local

    profiles = [configure_local(p) for p in parse_hmmer3(MINIPFAM)]
    xs = [encode_sequence(str(r.seq)) for r in seqio.parse(PROTEINS)]
    bank = ProfileBank.build(profiles)
    host = numpy.array(
        [[engine.viterbi_score(gm, x) for gm in profiles] for x in xs])
    full = Bucketed(ViterbiKernel, bank)(xs)
    _require(
        float(numpy.abs(host - full).max()) < 5e-3,
        f"viterbi/full-bank: max diff {numpy.abs(host - full).max()} vs host",
    )
    pair = PairBucketed(bank, viterbi=True)(
        xs, [list(range(len(profiles)))] * len(xs))
    worst = max(
        abs(host[s, p] - pair[(s, p)])
        for s in range(len(xs)) for p in range(len(profiles))
    )
    _require(worst < 5e-3, f"viterbi/pair-dense: max diff {worst} vs host")
    return len(xs) * len(profiles)


def run(verbose=True):
    import jax

    device = jax.devices()[0].platform
    n1 = check_minipfam()
    if verbose:
        print(f"# parity minipfam: ok ({n1} hits, device={device})",
              file=sys.stderr)
    nv = check_viterbi()
    if verbose:
        print(f"# parity viterbi: ok ({nv} pairs, device={device})",
              file=sys.stderr)
    n2, nm = check_multidomain()
    if verbose:
        print(f"# parity multidomain: ok ({n2} hits, {nm} multi-domain, "
              f"device={device})", file=sys.stderr)
    return device


def main():
    try:
        device = run()
    except ParityError as exc:
        print(f"PARITY FAILURE: {exc}", file=sys.stderr)
        sys.exit(1)
    print(f"parity: ok (device={device})")


if __name__ == "__main__":
    main()
