"""Deterministic synthetic profile/sequence generators for tests & benchmarks.

The full 2,766-profile Pfam subset the reference downloads at install
time (``setup.py:344-372``) cannot be fetched in a hermetic
environment; benchmarks therefore run on synthetic banks with a
Pfam-like length distribution, which exercise exactly the same kernels.
"""

from typing import List, Tuple

import numpy

from .io import BACKGROUND_F, ProfileHMM
from .profile import SearchProfile, configure_local

__all__ = ["synthetic_profiles", "synthetic_proteins", "plant_domain"]


def synthetic_profiles(
    count: int,
    min_length: int = 40,
    max_length: int = 250,
    seed: int = 0,
) -> List[SearchProfile]:
    """Generate ``count`` random-but-plausible configured profiles."""
    rng = numpy.random.default_rng(seed)
    profiles = []
    for p in range(count):
        M = int(rng.integers(min_length, max_length + 1))
        match = rng.dirichlet(numpy.full(20, 0.3), size=M + 1)
        insert = numpy.tile(BACKGROUND_F, (M + 1, 1))
        trans = numpy.zeros((M + 1, 7))
        for k in range(M + 1):
            mm = rng.dirichlet(numpy.array([50.0, 1.0, 1.0]))
            trans[k] = [mm[0], mm[1], mm[2], 0.5, 0.5, 0.6, 0.4]
        trans[M] = [1.0, 0.0, 0.0, 0.5, 0.5, 1.0, 0.0]
        hmm = ProfileHMM(
            name=f"SYN{p:05d}", accession=f"SY{p:05d}.1", description=None,
            length=M, alphabet="amino", match=match, insert=insert, trans=trans,
            stats={
                "MSV": (-8.0 - 0.01 * (M // 10), 0.70),
                "VITERBI": (-9.0, 0.70),
                "FORWARD": (-5.0, 0.70),
            },
        )
        profiles.append(configure_local(hmm))
    return profiles


def synthetic_proteins(
    count: int,
    mean_length: int = 280,
    seed: int = 1,
) -> List["numpy.ndarray"]:
    """Generate encoded protein sequences with background composition."""
    rng = numpy.random.default_rng(seed)
    lengths = numpy.clip(
        rng.gamma(4.0, mean_length / 4.0, size=count).astype(int), 40, 4 * mean_length
    )
    p = BACKGROUND_F / BACKGROUND_F.sum()
    return [
        rng.choice(20, size=int(L), p=p).astype(numpy.int32)
        for L in lengths
    ]


def plant_domain(
    x: "numpy.ndarray",
    gm: SearchProfile,
    rng: "numpy.random.Generator",
    offset: int = 10,
    max_len: int = 100,
    divergence: float = 0.35,
) -> "numpy.ndarray":
    """Overwrite part of ``x`` with residues emitted from the profile.

    Samples a match-state path (emissions drawn from each node's match
    distribution, occasional node skips, ``divergence`` of positions
    substituted with background draws) so the sequence genuinely
    scores against ``gm`` — used to give benchmark workloads
    production-like hit rates so the domain-definition stage is
    exercised.  The divergence matters for load realism: a verbatim
    emission trace is a ~100%-identity hit, which passes the weak SSV
    filter against hundreds of unrelated profiles; real Pfam hits are
    diverged homologs (seed alignments sit at ~30-60% identity) whose
    cross-profile filter pass rate stays near the calibrated 2%.
    """
    match = gm.hmm.match[1:, :20]
    cdf = numpy.cumsum(match / match.sum(axis=1, keepdims=True), axis=1)
    u = rng.random((len(cdf), 1))
    emitted = (u > cdf).sum(axis=1).astype(numpy.int32)
    emitted = numpy.minimum(emitted, 19)
    p_bg = BACKGROUND_F / BACKGROUND_F.sum()
    mutate = rng.random(len(emitted)) < divergence
    emitted[mutate] = rng.choice(20, size=int(mutate.sum()), p=p_bg)
    keep = rng.random(len(emitted)) > 0.08          # ~8% deletions
    emitted = emitted[keep][:max_len]
    n = min(len(emitted), len(x) - offset)
    if n <= 0:
        return x
    out = x.copy()
    out[offset : offset + n] = emitted[:n]
    return out
