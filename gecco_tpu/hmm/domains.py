"""Device-side domain definition (pipeline stage 3).

The reference gets this stage from HMMER's C ``p7_domaindef`` through
pyhmmer (``/root/reference/gecco/hmmer/__init__.py:131-140``): for every
pair that survives the Forward filter it posterior-decodes the
sequence, finds high-homology regions, splits them into envelopes, and
scores/aligns each envelope.  Running that per pair on the Python host
costs ~100 ms; at real Pfam hit rates (~1-2 reported domains per gene)
it dominates whole-genome latency.

This module drives the two Pallas kernels that move the O(L·M) work
on-device, keeping only the O(L) region/threshold logic on the host:

1. :class:`~gecco_tpu.hmm.kernels.PairPosteriorKernel` — full-sequence
   Forward+Backward per pair with ``mocc``/``pB``/``pE`` trajectories;
2. host region finding + envelope splitting (the same
   ``engine._find_regions`` / ``engine._split_region`` heuristics);
3. :class:`~gecco_tpu.hmm.kernels.PairAlignKernel` — per envelope: the
   envelope Forward rescore, null2 occupancy statistics, and the
   optimal-accuracy alignment endpoints (traceback-free).

Profiles are routed to padded-width buckets like the other pair
kernels; pairs whose ``Lp × Mp`` footprint exceeds the VMEM budget of
the alignment kernel's backward-plane scratch fall back to the exact
float64 host engine (``engine.define_domains``).
"""

import math
from typing import Dict, List, Sequence, Tuple

import numpy

from . import engine
from .batch import ProfileBank, _round_up
from .engine import DomainHit, Posterior, exp_surv
from .profile import SearchProfile, length_model, null1_score

__all__ = ["PairDomains"]

LOG2 = math.log(2.0)

#: max Lp × Mp for the device alignment kernel (2 bf16 [Lp, 8, Mp]
#: backward-plane scratch rings must fit VMEM next to the DP state)
_VMEM_CELLS = 512 * 512


class PairDomains:
    """Bucketed device domain definition over a profile bank."""

    def __init__(self, bank: ProfileBank, profiles: Sequence[SearchProfile],
                 lane: int = 128):
        from .kernels import PairAlignKernel, PairPosteriorKernel

        self.bank = bank
        self.profiles = list(profiles)
        self.buckets: List[Tuple["numpy.ndarray", object, object]] = []
        caps: Dict[int, List[int]] = {}
        for i, m in enumerate(bank.lengths):
            caps.setdefault(_round_up(max(8, int(m) + 1), lane), []).append(i)
        self.local = numpy.zeros((bank.P, 2), dtype=numpy.int32)
        self.cap_of_bucket: List[int] = []
        for b, cap in enumerate(sorted(caps)):
            idx = numpy.asarray(caps[cap], dtype=numpy.int64)
            self.local[idx, 0] = b
            self.local[idx, 1] = numpy.arange(len(idx), dtype=numpy.int32)
            sub = bank.select(idx, lane=lane, width=cap)
            self.buckets.append((idx, PairPosteriorKernel(sub), PairAlignKernel(sub)))
            self.cap_of_bucket.append(cap)

    def define(
        self,
        sequences: Sequence["numpy.ndarray"],
        pairs: Sequence[Tuple[int, int]],
        pad_to: int,
        interpret: bool = False,
    ) -> Dict[Tuple[int, int], List[DomainHit]]:
        """Domain hits per (sequence_index, profile_index) pair.

        Same per-envelope numbers as ``engine.define_domains`` within
        f32 tolerance (device path), or exactly (host fallback for
        pairs too large for the alignment kernel's VMEM scratch).
        """
        out: Dict[Tuple[int, int], List[DomainHit]] = {}
        by_bucket: Dict[int, List[Tuple[int, int]]] = {}
        for (s, p) in pairs:
            L = len(sequences[s])
            Lp = 1 << max(5, int(math.ceil(math.log2(max(1, L)))))
            b = int(self.local[p, 0])
            if Lp * self.cap_of_bucket[b] > _VMEM_CELLS:
                gm = self.profiles[p]
                out[(s, p)] = engine.define_domains(gm, sequences[s])
                continue
            by_bucket.setdefault(b, []).append((s, p))

        for b, members in sorted(by_bucket.items()):
            idx, post_kern, align_kern = self.buckets[b]
            grouped: Dict[int, List[int]] = {}
            for s, p in members:
                grouped.setdefault(s, []).append(int(self.local[p, 1]))
            # cap pairs per kernel row (a low-complexity sequence with
            # hundreds of candidates would inflate the whole batch's
            # gather footprint): chunk into several rows per sequence
            entries: List[Tuple[int, List[int]]] = []
            for s, locs in grouped.items():
                for c0 in range(0, len(locs), 8):
                    entries.append((s, locs[c0 : c0 + 8]))
            C0 = max(len(locs) for _, locs in entries)
            pair_idx = numpy.zeros((len(entries), C0), dtype=numpy.int32)
            for n, (_s, locs) in enumerate(entries):
                pair_idx[n, : len(locs)] = locs
            seqs_b = [sequences[s] for s, _ in entries]
            score, mocc, pb, pe = post_kern(
                seqs_b, pair_idx, pad_to=pad_to, interpret=interpret
            )
            where: Dict[Tuple[int, int], Tuple[int, int]] = {}
            for n, (s, locs) in enumerate(entries):
                for c, loc in enumerate(locs):
                    where[(s, loc)] = (n, c)

            # host: regions -> envelopes from the device trajectories
            envelopes: List[Tuple[int, int, int, int]] = []
            totals: List[float] = []
            env_pair: List[Tuple[int, int]] = []
            for s, p in members:
                n, c = where[(s, int(self.local[p, 1]))]
                L = len(sequences[s])
                post = Posterior(
                    ppM=None, ppI=None,
                    mocc=numpy.concatenate(([0.0], mocc[n, c, :L])),
                    btot=numpy.concatenate(([0.0], numpy.cumsum(pb[n, c, :L]))),
                    etot=numpy.concatenate(([0.0], numpy.cumsum(pe[n, c, :L]))),
                )
                for start, end in engine._find_regions(post, L):
                    for ienv, jenv in engine._split_region(post, start, end):
                        envelopes.append((n, int(self.local[p, 1]), ienv, jenv))
                        totals.append(float(score[n, c]))
                        env_pair.append((s, p))
                out.setdefault((s, p), [])

            if not envelopes:
                continue
            res = align_kern(
                seqs_b, envelopes, totals, pad_to=pad_to, interpret=interpret
            )
            for (s, p), (n, _loc, ienv, jenv), r in zip(env_pair, envelopes, res):
                gm = self.profiles[p]
                x = sequences[s]
                L = len(x)
                loop, _ = length_model(L)
                Ld = jenv - ienv + 1
                envsc = r["envsc"] + (L - Ld) * loop
                odds = numpy.exp(numpy.where(
                    numpy.isfinite(gm.msc[1:, :]), gm.msc[1:, :], -745.0))
                matocc = r["matocc"][: gm.M]
                total_occ = matocc.sum() + r["insocc"] + r["xocc"]
                null2 = (matocc @ odds + (r["insocc"] + r["xocc"])) / max(total_occ, 1e-30)
                null2 = numpy.maximum(null2, 1e-300)
                correction = float(numpy.log(null2[x[ienv - 1: jenv]]).sum())
                dombias = float(numpy.logaddexp(0.0, math.log(engine.OMEGA) + correction))
                bits = (envsc - (null1_score(L) + dombias)) / LOG2
                tau, lam = gm.hmm.stats.get("FORWARD", (0.0, LOG2))
                out[(s, p)].append(DomainHit(
                    ienv=ienv, jenv=jenv,
                    target_from=r["target_from"], target_to=r["target_to"],
                    hmm_from=r["hmm_from"], hmm_to=r["hmm_to"],
                    envsc=float(envsc), dombias=dombias,
                    bitscore=float(bits), pvalue=float(exp_surv(bits, tau, lam)),
                ))
        return out
