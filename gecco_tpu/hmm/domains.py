"""Device-side domain definition (pipeline stage 3).

The reference gets this stage from HMMER's C ``p7_domaindef`` through
pyhmmer (``/root/reference/gecco/hmmer/__init__.py:131-140``): for every
pair that survives the Forward filter it posterior-decodes the
sequence, finds high-homology regions, splits them into envelopes, and
scores/aligns each envelope.  Running that per pair on the Python host
costs ~100 ms; at real Pfam hit rates (~1-2 reported domains per gene)
it dominates whole-genome latency.

This module drives the Pallas kernels that keep ALL O(L·M) work — and
all O(L) intermediates — on device:

1. :class:`~gecco_tpu.hmm.kernels.PairPosteriorKernel` — full-sequence
   Forward+Backward per pair with ``mocc``/``pB`` trajectories, left
   resident on the device;
2. :func:`_envelopes` — a jitted re-statement of the
   ``engine._find_regions`` / ``engine._split_region`` heuristics over
   those trajectories; only envelope COORDINATES are transferred
   (the raw trajectories are ~50 MB per genome — at the ~30 MB/s of a
   remote-attached TPU that transfer used to dominate wall clock);
3. :class:`~gecco_tpu.hmm.kernels.PairAlignKernel` — per envelope: the
   envelope Forward rescore, the in-kernel null2 bias correction, and
   the optimal-accuracy alignment endpoints (traceback-free).

Profiles are routed to padded-width buckets like the other pair
kernels; pairs whose ``Lp × Mp`` footprint exceeds the VMEM budget of
the alignment kernel's backward-plane scratch — or whose region /
envelope count overflows the fixed device slots — fall back to the
exact float64 host engine (``engine.define_domains``).
"""

import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy

from . import engine
from .batch import ProfileBank, _round_up
from .engine import DomainHit, exp_surv
from .profile import SearchProfile, length_model, null1_score

__all__ = ["PairDomains"]

LOG2 = math.log(2.0)

#: max Lp × Mp for the device alignment kernel (2 bf16 [Lp, 8, Mp]
#: backward-plane scratch rings must fit VMEM next to the DP state)
_VMEM_CELLS = 512 * 512

#: fixed device slots: regions per pair, envelopes per region
_N_REGIONS = 8
_N_ENVS = 4


@functools.lru_cache(maxsize=None)
def _jit_envelopes(R: int, E: int):
    """Jitted region finding + envelope splitting over device posteriors.

    Vectorized restatement of ``engine._find_regions`` (maximal runs
    with ``mocc ≥ RT2`` whose peak reaches ``RT1``) and
    ``engine._split_region`` (cut where cumulative expected-B mass
    crosses ``m + 0.5``), with fixed capacity: ``R`` regions of up to
    ``E`` envelopes each.  Returns 1-based inclusive ``(ienv, jenv)``
    per slot (slot invalid when ``jenv < ienv``) plus an overflow flag
    per pair (→ exact host fallback).
    """
    import jax
    import jax.numpy as jnp

    RT1, RT2 = engine.RT1, engine.RT2

    def run(mocc, pb, lens):
        # mocc, pb: [N, C, Lp] f32; lens: [N] int32
        Lp = mocc.shape[-1]
        pos = jnp.arange(Lp, dtype=jnp.int32)[None, None, :]
        vpos = pos < lens[:, None, None]
        above = jnp.logical_and(mocc >= RT2, vpos)
        prev = jnp.pad(above[..., :-1], ((0, 0), (0, 0), (1, 0)))
        start = jnp.logical_and(above, ~prev)
        rid = jnp.cumsum(start.astype(jnp.int32), axis=-1) * above
        btot = jnp.cumsum(jnp.where(vpos, pb, 0.0), axis=-1)
        btot_prev = jnp.pad(btot[..., :-1], ((0, 0), (0, 0), (1, 0)))
        overflow = jnp.max(rid, axis=-1) > R
        BIG = jnp.int32(Lp + 1)
        ienv = []
        jenv = []
        for r in range(1, R + 1):
            m = rid == r
            any_r = jnp.any(m, axis=-1)
            peak = jnp.max(jnp.where(m, mocc, 0.0), axis=-1)
            sj = jnp.clip(jnp.min(jnp.where(m, pos, BIG), axis=-1), 0, Lp - 1)
            ej = jnp.clip(jnp.max(jnp.where(m, pos, -1), axis=-1), 0, Lp - 1)
            base = jnp.take_along_axis(btot_prev, sj[..., None], axis=-1)
            expected = jnp.take_along_axis(btot, ej[..., None], axis=-1) - base
            n_r = jnp.round(expected).astype(jnp.int32)        # [N, C, 1]
            valid_r = jnp.logical_and(any_r, peak >= RT1)      # [N, C]
            overflow = jnp.logical_or(
                overflow, jnp.logical_and(valid_r, n_r[..., 0] > E)
            )
            # envelope index of each position: the number of B-mass
            # crossings strictly before it, capped at n_r - 1
            cprev = jnp.where(m, btot_prev - base, 0.0)
            e = jnp.clip(
                jnp.floor(cprev - 0.5).astype(jnp.int32),
                0, jnp.maximum(n_r - 1, 0),
            )
            for ei in range(E):
                me = jnp.logical_and(
                    jnp.logical_and(m, e == ei), valid_r[..., None]
                )
                i0 = jnp.min(jnp.where(me, pos, BIG), axis=-1)
                j0 = jnp.max(jnp.where(me, pos, -1), axis=-1)
                ienv.append(i0 + 1)
                jenv.append(j0 + 1)
        return (jnp.stack(ienv, axis=-1).astype(jnp.int32),
                jnp.stack(jenv, axis=-1).astype(jnp.int32),
                overflow)

    return jax.jit(run)


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
        pack: Optional[object] = None,
    ) -> Dict[Tuple[int, int], List[DomainHit]]:
        """Domain hits per (sequence_index, profile_index) pair.

        Same per-envelope numbers as ``engine.define_domains`` within
        f32 tolerance (device path), or exactly (host fallback for
        pairs too large for the alignment kernel's VMEM scratch).
        ``pack`` — an optional already-uploaded
        :class:`~gecco_tpu.hmm.kernels.SeqPack` of ``sequences``.
        """
        from .kernels import SeqPack

        out: Dict[Tuple[int, int], List[DomainHit]] = {}
        if pack is None and pairs:
            Lp = pad_to or _round_up(
                max(len(sequences[s]) for s, _ in pairs), 32
            )
            pack = SeqPack(sequences, Lp)
        by_bucket: Dict[int, List[Tuple[int, int]]] = {}
        for (s, p) in pairs:
            b = int(self.local[p, 0])
            # VMEM gate on the SEQUENCE's own padded length, not the
            # shared pack width — one long sequence in the batch must
            # not push every other pair onto the slow host engine
            # (128 = the lane width the kernel pads rows to)
            Lp_s = _round_up(len(sequences[s]), 128)
            if Lp_s * self.cap_of_bucket[b] > _VMEM_CELLS:
                gm = self.profiles[p]
                out[(s, p)] = engine.define_domains(gm, sequences[s])
                continue
            by_bucket.setdefault(b, []).append((s, p))

        for b, members in sorted(by_bucket.items()):
            idx, post_kern, align_kern = self.buckets[b]
            # every member passed the per-sequence VMEM gate, but the
            # SHARED pack can still be too wide for this bucket's
            # kernels (its width covers the longest sequence in the
            # whole batch): re-pack just this bucket's sequences at
            # their own width instead of dropping to the host engine
            bpack = pack
            brow = None
            if pack.Lp * self.cap_of_bucket[b] > _VMEM_CELLS:
                used = sorted({s for s, _ in members})
                w = max(_round_up(len(sequences[s]), 128) for s in used)
                bpack = SeqPack([sequences[s] for s in used], w)
                brow = {s: i for i, s in enumerate(used)}
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
            krows = numpy.asarray(
                [s if brow is None else brow[s] for s, _ in entries],
                dtype=numpy.int32,
            )
            # stage 3a: trajectories stay ON DEVICE; only the Forward
            # score and the envelope coordinate slots are fetched (the
            # envelope finder never reads pE, so it is not emitted)
            score_d, mocc_d, pb_d, _ = post_kern.call_packed(
                bpack, krows, pair_idx, interpret=interpret, emit_pe=False
            )
            env_i_d, env_j_d, over_d = _jit_envelopes(_N_REGIONS, _N_ENVS)(
                mocc_d, pb_d, bpack.lens[krows]
            )
            score = numpy.asarray(score_d)
            env_i = numpy.asarray(env_i_d)
            env_j = numpy.asarray(env_j_d)
            over = numpy.asarray(over_d)
            where: Dict[Tuple[int, int], Tuple[int, int]] = {}
            for n, (s, locs) in enumerate(entries):
                for c, loc in enumerate(locs):
                    where[(s, loc)] = (n, c)

            envelopes: List[Tuple[int, int, int, int]] = []
            totals: List[float] = []
            env_pair: List[Tuple[int, int]] = []
            for s, p in members:
                n, c = where[(s, int(self.local[p, 1]))]
                out.setdefault((s, p), [])
                if over[n, c]:
                    # more regions/envelopes than the device slots hold:
                    # exact host fallback for this pair
                    out[(s, p)] = engine.define_domains(
                        self.profiles[p], sequences[s]
                    )
                    continue
                for k in range(env_i.shape[-1]):
                    i0, j0 = int(env_i[n, c, k]), int(env_j[n, c, k])
                    if j0 >= i0:
                        envelopes.append((n, int(self.local[p, 1]), i0, j0))
                        totals.append(float(score[n, c]))
                        env_pair.append((s, p))

            if not envelopes:
                continue
            # stage 3b: envelope cells address the SAME pack rows
            # (envelopes are keyed by entry index n → seq_rows=krows)
            res = align_kern.call_packed(
                bpack, krows, envelopes, totals, interpret=interpret
            )
            # per-envelope residue-class counts fold with the kernel's
            # per-class log null2 odds: Σ_i log null2(x_i) over the
            # envelope = counts · log null2
            class_cum: Dict[int, "numpy.ndarray"] = {}
            for (s, p), (_n, _loc, ienv, jenv), r in zip(env_pair, envelopes, res):
                gm = self.profiles[p]
                x = sequences[s]
                L = len(x)
                if s not in class_cum:
                    onehot = numpy.zeros((L + 1, 21), dtype=numpy.float64)
                    onehot[numpy.arange(1, L + 1), numpy.minimum(x, 20)] = 1.0
                    class_cum[s] = numpy.cumsum(onehot, axis=0)
                cum = class_cum[s]
                counts_env = cum[jenv] - cum[ienv - 1]
                corr = float(counts_env @ r["logn2"])
                loop, _ = length_model(L)
                Ld = jenv - ienv + 1
                envsc = r["envsc"] + (L - Ld) * loop
                dombias = float(numpy.logaddexp(
                    0.0, math.log(engine.OMEGA) + corr
                ))
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
