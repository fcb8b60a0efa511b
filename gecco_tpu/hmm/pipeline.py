"""The profile-HMM search pipeline: filters, scoring, domain reporting.

Mirrors the acceleration pipeline the reference gets from
``pyhmmer.hmmer.hmmsearch`` (``/root/reference/gecco/hmmer/__init__.py:131-140``),
re-architected for the accelerator:

1. **MSV filter** — batched on-device scores of *all* (sequence,
   profile) pairs, Gumbel P-value threshold ``F1`` (default 0.02);
2. **Forward** — batched on-device scores of surviving pairs
   (host-compacted sub-bank), exponential-tail threshold ``F3``
   (default 1e-5);
3. **domain definition** — host float64 posterior decoding, envelopes,
   null2 bias, optimal-accuracy alignment (``gecco_tpu.hmm.engine``) for
   the rare survivors.

Reporting follows hmmsearch defaults: sequence E ≤ 10 and domain
i-Evalue ≤ 10 with caller-fixed ``Z``/``domZ`` (GECCO pins both to the
HMM library size, 2766), or the profile's GA/NC/TC bit cutoffs.

Device stages run on one of two engines (``backend=``): the Pallas
kernels (``gecco_tpu.hmm.kernels``, VMEM-resident bank — default on
TPU) or the XLA batch engines (``gecco_tpu.hmm.batch`` — default
elsewhere).
"""

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy

from . import engine
from .batch import ProfileBank, forward_scores, msv_scores
from .engine import DomainHit, exp_surv, gumbel_surv
from .profile import SearchProfile, null1_score

__all__ = ["SequenceHit", "SearchPipeline"]

LOG2 = math.log(2.0)


@dataclass
class SequenceHit:
    """All reported domains of one (sequence, profile) comparison."""

    sequence_index: int
    profile: SearchProfile
    score: float              # full-sequence bit score
    pvalue: float
    evalue: float
    domains: List[DomainHit] = field(default_factory=list)


class SearchPipeline:
    """hmmsearch-equivalent many-vs-many search."""

    def __init__(
        self,
        profiles: Sequence[SearchProfile],
        Z: Optional[float] = None,
        domZ: Optional[float] = None,
        F1: float = 0.02,
        F3: float = 1e-5,
        E: float = 10.0,
        domE: float = 10.0,
        bit_cutoffs: Optional[str] = None,
        use_accelerator: bool = True,
        max_filter: bool = False,
        backend: str = "auto",
    ) -> None:
        self.profiles = list(profiles)
        self.Z = Z
        self.domZ = domZ
        self.F1 = F1
        self.F3 = F3
        self.E = E
        self.domE = domE
        if bit_cutoffs not in (None, "gathering", "noise", "trusted"):
            raise ValueError(f"invalid bit cutoffs: {bit_cutoffs!r}")
        self.bit_cutoffs = bit_cutoffs
        self.use_accelerator = use_accelerator
        self.max_filter = max_filter  # True = skip filters (hmmsearch --max)
        if backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"invalid backend: {backend!r}")
        self.backend = backend
        self._bank = ProfileBank.build(self.profiles) if self.profiles else None
        self._msv_kernel = None

    def _resolve_backend(self) -> str:
        """Pick the device engine: Pallas kernels on TPU, XLA elsewhere."""
        if self.backend != "auto":
            return self.backend
        try:
            import jax

            platform = jax.default_backend()
        except Exception:  # pragma: no cover - jax always present
            platform = "cpu"
        return "pallas" if platform == "tpu" else "xla"

    # -- helpers -----------------------------------------------------------

    def _cutoff(self, gm: SearchProfile) -> Optional[Tuple[float, float]]:
        if self.bit_cutoffs is None:
            return None
        key = {"gathering": "GA", "noise": "NC", "trusted": "TC"}[self.bit_cutoffs]
        cutoff = gm.hmm.cutoffs.get(key)
        if cutoff is None:
            raise ValueError(
                f"profile {gm.name!r} has no {key} bit cutoffs"
            )
        return cutoff

    # -- search ------------------------------------------------------------

    def search(self, sequences: Sequence["numpy.ndarray"]) -> List[SequenceHit]:
        """Search all profiles against all encoded sequences."""
        if not self.profiles or not sequences:
            return []
        Z = self.Z if self.Z is not None else float(len(sequences))
        domZ = self.domZ if self.domZ is not None else Z
        lengths = numpy.array([len(x) for x in sequences])
        nullsc = numpy.array([null1_score(int(L)) for L in lengths])

        # ---- stage 1+2 (device): MSV filter then Forward on survivors
        backend = self._resolve_backend() if self.use_accelerator else "xla"
        pair_scores: Dict[Tuple[int, int], float] = {}
        order = numpy.argsort(lengths, kind="stable")
        bucket: List[int] = []

        def flush(bucket: List[int]) -> None:
            if not bucket:
                return
            seqs = [sequences[i] for i in bucket]
            if self.max_filter or not self.use_accelerator:
                surviving = {i: list(range(len(self.profiles))) for i in bucket}
            else:
                if backend == "pallas":
                    if self._msv_kernel is None:
                        from .kernels import Bucketed, MSVKernel

                        self._msv_kernel = Bucketed(MSVKernel, self._bank)
                    msv = self._msv_kernel(seqs, pad_to=current_cap)
                else:
                    msv = msv_scores(self._bank, seqs)  # [S, P] nats
                bits = (msv - nullsc[bucket][:, None]) / LOG2
                lam = self._bank.msv_lambda[None, :]
                mu = self._bank.msv_mu[None, :]
                y = lam * (bits - mu)
                pv = numpy.where(y > 30, numpy.exp(-y), 1.0 - numpy.exp(-numpy.exp(-numpy.minimum(y, 30))))
                keep = pv <= self.F1
                surviving = {
                    i: numpy.nonzero(keep[s])[0].tolist()
                    for s, i in enumerate(bucket)
                }
            profile_union = sorted({p for ps in surviving.values() for p in ps})
            if not profile_union:
                return
            if self.use_accelerator:
                keep_seqs = [i for i in bucket if surviving[i]]
                if backend == "pallas":
                    from .kernels import ForwardKernel

                    # pad the sub-bank to a power-of-two profile count so
                    # every flush reuses one of O(log P) compiled kernels
                    # instead of recompiling per union size
                    padded = list(profile_union)
                    target = max(8, 1 << (len(padded) - 1).bit_length())
                    padded += [padded[0]] * (target - len(padded))
                    fkern = ForwardKernel(self._bank.select(padded))
                    fwd = fkern(
                        [sequences[i] for i in keep_seqs], pad_to=current_cap
                    )
                else:
                    sub = self._bank.select(profile_union)
                    fwd = forward_scores(sub, [sequences[i] for i in keep_seqs])
                for s, i in enumerate(keep_seqs):
                    for c, p in enumerate(profile_union):
                        if p in surviving[i]:
                            pair_scores[(i, p)] = float(fwd[s, c])
            else:
                for i in bucket:
                    for p in surviving[i]:
                        pair_scores[(i, p)] = engine.forward(
                            self.profiles[p], sequences[i]
                        ).score

        # Length-bucketing matters only for the XLA engines, whose scan
        # length is the padded shape.  The Pallas kernels bound their
        # residue loop by the true length (Lp is just buffer size), so
        # one global cap minimizes the number of compiled shapes.
        global_cap: Optional[int] = None
        if backend == "pallas" and not self.max_filter:
            longest = int(lengths.max())
            global_cap = 1 << max(9, int(math.ceil(math.log2(max(1, longest)))))

        current_cap: Optional[int] = None
        for i in order:
            if global_cap is not None:
                cap = global_cap
            else:
                cap = 1 << max(5, int(math.ceil(math.log2(max(1, lengths[i])))))
            if current_cap is None:
                current_cap = cap
            if cap != current_cap or len(bucket) >= 64:
                flush(bucket)
                bucket = []
                current_cap = cap
            bucket.append(int(i))
        flush(bucket)

        # ---- stage 3 (host): Forward threshold, domain definition, reporting
        hits: List[SequenceHit] = []
        for (i, p), fwd_nats in sorted(pair_scores.items()):
            gm = self.profiles[p]
            L = int(lengths[i])
            bits = (fwd_nats - nullsc[i]) / LOG2
            tau, lam = gm.hmm.stats.get("FORWARD", (0.0, math.log(2.0)))
            pv = exp_surv(bits, tau, lam)
            if not self.max_filter and pv > self.F3:
                continue
            cutoff = self._cutoff(gm)
            if cutoff is None:
                if pv * Z > self.E:
                    continue
            elif bits < cutoff[0]:
                continue
            # exact rescore + domains on the host engine (float64)
            x = sequences[i]
            fwd = engine.forward(gm, x)
            bwd = engine.backward(gm, x)
            bits64 = (fwd.score - nullsc[i]) / LOG2
            pv64 = exp_surv(bits64, tau, lam)
            domains = engine.define_domains(gm, x, fwd, bwd)
            reported: List[DomainHit] = []
            for dom in domains:
                dom.i_evalue = dom.pvalue * domZ
                if cutoff is None:
                    if dom.i_evalue <= self.domE:
                        reported.append(dom)
                elif dom.bitscore >= cutoff[1]:
                    reported.append(dom)
            if not reported:
                continue
            hits.append(SequenceHit(
                sequence_index=i, profile=gm,
                score=bits64, pvalue=pv64, evalue=pv64 * Z,
                domains=reported,
            ))
        return hits
