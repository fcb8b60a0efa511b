"""De-novo prokaryotic gene finding (the Prodigal-equivalent stage).

The reference wraps Prodigal in metagenome mode through pyrodigal
(``/root/reference/gecco/orf.py:44-146``).  This is an independent,
self-training gene finder of the same family:

1. enumerate candidate genes in all six frames (start codons
   ATG/GTG/TTG, stops per translation table 11, minimum length 90 nt),
   including genes running off the contig edges (Prodigal's partial
   genes);
2. learn an in-frame hexamer (dicodon) log-odds model from a
   high-confidence seed set (long ORFs) against the contig background —
   iterated once — plus start-codon and Shine–Dalgarno (RBS) bonuses;
3. select the highest-scoring compatible gene set with a dynamic
   program over candidates sorted by end coordinate (bounded overlap).

Output coordinates are 1-based inclusive like the reference, proteins
are numbered ``{contig}_{i}`` left-to-right, and the gene qualifiers
mirror the reference's (``inference``/``transl_table``,
``orf.py:142-145``).
"""

import bisect
import math
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy

from ..model import Gene, Protein, Strand
from ..seq import Seq, SeqRecord, reverse_complement, translate
from . import ORFFinder

__all__ = ["ScanFinder"]

_STARTS = ("ATG", "GTG", "TTG")
_STOPS = ("TAA", "TAG", "TGA")
_START_BONUS = {"ATG": 0.0, "GTG": -0.5, "TTG": -1.5}
_RBS_MOTIFS = ("AGGAGG", "GGAGG", "AGGAG", "GGAG", "AGGA", "GAGG")
_RBS_BONUS = {6: 3.0, 5: 2.5, 4: 1.5}
MIN_GENE = 90
MAX_OVERLAP = 30

_BASE = {"A": 0, "C": 1, "G": 2, "T": 3}


def _encode(seq: str) -> "numpy.ndarray":
    table = numpy.full(128, -1, dtype=numpy.int8)
    for base, code in _BASE.items():
        table[ord(base)] = code
        table[ord(base.lower())] = code
    raw = numpy.frombuffer(seq.encode("ascii", "replace"), dtype=numpy.uint8)
    return table[numpy.minimum(raw, 127)].astype(numpy.int32)


class _Candidate:
    __slots__ = ("start", "end", "strand", "score", "partial_begin", "partial_end")

    def __init__(self, start, end, strand, score=0.0, partial_begin=False, partial_end=False):
        self.start = start          # 0-based inclusive leftmost nt
        self.end = end              # 0-based exclusive rightmost nt
        self.strand = strand
        self.score = score
        self.partial_begin = partial_begin
        self.partial_end = partial_end


MAX_STARTS = 8


def _find_orfs(codes: "numpy.ndarray", strand: int, length: int) -> List[_Candidate]:
    """Enumerate candidate genes on one strand of an encoded sequence.

    ``codes`` must already be the strand's 5'→3' encoding; coordinates
    are returned relative to that orientation and mapped by the caller.
    Uses the native core (``native/orfscan.cpp``) when built; the pure
    Python path below is the reference fallback (tested equal).
    """
    from ._native import native_candidates

    native = native_candidates(codes, MIN_GENE, MAX_STARTS)
    if native is not None:
        starts, ends, flags = native
        return [
            _Candidate(
                int(s), int(e), strand,
                partial_begin=bool(f & 2), partial_end=bool(f & 4),
            )
            for s, e, f in zip(starts, ends, flags)
        ]
    n = len(codes)
    stop_set = {tuple(_BASE[c] for c in s) for s in _STOPS}
    start_set = {tuple(_BASE[c] for c in s) for s in _STARTS}
    candidates: List[_Candidate] = []
    for frame in range(3):
        stops = [
            i for i in range(frame, n - 2, 3)
            if (codes[i], codes[i + 1], codes[i + 2]) in stop_set
        ]
        region_start = frame
        boundaries = stops + [n - (n - frame) % 3]
        previous_stop_end = frame
        for stop_i, stop in enumerate(boundaries):
            is_real_stop = stop_i < len(stops)
            region = (previous_stop_end, stop)  # codons in [region) are stop-free
            previous_stop_end = stop + 3
            span = region[1] - region[0]
            if span < MIN_GENE - 3:
                continue
            # candidate starts inside the region
            starts = [
                i for i in range(region[0], region[1] - 2, 3)
                if (codes[i], codes[i + 1], codes[i + 2]) in start_set
            ]
            gene_end = region[1] + (3 if is_real_stop else 0)
            partial_end = not is_real_stop
            if region[0] == frame:
                # region touches the contig begin: allow a partial gene
                starts = [region[0]] + [s for s in starts if s != region[0]]
            for s in starts[:MAX_STARTS]:  # cap alternative starts per stop
                if gene_end - s < MIN_GENE:
                    continue
                partial_begin = (s == region[0]) and (
                    (codes[s], codes[s + 1], codes[s + 2]) not in start_set
                )
                candidates.append(_Candidate(s, gene_end, strand,
                                             partial_begin=partial_begin,
                                             partial_end=partial_end))
    return candidates


def _hexamer_counts(codes: "numpy.ndarray", spans: List[Tuple[int, int]]) -> "numpy.ndarray":
    counts = numpy.ones(4096, dtype=numpy.float64)  # +1 pseudocounts
    valid = codes >= 0
    # base-4 rolling hexamer codes
    for begin, end in spans:
        seg = codes[begin:end]
        ok = valid[begin:end]
        if len(seg) < 6:
            continue
        h = (
            seg[:-5] * 1024 + seg[1:-4] * 256 + seg[2:-3] * 64
            + seg[3:-2] * 16 + seg[4:-1] * 4 + seg[5:]
        )
        mask = ok[:-5] & ok[1:-4] & ok[2:-3] & ok[3:-2] & ok[4:-1] & ok[5:]
        # keep only in-frame positions (codon-aligned)
        h = h[::3][mask[::3][: len(h[::3])]]
        numpy.add.at(counts, h, 1.0)
    return counts


class ScanFinder(ORFFinder):
    """Self-training six-frame gene finder with DP gene selection."""

    def __init__(self, metagenome: bool = True, mask: bool = False, cpus: int = 0,
                 translation_table: int = 11) -> None:
        self.metagenome = metagenome
        self.mask = mask
        self.cpus = cpus
        self.translation_table = translation_table

    # -- scoring ------------------------------------------------------------

    def _train(self, codes_fwd, codes_rev, candidates_fwd, candidates_rev):
        """Hexamer log-odds from long-ORF seeds vs whole-sequence background."""
        n = len(codes_fwd)
        seeds_f = [(c.start, c.end - 3) for c in candidates_fwd if c.end - c.start >= 500]
        seeds_r = [(c.start, c.end - 3) for c in candidates_rev if c.end - c.start >= 500]
        if not seeds_f and not seeds_r:
            seeds_f = sorted(
                ((c.start, c.end - 3) for c in candidates_fwd),
                key=lambda span: span[0] - span[1],
            )[: max(3, len(candidates_fwd) // 10)]
        coding = _hexamer_counts(codes_fwd, seeds_f) + _hexamer_counts(codes_rev, seeds_r)
        background = (
            _hexamer_counts(codes_fwd, [(0, n)]) + _hexamer_counts(codes_rev, [(0, n)])
        )
        log_odds = numpy.log(coding / coding.sum()) - numpy.log(background / background.sum())
        return numpy.clip(log_odds, -4.0, 4.0)

    def _score_batch(self, codes, candidates: List[_Candidate], log_odds) -> "numpy.ndarray":
        """Coding score + length prior for every candidate (native or numpy)."""
        from ._native import native_scores

        if not candidates:
            return numpy.zeros(0)
        starts = numpy.array([c.start for c in candidates], dtype=numpy.int32)
        ends = numpy.array([c.end - 3 for c in candidates], dtype=numpy.int32)
        coding = native_scores(codes, log_odds, starts, ends)
        if coding is None:
            coding = numpy.array([
                self._score_coding(codes, int(b), int(e), log_odds)
                for b, e in zip(starts, ends)
            ])
        lengths = numpy.maximum(ends + 3 - starts, 1)
        return coding + 0.5 * numpy.log(lengths / 90.0)

    @staticmethod
    def _score_coding(codes, begin: int, end: int, log_odds) -> float:
        seg = codes[begin:end]
        if len(seg) < 6:
            return 0.0
        h = (
            seg[:-5] * 1024 + seg[1:-4] * 256 + seg[2:-3] * 64
            + seg[3:-2] * 16 + seg[4:-1] * 4 + seg[5:]
        )
        valid = seg >= 0
        ok = (
            valid[:-5] & valid[1:-4] & valid[2:-3]
            & valid[3:-2] & valid[4:-1] & valid[5:]
        )
        h_inframe = h[::3][ok[::3]]
        return float(log_odds[h_inframe].sum())

    def _start_bonus(self, seq5: str, codes, candidate: _Candidate) -> float:
        if candidate.partial_begin:
            return -1.0
        codon = seq5[candidate.start : candidate.start + 3]
        bonus = _START_BONUS.get(codon, -2.0)
        upstream = seq5[max(0, candidate.start - 15) : candidate.start - 4]
        for motif in _RBS_MOTIFS:
            if motif in upstream:
                bonus += _RBS_BONUS.get(len(motif), 1.0)
                break
        return bonus

    # -- selection ----------------------------------------------------------

    @staticmethod
    def _select(candidates: List[_Candidate]) -> List[_Candidate]:
        """Max-weight compatible subset (bounded overlap) via DP."""
        positive = [c for c in candidates if c.score > 0]
        positive.sort(key=lambda c: c.end)
        if not positive:
            return []
        ends = [c.end for c in positive]
        best = [0.0] * (len(positive) + 1)  # best[i] = best using first i, prefix max
        choice: List[Optional[int]] = [None] * (len(positive) + 1)
        take_score = [0.0] * len(positive)
        parent = [-1] * len(positive)
        for i, candidate in enumerate(positive):
            limit = candidate.start + MAX_OVERLAP
            j = bisect.bisect_right(ends, limit, 0, i)  # predecessors ending before limit
            take_score[i] = best[j] + candidate.score
            parent[i] = j
            best[i + 1] = max(best[i], take_score[i])
        # traceback
        selected: List[_Candidate] = []
        i = len(positive)
        while i > 0:
            if best[i] == best[i - 1] and take_score[i - 1] < best[i]:
                i -= 1
                continue
            if take_score[i - 1] == best[i]:
                selected.append(positive[i - 1])
                i = parent[i - 1]
            else:
                i -= 1
        selected.reverse()
        return selected

    # -- public API ---------------------------------------------------------

    def find_genes(
        self,
        records: Iterable[SeqRecord],
        progress: Optional[Callable[[SeqRecord, int], None]] = None,
    ) -> Iterator[Gene]:
        _progress = (lambda x, y: None) if progress is None else progress
        for record in records:
            genes = list(self._find_in_record(record))
            _progress(record, len(genes))
            yield from genes

    def _find_in_record(self, record: SeqRecord) -> Iterator[Gene]:
        seq = str(record.seq).upper()
        n = len(seq)
        if n < MIN_GENE:
            return
        rev = reverse_complement(seq)
        codes_f = _encode(seq)
        codes_r = _encode(rev)
        cands_f = _find_orfs(codes_f, 1, n)
        cands_r = _find_orfs(codes_r, -1, n)
        log_odds = self._train(codes_f, codes_r, cands_f, cands_r)

        merged: List[_Candidate] = []
        scores_f = self._score_batch(codes_f, cands_f, log_odds)
        for candidate, coding in zip(cands_f, scores_f):
            candidate.score = float(coding) + self._start_bonus(seq, codes_f, candidate)
            merged.append(candidate)
        scores_r = self._score_batch(codes_r, cands_r, log_odds)
        for candidate, coding in zip(cands_r, scores_r):
            candidate.score = float(coding) + self._start_bonus(rev, codes_r, candidate)
            # map to forward coordinates
            start, end = candidate.start, candidate.end
            candidate.start, candidate.end = n - end, n - start
            merged.append(candidate)

        selected = self._select(merged)
        selected.sort(key=lambda c: (c.start, c.end))
        for i, candidate in enumerate(selected):
            if candidate.strand == 1:
                nucleotides = seq[candidate.start : candidate.end]
            else:
                nucleotides = reverse_complement(seq[candidate.start : candidate.end])
            protein_seq = translate(nucleotides, table=self.translation_table)
            protein = Protein(id=f"{record.id}_{i+1}", seq=Seq(protein_seq.rstrip("*")))
            yield Gene(
                source=record,
                start=candidate.start + 1,
                end=candidate.end,
                strand=Strand(candidate.strand),
                protein=protein,
                qualifiers={
                    "inference": ["ab initio prediction:gecco-tpu-scan"],
                    "transl_table": [str(self.translation_table)],
                },
            )
