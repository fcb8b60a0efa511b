"""Pallas TPU kernels for the profile-HMM hot loops.

The XLA-level batched engines (``gecco_tpu.hmm.batch``) are HBM-bound:
every scan step re-reads the per-residue emission row and the state
tensors from HBM.  The Pallas MSV kernel keeps a *profile chunk's*
emission table and all DP state resident in VMEM and streams only the
sequence indices in and the scores out, turning the filter stage
compute-bound.

Design (see ``pallas_guide.md``):

* layout ``[Pc, Mp]`` — profile chunk on sublanes, model nodes on the
  128-lane axis; node shift = ``pltpu.roll`` along lanes;
* **log-space max-plus recurrence** — MSV is a Viterbi-style max DP, so
  log space needs no rescaling and each cell costs ~4 VPU ops;
* grid ``(seq_tiles, profile_chunks)``; per grid cell the kernel loops
  over the S_TILE sequences and scans their residues, reading the
  emission row by scalar index (``e_ref[xi]`` — a dynamic slice on the
  leading axis, natively supported; TPUs have no per-lane gather).
"""

import functools
import os
import math
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy

from .batch import ProfileBank, _round_up
from .profile import length_model

__all__ = [
    "msv_scores_pallas", "MSVKernel", "SSVKernel", "ForwardKernel",
    "ViterbiKernel", "PairForwardKernel", "PairBucketed", "Bucketed",
    "SeqPack",
]

NEG = -1e30
LOG2 = math.log(2.0)


def _auto_interpret(interpret: bool) -> bool:
    """Fall back to the Pallas interpreter off-TPU (tests, CPU hosts)."""
    if interpret:
        return True
    import jax

    return jax.default_backend() != "tpu"



def _vmem_chunk(preferred: int, Mp: int, cell_budget: int) -> int:
    """Largest power-of-two chunk <= preferred with chunk*Mp <= cell_budget.

    Kernel VMEM footprints scale with (chunk x Mp) blocks (double
    buffered); the budgets below are anchored at empirically-working
    points on 16 MB-VMEM chips (e.g. the SSV filter at Pc=256, Mp=256)
    and shrink the chunk for the wide real-Pfam buckets (Mp up to 2048+)
    instead of overflowing scoped VMEM.
    """
    chunk = preferred
    while chunk > 8 and chunk * Mp > cell_budget:
        chunk //= 2
    return max(8, chunk)



def _legal_pc(P: int, Mp: int, preferred: int, cell_budget: int) -> int:
    """Profile-chunk size that is both VMEM-sized and lane-legal.

    The output block's last dim must be a multiple of 128 or equal to
    the whole array dim, so a chunk is legal iff ``Pc == P_pad`` (single
    chunk) or ``Pc % 128 == 0``.  Wide buckets (large ``Mp``) hold few
    profiles on real banks, so the single-chunk form fits VMEM there;
    on an adversarial many-wide-profile bank the single-chunk fallback
    may still exceed scoped VMEM — such banks should use the XLA
    engines (``backend="xla"``).
    """
    P8 = _round_up(max(P, 1), 8)
    cap = _vmem_chunk(preferred, Mp, cell_budget)
    if P8 <= cap:
        return P8          # one chunk over the whole bucket
    if cap >= 128:
        return cap         # multiple chunks, lane-aligned
    return P8              # VMEM-oversized fallback (see docstring)


def _pair_width(n: int) -> int:
    """Survivor-row width quantization shared by the pair dispatchers.

    8, 16, 32, then powers of two — bounded compile count; 8-wide
    keeps Mp=2048 cells inside the per-dispatch VMEM cell budget.
    The 48 rung was removed after measuring it: non-power-of-two
    sublane blocks run 15.0 Gpad/s where C=64 runs 25.7 (docs/
    kernels.md #3), so padding a 33-48-survivor row to 64 is a net
    win (25.7 / (64/48) = 19.3 effective on true cells).
    """
    if n <= 8:
        return 8
    return 1 << (n - 1).bit_length()


def dchain_depth(bank: ProfileBank) -> int:
    """Doubling steps needed by the delete-chain prefix scan.

    A delete run of length ``g`` carries ``Π tdd ≤ max(tdd)^g`` of the
    chain head's mass; runs below 1e-6 relative are far below every
    downstream tolerance (scores gate at ~1e-3 nats), so the scan only
    needs to reach ``2^k ≥ log(1e-6)/log(max tdd)`` nodes instead of
    the padded model width.  The forward delete chain costs ~6 VPU ops per doubling step
    — on typical banks this halves the chain cost; on high-``tdd``
    banks it automatically stays exact (capped at ``log2(Mp)``).
    """
    full = max(1, (int(bank.Mp) - 1).bit_length())  # ceil(log2), any Mp
    t = float(bank.tdd.max())
    if t <= 0.0:
        return 1
    if t >= 1.0:
        return full
    run = math.log(1e-6) / math.log(t)
    return min(full, max(1, int(math.ceil(math.log2(max(2.0, run))))))


def viterbi_log_tensors(bank: ProfileBank):
    """Log-space emission/transition tensors for the max-plus pair kernels.

    Slots 5 and 6 of the transition tuple do NOT carry ``log tmd`` /
    ``log tdd``: the delete chain factorizes through the per-profile
    prefix sum ``S_j = Σ_{k≤j} log tdd_k`` —

        ``D_j = S_{j-1} + max_{i<j} (M_i + log tmd_i − S_i)``

    so the kernel's per-residue work drops from a two-operand max-plus
    doubling scan (2 lane-rolls per doubling step) to a plain prefix
    MAX (1 roll per step), with ``S`` hoisted out of the residue loop
    entirely.  Slot 5 holds ``log tmd − S`` and slot 6 holds
    ``S_{j-1}``.  ``log tdd`` is clamped at −1e4 for the sum: the
    clamp keeps ``S`` finite where ``tdd = 0`` (an unclamped −1e30
    would cancel against pad-lane emissions and resurrect dead
    lanes).  In real banks zeros occur only at the last node and pad
    lanes, where the chain is dead anyway; for a hand-built bank with
    an INTERIOR zero DD transition, a path crossing the wall is
    charged 1e4 nats per crossing — far below any representable
    competitor (scores span ±1e3), so decisions match the exact NEG
    chain; the f32 cancellation cost is ``eps·1e4 ≈ 6e-4`` nats per
    crossed wall on downstream lanes (inside the 5e-3 parity gate for
    up to a handful of walls).
    """
    import jax.numpy as jnp

    def logs(a):
        with numpy.errstate(divide="ignore"):
            return numpy.where(
                a > 0, numpy.log(numpy.maximum(a, 1e-300)), NEG
            ).astype(numpy.float32)

    e_odds = jnp.asarray(logs(bank.e_odds))
    log = [logs(a) for a in (
        bank.tmm, bank.tim, bank.tdm, bank.tmi, bank.tii,
        bank.tmd, bank.tdd, bank.bm,
    )]
    S = numpy.cumsum(
        numpy.maximum(log[6], -1e4), axis=-1, dtype=numpy.float64,
    ).astype(numpy.float32)
    Sm1 = numpy.zeros_like(S)
    Sm1[:, 1:] = S[:, :-1]
    log[5] = log[5] - S
    log[6] = Sm1
    return e_odds, tuple(jnp.asarray(a) for a in log)


class SeqPack:
    """A batch of encoded sequences resident on the device.

    The remote-attached TPU moves host↔device bytes ~30 MB/s, so the
    pipeline uploads every sequence exactly ONCE per search; all kernel
    stages then address rows of the same device tensors through int32
    row-index gathers (device-side, HBM-bandwidth cheap).

    Rows are padded to a power-of-two multiple of 8 so downstream grid
    shapes stay within O(log S) compiled variants.
    """

    def __init__(self, sequences: Sequence["numpy.ndarray"], pad_to: int):
        import jax.numpy as jnp

        from .profile import null1_score

        S = len(sequences)
        self.S = S
        self.Lp = pad_to
        n = max(8, _round_up(S, 8))
        n = 8 * (1 << (((n // 8) - 1).bit_length()))
        self.n = n
        xs = numpy.zeros((n, pad_to), dtype=numpy.int8)
        lens = numpy.zeros(n, dtype=numpy.int32)
        loops_log = numpy.zeros(n, dtype=numpy.float32)
        moves_log = numpy.full(n, -1.0, dtype=numpy.float32)
        nullsc = numpy.zeros(n, dtype=numpy.float32)
        counts = numpy.zeros((n, 20), dtype=numpy.float32)
        for i, x in enumerate(sequences):
            L = len(x)
            xs[i, :L] = x
            lens[i] = L
            loop, move = length_model(L)
            loops_log[i] = loop
            moves_log[i] = move
            nullsc[i] = null1_score(L)
            counts[i] = numpy.bincount(
                numpy.minimum(x, 20), minlength=21
            )[:20]
        self.counts_host = counts        # host copy: the bias filter's
        self.counts = jnp.asarray(counts)  # null reuses it, no recompute
        # one h2d transfer of int8 residues; widen on device
        self.xs = jnp.asarray(xs).astype(jnp.int32)
        self.lens_host = lens            # host copy: length-sorting and
        self.lens = jnp.asarray(lens)    # accounting never pay a d2h trip
        self.loops_log = jnp.asarray(loops_log)
        self.moves_log = jnp.asarray(moves_log)
        self.loops_exp = jnp.exp(self.loops_log)
        self.moves_exp = jnp.exp(self.moves_log)
        self.nullsc = jnp.asarray(nullsc)
        self.valid = jnp.asarray(numpy.arange(n) < S)


@functools.lru_cache(maxsize=None)
def _jit_pack_mask(P: int, W: int, bias: bool):
    """Epilogue: threshold filter scores on device, bit-pack survivors.

    ``keep[s, p] = score >= filtersc[s, p] + thr[p]`` packed
    little-endian into ``[n, W]`` uint32 words — a ~30× smaller d2h
    transfer than the raw score matrix.  With ``bias`` the null is the
    HMMER-style composition filter ``logaddexp(null1, bias) - log 2``
    (one small MXU matmul); otherwise plain ``null1``.
    """
    import jax
    import jax.numpy as jnp

    def run(scores, nullsc, thr, valid, counts, logratio):
        null = nullsc[:, None]
        if bias:
            delta = counts @ logratio  # [n, P] bias - null1 (nats)
            # clipped at >=0 like the host path: the filter null
            # never drops below null1 (HMMER p7_bg_FilterScore)
            null = null + jnp.maximum(jnp.logaddexp(0.0, delta) - LOG2, 0.0)
        keep = scores >= (null + thr[None, :])
        keep = jnp.logical_and(keep, valid[:, None])
        pad = W * 32 - P
        if pad:
            keep = jnp.pad(keep, ((0, 0), (0, pad)))
        bits = keep.reshape(keep.shape[0], W, 32).astype(jnp.uint32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)

    return jax.jit(run)


def bias_logratio(bank: ProfileBank) -> "numpy.ndarray":
    """``log(compo_p[a] / bg[a])`` per profile — the composition filter.

    ``compo_p`` is the profile's mean match emission distribution (the
    analog of HMMER's ``COMPO`` line); derived from the bank's odds
    tensor: ``mean_k e_odds[a, p, k] = compo_p[a] / bg[a]``.
    Returns ``[20, P]`` float32.
    """
    sums = bank.e_odds[:20].sum(axis=2)            # [20, P]
    ratio = sums / numpy.maximum(bank.lengths, 1)[None, :]
    return numpy.log(numpy.maximum(ratio, 1e-30)).astype(numpy.float32)


@functools.lru_cache(maxsize=None)
def _pallas_msv(P: int, Mp: int, Lp: int, S: int, Pc: int, masked: bool, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = P // Pc

    def kernel(xs_ref, lens_ref, loops_ref, moves_ref, e_ref, tbm_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (Pc, Mp), dimension=1)

        def one_sequence(s, _):
            L = lens_ref[0, 0, s]
            loop = loops_ref[0, 0, s]
            move = moves_ref[0, 0, s]
            tbm = tbm_ref[:]  # [Pc, 1] log entry

            def step(i, carry):
                M, N, B, J, C = carry
                xi = xs_ref[0, s, i]
                e = e_ref[xi]  # [Pc, Mp]
                shifted = pltpu.roll(M, shift=1, axis=1)
                if masked:
                    shifted = jnp.where(lane == 0, NEG, shifted)
                Mn = e + jnp.maximum(shifted, B + tbm)
                E = jnp.max(Mn, axis=1, keepdims=True)  # [Pc, 1]
                Elm = E + math.log(0.5)
                Jn = jnp.maximum(J + loop, Elm)
                Cn = jnp.maximum(C + loop, Elm)
                Nn = N + loop
                Bn = jnp.maximum(Nn, Jn) + move
                return (Mn, Nn, Bn, Jn, Cn)

            M0 = jnp.full((Pc, Mp), NEG, jnp.float32)
            z1 = jnp.zeros((Pc, 1), jnp.float32)
            carry = (M0, z1, z1 + move, z1 + NEG, z1 + NEG)
            carry = jax.lax.fori_loop(0, L, step, carry)
            out_ref[s, :] = (carry[4] + move)[:, 0]
            return 0

        jax.lax.fori_loop(0, S, one_sequence, 0)

    def run(xs, lens, loops, moves, e_log, tbm):
        # xs [St, S, Lp] int32; e_log [21, P, Mp]; tbm [P, 1]
        St = xs.shape[0]
        # grid: profile chunk OUTER, sequence tile INNER — consecutive
        # cells share the same emission block, so Mosaic keeps it in
        # VMEM instead of re-streaming 5+ MB per cell
        return pl.pallas_call(
            kernel,
            grid=(n_chunks, St),
            in_specs=[
                pl.BlockSpec((1, S, Lp), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((21, Pc, Mp), lambda c, t: (0, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Pc, 1), lambda c, t: (c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, Pc), lambda c, t: (t, c), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((St * S, P), jnp.float32),
            interpret=interpret,
        )(xs, lens, loops, moves, e_log, tbm)

    return jax.jit(run)


def msv_scores_pallas(
    bank: ProfileBank,
    sequences: Sequence["numpy.ndarray"],
    seq_tile: int = 8,
    profile_chunk: int = 256,
    pad_to: Optional[int] = None,
    interpret: bool = False,
) -> "numpy.ndarray":
    """MSV filter scores (nats) of every pair via the Pallas kernel.

    Same contract as ``batch.msv_scores``; ``interpret=True`` runs the
    kernel in the Pallas interpreter (for CPU tests).
    """
    import jax.numpy as jnp

    S = len(sequences)
    if S == 0:
        return numpy.zeros((0, bank.P), dtype=numpy.float32)
    Lp = pad_to or _round_up(max(len(x) for x in sequences), 32)
    St = _round_up(S, seq_tile) // seq_tile
    Pc = min(profile_chunk, _round_up(bank.P, 8))
    P_pad = _round_up(bank.P, Pc)
    xs = numpy.zeros((St * seq_tile, Lp), dtype=numpy.int32)
    lens = numpy.zeros(St * seq_tile, dtype=numpy.int32)
    loops = numpy.zeros(St * seq_tile, dtype=numpy.float32)
    moves = numpy.full(St * seq_tile, -1.0, dtype=numpy.float32)
    for i, x in enumerate(sequences):
        L = len(x)
        xs[i, :L] = x
        lens[i] = L
        loop, move = length_model(L)
        loops[i] = loop
        moves[i] = move

    # log-space emissions: [21, P_pad, Mp]; padded nodes/profiles at -inf
    with numpy.errstate(divide="ignore"):
        e_log = numpy.full((_K := 21, P_pad, bank.Mp), NEG, dtype=numpy.float32)
        e_log[:, : bank.P] = numpy.where(
            bank.e_odds > 0, numpy.log(numpy.maximum(bank.e_odds, 1e-300)), NEG
        )
        tbm = numpy.full((P_pad, 1), NEG, dtype=numpy.float32)
        tbm[: bank.P, 0] = numpy.log(bank.msv_tbm)

    masked = bool((bank.lengths >= bank.Mp).any())
    fn = _pallas_msv(P_pad, bank.Mp, Lp, seq_tile, Pc, masked, interpret)
    out = fn(
        jnp.asarray(xs.reshape(St, seq_tile, Lp)),
        jnp.asarray(lens.reshape(St, 1, seq_tile)),
        jnp.asarray(loops.reshape(St, 1, seq_tile)),
        jnp.asarray(moves.reshape(St, 1, seq_tile)),
        jnp.asarray(e_log), jnp.asarray(tbm),
    )
    return numpy.asarray(out)[:S, : bank.P]


class MSVKernel:
    """Device-cached Pallas MSV filter over a fixed bank.

    Prepares the log-space emission tensors once (host + device) so
    repeated batches pay only the scan cost.
    """

    def __init__(self, bank: ProfileBank, seq_tile: int = 8, profile_chunk: int = 512):
        import jax.numpy as jnp

        self.bank = bank
        self.masked = bool((bank.lengths >= bank.Mp).any())
        self.seq_tile = seq_tile
        self.Pc = _legal_pc(bank.P, bank.Mp, profile_chunk, 65536)
        self.P_pad = _round_up(bank.P, self.Pc)
        with numpy.errstate(divide="ignore"):
            e_log = numpy.full((21, self.P_pad, bank.Mp), NEG, dtype=numpy.float32)
            e_log[:, : bank.P] = numpy.where(
                bank.e_odds > 0, numpy.log(numpy.maximum(bank.e_odds, 1e-300)), NEG
            )
            tbm = numpy.full((self.P_pad, 1), NEG, dtype=numpy.float32)
            tbm[: bank.P, 0] = numpy.log(bank.msv_tbm)
        self.e_log = jnp.asarray(e_log)
        self.tbm = jnp.asarray(tbm)

    def __call__(self, sequences, pad_to=None, interpret=False):
        import jax.numpy as jnp

        S = len(sequences)
        if S == 0:
            return numpy.zeros((0, self.bank.P), dtype=numpy.float32)
        Lp = pad_to or _round_up(max(len(x) for x in sequences), 32)
        # round the tile count to a power of two: O(log S) compiled
        # shapes instead of one per batch size
        St = _round_up(S, self.seq_tile) // self.seq_tile
        St = 1 << (St - 1).bit_length()
        n = St * self.seq_tile
        xs = numpy.zeros((n, Lp), dtype=numpy.int32)
        lens = numpy.zeros(n, dtype=numpy.int32)
        loops = numpy.zeros(n, dtype=numpy.float32)
        moves = numpy.full(n, -1.0, dtype=numpy.float32)
        for i, x in enumerate(sequences):
            L = len(x)
            xs[i, :L] = x
            lens[i] = L
            loop, move = length_model(L)
            loops[i] = loop
            moves[i] = move
        fn = _pallas_msv(
            self.P_pad, self.bank.Mp, Lp, self.seq_tile, self.Pc,
            self.masked, _auto_interpret(interpret),
        )
        out = fn(
            jnp.asarray(xs.reshape(St, self.seq_tile, Lp)),
            jnp.asarray(lens.reshape(St, 1, self.seq_tile)),
            jnp.asarray(loops.reshape(St, 1, self.seq_tile)),
            jnp.asarray(moves.reshape(St, 1, self.seq_tile)),
            self.e_log, self.tbm,
        )
        return numpy.asarray(out)[:S, : self.bank.P]

    def scores_packed(self, pack: SeqPack, interpret: bool = False):
        """Device-resident scores ``[pack.n, P_pad]`` — no transfers."""
        fn = _pallas_filter_packed(
            "msv", self.P_pad, self.bank.Mp, pack.Lp, self.seq_tile,
            self.Pc, self.masked, _auto_interpret(interpret),
        )
        return fn(pack.xs, pack.lens, pack.loops_log, pack.moves_log,
                  self.e_log, self.tbm)


@functools.lru_cache(maxsize=None)
def _pallas_ssv(P: int, Mp: int, Lp: int, S: int, Pc: int, masked: bool,
                interpret: bool, unroll: int = 4):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = P // Pc

    def kernel(xs_ref, lens_ref, loops_ref, moves_ref, e_ref, tbm_ref, out_ref):
        if masked:
            lane = jax.lax.broadcasted_iota(jnp.int32, (Pc, Mp), dimension=1)

        def one_sequence(s, _):
            L = lens_ref[0, 0, s]
            loop = loops_ref[0, 0, s]
            move = moves_ref[0, 0, s]
            # de-offset recurrence: with A_i = M_i - i*loop the entry
            # threshold becomes the CONSTANT cb0 = tbm + move and the
            # running segment max needs no per-step loop decay:
            #   A_i = (e - loop) + max(A_{i-1} shifted, cb0)
            #   G   = max(G, A_i);   score = rowmax(G) + L*loop + ...
            cb0 = jnp.broadcast_to(tbm_ref[:] + move, (Pc, Mp))

            def substep(i, carry):
                A, G = carry
                xi = xs_ref[0, s, i]
                e = e_ref[xi]  # [Pc, Mp]
                shifted = pltpu.roll(A, shift=1, axis=1)
                if masked:
                    shifted = jnp.where(lane == 0, NEG, shifted)
                An = (e - loop) + jnp.maximum(shifted, cb0)
                Gn = jnp.maximum(G, An)
                return (An, Gn)

            def step(b, carry):
                # unrolled residue block: amortizes per-iteration scalar
                # overhead across `unroll` DP steps
                i0 = b * unroll
                for u in range(unroll):
                    carry = substep(i0 + u, carry)
                return carry

            M0 = jnp.full((Pc, Mp), NEG, jnp.float32)
            carry = jax.lax.fori_loop(0, L // unroll, step, (M0, M0))
            carry = jax.lax.fori_loop(
                (L // unroll) * unroll, L, substep, carry)
            G = carry[1]
            out_ref[s, :] = jnp.max(G, axis=1) + (
                L.astype(jnp.float32) * loop + math.log(0.5) + move
            )
            return 0

        jax.lax.fori_loop(0, S, one_sequence, 0)

    def run(xs, lens, loops, moves, e_log, tbm):
        St = xs.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n_chunks, St),
            in_specs=[
                pl.BlockSpec((1, S, Lp), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((21, Pc, Mp), lambda c, t: (0, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Pc, 1), lambda c, t: (c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, Pc), lambda c, t: (t, c), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((St * S, P), jnp.float32),
            interpret=interpret,
        )(xs, lens, loops, moves, e_log, tbm)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pallas_ssv_pair(P: int, Mp: int, Lp: int, S: int, Pc: int,
                     interpret: bool, unroll: int = 4):
    """SSV filter processing TWO residues per lane-roll.

    The plain kernel pays one ``pltpu.roll`` of the DP plane per
    residue — a large share of its runtime (the permute port, unlike
    the ALUs, moves one vreg per cycle).  Rewriting two steps jointly,

        inner[k] = (e0[k-1] - loop) + max(A[k-2], cb0)     # = A_i[k-1]
        A'  [k] = (e1[k]   - loop) + max(inner[k], cb0)    # = A_{i+1}[k]

    needs ONE roll of ``A`` by two lanes plus a PRE-SHIFTED emission
    table for ``e0[k-1]`` (built once per bank).  ``inner`` is
    ``A_i`` shifted by one lane, which is fine to fold into ``G``
    directly: the reported score is a lane-wise max, invariant under
    lane shifts (pad lanes hold -1e30 on both tables).  Requires a
    guaranteed trailing pad lane (``masked=False`` buckets — which the
    power-of-two ``Bucketed`` construction always provides).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = P // Pc
    assert unroll % 2 == 0

    def kernel(xs_ref, lens_ref, loops_ref, moves_ref, e_ref, es_ref,
               tbm_ref, out_ref):
        def one_sequence(s, _):
            L = lens_ref[0, 0, s]
            loop = loops_ref[0, 0, s]
            move = moves_ref[0, 0, s]
            cb0 = jnp.broadcast_to(tbm_ref[:] + move, (Pc, Mp))

            def pairstep(i, carry):
                A, G = carry
                xi0 = xs_ref[0, s, 2 * i]
                xi1 = xs_ref[0, s, 2 * i + 1]
                e0s = es_ref[xi0]               # e0 shifted by one lane
                e1 = e_ref[xi1]
                shifted2 = pltpu.roll(A, shift=2, axis=1)
                inner = (e0s - loop) + jnp.maximum(shifted2, cb0)
                An = (e1 - loop) + jnp.maximum(inner, cb0)
                Gn = jnp.maximum(jnp.maximum(G, inner), An)
                return (An, Gn)

            def substep(i, carry):
                A, G = carry
                xi = xs_ref[0, s, i]
                e = e_ref[xi]
                shifted = pltpu.roll(A, shift=1, axis=1)
                An = (e - loop) + jnp.maximum(shifted, cb0)
                return (An, jnp.maximum(G, An))

            def block(b, carry):
                i0 = b * (unroll // 2)
                for u in range(unroll // 2):
                    carry = pairstep(i0 + u, carry)
                return carry

            M0 = jnp.full((Pc, Mp), NEG, jnp.float32)
            n_pairs = L // 2
            carry = jax.lax.fori_loop(
                0, n_pairs // (unroll // 2), block, (M0, M0))
            carry = jax.lax.fori_loop(
                (n_pairs // (unroll // 2)) * (unroll // 2), n_pairs,
                pairstep, carry)
            carry = jax.lax.fori_loop(2 * n_pairs, L, substep, carry)
            G = carry[1]
            out_ref[s, :] = jnp.max(G, axis=1) + (
                L.astype(jnp.float32) * loop + math.log(0.5) + move
            )
            return 0

        jax.lax.fori_loop(0, S, one_sequence, 0)

    def run(xs, lens, loops, moves, e_log, e_shift, tbm):
        St = xs.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n_chunks, St),
            in_specs=[
                pl.BlockSpec((1, S, Lp), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((21, Pc, Mp), lambda c, t: (0, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((21, Pc, Mp), lambda c, t: (0, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Pc, 1), lambda c, t: (c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, Pc), lambda c, t: (t, c), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((St * S, P), jnp.float32),
            interpret=interpret,
        )(xs, lens, loops, moves, e_log, e_shift, tbm)

    return jax.jit(run)


def _pallas_ssv_quad(P: int, Mp: int, Lp: int, S: int, Pc: int,
                     interpret: bool, unroll: int = 8):
    """SSV filter processing FOUR residues per lane-roll.

    Extends the paired kernel's trick (see :func:`_pallas_ssv_pair`):
    unrolling the recurrence four steps from ``A[k-4]`` needs ONE roll
    of ``A`` by four lanes plus emission tables pre-shifted by 3, 2,
    and 1 lanes.  Every intermediate is a lane-shifted version of a
    true ``A`` row, so all of them fold into the running lane-max
    ``G`` directly; ``cb0`` is lane-invariant so comparing shifted
    intermediates against it is exact.  The shifted tables' leading
    NEG lanes kill roll wrap-around, and lane ``Mp-1`` of ``A`` is NEG
    on unmasked buckets (every profile strictly shorter than ``Mp``),
    so the 4-lane wrap is junk-free.

    Streaming four HBM tables would quadruple the double-buffered VMEM
    footprint (measured OOM at Pc=920×256); instead the three shifted
    tables are built IN KERNEL into persistent scratch, once per
    profile chunk (63 rolls amortized over the whole sequence tile
    axis), so the kernel keeps the paired variant's chunk budget.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = P // Pc
    assert unroll % 4 == 0

    def kernel(xs_ref, lens_ref, loops_ref, moves_ref, e_ref,
               tbm_ref, out_ref, es1_ref, es2_ref, es3_ref):
        # build the lane-shifted emission tables once per profile
        # chunk: the sequence-tile grid axis (last = fastest) reuses
        # them for every tile
        @pl.when(pl.program_id(1) == 0)
        def _build_tables():
            lane = jax.lax.broadcasted_iota(jnp.int32, (Pc, Mp), 1)
            for a in range(21):
                e = e_ref[a]
                for k, ref in ((1, es1_ref), (2, es2_ref), (3, es3_ref)):
                    rolled = pltpu.roll(e, shift=k, axis=1)
                    ref[a] = jnp.where(lane < k, NEG, rolled)

        def one_sequence(s, _):
            L = lens_ref[0, 0, s]
            loop = loops_ref[0, 0, s]
            move = moves_ref[0, 0, s]
            cb0 = jnp.broadcast_to(tbm_ref[:] + move, (Pc, Mp))

            def quadstep(i, carry):
                A, G = carry
                x0 = xs_ref[0, s, 4 * i]
                x1 = xs_ref[0, s, 4 * i + 1]
                x2 = xs_ref[0, s, 4 * i + 2]
                x3 = xs_ref[0, s, 4 * i + 3]
                rolled = pltpu.roll(A, shift=4, axis=1)
                b1 = (es3_ref[x0] - loop) + jnp.maximum(rolled, cb0)
                b2 = (es2_ref[x1] - loop) + jnp.maximum(b1, cb0)
                b3 = (es1_ref[x2] - loop) + jnp.maximum(b2, cb0)
                An = (e_ref[x3] - loop) + jnp.maximum(b3, cb0)
                Gn = jnp.maximum(jnp.maximum(jnp.maximum(G, b1), b2),
                                 jnp.maximum(b3, An))
                return (An, Gn)

            def substep(i, carry):
                A, G = carry
                xi = xs_ref[0, s, i]
                shifted = pltpu.roll(A, shift=1, axis=1)
                An = (e_ref[xi] - loop) + jnp.maximum(shifted, cb0)
                return (An, jnp.maximum(G, An))

            def block(b, carry):
                i0 = b * (unroll // 4)
                for u in range(unroll // 4):
                    carry = quadstep(i0 + u, carry)
                return carry

            M0 = jnp.full((Pc, Mp), NEG, jnp.float32)
            n_quads = L // 4
            carry = jax.lax.fori_loop(
                0, n_quads // (unroll // 4), block, (M0, M0))
            carry = jax.lax.fori_loop(
                (n_quads // (unroll // 4)) * (unroll // 4), n_quads,
                quadstep, carry)
            carry = jax.lax.fori_loop(4 * n_quads, L, substep, carry)
            G = carry[1]
            out_ref[s, :] = jnp.max(G, axis=1) + (
                L.astype(jnp.float32) * loop + math.log(0.5) + move
            )
            return 0

        jax.lax.fori_loop(0, S, one_sequence, 0)

    def run(xs, lens, loops, moves, e_log, tbm):
        St = xs.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n_chunks, St),
            in_specs=[
                pl.BlockSpec((1, S, Lp), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((21, Pc, Mp), lambda c, t: (0, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Pc, 1), lambda c, t: (c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, Pc), lambda c, t: (t, c), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((St * S, P), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((21, Pc, Mp), jnp.float32),
                pltpu.VMEM((21, Pc, Mp), jnp.float32),
                pltpu.VMEM((21, Pc, Mp), jnp.float32),
            ],
            interpret=interpret,
        )(xs, lens, loops, moves, e_log, tbm)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pallas_ssv_quad_packed(P: int, Mp: int, Lp: int, S: int, Pc: int,
                            interpret: bool, unroll: int = 8):
    """Device-array entry to the quad SSV kernel."""
    import jax

    inner = _pallas_ssv_quad(P, Mp, Lp, S, Pc, interpret, unroll)

    def run(xs, lens, loops, moves, e_log, tbm):
        n = xs.shape[0]
        St = n // S
        return inner(
            xs.reshape(St, S, Lp),
            lens.reshape(St, 1, S),
            loops.reshape(St, 1, S),
            moves.reshape(St, 1, S),
            e_log, tbm,
        )

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pallas_ssv_pair_packed(P: int, Mp: int, Lp: int, S: int, Pc: int,
                            interpret: bool, unroll: int = 4):
    """Device-array entry to the paired SSV kernel."""
    import jax

    inner = _pallas_ssv_pair(P, Mp, Lp, S, Pc, interpret, unroll)

    def run(xs, lens, loops, moves, e_log, e_shift, tbm):
        n = xs.shape[0]
        St = n // S
        return inner(
            xs.reshape(St, S, Lp),
            lens.reshape(St, 1, S),
            loops.reshape(St, 1, S),
            moves.reshape(St, 1, S),
            e_log, e_shift, tbm,
        )

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pallas_filter_packed(kind: str, P: int, Mp: int, Lp: int, S: int, Pc: int,
                          masked: bool, interpret: bool):
    """Device-array entry to a filter kernel: reshape rows on device."""
    import jax

    inner = (_pallas_ssv if kind == "ssv" else _pallas_msv)(
        P, Mp, Lp, S, Pc, masked, interpret
    )

    def run(xs, lens, loops, moves, e_log, tbm):
        n = xs.shape[0]
        St = n // S
        return inner(
            xs.reshape(St, S, Lp),
            lens.reshape(St, 1, S),
            loops.reshape(St, 1, S),
            moves.reshape(St, 1, S),
            e_log, tbm,
        )

    return jax.jit(run)


class SSVKernel:
    """Device-cached Pallas SSV filter over a fixed bank.

    Single-segment variant of :class:`MSVKernel` — no J state, so the
    per-step cross-lane E reduction disappears entirely: the score is
    recovered at the end from a running elementwise max
    ``G = max(G + loop, M)`` (max commutes with the deferred length-model
    offsets).  5 VPU ops per DP cell; the fastest filter stage, matching
    ``engine.ssv_score``.  When every profile is strictly shorter than
    its padded width the lane-0 masking of the node shift is dropped:
    the rolled-in value is the last pad lane, already ``-1e30``.
    """

    def __init__(self, bank: ProfileBank, seq_tile: int = 8, profile_chunk: int = 512,
                 unroll: int = 8):
        import jax.numpy as jnp

        self.bank = bank
        self.seq_tile = seq_tile
        self.unroll = unroll
        self.masked = bool((bank.lengths >= bank.Mp).any())
        # the 4-residues-per-roll variant builds its three extra
        # (lane-shifted) emission tables in-kernel into scratch, so the
        # streamed-block budget matches the 2-residue variant's
        budget = 65536 if self.masked else 32768
        self.Pc = _legal_pc(bank.P, bank.Mp, profile_chunk, budget)
        self.P_pad = _round_up(bank.P, self.Pc)
        with numpy.errstate(divide="ignore"):
            e_log = numpy.full((21, self.P_pad, bank.Mp), NEG, dtype=numpy.float32)
            e_log[:, : bank.P] = numpy.where(
                bank.e_odds > 0, numpy.log(numpy.maximum(bank.e_odds, 1e-300)), NEG
            )
            tbm = numpy.full((self.P_pad, 1), NEG, dtype=numpy.float32)
            tbm[: bank.P, 0] = numpy.log(bank.msv_tbm)
        self.e_log = jnp.asarray(e_log)
        self.tbm = jnp.asarray(tbm)
        # the quad kernel's shifted intermediates drop lanes Mp-1..Mp-3
        # of the true DP rows from the lane-max fold, so it is exact
        # only with >=3 trailing pad lanes on EVERY profile (Bucketed
        # guarantees 4; standalone banks may not) — else the 2-residue
        # kernel (1 pad lane) or the plain kernel (masked) runs
        self.quad = bool(
            bank.P == 0 or int(bank.lengths.max()) <= bank.Mp - 3)
        self._e_shift = None   # only the (fallback) pair path reads it
        if not self.masked and not self.quad:
            e_shift = numpy.full_like(e_log, NEG)
            e_shift[:, :, 1:] = e_log[:, :, :-1]
            self._e_shift = jnp.asarray(e_shift)

    def __call__(self, sequences, pad_to=None, interpret=False):
        import jax.numpy as jnp

        S = len(sequences)
        if S == 0:
            return numpy.zeros((0, self.bank.P), dtype=numpy.float32)
        Lp = pad_to or _round_up(max(len(x) for x in sequences), 32)
        St = _round_up(S, self.seq_tile) // self.seq_tile
        St = 1 << (St - 1).bit_length()
        n = St * self.seq_tile
        xs = numpy.zeros((n, Lp), dtype=numpy.int32)
        lens = numpy.zeros(n, dtype=numpy.int32)
        loops = numpy.zeros(n, dtype=numpy.float32)
        moves = numpy.full(n, -1.0, dtype=numpy.float32)
        for i, x in enumerate(sequences):
            L = len(x)
            xs[i, :L] = x
            lens[i] = L
            loop, move = length_model(L)
            loops[i] = loop
            moves[i] = move
        fn = _pallas_ssv(
            self.P_pad, self.bank.Mp, Lp, self.seq_tile, self.Pc,
            self.masked, _auto_interpret(interpret), self.unroll,
        )
        out = fn(
            jnp.asarray(xs.reshape(St, self.seq_tile, Lp)),
            jnp.asarray(lens.reshape(St, 1, self.seq_tile)),
            jnp.asarray(loops.reshape(St, 1, self.seq_tile)),
            jnp.asarray(moves.reshape(St, 1, self.seq_tile)),
            self.e_log, self.tbm,
        )
        return numpy.asarray(out)[:S, : self.bank.P]

    def scores_packed(self, pack: SeqPack, interpret: bool = False):
        """Device-resident scores ``[pack.n, P_pad]`` — no transfers."""
        if not self.masked and self.quad:
            fn = _pallas_ssv_quad_packed(
                self.P_pad, self.bank.Mp, pack.Lp, self.seq_tile,
                self.Pc, _auto_interpret(interpret), self.unroll,
            )
            return fn(pack.xs, pack.lens, pack.loops_log, pack.moves_log,
                      self.e_log, self.tbm)
        if not self.masked:
            fn = _pallas_ssv_pair_packed(
                self.P_pad, self.bank.Mp, pack.Lp, self.seq_tile,
                self.Pc, _auto_interpret(interpret), self.unroll,
            )
            return fn(pack.xs, pack.lens, pack.loops_log, pack.moves_log,
                      self.e_log, self._e_shift, self.tbm)
        fn = _pallas_filter_packed(
            "ssv", self.P_pad, self.bank.Mp, pack.Lp, self.seq_tile,
            self.Pc, self.masked, _auto_interpret(interpret),
        )
        return fn(pack.xs, pack.lens, pack.loops_log, pack.moves_log,
                  self.e_log, self.tbm)


class Bucketed:
    """Length-bucketed wrapper around a single-bank kernel class.

    Packing all 2,766 Pfam profiles into one ``[P, Mp]`` bank pads every
    profile to the longest model (lane-rounded), wasting VPU lanes on
    the short majority (median Pfam model ≲ 150 nodes).  This wrapper
    splits the bank into lane-width buckets (``Mp`` = 128, 256, …), runs
    the wrapped kernel per bucket, and scatters scores back into the
    original profile order — same results, ~1.5–2× fewer padded cells.
    """

    def __init__(self, kernel_cls, bank: ProfileBank, lane: int = 128,
                 pow2: bool = False, **kwargs):
        # kernels running the delete-chain doubling scan REQUIRE
        # power-of-two widths; derive it from the class so callers
        # cannot silently build a crashing configuration
        pow2 = pow2 or getattr(kernel_cls, "REQUIRES_POW2", False)
        self.bank = bank
        self.buckets = []
        caps = {}
        for i, m in enumerate(bank.lengths):
            # exclusive cap with FOUR guaranteed trailing pad lanes
            # (M <= cap-4): one pad lane lets kernels skip lane-0
            # masking of the node shift, and the quad SSV kernel's
            # lane-max fold needs lanes Mp-1..Mp-3 dead — its shifted
            # intermediates lose those lanes of the true DP rows, so a
            # profile within 2 nodes of the cap scored low at some
            # residue phases (found by review repro: M=127/Mp=128
            # consensus plant, 261.99 -> 257.74)
            cap = _round_up(max(8, int(m) + 4), lane)
            if pow2:
                # the Forward/Viterbi delete-chain doubling scan
                # requires power-of-two padded widths
                cap = 1 << (cap - 1).bit_length()
            caps.setdefault(cap, []).append(i)
        for cap in sorted(caps):
            idx = numpy.asarray(caps[cap], dtype=numpy.int64)
            # wide buckets: the lane-legal profile chunk would have to
            # be a multiple of 128, which no longer fits VMEM — split
            # the bucket into single-chunk groups that do (conservative
            # 32k-cell budget covers every kernel's block footprint)
            group = _vmem_chunk(256, cap, 32768)
            if group < 128 and len(idx) > group:
                pieces = [idx[i0 : i0 + group] for i0 in range(0, len(idx), group)]
            else:
                pieces = [idx]
            for piece in pieces:
                sub = bank.select(piece, lane=lane, width=cap)
                self.buckets.append((piece, kernel_cls(sub, **kwargs)))

    def __call__(self, sequences, pad_to=None, interpret=False):
        out = numpy.zeros((len(sequences), self.bank.P), dtype=numpy.float32)
        for idx, kern in self.buckets:
            out[:, idx] = kern(sequences, pad_to=pad_to, interpret=interpret)
        return out

    def masks(self, pack: SeqPack, F1: float, interpret: bool = False,
              bias: bool = True) -> "numpy.ndarray":
        """Gumbel-filter survivor matrix ``[S, P]`` (bool).

        Thresholds the filter scores ON DEVICE (``pv <= F1`` rewritten
        as a per-(sequence, profile) score threshold — the Gumbel
        survival function is monotone) and transfers only bit-packed
        words: ~30× fewer d2h bytes than raw scores, which dominates
        wall clock on remote-attached devices.  ``bias`` applies the
        HMMER-style composition bias filter null (on by default, like
        hmmsearch).
        """
        import jax.numpy as jnp

        if F1 < 1e-13:  # below the exact branch's resolution: tail form
            y_thr = -math.log(F1)
        else:
            y_thr = -math.log(-math.log1p(-F1))
        if bias and not hasattr(self, "_logratio"):
            self._logratio = [
                jnp.asarray(bias_logratio(kern.bank)) for _i, kern in self.buckets
            ]
        out = numpy.zeros((pack.S, self.bank.P), dtype=bool)
        collected = []
        for b, (idx, kern) in enumerate(self.buckets):
            scores = kern.scores_packed(pack, interpret=interpret)
            sub = kern.bank
            P_pad = scores.shape[1]
            thr = numpy.full(P_pad, numpy.inf, dtype=numpy.float32)
            thr[: sub.P] = LOG2 * (sub.msv_mu + y_thr / sub.msv_lambda)
            W = (P_pad + 31) // 32
            if bias:
                lr = self._logratio[b]
                if lr.shape[1] != P_pad:
                    lr = jnp.pad(lr, ((0, 0), (0, P_pad - lr.shape[1])))
                    self._logratio[b] = lr
            else:
                lr = jnp.zeros((20, P_pad), dtype=jnp.float32)
            packed = _jit_pack_mask(P_pad, W, bias)(
                scores, pack.nullsc, jnp.asarray(thr), pack.valid,
                pack.counts, lr,
            )
            collected.append((idx, sub.P, W, packed))
        import jax

        fetched = jax.device_get([packed for *_m, packed in collected])
        for (idx, subP, W, _h), words in zip(collected, fetched):
            words = numpy.ascontiguousarray(words)
            bits = numpy.unpackbits(words.view(numpy.uint8), bitorder="little")
            out[:, idx] = bits.reshape(pack.n, W * 32)[: pack.S, : subP].astype(bool)
        return out


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _pallas_fwd(P: int, Mp: int, Lp: int, S: int, Pc: int, masked: bool,
                interpret: bool, nd: Optional[int] = None,
                viterbi: bool = False, unroll: int = 4):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = P // Pc
    n_doubling = nd if nd is not None else int(math.log2(Mp))
    assert 1 << int(math.log2(Mp)) == Mp, "Mp must be a power of two"
    # max-plus (Viterbi) vs sum-product (Forward) semiring: the uniform
    # per-step rescaling trick is valid for both (positive scaling
    # commutes with max as well as with +)
    add = jnp.maximum if viterbi else (lambda a, b: a + b)

    def kernel(xs_ref, lens_ref, loops_ref, moves_ref,
               e_ref, tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (Pc, Mp), dimension=1)
        first_lane = lane == 0

        def shift1(a):
            rolled = pltpu.roll(a, shift=1, axis=1)
            if masked:
                return jnp.where(first_lane, 0.0, rolled)
            return rolled

        tmm = tmm_ref[...]
        tim = tim_ref[...]
        tdm = tdm_ref[...]
        tmi = tmi_ref[...]
        tii = tii_ref[...]
        tmd = tmd_ref[...]
        tdd = tdd_ref[...]
        bm = bm_ref[...]
        tdd_shifted = shift1(tdd)  # a_k = tdd[k-1]

        def dchain(m_new):
            # D_k = tdd[k-1] (*) D_{k-1} (+) m_new[k-1] * tmd[k-1]
            a = tdd_shifted
            b = shift1(m_new * tmd)
            shift = 1
            for _ in range(n_doubling):
                rolled_a = pltpu.roll(a, shift=shift, axis=1)
                rolled_b = pltpu.roll(b, shift=shift, axis=1)
                mask = lane >= shift
                prev_a = jnp.where(mask, rolled_a, 1.0)
                prev_b = jnp.where(mask, rolled_b, 0.0)
                b = add(prev_b * a, b)
                a = prev_a * a
                shift *= 2
            return b

        def one_sequence(s, _):
            L = lens_ref[0, 0, s]
            loop = loops_ref[0, 0, s]
            move = moves_ref[0, 0, s]

            def step(i, carry):
                M, I, D, N, B, J, C, logscale = carry
                xi = xs_ref[0, s, i]
                e = e_ref[xi]  # [Pc, Mp] odds
                stay = shift1(add(add(M * tmm, I * tim), D * tdm))
                Mn = e * add(stay, B * bm)
                In = add(M * tmi, I * tii)
                Dn = dchain(Mn)
                if viterbi:
                    # max Dn <= max Mn always (every Dn entry is an
                    # Mn_i scaled by transition probs <= 1), so the D
                    # plane never raises the lane max — drop it from
                    # the E reduction (exactness shared with the log-
                    # space ILP kernel; see its comment)
                    E = jnp.max(Mn, axis=1, keepdims=True)
                else:
                    E = jnp.sum(Mn + Dn, axis=1, keepdims=True)  # [Pc, 1]
                Jn = add(J * loop, E * 0.5)
                Cn = add(C * loop, E * 0.5)
                Nn = N * loop
                Bn = add(Nn, Jn) * move
                total = E + Bn + Nn + Cn + 1e-30
                inv = 1.0 / total
                return (Mn * inv, In * inv, Dn * inv,
                        Nn * inv, Bn * inv, Jn * inv, Cn * inv,
                        logscale + jnp.log(total))

            zeros = jnp.zeros((Pc, Mp), jnp.float32)
            z1 = jnp.zeros((Pc, 1), jnp.float32)
            carry = (zeros, zeros, zeros, z1 + 1.0, z1 + move, z1, z1, z1)

            def block(b, carry):
                # unrolled residue block: amortizes per-step overhead
                for u in range(unroll):
                    carry = step(b * unroll + u, carry)
                return carry

            carry = jax.lax.fori_loop(0, L // unroll, block, carry)
            carry = jax.lax.fori_loop((L // unroll) * unroll, L, step, carry)
            C_final, logscale = carry[6], carry[7]
            out_ref[s, :] = (jnp.log(C_final * move + 1e-38) + logscale)[:, 0]
            return 0

        jax.lax.fori_loop(0, S, one_sequence, 0)

    def run(xs, lens, loops, moves, e_odds, *trans_arrays):
        St = xs.shape[0]
        trans_specs = [
            pl.BlockSpec((Pc, Mp), lambda c, t: (c, 0), memory_space=pltpu.VMEM)
            for _ in range(8)
        ]
        return pl.pallas_call(
            kernel,
            grid=(n_chunks, St),
            in_specs=[
                pl.BlockSpec((1, S, Lp), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, S), lambda c, t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((21, Pc, Mp), lambda c, t: (0, c, 0), memory_space=pltpu.VMEM),
                *trans_specs,
            ],
            out_specs=pl.BlockSpec((S, Pc), lambda c, t: (t, c), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((St * S, P), jnp.float32),
            interpret=interpret,
        )(xs, lens, loops, moves, e_odds, *trans_arrays)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pallas_pair_fwd(Mp: int, Lp: int, C: int, masked: bool, interpret: bool,
                     nd: Optional[int] = None, viterbi: bool = False,
                     unroll: int = 4):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = nd if nd is not None else int(math.log2(Mp))
    assert 1 << int(math.log2(Mp)) == Mp, "Mp must be a power of two"
    add = jnp.maximum if viterbi else (lambda a, b: a + b)

    def kernel(xs_ref, starts_ref, ends_ref, loops_ref, moves_ref,
               e_ref, tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref, out_ref):
        j = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)
        first_lane = lane == 0

        def shift1(a):
            rolled = pltpu.roll(a, shift=1, axis=1)
            if masked:
                return jnp.where(first_lane, 0.0, rolled)
            return rolled

        tmm = tmm_ref[0]
        tim = tim_ref[0]
        tdm = tdm_ref[0]
        tmi = tmi_ref[0]
        tii = tii_ref[0]
        tmd = tmd_ref[0]
        tdd = tdd_ref[0]
        bm = bm_ref[0]
        tdd_shifted = shift1(tdd)

        def dchain(m_new):
            a = tdd_shifted
            b = shift1(m_new * tmd)
            shift = 1
            for _ in range(n_doubling):
                rolled_a = pltpu.roll(a, shift=shift, axis=1)
                rolled_b = pltpu.roll(b, shift=shift, axis=1)
                mask = lane >= shift
                prev_a = jnp.where(mask, rolled_a, 1.0)
                prev_b = jnp.where(mask, rolled_b, 0.0)
                b = add(prev_b * a, b)
                a = prev_a * a
                shift *= 2
            return b

        start = starts_ref[0, 0, j]
        end = ends_ref[0, 0, j]
        loop = loops_ref[0, 0, j]
        move = moves_ref[0, 0, j]

        def step(i, carry):
            M, I, D, N, B, J, Cc, logscale = carry
            xi = xs_ref[0, j, i]
            e = e_ref[xi, 0]  # [C, Mp] odds of this sequence's survivor rows
            stay = shift1(add(add(M * tmm, I * tim), D * tdm))
            Mn = e * add(stay, B * bm)
            In = add(M * tmi, I * tii)
            Dn = dchain(Mn)
            if viterbi:
                # max Dn <= max Mn always — see the ILP kernel comment
                E = jnp.max(Mn, axis=1, keepdims=True)
            else:
                E = jnp.sum(Mn + Dn, axis=1, keepdims=True)  # [C, 1]
            Jn = add(J * loop, E * 0.5)
            Cn = add(Cc * loop, E * 0.5)
            Nn = N * loop
            Bn = add(Nn, Jn) * move
            total = E + Bn + Nn + Cn + 1e-30
            inv = 1.0 / total
            return (Mn * inv, In * inv, Dn * inv,
                    Nn * inv, Bn * inv, Jn * inv, Cn * inv,
                    logscale + jnp.log(total))

        zeros = jnp.zeros((C, Mp), jnp.float32)
        z1 = jnp.zeros((C, 1), jnp.float32)
        carry = (zeros, zeros, zeros, z1 + 1.0, z1 + move, z1, z1, z1)
        n_res = end - start

        def block(b, carry):
            # unrolled residue block: amortizes per-step overhead
            i0 = start + b * unroll
            for u in range(unroll):
                carry = step(i0 + u, carry)
            return carry

        carry = jax.lax.fori_loop(0, n_res // unroll, block, carry)
        carry = jax.lax.fori_loop(
            start + (n_res // unroll) * unroll, end, step, carry)
        C_final, logscale = carry[6], carry[7]
        out_ref[0, j, :] = (jnp.log(C_final * move + 1e-38) + logscale)[:, 0]

    def run(xs, starts, ends, loops, moves, idx, e_odds, *trans):
        St = xs.shape[0]
        S = St * 8
        # device-side gather: each sequence's survivor rows, fixed [C]
        e_g = e_odds[:, idx, :]                      # [21, S, C, Mp]
        trans_g = [t[idx] for t in trans]            # [S, C, Mp] × 8
        trans_specs = [
            pl.BlockSpec((1, C, Mp), lambda t, j: (t * 8 + j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(8)
        ]
        out = pl.pallas_call(
            kernel,
            grid=(St, 8),
            in_specs=[
                pl.BlockSpec((1, 8, Lp), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((21, 1, C, Mp), lambda t, j: (0, t * 8 + j, 0, 0),
                             memory_space=pltpu.VMEM),
                *trans_specs,
            ],
            out_specs=pl.BlockSpec((1, 8, C), lambda t, j: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
            interpret=interpret,
        )(xs, starts, ends, loops, moves, e_g, *trans_g)
        return out.reshape(S, C)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pallas_pair_fwd_ilp(Mp: int, Lp: int, C: int, masked: bool, interpret: bool,
                         nd: Optional[int] = None, viterbi: bool = False,
                         unroll: int = 4, rows_per_cell: int = 2,
                         log_space: bool = False):
    """Pair Forward/Viterbi with 2-4 independent rows per grid cell.

    The single-row kernel's padded-cell rate scales near-linearly with
    the block width (measured 11.5 Gpad/s at C=32 vs 20.6 at C=64):
    each DP step is one serial dependency chain, so thin blocks leave
    the VPU pipeline idle between steps.  Interleaving two UNRELATED
    rows' recurrences in one residue loop fills those stalls — same
    vector work, double the instruction-level parallelism.  Rows may
    have different lengths; a finished row's carry freezes.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = nd if nd is not None else max(1, (Mp - 1).bit_length())
    if log_space:
        # the prefix-MAX delete chain has no doubling-combine step, so
        # any 128-lane-multiple width is legal (the viterbi buckets use
        # 384/768/1536 rungs to cut Mp padding — docs/kernels.md)
        assert Mp % 128 == 0, "Mp must be a multiple of 128"
    else:
        assert 1 << int(math.log2(Mp)) == Mp, "Mp must be a power of two"
    assert rows_per_cell in (2, 4, 8) and 8 % rows_per_cell == 0
    assert not log_space or viterbi, "log space is the max-plus semiring"
    R2 = rows_per_cell
    add = jnp.maximum if viterbi else (lambda a, b: a + b)

    def kernel(xs_ref, starts_ref, ends_ref, loops_ref, moves_ref,
               e_ref, tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref, out_ref):
        j = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)
        first_lane = lane == 0

        fill = NEG if log_space else 0.0

        def shift1(a):
            rolled = pltpu.roll(a, shift=1, axis=1)
            if masked:
                return jnp.where(first_lane, fill, rolled)
            return rolled

        def make_row(r):
            trans = tuple(t[0, r] for t in (
                tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
                tmd_ref, tdd_ref, bm_ref,
            ))
            # log space reads slots 5/6 as (tmd - S, S_{j-1}) — see
            # viterbi_log_tensors — and needs no shifted-tdd plane
            tdd_shifted = None if log_space else shift1(trans[6])
            row = R2 * j + r
            start = starts_ref[0, 0, row]
            end = ends_ref[0, 0, row]
            loop = loops_ref[0, 0, row]
            move = moves_ref[0, 0, row]
            return trans, tdd_shifted, row, start, end, loop, move, r

        rows = tuple(make_row(r) for r in range(R2))
        n_res = rows[0][4] - rows[0][3]
        for rd in rows[1:]:
            n_res = jnp.maximum(n_res, rd[4] - rd[3])

        if log_space:
            # max-plus in LOG space: no per-step rescale, no 1/x, no
            # log — and the delete chain factorizes through the
            # precomputed prefix sum S of log tdd (viterbi_log_tensors):
            #   D_j = S_{j-1} + max_{i<j} (Mn_i + tmd_i - S_i)
            # so the per-step scan is a plain prefix MAX: one roll per
            # doubling step instead of two, with the same 2^nd window
            # as the two-operand scan it replaces.
            def dchain(m_new, tmdS, Sm1):
                w = shift1(m_new + tmdS)
                shift = 1
                for _ in range(n_doubling):
                    rolled = pltpu.roll(w, shift=shift, axis=1)
                    w = jnp.maximum(
                        w, jnp.where(lane >= shift, rolled, NEG))
                    shift *= 2
                return w + Sm1

            def step_row(k, carry, row_data):
                (tmm, tim, tdm, tmi, tii, tmdS, Sm1, bm), _unused, \
                    row, start, end, loop, move, r = row_data
                M, I, D, N, B, J, Cc = carry
                alive = k < end - start
                xi = xs_ref[0, row, jnp.minimum(start + k, Lp - 1)]
                e = e_ref[xi, 0, r]             # [C, Mp] log odds
                stay = shift1(jnp.maximum(jnp.maximum(M + tmm, I + tim),
                                          D + tdm))
                Mn = e + jnp.maximum(stay, B + bm)
                In = jnp.maximum(M + tmi, I + tii)
                Dn = dchain(Mn, tmdS, Sm1)
                # E = max(max Mn, max Dn) collapses to max Mn EXACTLY:
                # every Dn entry is some Mn_i + tmd_i + Σ tdd (all log
                # probs <= 0), so the D plane never raises the lane max
                # — and the E -> J/C/B chain no longer waits on the
                # delete-chain scan (they run as parallel dependency
                # chains within the step)
                E = jnp.max(Mn, axis=1, keepdims=True)
                Elm = E + math.log(0.5)
                Jn = jnp.maximum(J + loop, Elm)
                Cn = jnp.maximum(Cc + loop, Elm)
                Nn = N + loop
                Bn = jnp.maximum(Nn, Jn) + move
                return (jnp.where(alive, Mn, M),
                        jnp.where(alive, In, I),
                        jnp.where(alive, Dn, D),
                        jnp.where(alive, Nn, N),
                        jnp.where(alive, Bn, B),
                        jnp.where(alive, Jn, J),
                        jnp.where(alive, Cn, Cc))
        else:
            def dchain(m_new, tmd, tdd_shifted):
                a = tdd_shifted
                b = shift1(m_new * tmd)
                shift = 1
                for _ in range(n_doubling):
                    rolled_a = pltpu.roll(a, shift=shift, axis=1)
                    rolled_b = pltpu.roll(b, shift=shift, axis=1)
                    mask = lane >= shift
                    prev_a = jnp.where(mask, rolled_a, 1.0)
                    prev_b = jnp.where(mask, rolled_b, 0.0)
                    b = add(prev_b * a, b)
                    a = prev_a * a
                    shift *= 2
                return b

            def step_row(k, carry, row_data):
                (tmm, tim, tdm, tmi, tii, tmd, tdd, bm), tdd_shifted, \
                    row, start, end, loop, move, r = row_data
                M, I, D, N, B, J, Cc, logscale = carry
                alive = k < end - start
                xi = xs_ref[0, row, jnp.minimum(start + k, Lp - 1)]
                e = e_ref[xi, 0, r]                 # [C, Mp]
                stay = shift1(add(add(M * tmm, I * tim), D * tdm))
                Mn = e * add(stay, B * bm)
                In = add(M * tmi, I * tii)
                Dn = dchain(Mn, tmd, tdd_shifted)
                if viterbi:
                    # max Dn <= max Mn always (every Dn entry is an
                    # Mn_i scaled by transition probs <= 1), so the D
                    # plane never raises the lane max — drop it from
                    # the E reduction (exactness shared with the log-
                    # space ILP kernel; see its comment)
                    E = jnp.max(Mn, axis=1, keepdims=True)
                else:
                    E = jnp.sum(Mn + Dn, axis=1, keepdims=True)
                Jn = add(J * loop, E * 0.5)
                Cn = add(Cc * loop, E * 0.5)
                Nn = N * loop
                Bn = add(Nn, Jn) * move
                total = E + Bn + Nn + Cn + 1e-30
                inv = 1.0 / total
                return (jnp.where(alive, Mn * inv, M),
                        jnp.where(alive, In * inv, I),
                        jnp.where(alive, Dn * inv, D),
                        jnp.where(alive, Nn * inv, N),
                        jnp.where(alive, Bn * inv, B),
                        jnp.where(alive, Jn * inv, J),
                        jnp.where(alive, Cn * inv, Cc),
                        jnp.where(alive, logscale + jnp.log(total), logscale))

        zeros = jnp.zeros((C, Mp), jnp.float32)
        negs = jnp.full((C, Mp), NEG, jnp.float32)
        z1 = jnp.zeros((C, 1), jnp.float32)

        def init(row_data):
            move = row_data[6]
            if log_space:
                return (negs, negs, negs, z1, z1 + move,
                        z1 + NEG, z1 + NEG)
            return (zeros, zeros, zeros, z1 + 1.0, z1 + move, z1, z1, z1)

        def step(k, carries):
            return tuple(
                step_row(k, c, rd) for c, rd in zip(carries, rows))

        def block(b, carries):
            for u in range(unroll):
                carries = step(b * unroll + u, carries)
            return carries

        carries = tuple(init(rd) for rd in rows)
        carries = jax.lax.fori_loop(0, n_res // unroll, block, carries)
        carries = jax.lax.fori_loop(
            (n_res // unroll) * unroll, n_res, step, carries)
        for r in range(R2):
            move = rows[r][6]
            if log_space:
                out_ref[0, R2 * j + r, :] = (carries[r][6] + move)[:, 0]
            else:
                C_final, logscale = carries[r][6], carries[r][7]
                out_ref[0, R2 * j + r, :] = (
                    jnp.log(C_final * move + 1e-38) + logscale)[:, 0]

    def run(xs, starts, ends, loops, moves, idx, e_odds, *trans):
        St = xs.shape[0]
        S = St * 8
        J = 8 // R2
        e_g = e_odds[:, idx, :]                      # [21, S, C, Mp]
        # emission rows indexed [xi, subrow]: put the row axis minor
        e_g = e_g.reshape(21, St * J, R2, C, Mp)
        trans_g = [t[idx].reshape(St * J, R2, C, Mp) for t in trans]
        trans_specs = [
            pl.BlockSpec((1, R2, C, Mp), lambda t, j: (t * J + j, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(8)
        ]
        svec = pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            kernel,
            grid=(St, J),
            in_specs=[
                pl.BlockSpec((1, 8, Lp), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                svec, svec, svec, svec,
                pl.BlockSpec((21, 1, R2, C, Mp), lambda t, j: (0, t * J + j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                *trans_specs,
            ],
            out_specs=pl.BlockSpec((1, 8, C), lambda t, j: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
            interpret=interpret,
        )(xs, starts, ends, loops, moves, e_g, *trans_g)
        return out.reshape(S, C)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pallas_pair_fwd_packed(Mp: int, Lp: int, C: int, masked: bool,
                            interpret: bool, with_ranges: bool,
                            nd: Optional[int] = None, viterbi: bool = False,
                            rows_per_cell: int = 2, log_space: bool = False):
    """Packed-batch entry: gather sequence rows on device, then DP."""
    import jax

    if rows_per_cell > 1:
        inner = _pallas_pair_fwd_ilp(
            Mp, Lp, C, masked, interpret, nd, viterbi,
            rows_per_cell=rows_per_cell, log_space=log_space)
    else:
        assert not log_space
        inner = _pallas_pair_fwd(Mp, Lp, C, masked, interpret, nd, viterbi)

    def run(xs_all, lens_all, loops_all, moves_all, rows, valid, idx,
            starts, ends, e_odds, *trans):
        n = rows.shape[0]
        St = n // 8
        xs = xs_all[rows]
        if with_ranges:
            s0, e0 = starts, ends
        else:
            s0 = starts  # zeros
            e0 = lens_all[rows] * valid
        loops = loops_all[rows]
        moves = moves_all[rows]
        return inner(
            xs.reshape(St, 8, Lp),
            s0.reshape(St, 1, 8), e0.reshape(St, 1, 8),
            loops.reshape(St, 1, 8), moves.reshape(St, 1, 8),
            idx, e_odds, *trans,
        )

    return jax.jit(run)


class PairForwardKernel:
    """Pair-dense Pallas Forward: per-sequence survivor sub-banks.

    At the hmmsearch default ``F1=0.02``, ~2% of *all* (sequence,
    profile) pairs survive the filter, so the union of surviving
    profiles over even a 64-sequence batch approaches the whole bank —
    rescoring ``batch × union`` wastes 10–30× the needed FLOPs.  This
    kernel instead gathers, on device, each sequence's ``C`` surviving
    profile rows out of the full bank (``e_odds[:, idx, :]`` — XLA
    gather, HBM-bandwidth cheap) and runs one grid cell per sequence
    over its own ``[C, Mp]`` sub-bank: every DP cell computed is a real
    survivor pair.
    """

    def __init__(self, bank: ProfileBank, viterbi: bool = False):
        import jax.numpy as jnp

        self.bank = bank
        self.viterbi = viterbi
        self.masked = bool((bank.lengths >= bank.Mp).any())
        self.nd = dchain_depth(bank)
        if viterbi:
            # max-plus runs in LOG space (no per-step rescale, no
            # transcendentals); slots 5/6 carry the prefix-sum-factored
            # delete-chain tensors (see viterbi_log_tensors)
            self.e_odds, self.trans = viterbi_log_tensors(bank)
        else:
            self.e_odds = jnp.asarray(bank.e_odds)
            self.trans = tuple(jnp.asarray(a) for a in (
                bank.tmm, bank.tim, bank.tdm, bank.tmi, bank.tii,
                bank.tmd, bank.tdd, bank.bm,
            ))

    def __call__(self, sequences, pair_idx, pad_to=None, interpret=False, ranges=None):
        """Forward scores (nats) for chosen pairs.

        ``pair_idx`` — ``[S, C0]`` int32, row ``s`` holding the profile
        rows to score against sequence ``s`` (padded with any valid
        index; padded cells are computed but meant to be discarded).
        ``ranges`` — optional ``[S, 2]`` int32 of 0-based half-open
        residue windows; the DP then scores only ``x[start:end]`` under
        the full-length model (HMMER's envelope rescore).  Returns
        ``[S, C0]`` float32.
        """
        S = len(sequences)
        if S == 0 or pair_idx.shape[1] == 0:
            return numpy.zeros((S, pair_idx.shape[1]), dtype=numpy.float32)
        Lp = pad_to or _round_up(max(len(x) for x in sequences), 32)
        pack = SeqPack(sequences, Lp)
        return self.call_packed(
            pack, numpy.arange(S, dtype=numpy.int32), pair_idx,
            interpret=interpret, ranges=ranges,
        )

    def call_packed(self, pack: SeqPack, rows, pair_idx, interpret=False,
                    ranges=None, fetch=True):
        """Forward scores for pairs addressed into a :class:`SeqPack`.

        ``rows[r]`` is the pack row of kernel row ``r``; ``pair_idx`` as
        in :meth:`__call__`.  Only O(rows) index bytes move host→device.
        """
        import jax.numpy as jnp

        R = len(rows)
        C0 = pair_idx.shape[1] if R else 0
        if R == 0 or C0 == 0:
            return numpy.zeros((R, C0), dtype=numpy.float32)
        C = _pair_width(C0)
        St = _round_up(R, 8) // 8
        St = 1 << (St - 1).bit_length()
        n = St * 8
        rows_p = numpy.zeros(n, dtype=numpy.int32)
        rows_p[:R] = rows
        valid = numpy.zeros(n, dtype=numpy.int32)
        valid[:R] = 1
        idx = numpy.zeros((n, C), dtype=numpy.int32)
        idx[:R, :C0] = pair_idx
        if ranges is not None:
            starts = numpy.zeros(n, dtype=numpy.int32)
            ends = numpy.zeros(n, dtype=numpy.int32)
            for r in range(R):
                starts[r], ends[r] = int(ranges[r][0]), int(ranges[r][1])
        else:
            starts = numpy.zeros(n, dtype=numpy.int32)
            ends = starts
        # the multi-row ILP kernel multiplies the per-cell emission/
        # transition VMEM footprint by rows_per_cell; rows x C x Mp =
        # 32k is the measured fit boundary at 16 MB scoped VMEM, so
        # narrow cells interleave up to 8 rows, mid cells 4/2, wide 1
        cell = C * self.bank.Mp
        rpc = next((r for r in (8, 4, 2) if r * cell <= 32768), 1)
        if os.environ.get("GECCO_LOG_PAIR_SHAPES"):
            import sys as _sys

            lens_np = pack.lens_host[numpy.asarray(rows_p)[:R]]
            print(f"# pair-shape Mp={self.bank.Mp} C={C} R={R} rpc={rpc} "
                  f"Lsum={int(lens_np.sum())} viterbi={self.viterbi}",
                  file=_sys.stderr)
        # Viterbi ILP cells run max-plus in LOG space (the tensors this
        # kernel holds for viterbi=True); wide single-row cells keep
        # the prob-space kernel and need probability tensors
        log_space = self.viterbi and rpc > 1
        if self.viterbi and not log_space:
            if not hasattr(self, "_prob_tensors"):
                self._prob_tensors = (
                    jnp.asarray(self.bank.e_odds),
                    tuple(jnp.asarray(a) for a in (
                        self.bank.tmm, self.bank.tim, self.bank.tdm,
                        self.bank.tmi, self.bank.tii, self.bank.tmd,
                        self.bank.tdd, self.bank.bm,
                    )),
                )
            e_odds, trans = self._prob_tensors
        else:
            e_odds, trans = self.e_odds, self.trans
        fn = _pallas_pair_fwd_packed(
            self.bank.Mp, pack.Lp, C, self.masked,
            _auto_interpret(interpret), ranges is not None, self.nd,
            self.viterbi, rows_per_cell=rpc, log_space=log_space,
        )
        out = fn(
            pack.xs, pack.lens,
            pack.loops_log if log_space else pack.loops_exp,
            pack.moves_log if log_space else pack.moves_exp,
            jnp.asarray(rows_p), jnp.asarray(valid), jnp.asarray(idx),
            jnp.asarray(starts), jnp.asarray(ends),
            e_odds, *trans,
        )
        if fetch:
            return numpy.asarray(out)[:R, :C0]
        return out[:R, :C0]  # device array: caller syncs after dispatching all


@functools.lru_cache(maxsize=None)
def _pallas_pair_posterior(Mp: int, Lp: int, C: int, masked: bool,
                           interpret: bool, emit_pe: bool = True):
    """Pair-dense Forward+Backward with posterior state trajectories.

    Per (sequence, profile) pair, outputs what HMMER's domain-definition
    heuristics need *before* envelopes are known (``p7_domaindef``
    region finding): the full-sequence Forward score and, per position,
    ``mocc`` (P(homologous)), ``pB`` and — when ``emit_pe`` — ``pE``
    (B/E usage posteriors).  The envelope finder only consumes mocc/pB,
    so the domain-definition path drops the pE plane (one [S,C,Lp] HBM
    write saved).  Forward scalar-state trajectories are recorded in
    VMEM scratch on the way out; the Backward pass re-walks the
    sequence combining them into the posteriors on the fly — no DP
    matrix ever leaves the chip.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = int(math.log2(Mp))

    def kernel(xs_ref, lens_ref, loops_ref, moves_ref,
               e_ref, tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref,
               score_ref, mocc_ref, pb_ref, *rest):
        if emit_pe:
            pe_ref = rest[0]
            (fN_s, fB_s, fJ_s, fC_s, fE_s, flog_s,
             mocc_s, pb_s, pe_s) = rest[1:]
        else:
            pe_ref = pe_s = None
            (fN_s, fB_s, fJ_s, fC_s, fE_s, flog_s,
             mocc_s, pb_s) = rest
        j = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)
        first_lane = lane == 0

        def shiftR(a):  # node k-1 -> k
            rolled = pltpu.roll(a, shift=1, axis=1)
            if masked:
                return jnp.where(first_lane, 0.0, rolled)
            return rolled

        def shiftL(a):  # node k+1 -> k  (left roll = right roll by Mp-1)
            rolled = pltpu.roll(a, shift=Mp - 1, axis=1)
            if masked:
                return jnp.where(lane == Mp - 1, 0.0, rolled)
            return rolled

        tmm = tmm_ref[0]
        tim = tim_ref[0]
        tdm = tdm_ref[0]
        tmi = tmi_ref[0]
        tii = tii_ref[0]
        tmd = tmd_ref[0]
        tdd = tdd_ref[0]
        bm = bm_ref[0]
        nm = e_ref[20, 0]  # degenerate-residue odds: 1 at real nodes, 0 at pads
        tdd_shifted = shiftR(tdd)

        def dchain_fwd(m_new):
            a = tdd_shifted
            b = shiftR(m_new * tmd)
            shift = 1
            for _ in range(n_doubling):
                rolled_a = pltpu.roll(a, shift=shift, axis=1)
                rolled_b = pltpu.roll(b, shift=shift, axis=1)
                mask = lane >= shift
                b = jnp.where(mask, rolled_b, 0.0) * a + b
                a = jnp.where(mask, rolled_a, 1.0) * a
                shift *= 2
            return b

        def dchain_bwd(c):
            # d[k] = c[k] + tdd[k] * d[k+1]
            a = tdd
            b = c
            shift = 1
            for _ in range(n_doubling):
                rolled_a = pltpu.roll(a, shift=Mp - shift, axis=1)
                rolled_b = pltpu.roll(b, shift=Mp - shift, axis=1)
                mask = lane < Mp - shift
                b = b + a * jnp.where(mask, rolled_b, 0.0)
                a = a * jnp.where(mask, rolled_a, 1.0)
                shift *= 2
            return b

        L = lens_ref[0, 0, j]
        loop = loops_ref[0, 0, j]
        move = moves_ref[0, 0, j]

        # ---- pass A: forward, recording scalar-state trajectories
        # Trajectories are kept as RAW rescaled probabilities plus one
        # shared log-scale row — per-step transcendentals (5 logs on the
        # way out, 5 exps on the way back) cost several times the DP
        # recurrence itself on the VPU; in raw space the backward emit
        # needs only 2 exps of shared scale factors.
        def fstep(i, carry):
            M, I, D, N, B, J, Cc, logscale = carry
            xi = xs_ref[0, j, i]
            e = e_ref[xi, 0]
            stay = shiftR(M * tmm + I * tim + D * tdm)
            Mn = e * (stay + B * bm)
            In = M * tmi + I * tii
            Dn = dchain_fwd(Mn)
            E = jnp.sum(Mn + Dn, axis=1, keepdims=True)
            Jn = J * loop + E * 0.5
            Cn = Cc * loop + E * 0.5
            Nn = N * loop
            Bn = (Nn + Jn) * move
            total = E + Bn + Nn + Cn + 1e-30
            inv = 1.0 / total
            ls = logscale + jnp.log(total)
            fN_s[i, :] = (Nn * inv)[:, 0]
            fB_s[i, :] = (Bn * inv)[:, 0]
            fJ_s[i, :] = (Jn * inv)[:, 0]
            fC_s[i, :] = (Cn * inv)[:, 0]
            fE_s[i, :] = (E * inv)[:, 0]
            flog_s[i, :] = ls[:, 0]
            return (Mn * inv, In * inv, Dn * inv,
                    Nn * inv, Bn * inv, Jn * inv, Cn * inv, ls)

        zeros = jnp.zeros((C, Mp), jnp.float32)
        z1 = jnp.zeros((C, 1), jnp.float32)
        carry = jax.lax.fori_loop(
            0, L, fstep, (zeros, zeros, zeros, z1 + 1.0, z1 + move, z1, z1, z1)
        )
        total_log = jnp.log(carry[6] * move + 1e-38) + carry[7]  # [C, 1]
        score_ref[0, j, :] = total_log[:, 0]

        # ---- pass B: backward, combining into posterior trajectories
        def emit(o, bN_p, bB_p, bJ_p, bC_p, bE_p, ls_b):
            """Write mocc/pB/pE for output index o (engine row o+1).

            ``b*_p`` are rescaled backward probabilities with shared
            log-scale ``ls_b``; the forward side comes from the raw
            trajectory scratches, so only the two scale factors need an
            exp.
            """
            first = o == 0
            om1 = jnp.maximum(o - 1, 0)
            prev_fN = jnp.where(first, 1.0, fN_s[om1, :][:, None])
            prev_fJ = jnp.where(first, 0.0, fJ_s[om1, :][:, None])
            prev_fC = jnp.where(first, 0.0, fC_s[om1, :][:, None])
            prev_ls = jnp.where(first, 0.0, flog_s[om1, :][:, None])
            sc_prev = jnp.exp(prev_ls + ls_b - total_log)
            sc_cur = jnp.exp(flog_s[o, :][:, None] + ls_b - total_log)
            ppN = prev_fN * loop * bN_p * sc_prev
            ppJ = prev_fJ * loop * bJ_p * sc_prev
            ppC = prev_fC * loop * bC_p * sc_prev
            mocc = jnp.clip(1.0 - (ppN + ppJ + ppC), 0.0, 1.0)
            pB = fB_s[o, :][:, None] * bB_p * sc_cur
            mocc_s[o, :] = mocc[:, 0]
            pb_s[o, :] = pB[:, 0]
            if emit_pe:
                pE = fE_s[o, :][:, None] * bE_p * sc_cur
                pe_s[o, :] = pE[:, 0]

        # row L init (engine backward row L)
        bC0 = move
        bE0 = bC0 * 0.5
        bD_L = dchain_bwd(nm * bE0)
        bM_L = nm * bE0 + tmd * shiftL(bD_L)
        z1c = jnp.zeros((C, 1), jnp.float32)
        emit(L - 1, z1c, z1c, z1c, z1c + move, z1c + move * 0.5, z1c)

        def bstep(t, carry):
            bM, bI, bN, bB, bJ, bCs, logscale = carry
            row = L - t  # engine row index being computed
            xi = xs_ref[0, j, row]  # residue row+1 (0-based index row)
            e_next = e_ref[xi, 0]
            q = shiftL(e_next * bM)            # e_{i+1}[k+1] * bM[i+1, k+1]
            bBn = jnp.sum(bm * e_next * bM, axis=1, keepdims=True)
            bJn = loop * bJ + move * bBn
            bCn = loop * bCs
            bNn = loop * bN + move * bBn
            bEn = 0.5 * bJn + 0.5 * bCn
            bIn = tim * q + tii * bI
            bDn = dchain_bwd(nm * bEn + tdm * q)
            bMn = nm * bEn + tmm * q + tmi * bI + tmd * shiftL(bDn)
            scale = bNn + bJn + bCn + bBn + 1e-30
            inv = 1.0 / scale
            ls = logscale + jnp.log(scale)
            emit(row - 1, bNn * inv, bBn * inv, bJn * inv,
                 bCn * inv, bEn * inv, ls)
            return (bMn * inv, bIn * inv, bNn * inv, bBn * inv,
                    bJn * inv, bCn * inv, ls)

        jax.lax.fori_loop(1, L, bstep, (
            bM_L, zeros, z1, z1, z1, z1 + move, z1,
        ))

        # transpose the (Lp, C) trajectory scratches into the outputs
        mocc_ref[0, 0] = mocc_s[...].T
        pb_ref[0, 0] = pb_s[...].T
        if emit_pe:
            pe_ref[0, 0] = pe_s[...].T

    def run(xs, lens, loops, moves, idx, e_odds, *trans):
        St = xs.shape[0]
        S = St * 8
        e_g = e_odds[:, idx, :]
        trans_g = [t[idx] for t in trans]
        trans_specs = [
            pl.BlockSpec((1, C, Mp), lambda t, j: (t * 8 + j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(8)
        ]
        vec_spec = pl.BlockSpec((1, 1, C, Lp), lambda t, j: (t, j, 0, 0),
                                memory_space=pltpu.VMEM)
        n_vec_out = 3 if emit_pe else 2
        outs = pl.pallas_call(
            kernel,
            grid=(St, 8),
            in_specs=[
                pl.BlockSpec((1, 8, Lp), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((21, 1, C, Mp), lambda t, j: (0, t * 8 + j, 0, 0),
                             memory_space=pltpu.VMEM),
                *trans_specs,
            ],
            out_specs=[
                pl.BlockSpec((1, 8, C), lambda t, j: (t, 0, 0), memory_space=pltpu.VMEM),
            ] + [vec_spec] * n_vec_out,
            out_shape=[
                jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
            ] + [
                jax.ShapeDtypeStruct((St, 8, C, Lp), jnp.float32)
            ] * n_vec_out,
            scratch_shapes=[
                pltpu.VMEM((Lp, C), jnp.float32),   # fN
                pltpu.VMEM((Lp, C), jnp.float32),   # fB
                pltpu.VMEM((Lp, C), jnp.float32),   # fJ
                pltpu.VMEM((Lp, C), jnp.float32),   # fC
                pltpu.VMEM((Lp, C), jnp.float32),   # fE
                pltpu.VMEM((Lp, C), jnp.float32),   # forward logscale
                pltpu.VMEM((Lp, C), jnp.float32),   # mocc rows
                pltpu.VMEM((Lp, C), jnp.float32),   # pB rows
            ] + ([pltpu.VMEM((Lp, C), jnp.float32)] if emit_pe else []),
            interpret=interpret,
        )(xs, lens, loops, moves, e_g, *trans_g)
        score, mocc, pb = outs[0], outs[1], outs[2]
        res = (score.reshape(S, C), mocc.reshape(S, C, Lp),
               pb.reshape(S, C, Lp))
        if emit_pe:
            res = res + (outs[3].reshape(S, C, Lp),)
        return res

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pallas_pair_posterior_packed(Mp: int, Lp: int, C: int, masked: bool,
                                  interpret: bool, emit_pe: bool = True):
    """Packed-batch entry: gather sequence rows on device, then DP."""
    import jax
    import jax.numpy as jnp

    inner = _pallas_pair_posterior(Mp, Lp, C, masked, interpret, emit_pe)

    def run(xs_all, lens_all, loops_all, moves_all, rows, valid, idx,
            e_odds, *trans):
        n = rows.shape[0]
        St = n // 8
        xs = xs_all[rows]
        lens = jnp.maximum(lens_all[rows] * valid, 1)
        loops = loops_all[rows]
        moves = moves_all[rows]
        return inner(
            xs.reshape(St, 8, Lp),
            lens.reshape(St, 1, 8),
            loops.reshape(St, 1, 8), moves.reshape(St, 1, 8),
            idx, e_odds, *trans,
        )

    return jax.jit(run)


class PairPosteriorKernel:
    """Pair-dense posterior trajectories for domain definition (stage 3a).

    Same gather layout as :class:`PairForwardKernel`; returns, per pair,
    the Forward score plus the ``mocc``/``pB``/``pE`` position vectors
    that drive HMMER-style region finding (``engine.posterior_decode`` /
    ``engine._find_regions`` semantics, f32).
    """

    def __init__(self, bank: ProfileBank):
        import jax.numpy as jnp

        self.bank = bank
        self.masked = bool((bank.lengths >= bank.Mp).any())
        self.e_odds = jnp.asarray(bank.e_odds)
        self.trans = tuple(jnp.asarray(a) for a in (
            bank.tmm, bank.tim, bank.tdm, bank.tmi, bank.tii,
            bank.tmd, bank.tdd, bank.bm,
        ))

    def __call__(self, sequences, pair_idx, pad_to=None, interpret=False):
        S = len(sequences)
        C0 = pair_idx.shape[1] if S else 0
        if S == 0 or C0 == 0:
            z = numpy.zeros((S, C0), dtype=numpy.float32)
            return z, z[:, :, None], z[:, :, None], z[:, :, None]
        Lp = pad_to or _round_up(max(len(x) for x in sequences), 32)
        pack = SeqPack(sequences, Lp)
        score, mocc, pb, pe = self.call_packed(
            pack, numpy.arange(S, dtype=numpy.int32), pair_idx,
            interpret=interpret,
        )
        return (numpy.asarray(score), numpy.asarray(mocc),
                numpy.asarray(pb), numpy.asarray(pe))

    def call_packed(self, pack: SeqPack, rows, pair_idx, interpret=False,
                    emit_pe=True):
        """DEVICE-resident trajectories for pairs addressed into a pack.

        Returns jnp arrays ``(score [R, C0], mocc/pb [R, C0, Lp])`` plus
        ``pe`` when ``emit_pe`` — no host transfer; feed them to the
        on-device envelope finder and fetch only its coordinates.  The
        envelope finder needs only mocc/pB, so domain definition passes
        ``emit_pe=False`` and saves the third trajectory plane.
        """
        import jax.numpy as jnp

        R = len(rows)
        C0 = pair_idx.shape[1] if R else 0
        C = max(8, _round_up(C0, 8))
        St = _round_up(R, 8) // 8
        St = 1 << (St - 1).bit_length()
        n = St * 8
        rows_p = numpy.zeros(n, dtype=numpy.int32)
        rows_p[:R] = rows
        valid = numpy.zeros(n, dtype=numpy.int32)
        valid[:R] = 1
        idx = numpy.zeros((n, C), dtype=numpy.int32)
        idx[:R, :C0] = pair_idx
        fn = _pallas_pair_posterior_packed(
            self.bank.Mp, pack.Lp, C, self.masked,
            _auto_interpret(interpret), emit_pe,
        )
        outs = fn(
            pack.xs, pack.lens, pack.loops_exp, pack.moves_exp,
            jnp.asarray(rows_p), jnp.asarray(valid), jnp.asarray(idx),
            self.e_odds, *self.trans,
        )
        res = tuple(o[:R, :C0] for o in outs)
        return res if emit_pe else res + (None,)


@functools.lru_cache(maxsize=None)
def _pallas_pair_align(Mp: int, Lp: int, C: int, masked: bool, interpret: bool):
    """Per-envelope scoring and alignment (stage 3b), one sequence/cell.

    For up to ``C`` envelopes of one sequence (each row: its own profile
    and ``[ienv, jenv]`` window), computes in one kernel:

    * the envelope Forward rescore (fresh DP over ``x[ienv..jenv]``);
    * the null2 bias correction ``Σ log null2(x_i)`` over the envelope,
      computed IN KERNEL from the match/insert/non-homology posterior
      occupancies (``p7_GNull2`` analog) so only one scalar per
      envelope ever leaves the chip;
    * optimal-accuracy alignment coordinates — the posterior-max local
      path's endpoints, recovered WITHOUT traceback by propagating the
      path's start coordinates through the max DP as payload planes.

    The Backward pass runs first, parking its match/insert planes in a
    VMEM scratch ring (bf16, ``[Lp, C, Mp]``); the Forward pass then
    combines them into posterior rows on the fly.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = int(math.log2(Mp))
    BIG = 1e9

    def kernel(xs_ref, lens_ref, loops_ref, moves_ref, ienv_ref, jenv_ref,
               total_ref,
               e_ref, tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref,
               envsc_ref, logn2_ref,
               tf_ref, tt_ref, hf_ref, ht_ref,
               bM_s, bI_s, blog_s, bN_s, bJ_s, bC_s, logn2_s):
        j = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)
        first_lane = lane == 0
        lane_f = lane.astype(jnp.float32)

        def shiftR(a):
            rolled = pltpu.roll(a, shift=1, axis=1)
            if masked:
                return jnp.where(first_lane, 0.0, rolled)
            return rolled

        def shiftL(a):
            rolled = pltpu.roll(a, shift=Mp - 1, axis=1)
            if masked:
                return jnp.where(lane == Mp - 1, 0.0, rolled)
            return rolled

        def shiftR_neg(a):
            """NEG-space node shift for the OA planes (pads hold NEG)."""
            rolled = pltpu.roll(a, shift=1, axis=1)
            return jnp.where(first_lane, NEG, rolled)

        tmm = tmm_ref[0]
        tim = tim_ref[0]
        tdm = tdm_ref[0]
        tmi = tmi_ref[0]
        tii = tii_ref[0]
        tmd = tmd_ref[0]
        tdd = tdd_ref[0]
        bm = bm_ref[0]
        nm = e_ref[20, 0]           # 1 at real nodes, 0 at pads
        node_neg = jnp.where(nm > 0, 0.0, NEG)
        # transition-existence gates for the OA path (additive NEG gates)
        g_mm = jnp.where(tmm > 0, 0.0, NEG)
        g_im = jnp.where(tim > 0, 0.0, NEG)
        g_dm = jnp.where(tdm > 0, 0.0, NEG)
        g_mi = jnp.where(tmi > 0, 0.0, NEG)
        g_ii = jnp.where(tii > 0, 0.0, NEG)
        g_md = jnp.where(tmd > 0, 0.0, NEG)
        g_dd = jnp.where(tdd > 0, 0.0, NEG)
        tdd_shifted = shiftR(tdd)

        def dchain_fwd(m_new):
            a = tdd_shifted
            b = shiftR(m_new * tmd)
            shift = 1
            for _ in range(n_doubling):
                rolled_a = pltpu.roll(a, shift=shift, axis=1)
                rolled_b = pltpu.roll(b, shift=shift, axis=1)
                mask = lane >= shift
                b = jnp.where(mask, rolled_b, 0.0) * a + b
                a = jnp.where(mask, rolled_a, 1.0) * a
                shift *= 2
            return b

        def dchain_bwd(c):
            a = tdd
            b = c
            shift = 1
            for _ in range(n_doubling):
                rolled_a = pltpu.roll(a, shift=Mp - shift, axis=1)
                rolled_b = pltpu.roll(b, shift=Mp - shift, axis=1)
                mask = lane < Mp - shift
                b = b + a * jnp.where(mask, rolled_b, 0.0)
                a = a * jnp.where(mask, rolled_a, 1.0)
                shift *= 2
            return b

        L = lens_ref[0, 0, j]
        loop = loops_ref[0, 0, j]
        move = moves_ref[0, 0, j]
        total_log = total_ref[0, j, :][:, None]          # [C, 1] full-seq fwd
        iv = ienv_ref[0, j, :][:, None]                  # [C, 1] 1-based, f32
        jv = jenv_ref[0, j, :][:, None]
        # envelope rescore length model: p7_ReconfigLength over Ld
        Ld = jnp.maximum(jv - iv + 1.0, 1.0)
        eloop = Ld / (Ld + 3.0)
        emove = 3.0 / (Ld + 3.0)

        zeros = jnp.zeros((C, Mp), jnp.float32)
        negs = jnp.full((C, Mp), NEG, jnp.float32)
        z1 = jnp.zeros((C, 1), jnp.float32)

        # ---- pass 1: backward, parking match/insert planes per row
        bC0 = move
        bE0 = bC0 * 0.5
        bD_L = dchain_bwd(nm * bE0)
        bM_L = nm * bE0 + tmd * shiftL(bD_L)
        bM_s[L - 1] = bM_L.astype(jnp.bfloat16)
        bI_s[L - 1] = jnp.zeros((C, Mp), jnp.bfloat16)
        blog_s[L - 1, :] = z1[:, 0]
        bN_s[L - 1, :] = z1[:, 0] + NEG
        bJ_s[L - 1, :] = z1[:, 0] + NEG
        bC_s[L - 1, :] = z1[:, 0] + jnp.log(move)

        def bstep(t, carry):
            bM, bI, bN, bB, bJ, bCs, logscale = carry
            row = L - t
            xi = xs_ref[0, j, row]
            e_next = e_ref[xi, 0]
            q = shiftL(e_next * bM)
            bBn = jnp.sum(bm * e_next * bM, axis=1, keepdims=True)
            bJn = loop * bJ + move * bBn
            bCn = loop * bCs
            bNn = loop * bN + move * bBn
            bEn = 0.5 * bJn + 0.5 * bCn
            bIn = tim * q + tii * bI
            bDn = dchain_bwd(nm * bEn + tdm * q)
            bMn = nm * bEn + tmm * q + tmi * bI + tmd * shiftL(bDn)
            scale = bNn + bJn + bCn + bBn + 1e-30
            inv = 1.0 / scale
            ls = logscale + jnp.log(scale)
            tiny = 1e-38
            o = row - 1
            bM_s[o] = (bMn * inv).astype(jnp.bfloat16)
            bI_s[o] = (bIn * inv).astype(jnp.bfloat16)
            blog_s[o, :] = ls[:, 0]
            bN_s[o, :] = (jnp.log(bNn * inv + tiny) + ls)[:, 0]
            bJ_s[o, :] = (jnp.log(bJn * inv + tiny) + ls)[:, 0]
            bC_s[o, :] = (jnp.log(bCn * inv + tiny) + ls)[:, 0]
            return (bMn * inv, bIn * inv, bNn * inv, bBn * inv,
                    bJn * inv, bCn * inv, ls)

        jax.lax.fori_loop(1, L, bstep, (bM_L, zeros, z1, z1, z1, z1 + move, z1))

        # ---- pass 2: forward + posteriors + envelope DP + OA
        log_loop = jnp.log(loop)

        def fstep(i0, carry):
            (M, I, D, N, B, J, Cc, lsf,
             eM, eI, eD, eN, eB, eJ, eC, elog,
             sM, sI, sD, siM, skM, siI, skI, siD, skD,
             best, b_tf, b_tt, b_hf, b_ht,
             matocc, insocc, xocc) = carry
            i = i0 + 1  # engine row (1-based residue index)
            i_row = jnp.float32(0) + i
            xi = xs_ref[0, j, i0]
            e = e_ref[xi, 0]
            in_env = jnp.logical_and(i_row >= iv, i_row <= jv)  # [C, 1]
            in_envf = in_env.astype(jnp.float32)

            # -- full-sequence forward step
            stay = shiftR(M * tmm + I * tim + D * tdm)
            Mn = e * (stay + B * bm)
            In = M * tmi + I * tii
            Dn = dchain_fwd(Mn)
            E = jnp.sum(Mn + Dn, axis=1, keepdims=True)
            Jn = J * loop + E * 0.5
            Cn = Cc * loop + E * 0.5
            Nn = N * loop
            Bn = (Nn + Jn) * move
            total = E + Bn + Nn + Cn + 1e-30
            inv = 1.0 / total
            lsf_n = lsf + jnp.log(total)
            prev_fN, prev_fJ, prev_fC = N, J, Cc  # probs, scale lsf

            # -- posterior rows (scale factors fold the rescaling away)
            pscale = jnp.exp(lsf_n + blog_s[i0, :][:, None] - total_log)
            ppM = (Mn * inv) * bM_s[i0].astype(jnp.float32) * pscale
            ppI = (In * inv) * bI_s[i0].astype(jnp.float32) * pscale
            matocc = matocc + ppM * in_envf
            insocc = insocc + ppI * in_envf
            # non-homology mass 1 - mocc from the scalar trajectories
            tiny = 1e-38
            ppN = jnp.exp(jnp.log(prev_fN + tiny) + lsf + log_loop
                          + bN_s[i0, :][:, None] - total_log)
            ppJ = jnp.exp(jnp.log(prev_fJ + tiny) + lsf + log_loop
                          + bJ_s[i0, :][:, None] - total_log)
            ppC = jnp.exp(jnp.log(prev_fC + tiny) + lsf + log_loop
                          + bC_s[i0, :][:, None] - total_log)
            xocc = xocc + jnp.clip(ppN + ppJ + ppC, 0.0, 1.0) * in_envf

            # -- envelope forward rescore (fresh DP gated to the window)
            estay = shiftR(eM * tmm + eI * tim + eD * tdm)
            eMn = e * (estay + eB * bm)
            eIn = eM * tmi + eI * tii
            eDn = dchain_fwd(eMn)
            eE = jnp.sum(eMn + eDn, axis=1, keepdims=True)
            eJn = eJ * eloop + eE * 0.5
            eCn = eC * eloop + eE * 0.5
            eNn = eN * eloop
            eBn = (eNn + eJn) * emove
            etot = eE + eBn + eNn + eCn + 1e-30
            einv = 1.0 / etot
            eM = jnp.where(in_env, eMn * einv, eM)
            eI = jnp.where(in_env, eIn * einv, eI)
            eD = jnp.where(in_env, eDn * einv, eD)
            eN = jnp.where(in_env, eNn * einv, eN)
            eB = jnp.where(in_env, eBn * einv, eB)
            eJ = jnp.where(in_env, eJn * einv, eJ)
            eC = jnp.where(in_env, eCn * einv, eC)
            elog = jnp.where(in_env, elog + jnp.log(etot), elog)

            # -- optimal-accuracy DP with endpoint payloads
            i_f = jnp.float32(0) + i  # traced scalar
            fromM = shiftR_neg(sM + g_mm)
            fromI = shiftR_neg(sI + g_im)
            fromD = shiftR_neg(sD + g_dm)
            pM = jnp.maximum(fromM, jnp.maximum(fromI, fromD))
            entry = pM <= 0.0       # 0 >= best_prev: entry wins ties (host stack order)
            # payload of the winning predecessor (M > I > D on ties)
            useM = fromM >= pM
            useI = jnp.logical_and(~useM, fromI >= pM)
            si_prev = jnp.where(useM, shiftR_neg(siM),
                                jnp.where(useI, shiftR_neg(siI), shiftR_neg(siD)))
            sk_prev = jnp.where(useM, shiftR_neg(skM),
                                jnp.where(useI, shiftR_neg(skI), shiftR_neg(skD)))
            sMn = node_neg + ppM + jnp.maximum(pM, 0.0)
            siMn = jnp.where(entry, i_f, si_prev)
            skMn = jnp.where(entry, lane_f + 1.0, sk_prev)
            # inserts: from M or I at same node, previous row
            fromMi = sM + g_mi
            fromIi = sI + g_ii
            useMi = fromMi >= fromIi
            sIn = node_neg + ppI + jnp.maximum(fromMi, fromIi)
            siIn = jnp.where(useMi, siM, siI)
            skIn = jnp.where(useMi, skM, skI)
            # deletes: in-row max chain with payloads (doubling scan)
            dsc = shiftR_neg(sMn + g_md)
            dsi = shiftR_neg(siMn)
            dsk = shiftR_neg(skMn)
            gate = shiftR_neg(g_dd)  # gate[k] = ok_dd[k-1] as additive 0/NEG
            shift = 1
            for _ in range(n_doubling):
                r_sc = pltpu.roll(dsc, shift=shift, axis=1)
                r_si = pltpu.roll(dsi, shift=shift, axis=1)
                r_sk = pltpu.roll(dsk, shift=shift, axis=1)
                r_g = pltpu.roll(gate, shift=shift, axis=1)
                mask = lane >= shift
                cand = jnp.where(mask, r_sc, NEG) + gate
                take = cand > dsc
                dsc = jnp.where(take, cand, dsc)
                dsi = jnp.where(take, r_si, dsi)
                dsk = jnp.where(take, r_sk, dsk)
                gate = gate + jnp.where(mask, r_g, 0.0)
                shift *= 2
            sDn, siDn, skDn = dsc, dsi, dsk

            # freeze OA planes outside the envelope window
            sM = jnp.where(in_env, sMn, sM)
            sI = jnp.where(in_env, sIn, sI)
            sD = jnp.where(in_env, sDn, sD)
            siM = jnp.where(in_env, siMn, siM)
            skM = jnp.where(in_env, skMn, skM)
            siI = jnp.where(in_env, siIn, siI)
            skI = jnp.where(in_env, skIn, skI)
            siD = jnp.where(in_env, siDn, siD)
            skD = jnp.where(in_env, skDn, skD)

            # running best end cell (strict > keeps the earliest row/lane)
            rowmax = jnp.max(sM, axis=1, keepdims=True)
            upd = jnp.logical_and(in_env, rowmax > best)
            at_max = sM == rowmax
            k_end = jnp.min(jnp.where(at_max, lane_f, BIG), axis=1, keepdims=True)
            sel = lane_f[...] == k_end
            si_at = jnp.max(jnp.where(sel, siM, -BIG), axis=1, keepdims=True)
            sk_at = jnp.max(jnp.where(sel, skM, -BIG), axis=1, keepdims=True)
            best = jnp.where(upd, rowmax, best)
            b_tf = jnp.where(upd, si_at, b_tf)
            b_tt = jnp.where(upd, i_f + jnp.zeros_like(best), b_tt)
            b_hf = jnp.where(upd, sk_at, b_hf)
            b_ht = jnp.where(upd, k_end + 1.0, b_ht)

            # advance full-seq forward carry
            return (Mn * inv, In * inv, Dn * inv, Nn * inv, Bn * inv,
                    Jn * inv, Cn * inv, lsf_n,
                    eM, eI, eD, eN, eB, eJ, eC, elog,
                    sM, sI, sD, siM, skM, siI, skI, siD, skD,
                    best, b_tf, b_tt, b_hf, b_ht,
                    matocc, insocc, xocc)

        init = (zeros, zeros, zeros, z1 + 1.0, z1 + move, z1, z1, z1,
                zeros, zeros, zeros, z1 + 1.0, z1 * 0.0 + emove, z1, z1, z1,
                negs, negs, negs, negs, negs, negs, negs, negs, negs,
                z1 + NEG, z1, z1, z1, z1,
                zeros, zeros, z1)
        out = jax.lax.fori_loop(0, L, fstep, init)
        eC_f, elog_f = out[14], out[15]
        envsc_ref[0, j, :] = (jnp.log(eC_f * emove + 1e-38) + elog_f)[:, 0]
        tf_ref[0, j, :] = out[26][:, 0]
        tt_ref[0, j, :] = out[27][:, 0]
        hf_ref[0, j, :] = out[28][:, 0]
        ht_ref[0, j, :] = out[29][:, 0]

        # ---- null2 odds per residue class (p7_GNull2 analog): the
        # envelope's null2 model emits occupancy-weighted emission
        # odds.  Only these 21 log-odds per envelope leave the chip;
        # the host folds them with per-envelope residue-class counts
        # (Σ log null2(x_i) = Σ_a count_a · log null2_a).
        matocc = out[30]                                   # [C, Mp]
        insocc = jnp.sum(out[31], axis=1, keepdims=True)   # [C, 1]
        xocc = out[32]                                     # [C, 1]
        total_occ = jnp.sum(matocc, axis=1, keepdims=True) + insocc + xocc
        inv_tot = 1.0 / jnp.maximum(total_occ, 1e-30)
        for a in range(21):
            dot = jnp.sum(matocc * e_ref[a, 0], axis=1, keepdims=True)
            n2 = (dot + insocc + xocc) * inv_tot
            logn2_s[a, :] = jnp.log(jnp.maximum(n2, 1e-300))[:, 0]
        logn2_ref[0, 0] = logn2_s[...].T

    def run(xs, lens, loops, moves, ienv, jenv, totals, idx, e_odds, *trans):
        St = xs.shape[0]
        S = St * 8
        e_g = e_odds[:, idx, :]
        trans_g = [t[idx] for t in trans]
        trans_specs = [
            pl.BlockSpec((1, C, Mp), lambda t, j: (t * 8 + j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(8)
        ]
        out_c = pl.BlockSpec((1, 8, C), lambda t, j: (t, 0, 0), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(St, 8),
            in_specs=[
                pl.BlockSpec((1, 8, Lp), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 8), lambda t, j: (t, 0, 0), memory_space=pltpu.SMEM),
                out_c,   # ienv (f32, VMEM: SMEM only allows scalar loads)
                out_c,   # jenv
                pl.BlockSpec((1, 8, C), lambda t, j: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((21, 1, C, Mp), lambda t, j: (0, t * 8 + j, 0, 0),
                             memory_space=pltpu.VMEM),
                *trans_specs,
            ],
            out_specs=[
                out_c,
                pl.BlockSpec((1, 1, C, 24), lambda t, j: (t, j, 0, 0),
                             memory_space=pltpu.VMEM),
                out_c, out_c, out_c, out_c,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
                jax.ShapeDtypeStruct((St, 8, C, 24), jnp.float32),
                jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
                jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
                jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
                jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((Lp, C, Mp), jnp.bfloat16),  # bM rows
                pltpu.VMEM((Lp, C, Mp), jnp.bfloat16),  # bI rows
                pltpu.VMEM((Lp, C), jnp.float32),       # backward logscale
                pltpu.VMEM((Lp, C), jnp.float32),       # log bN
                pltpu.VMEM((Lp, C), jnp.float32),       # log bJ
                pltpu.VMEM((Lp, C), jnp.float32),       # log bC
                pltpu.VMEM((24, C), jnp.float32),       # log null2 by class
            ],
            interpret=interpret,
        )(xs, lens, loops, moves, ienv, jenv, totals, e_g, *trans_g)
        envsc, logn2, tf, tt, hf, ht = outs
        return (envsc.reshape(S, C), logn2.reshape(S, C, 24),
                tf.reshape(S, C), tt.reshape(S, C),
                hf.reshape(S, C), ht.reshape(S, C))

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pallas_pair_align_packed(Mp: int, Lp: int, C: int, masked: bool,
                              interpret: bool):
    """Packed-batch entry: gather cell sequences on device, then DP."""
    import jax
    import jax.numpy as jnp

    inner = _pallas_pair_align(Mp, Lp, C, masked, interpret)

    def run(xs_all, lens_all, loops_all, moves_all, rows, valid,
            ienv, jenv, totals, idx, e_odds, *trans):
        n = rows.shape[0]
        St = n // 8
        xs = xs_all[rows]
        lens = jnp.maximum(lens_all[rows] * valid, 1)
        loops = loops_all[rows]
        moves = moves_all[rows]
        return inner(
            xs.reshape(St, 8, Lp),
            lens.reshape(St, 1, 8),
            loops.reshape(St, 1, 8), moves.reshape(St, 1, 8),
            ienv.reshape(St, 8, C), jenv.reshape(St, 8, C),
            totals.reshape(St, 8, C), idx, e_odds, *trans,
        )

    return jax.jit(run)


class PairAlignKernel:
    """Pair-dense envelope scoring + OA alignment (stage 3b).

    One call scores a batch of envelopes: ``envelopes[i]`` is
    ``(seq_index, profile_row, ienv, jenv)`` (1-based inclusive window).
    Returns dicts keyed by envelope index with the envelope Forward
    score, null2 bias correction, and alignment coordinates, matching
    ``engine.define_domains``'s per-envelope numbers (f32).
    """

    def __init__(self, bank: ProfileBank):
        import jax.numpy as jnp

        self.bank = bank
        self.masked = bool((bank.lengths >= bank.Mp).any())
        self.e_odds = jnp.asarray(bank.e_odds)
        self.trans = tuple(jnp.asarray(a) for a in (
            bank.tmm, bank.tim, bank.tdm, bank.tmi, bank.tii,
            bank.tmd, bank.tdd, bank.bm,
        ))

    def __call__(self, sequences, envelopes, totals, pad_to=None, interpret=False):
        NE = len(envelopes)
        if NE == 0:
            return []
        Lp = pad_to or _round_up(max(len(x) for x in sequences), 32)
        pack = SeqPack(sequences, Lp)
        return self.call_packed(
            pack, numpy.arange(len(sequences), dtype=numpy.int32),
            envelopes, totals, interpret=interpret,
        )

    def call_packed(self, pack: SeqPack, seq_rows, envelopes, totals,
                    interpret=False):
        """:meth:`__call__` addressed into an uploaded :class:`SeqPack`.

        ``envelopes[i]`` indexes sequences by caller-local index ``s``;
        ``seq_rows[s]`` maps it to its pack row.
        """
        import jax.numpy as jnp

        NE = len(envelopes)
        if NE == 0:
            return []
        # group envelopes by sequence: one grid cell per sequence, up to
        # C rows; sequences with more envelopes repeat in another cell
        C = 8
        cells: List[List[int]] = []
        cell_of_seq: Dict[int, int] = {}
        for n, (s, _p, _i, _j) in enumerate(envelopes):
            c = cell_of_seq.get(s, -1)
            if c < 0 or len(cells[c]) >= C:
                cells.append([])
                c = len(cells) - 1
                cell_of_seq[s] = c
            cells[c].append(n)
        n_cells = len(cells)
        St = max(1, 1 << (((n_cells + 7) // 8) - 1).bit_length())
        n = St * 8
        rows_p = numpy.zeros(n, dtype=numpy.int32)
        valid = numpy.zeros(n, dtype=numpy.int32)
        ienv = numpy.ones((n, C), dtype=numpy.float32)
        jenv = numpy.zeros((n, C), dtype=numpy.float32)  # empty window
        tot = numpy.zeros((n, C), dtype=numpy.float32)
        idx = numpy.zeros((n, C), dtype=numpy.int32)
        for c, members in enumerate(cells):
            s = envelopes[members[0]][0]
            rows_p[c] = seq_rows[s]
            valid[c] = 1
            for r, ne in enumerate(members):
                _s, p, i0, j0 = envelopes[ne]
                idx[c, r] = p
                ienv[c, r] = i0
                jenv[c, r] = j0
                tot[c, r] = totals[ne]
        fn = _pallas_pair_align_packed(
            self.bank.Mp, pack.Lp, C, self.masked, _auto_interpret(interpret)
        )
        envsc, logn2, tf, tt, hf, ht = fn(
            pack.xs, pack.lens, pack.loops_exp, pack.moves_exp,
            jnp.asarray(rows_p), jnp.asarray(valid),
            jnp.asarray(ienv), jnp.asarray(jenv), jnp.asarray(tot),
            jnp.asarray(idx),
            self.e_odds, *self.trans,
        )
        import jax

        envsc, logn2, tf, tt, hf, ht = jax.device_get(
            (envsc, logn2, tf, tt, hf, ht))
        place = {}
        for c, members in enumerate(cells):
            for r, ne in enumerate(members):
                place[ne] = (c, r)
        results = []
        for ne, (_s, _p, _i, _j) in enumerate(envelopes):
            c, r = place[ne]
            results.append({
                "envsc": float(envsc[c, r]),
                "logn2": logn2[c, r, :21],
                "target_from": int(round(float(tf[c, r]))),
                "target_to": int(round(float(tt[c, r]))),
                "hmm_from": int(round(float(hf[c, r]))),
                "hmm_to": int(round(float(ht[c, r]))),
            })
        return results


class PairBucketed:
    """Length-bucketed pair-dense Forward over the full profile bank.

    Splits the bank by padded model width (like :class:`Bucketed`),
    routes each surviving (sequence, profile) pair to its profile's
    bucket, and scatters scores back.  ``survivors`` is one list of
    global profile indices per sequence.
    """

    def __init__(self, bank: ProfileBank, lane: int = 128, viterbi: bool = False,
                 min_width: int = 128):
        self.bank = bank
        self.buckets = []
        caps: Dict[int, List[int]] = {}
        for i, m in enumerate(bank.lengths):
            # exclusive cap (M < cap), as in Bucketed: no lane-0 masking;
            # power-of-two width for the delete-chain doubling scan.
            # (Two bucket-ladder variants were tried and measured NET
            # SLOWER on the full bench: merging the 128-lane bucket
            # upward to widen survivor rows — extra padded lanes beat
            # the wider-block gain — and 128-multiple rungs
            # (384/768/1536) for the log-space Viterbi path, which cut
            # padded cells but ran slower per cell on non-power-of-two
            # lane widths, F2 1.54 s → 1.74 s.)
            cap = _round_up(max(8, int(m) + 1), lane)
            cap = max(min_width, 1 << (cap - 1).bit_length())
            caps.setdefault(cap, []).append(i)
        # global index -> (bucket number, local row)
        self.local = numpy.zeros((bank.P, 2), dtype=numpy.int32)
        for b, cap in enumerate(sorted(caps)):
            idx = numpy.asarray(caps[cap], dtype=numpy.int64)
            self.local[idx, 0] = b
            self.local[idx, 1] = numpy.arange(len(idx), dtype=numpy.int32)
            self.buckets.append(
                (idx, PairForwardKernel(
                    bank.select(idx, lane=lane, width=cap), viterbi=viterbi))
            )

    def __call__(self, sequences, survivors, pad_to=None, interpret=False):
        """Scores for surviving pairs: ``{(seq_index, profile): nats}``."""
        s_idx, p_idx, values = self.flat(
            sequences, survivors, pad_to=pad_to, interpret=interpret
        )
        return {
            (int(s), int(p)): float(v)
            for s, p, v in zip(s_idx, p_idx, values)
        }

    def flat(self, sequences, survivors, pad_to=None, interpret=False,
             chunk: int = 64):
        """Scores for surviving pairs as flat arrays.

        Returns ``(seq_indices, profile_indices, scores)`` — the cheap
        form for vectorized downstream thresholding.
        """
        Lp = pad_to or _round_up(
            max((len(x) for x in sequences), default=32), 32
        )
        pack = SeqPack(sequences, Lp)
        rows = numpy.arange(len(sequences), dtype=numpy.int32)
        return self.flat_packed(
            pack, rows, survivors, interpret=interpret, chunk=chunk
        )

    def flat_packed(self, pack: SeqPack, seq_rows, survivors,
                    interpret=False, chunk: int = 256):
        """:meth:`flat` addressed into an already-uploaded :class:`SeqPack`.

        ``seq_rows[s]`` is the pack row of ``survivors[s]``; only index
        bytes move host→device.
        """
        from ..profiling import TIMER

        t_pack = time.perf_counter()
        bucket_of = self.local[:, 0]
        row_of = self.local[:, 1]
        out_s: List["numpy.ndarray"] = []
        out_p: List["numpy.ndarray"] = []
        out_v: List["numpy.ndarray"] = []
        pending: List[tuple] = []
        surv = [numpy.asarray(profs, dtype=numpy.int64) for profs in survivors]
        for b, (global_idx, kern) in enumerate(self.buckets):
            # chunk survivor rows: a sequence with a huge survivor set
            # (low-complexity junk) spreads over several rows instead of
            # inflating the whole batch's block width; wide buckets take
            # narrower chunks to fit their [C, Mp] blocks in VMEM, and
            # narrow (majority) buckets take WIDE chunks — at C=64 the
            # [C, 128] block is a single vreg row and the kernel is all
            # per-step overhead
            # 16k-cell budget: C=128 x Mp=256 blocks overflow the 16 MB
            # scoped VMEM by a hair (measured), C=64 x 256 fits
            chunk_b = _vmem_chunk(chunk, kern.bank.Mp, 16384)
            rows: List[Tuple[int, "numpy.ndarray"]] = []
            for s, profs in enumerate(surv):
                mine = profs[bucket_of[profs] == b]
                for c0 in range(0, len(mine), chunk_b):
                    rows.append((s, mine[c0 : c0 + chunk_b]))
            if not rows:
                continue
            # width-QUANTIZED dispatch groups: every row's survivor
            # count rounds up to the call_packed C granularity
            # (multiples of 16 to 64, powers of two above), and rows of
            # the same quantized width go out together — a row with 3
            # survivors never pads to a 60-survivor neighbour's width
            # (mixed-width groups wasted 2-4x the DP cells at real
            # survivor-count distributions)
            by_width: Dict[int, List[Tuple[int, "numpy.ndarray"]]] = {}
            for row in rows:
                by_width.setdefault(_pair_width(len(row[1])), []).append(row)
            # bound the kernel's gathered-emissions HBM footprint
            # (21 x rows x C x Mp f32): genome-sized batches go out in
            # row groups instead of one giant call.  All groups are
            # DISPATCHED before any result is fetched — a per-group sync
            # would pay the remote-device round-trip latency serially
            # (the same pipelining `Bucketed.masks` does)
            for C0, wrows in sorted(by_width.items()):
                # sort rows by sequence length: the multi-row ILP cells
                # run every row to the CELL's longest sequence, so
                # mixed-length cells burn (max - mean) dead cycles per
                # row — sorted tiling makes max ≈ mean within a cell
                wrows.sort(key=lambda row: int(pack.lens_host[seq_rows[row[0]]]))
                group = max(256, (2048 << 20) // (21 * C0 * kern.bank.Mp * 4))
                for g0 in range(0, len(wrows), group):
                    grows = wrows[g0 : g0 + group]
                    pair_idx = numpy.zeros((len(grows), C0), dtype=numpy.int32)
                    for r, (_s, mine) in enumerate(grows):
                        pair_idx[r, : len(mine)] = row_of[mine]
                    krows = numpy.asarray(
                        [seq_rows[s] for s, _ in grows], dtype=numpy.int32
                    )
                    scores = kern.call_packed(
                        pack, krows, pair_idx, interpret=interpret, fetch=False
                    )
                    pending.append((grows, scores))
        TIMER.records.append(
            ("pair.pack+dispatch", time.perf_counter() - t_pack))
        t_fetch = time.perf_counter()
        fetched = []
        if pending:
            # ONE host round trip for every dispatched group: each
            # individual fetch over a remote-attached device pays
            # ~25 ms of tunnel latency
            import jax

            fetched = jax.device_get([scores for _g, scores in pending])
        for (grows, _h), scores in zip(pending, fetched):
            for r, (s, mine) in enumerate(grows):
                out_s.append(numpy.full(len(mine), s, dtype=numpy.int64))
                out_p.append(mine)
                out_v.append(scores[r, : len(mine)])
        TIMER.records.append(("pair.fetch", time.perf_counter() - t_fetch))
        if not out_s:
            z = numpy.zeros(0)
            return z.astype(numpy.int64), z.astype(numpy.int64), z.astype(numpy.float32)
        return (numpy.concatenate(out_s), numpy.concatenate(out_p),
                numpy.concatenate(out_v).astype(numpy.float32))


class ForwardKernel:
    """Device-cached Pallas Forward scorer over a fixed bank.

    Probability-space sparse-rescaling Forward (HMMER's f32 trick); the
    delete chain is an exact in-kernel parallel prefix over the lane
    axis (log2(Mp) doubling steps of ``pltpu.roll``).
    """

    REQUIRES_POW2 = True  # the doubling scan needs power-of-two widths

    def __init__(self, bank: ProfileBank, seq_tile: int = 8, profile_chunk: int = 128,
                 viterbi: bool = False):
        import jax.numpy as jnp

        self.bank = bank
        self.viterbi = viterbi
        self.masked = bool((bank.lengths >= bank.Mp).any())
        self.seq_tile = seq_tile
        self.Pc = _legal_pc(bank.P, bank.Mp, profile_chunk, 32768)
        self.P_pad = _round_up(bank.P, self.Pc)

        def pad_rows(a):
            out = numpy.zeros((self.P_pad, bank.Mp), dtype=numpy.float32)
            out[: bank.P] = a
            return jnp.asarray(out)

        e = numpy.zeros((21, self.P_pad, bank.Mp), dtype=numpy.float32)
        e[:, : bank.P] = bank.e_odds
        self.e_odds = jnp.asarray(e)
        self.trans = tuple(pad_rows(a) for a in (
            bank.tmm, bank.tim, bank.tdm, bank.tmi, bank.tii,
            bank.tmd, bank.tdd, bank.bm,
        ))

    def __call__(self, sequences, pad_to=None, interpret=False):
        import jax.numpy as jnp

        S = len(sequences)
        if S == 0:
            return numpy.zeros((0, self.bank.P), dtype=numpy.float32)
        Lp = pad_to or _round_up(max(len(x) for x in sequences), 32)
        # round the tile count to a power of two: O(log S) compiled
        # shapes instead of one per batch size
        St = _round_up(S, self.seq_tile) // self.seq_tile
        St = 1 << (St - 1).bit_length()
        n = St * self.seq_tile
        xs = numpy.zeros((n, Lp), dtype=numpy.int32)
        lens = numpy.zeros(n, dtype=numpy.int32)
        loops = numpy.zeros(n, dtype=numpy.float32)
        moves = numpy.full(n, 0.5, dtype=numpy.float32)
        for i, x in enumerate(sequences):
            L = len(x)
            xs[i, :L] = x
            lens[i] = L
            loop, move = length_model(L)
            loops[i] = math.exp(loop)
            moves[i] = math.exp(move)
        fn = _pallas_fwd(
            self.P_pad, self.bank.Mp, Lp, self.seq_tile, self.Pc,
            self.masked, _auto_interpret(interpret), dchain_depth(self.bank),
            self.viterbi,
        )
        out = fn(
            jnp.asarray(xs.reshape(St, self.seq_tile, Lp)),
            jnp.asarray(lens.reshape(St, 1, self.seq_tile)),
            jnp.asarray(loops.reshape(St, 1, self.seq_tile)),
            jnp.asarray(moves.reshape(St, 1, self.seq_tile)),
            self.e_odds, *self.trans,
        )
        return numpy.asarray(out)[:S, : self.bank.P]


class ViterbiKernel(ForwardKernel):
    """Full-bank Viterbi scorer: the Forward kernel in the max-plus
    semiring (HMMER's F2 ``ViterbiFilter`` stage; per-pair values match
    ``engine.viterbi_score`` at f32 tolerance)."""

    def __init__(self, bank: ProfileBank, seq_tile: int = 8, profile_chunk: int = 128):
        super().__init__(bank, seq_tile, profile_chunk, viterbi=True)
