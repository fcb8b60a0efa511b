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
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy

from .batch import ProfileBank, _round_up
from .profile import length_model

__all__ = [
    "msv_scores_pallas", "MSVKernel", "SSVKernel", "ForwardKernel",
    "PairForwardKernel", "PairBucketed", "Bucketed",
]

NEG = -1e30


def _auto_interpret(interpret: bool) -> bool:
    """Fall back to the Pallas interpreter off-TPU (tests, CPU hosts)."""
    if interpret:
        return True
    import jax

    return jax.default_backend() != "tpu"


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

    def __init__(self, bank: ProfileBank, seq_tile: int = 8, profile_chunk: int = 256):
        import jax.numpy as jnp

        self.bank = bank
        self.masked = bool((bank.lengths >= bank.Mp).any())
        self.seq_tile = seq_tile
        self.Pc = min(profile_chunk, _round_up(bank.P, 8))
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


@functools.lru_cache(maxsize=None)
def _pallas_ssv(P: int, Mp: int, Lp: int, S: int, Pc: int, masked: bool, interpret: bool):
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

            def step(i, carry):
                A, G = carry
                xi = xs_ref[0, s, i]
                e = e_ref[xi]  # [Pc, Mp]
                shifted = pltpu.roll(A, shift=1, axis=1)
                if masked:
                    shifted = jnp.where(lane == 0, NEG, shifted)
                An = (e - loop) + jnp.maximum(shifted, cb0)
                Gn = jnp.maximum(G, An)
                return (An, Gn)

            M0 = jnp.full((Pc, Mp), NEG, jnp.float32)
            carry = jax.lax.fori_loop(0, L, step, (M0, M0))
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

    def __init__(self, bank: ProfileBank, seq_tile: int = 8, profile_chunk: int = 256):
        import jax.numpy as jnp

        self.bank = bank
        self.seq_tile = seq_tile
        self.Pc = min(profile_chunk, _round_up(bank.P, 8))
        self.P_pad = _round_up(bank.P, self.Pc)
        self.masked = bool((bank.lengths >= bank.Mp).any())
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


class Bucketed:
    """Length-bucketed wrapper around a single-bank kernel class.

    Packing all 2,766 Pfam profiles into one ``[P, Mp]`` bank pads every
    profile to the longest model (lane-rounded), wasting VPU lanes on
    the short majority (median Pfam model ≲ 150 nodes).  This wrapper
    splits the bank into lane-width buckets (``Mp`` = 128, 256, …), runs
    the wrapped kernel per bucket, and scatters scores back into the
    original profile order — same results, ~1.5–2× fewer padded cells.
    """

    def __init__(self, kernel_cls, bank: ProfileBank, lane: int = 128, **kwargs):
        self.bank = bank
        self.buckets = []
        caps = {}
        for i, m in enumerate(bank.lengths):
            # exclusive cap (M < cap): the guaranteed trailing pad lane
            # lets kernels skip lane-0 masking of the node shift
            caps.setdefault(_round_up(max(8, int(m) + 1), lane), []).append(i)
        for cap in sorted(caps):
            idx = numpy.asarray(caps[cap], dtype=numpy.int64)
            sub = bank.select(idx, lane=lane, width=cap)
            self.buckets.append((idx, kernel_cls(sub, **kwargs)))

    def __call__(self, sequences, pad_to=None, interpret=False):
        out = numpy.zeros((len(sequences), self.bank.P), dtype=numpy.float32)
        for idx, kern in self.buckets:
            out[:, idx] = kern(sequences, pad_to=pad_to, interpret=interpret)
        return out


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _pallas_fwd(P: int, Mp: int, Lp: int, S: int, Pc: int, masked: bool, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = P // Pc
    n_doubling = int(math.log2(Mp))
    assert 1 << n_doubling == Mp, "Mp must be a power of two"

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
            # D_k = tdd[k-1] * D_{k-1} + m_new[k-1] * tmd[k-1]
            a = tdd_shifted
            b = shift1(m_new * tmd)
            shift = 1
            for _ in range(n_doubling):
                rolled_a = pltpu.roll(a, shift=shift, axis=1)
                rolled_b = pltpu.roll(b, shift=shift, axis=1)
                mask = lane >= shift
                prev_a = jnp.where(mask, rolled_a, 1.0)
                prev_b = jnp.where(mask, rolled_b, 0.0)
                b = prev_b * a + b
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
                stay = shift1(M * tmm + I * tim + D * tdm)
                Mn = e * (stay + B * bm)
                In = M * tmi + I * tii
                Dn = dchain(Mn)
                E = jnp.sum(Mn + Dn, axis=1, keepdims=True)  # [Pc, 1]
                Jn = J * loop + E * 0.5
                Cn = C * loop + E * 0.5
                Nn = N * loop
                Bn = (Nn + Jn) * move
                total = E + Bn + Nn + Cn + 1e-30
                inv = 1.0 / total
                return (Mn * inv, In * inv, Dn * inv,
                        Nn * inv, Bn * inv, Jn * inv, Cn * inv,
                        logscale + jnp.log(total))

            zeros = jnp.zeros((Pc, Mp), jnp.float32)
            z1 = jnp.zeros((Pc, 1), jnp.float32)
            carry = (zeros, zeros, zeros, z1 + 1.0, z1 + move, z1, z1, z1)
            carry = jax.lax.fori_loop(0, L, step, carry)
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
def _pallas_pair_fwd(Mp: int, Lp: int, C: int, masked: bool, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = int(math.log2(Mp))
    assert 1 << n_doubling == Mp, "Mp must be a power of two"

    def kernel(xs_ref, lens_ref, loops_ref, moves_ref,
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
                b = prev_b * a + b
                a = prev_a * a
                shift *= 2
            return b

        L = lens_ref[0, 0, j]
        loop = loops_ref[0, 0, j]
        move = moves_ref[0, 0, j]

        def step(i, carry):
            M, I, D, N, B, J, Cc, logscale = carry
            xi = xs_ref[0, j, i]
            e = e_ref[xi, 0]  # [C, Mp] odds of this sequence's survivor rows
            stay = shift1(M * tmm + I * tim + D * tdm)
            Mn = e * (stay + B * bm)
            In = M * tmi + I * tii
            Dn = dchain(Mn)
            E = jnp.sum(Mn + Dn, axis=1, keepdims=True)  # [C, 1]
            Jn = J * loop + E * 0.5
            Cn = Cc * loop + E * 0.5
            Nn = N * loop
            Bn = (Nn + Jn) * move
            total = E + Bn + Nn + Cn + 1e-30
            inv = 1.0 / total
            return (Mn * inv, In * inv, Dn * inv,
                    Nn * inv, Bn * inv, Jn * inv, Cn * inv,
                    logscale + jnp.log(total))

        zeros = jnp.zeros((C, Mp), jnp.float32)
        z1 = jnp.zeros((C, 1), jnp.float32)
        carry = jax.lax.fori_loop(
            0, L, step, (zeros, zeros, zeros, z1 + 1.0, z1 + move, z1, z1, z1)
        )
        C_final, logscale = carry[6], carry[7]
        out_ref[0, j, :] = (jnp.log(C_final * move + 1e-38) + logscale)[:, 0]

    def run(xs, lens, loops, moves, idx, e_odds, *trans):
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
                pl.BlockSpec((21, 1, C, Mp), lambda t, j: (0, t * 8 + j, 0, 0),
                             memory_space=pltpu.VMEM),
                *trans_specs,
            ],
            out_specs=pl.BlockSpec((1, 8, C), lambda t, j: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
            interpret=interpret,
        )(xs, lens, loops, moves, e_g, *trans_g)
        return out.reshape(S, C)

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
        """Forward scores (nats) for chosen pairs.

        ``pair_idx`` — ``[S, C0]`` int32, row ``s`` holding the profile
        rows to score against sequence ``s`` (padded with any valid
        index; padded cells are computed but meant to be discarded).
        Returns ``[S, C0]`` float32.
        """
        import jax.numpy as jnp

        S = len(sequences)
        if S == 0 or pair_idx.shape[1] == 0:
            return numpy.zeros((S, pair_idx.shape[1]), dtype=numpy.float32)
        Lp = pad_to or _round_up(max(len(x) for x in sequences), 32)
        C0 = pair_idx.shape[1]
        # survivor-row granularity: multiples of 16 up to 64 (the common
        # range at F1=0.02), powers of two above — bounded compile count
        # without padding a ~40-survivor row all the way to 64+
        if C0 <= 64:
            C = max(8, _round_up(C0, 16))
        else:
            C = 1 << (C0 - 1).bit_length()
        St = _round_up(S, 8) // 8
        St = 1 << (St - 1).bit_length()
        n = St * 8
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
        idx = numpy.zeros((n, C), dtype=numpy.int32)
        idx[:S, :C0] = pair_idx
        fn = _pallas_pair_fwd(
            self.bank.Mp, Lp, C, self.masked, _auto_interpret(interpret)
        )
        out = fn(
            jnp.asarray(xs.reshape(St, 8, Lp)),
            jnp.asarray(lens.reshape(St, 1, 8)),
            jnp.asarray(loops.reshape(St, 1, 8)),
            jnp.asarray(moves.reshape(St, 1, 8)),
            jnp.asarray(idx),
            self.e_odds, *self.trans,
        )
        return numpy.asarray(out)[:S, :C0]


class PairBucketed:
    """Length-bucketed pair-dense Forward over the full profile bank.

    Splits the bank by padded model width (like :class:`Bucketed`),
    routes each surviving (sequence, profile) pair to its profile's
    bucket, and scatters scores back.  ``survivors`` is one list of
    global profile indices per sequence.
    """

    def __init__(self, bank: ProfileBank, lane: int = 128):
        self.bank = bank
        self.buckets = []
        caps: Dict[int, List[int]] = {}
        for i, m in enumerate(bank.lengths):
            # exclusive cap (M < cap), as in Bucketed: no lane-0 masking
            caps.setdefault(_round_up(max(8, int(m) + 1), lane), []).append(i)
        # global index -> (bucket number, local row)
        self.local = numpy.zeros((bank.P, 2), dtype=numpy.int32)
        for b, cap in enumerate(sorted(caps)):
            idx = numpy.asarray(caps[cap], dtype=numpy.int64)
            self.local[idx, 0] = b
            self.local[idx, 1] = numpy.arange(len(idx), dtype=numpy.int32)
            self.buckets.append(
                (idx, PairForwardKernel(bank.select(idx, lane=lane, width=cap)))
            )

    def __call__(self, sequences, survivors, pad_to=None, interpret=False):
        """Scores for surviving pairs: ``{(seq_index, profile): nats}``."""
        out: Dict[Tuple[int, int], float] = {}
        for b, (global_idx, kern) in enumerate(self.buckets):
            rows: List[Tuple[int, List[int]]] = []
            for s, profs in enumerate(survivors):
                mine = [p for p in profs if self.local[p, 0] == b]
                if mine:
                    rows.append((s, mine))
            if not rows:
                continue
            C0 = max(len(mine) for _, mine in rows)
            pair_idx = numpy.zeros((len(rows), C0), dtype=numpy.int32)
            for r, (_s, mine) in enumerate(rows):
                pair_idx[r, : len(mine)] = self.local[mine, 1]
            scores = kern(
                [sequences[s] for s, _ in rows], pair_idx,
                pad_to=pad_to, interpret=interpret,
            )
            for r, (s, mine) in enumerate(rows):
                for c, p in enumerate(mine):
                    out[(s, p)] = float(scores[r, c])
        return out


class ForwardKernel:
    """Device-cached Pallas Forward scorer over a fixed bank.

    Probability-space sparse-rescaling Forward (HMMER's f32 trick); the
    delete chain is an exact in-kernel parallel prefix over the lane
    axis (log2(Mp) doubling steps of ``pltpu.roll``).
    """

    def __init__(self, bank: ProfileBank, seq_tile: int = 8, profile_chunk: int = 128):
        import jax.numpy as jnp

        self.bank = bank
        self.masked = bool((bank.lengths >= bank.Mp).any())
        self.seq_tile = seq_tile
        self.Pc = min(profile_chunk, _round_up(bank.P, 8))
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
            self.masked, _auto_interpret(interpret),
        )
        out = fn(
            jnp.asarray(xs.reshape(St, self.seq_tile, Lp)),
            jnp.asarray(lens.reshape(St, 1, self.seq_tile)),
            jnp.asarray(loops.reshape(St, 1, self.seq_tile)),
            jnp.asarray(moves.reshape(St, 1, self.seq_tile)),
            self.e_odds, *self.trans,
        )
        return numpy.asarray(out)[:S, : self.bank.P]
