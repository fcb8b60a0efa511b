"""Streamed pair-packed stage-3 kernels (posterior + alignment).

The per-sequence pair kernels in :mod:`gecco_tpu.hmm.kernels` put one
SEQUENCE per grid cell with its C candidate profiles on the sublane
axis.  At real hit rates a sequence has only ~2-4 candidates, so those
cells run 30-45% occupied, and every DP step pays a scalar-indexed
emission gather (``e_ref[xi]``).

These kernels instead pack C arbitrary (sequence, profile) PAIRS per
grid cell at full occupancy.  The trick that makes mixed sequences
possible is **pre-gathered emission streams**: an XLA gather
materializes ``estream[r, i, :] = e_odds[x_r[i], p_r, :]`` in HBM
(~4 B/cell of DP work — far below the VPU's ops/byte, so the stream
DMA hides behind compute), and the kernel's residue loop becomes the
minor grid dimension so Mosaic double-buffers the stream blocks
through VMEM.  DP state lives in VMEM scratch, which persists across
the L-chunk grid steps of a cell.

Pair rows in one cell may have different lengths; rows freeze
(``where``-masked carries) once past their own length.  The backward
passes iterate the SAME forward-order streams with a reversed block
index map and a descending in-block loop; values needed one position
ahead at a block boundary are kept in a one-row scratch between grid
steps, and trajectory values needed one position *behind* come from
globally shifted copies prepared in XLA.

Behavioral reference: HMMER's ``p7_domaindef`` stage as wrapped by
pyhmmer (``/root/reference/gecco/hmmer/__init__.py:131-140``); numeric
reference: the float64 host engine (``gecco_tpu.hmm.engine``).
"""

import functools
import math
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy

from .batch import ProfileBank, _round_up

__all__ = ["StreamBank", "StreamScores", "StreamDomains"]

NEG = -1e30
LOG2 = math.log(2.0)


def _auto_interpret(interpret: bool) -> bool:
    if interpret:
        return True
    import jax

    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# pass A: forward with scalar-state trajectories
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _stream_fwd(Mp: int, C: int, Lc: int, nLc: int, n_cells: int,
                interpret: bool, nd: Optional[int] = None):
    assert Lc % 4 == 0, "unrolled stream kernels need Lc % 4 == 0"
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = nd if nd is not None else int(math.log2(Mp))

    def kernel(es_ref, lens_ref, loops_ref, moves_ref,
               tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref,
               fN_ref, fB_ref, fJ_ref, fC_ref, flog_ref, score_ref,
               M_s, I_s, D_s, sc_s):
        t = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)

        def shiftR(a):
            return pltpu.roll(a, shift=1, axis=1)

        tmm = tmm_ref[0]
        tim = tim_ref[0]
        tdm = tdm_ref[0]
        tmi = tmi_ref[0]
        tii = tii_ref[0]
        tmd = tmd_ref[0]
        tdd = tdd_ref[0]
        bm = bm_ref[0]
        lens = lens_ref[0, 0][:, None]        # [C, 1] f32
        loop = loops_ref[0, 0][:, None]
        move = moves_ref[0, 0][:, None]
        tdd_shifted = shiftR(tdd)

        def dchain(m_new):
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

        @pl.when(t == 0)
        def _init():
            zero = jnp.zeros((C, Mp), jnp.float32)
            M_s[...] = zero
            I_s[...] = zero
            D_s[...] = zero
            col = jax.lax.broadcasted_iota(jnp.int32, (C, 8), 1)
            sc = jnp.where(col == 0, 1.0, 0.0)                    # N
            sc = jnp.where(col == 1, jnp.broadcast_to(move, (C, 8)), sc)  # B
            sc_s[...] = sc                             # J=C=ls=score=0

        def step(k, carry):
            M, I, D, N, B, J, Cc, ls, score = carry
            i_f = jnp.float32(0) + (t * Lc + k)
            alive = i_f < lens                          # [C, 1]
            e = es_ref[0, k]                            # [C, Mp]
            stay = shiftR(M * tmm + I * tim + D * tdm)
            Mn = e * (stay + B * bm)
            In = M * tmi + I * tii
            Dn = dchain(Mn)
            E = jnp.sum(Mn + Dn, axis=1, keepdims=True)
            Jn = J * loop + E * 0.5
            Cn = Cc * loop + E * 0.5
            Nn = N * loop
            Bn = (Nn + Jn) * move
            total = E + Bn + Nn + Cn + 1e-30
            inv = 1.0 / total
            ls_n = ls + jnp.log(total)
            fN_ref[0, k] = (Nn * inv)[:, 0]
            fB_ref[0, k] = (Bn * inv)[:, 0]
            fJ_ref[0, k] = (Jn * inv)[:, 0]
            fC_ref[0, k] = (Cn * inv)[:, 0]
            flog_ref[0, k] = ls_n[:, 0]
            done = i_f == lens - 1.0
            score_n = jnp.where(
                done, jnp.log(Cn * inv * move + 1e-38) + ls_n, score
            )
            return (jnp.where(alive, Mn * inv, M),
                    jnp.where(alive, In * inv, I),
                    jnp.where(alive, Dn * inv, D),
                    jnp.where(alive, Nn * inv, N),
                    jnp.where(alive, Bn * inv, B),
                    jnp.where(alive, Jn * inv, J),
                    jnp.where(alive, Cn * inv, Cc),
                    jnp.where(alive, ls_n, ls),
                    score_n)

        # skip chunks past the cell's longest row (cells are built
        # length-sorted, so the skipped tail is usually large)
        @pl.when(jnp.float32(0) + t * Lc < jnp.max(lens))
        def _body():
            sc = sc_s[...]
            carry = (M_s[...], I_s[...], D_s[...],
                     sc[:, 0][:, None], sc[:, 1][:, None], sc[:, 2][:, None],
                     sc[:, 3][:, None], sc[:, 4][:, None], sc[:, 5][:, None])
            # Lc is a multiple of 4: unrolled blocks amortize per-step
            # scalar overhead (same transform as kernels._pallas_fwd)
            def _block(b, carry):
                for u in range(4):
                    carry = step(b * 4 + u, carry)
                return carry

            carry = jax.lax.fori_loop(0, Lc // 4, _block, carry)
            M_s[...] = carry[0]
            I_s[...] = carry[1]
            D_s[...] = carry[2]
            sc = jnp.concatenate(
                [carry[3], carry[4], carry[5], carry[6], carry[7], carry[8],
                 jnp.zeros((C, 2), jnp.float32)], axis=1)
            sc_s[...] = sc
            score_ref[0, 0] = carry[8][:, 0]

    def run(es, lens, loops, moves, *trans):
        lens, loops, moves = (a[:, None, :] for a in (lens, loops, moves))
        cvec = pl.BlockSpec((1, 1, C), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        cmat = pl.BlockSpec((1, C, Mp), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        traj = pl.BlockSpec((1, Lc, C), lambda c, t: (c, t, 0), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(n_cells, nLc),
            in_specs=[
                pl.BlockSpec((1, Lc, C, Mp), lambda c, t: (c, t, 0, 0),
                             memory_space=pltpu.VMEM),
                cvec, cvec, cvec,
                cmat, cmat, cmat, cmat, cmat, cmat, cmat, cmat,
            ],
            out_specs=[traj, traj, traj, traj, traj, cvec],
            out_shape=[
                jax.ShapeDtypeStruct((n_cells, nLc * Lc, C), jnp.float32)
                for _ in range(5)
            ] + [jax.ShapeDtypeStruct((n_cells, 1, C), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, 8), jnp.float32),
            ],
            interpret=interpret,
        )(es, lens, loops, moves, *trans)
        return list(outs[:5]) + [outs[5][:, 0]]

    return jax.jit(run)


# ---------------------------------------------------------------------------
# pass B: backward combining into mocc / pB rows
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _stream_bwd(Mp: int, C: int, Lc: int, nLc: int, n_cells: int,
                interpret: bool, nd: Optional[int] = None):
    assert Lc % 4 == 0, "unrolled stream kernels need Lc % 4 == 0"
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = nd if nd is not None else int(math.log2(Mp))

    def kernel(es_ref, fB_ref, flog_ref, fNp_ref, fJp_ref, fCp_ref, flogp_ref,
               lens_ref, loops_ref, moves_ref, total_ref,
               nm_ref, tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref,
               mocc_ref, pb_ref,
               bM_s, bI_s, sc_s, binit_s, ekeep_s):
        t = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)

        def shiftL(a):
            return pltpu.roll(a, shift=Mp - 1, axis=1)

        nm = nm_ref[0]
        tmm = tmm_ref[0]
        tim = tim_ref[0]
        tdm = tdm_ref[0]
        tmi = tmi_ref[0]
        tii = tii_ref[0]
        tmd = tmd_ref[0]
        tdd = tdd_ref[0]
        bm = bm_ref[0]
        lens = lens_ref[0, 0][:, None]
        loop = loops_ref[0, 0][:, None]
        move = moves_ref[0, 0][:, None]
        total_log = total_ref[0, 0][:, None]
        o_base = (nLc - 1 - t) * Lc

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

        @pl.when(t == 0)
        def _init():
            bE0 = move * 0.5
            bD_L = dchain_bwd(nm * bE0)
            binit_s[...] = nm * bE0 + tmd * shiftL(bD_L)
            bM_s[...] = jnp.zeros((C, Mp), jnp.float32)
            bI_s[...] = jnp.zeros((C, Mp), jnp.float32)
            sc_s[...] = jnp.zeros((C, 8), jnp.float32)
            ekeep_s[...] = jnp.zeros((C, Mp), jnp.float32)

        binit = binit_s[...]

        def step(kk, carry):
            bM, bI, bN, bJ, bC, ls = carry
            k = Lc - 1 - kk
            o_f = jnp.float32(0) + (o_base + k)
            alive = o_f < lens                      # row active at o
            is_init = o_f == lens - 1.0

            # e_next = estream[o + 1]; the cross-chunk element lives in
            # the keep-scratch written by the previous grid step
            e_blk = es_ref[0, jnp.minimum(k + 1, Lc - 1)]
            e_next = jnp.where(k == Lc - 1, ekeep_s[...], e_blk)
            q = shiftL(e_next * bM)
            bBn = jnp.sum(bm * e_next * bM, axis=1, keepdims=True)
            bJn = loop * bJ + move * bBn
            bCn = loop * bC
            bNn = loop * bN + move * bBn
            bEn = 0.5 * bJn + 0.5 * bCn
            bIn = tim * q + tii * bI
            bDn = dchain_bwd(nm * bEn + tdm * q)
            bMn = nm * bEn + tmm * q + tmi * bI + tmd * shiftL(bDn)
            scale = bNn + bJn + bCn + bBn + 1e-30
            inv = 1.0 / scale
            ls_n = ls + jnp.log(scale)

            # emitted (rescaled) values: stepped vs init row L-1
            bN_e = jnp.where(is_init, 0.0, bNn * inv)
            bB_e = jnp.where(is_init, 0.0, bBn * inv)
            bJ_e = jnp.where(is_init, 0.0, bJn * inv)
            bC_e = jnp.where(is_init, move, bCn * inv)
            ls_e = jnp.where(is_init, 0.0, ls_n)

            first = o_f == 0.0
            prev_fN = jnp.where(first, 1.0, fNp_ref[0, k][:, None])
            prev_fJ = jnp.where(first, 0.0, fJp_ref[0, k][:, None])
            prev_fC = jnp.where(first, 0.0, fCp_ref[0, k][:, None])
            prev_ls = jnp.where(first, 0.0, flogp_ref[0, k][:, None])
            sc_prev = jnp.exp(prev_ls + ls_e - total_log)
            sc_cur = jnp.exp(flog_ref[0, k][:, None] + ls_e - total_log)
            ppN = prev_fN * loop * bN_e * sc_prev
            ppJ = prev_fJ * loop * bJ_e * sc_prev
            ppC = prev_fC * loop * bC_e * sc_prev
            mocc = jnp.clip(1.0 - (ppN + ppJ + ppC), 0.0, 1.0)
            pB = fB_ref[0, k][:, None] * bB_e * sc_cur
            mocc_ref[0, k] = jnp.where(alive, mocc, 0.0)[:, 0]
            pb_ref[0, k] = jnp.where(alive, pB, 0.0)[:, 0]

            sel = jnp.logical_and(alive, ~is_init)
            return (jnp.where(is_init, binit, jnp.where(sel, bMn * inv, bM)),
                    jnp.where(is_init, 0.0, jnp.where(sel, bIn * inv, bI)),
                    jnp.where(is_init, 0.0, jnp.where(sel, bNn * inv, bN)),
                    jnp.where(is_init, 0.0, jnp.where(sel, bJn * inv, bJ)),
                    jnp.where(is_init, move, jnp.where(sel, bCn * inv, bC)),
                    jnp.where(is_init, 0.0, jnp.where(sel, ls_n, ls)))

        @pl.when(jnp.float32(0) + o_base < jnp.max(lens))
        def _body():
            sc = sc_s[...]
            carry = (bM_s[...], bI_s[...],
                     sc[:, 0][:, None], sc[:, 1][:, None], sc[:, 2][:, None],
                     sc[:, 3][:, None])
            # Lc is a multiple of 4: unrolled blocks amortize per-step
            # scalar overhead (same transform as kernels._pallas_fwd)
            def _block(b, carry):
                for u in range(4):
                    carry = step(b * 4 + u, carry)
                return carry

            carry = jax.lax.fori_loop(0, Lc // 4, _block, carry)
            bM_s[...] = carry[0]
            bI_s[...] = carry[1]
            sc_s[...] = jnp.concatenate(
                [carry[2], carry[3], carry[4], carry[5],
                 jnp.zeros((C, 4), jnp.float32)], axis=1)
            ekeep_s[...] = es_ref[0, 0]

    def run(es, fB, flog, fNp, fJp, fCp, flogp, lens, loops, moves, total,
            *trans):
        lens, loops, moves, total = (
            a[:, None, :] for a in (lens, loops, moves, total))
        rev = lambda c, t: (c, nLc - 1 - t, 0, 0)
        rev3 = lambda c, t: (c, nLc - 1 - t, 0)
        cvec = pl.BlockSpec((1, 1, C), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        cmat = pl.BlockSpec((1, C, Mp), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        traj = pl.BlockSpec((1, Lc, C), rev3, memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(n_cells, nLc),
            in_specs=[
                pl.BlockSpec((1, Lc, C, Mp), rev, memory_space=pltpu.VMEM),
                traj, traj, traj, traj, traj, traj,
                cvec, cvec, cvec, cvec,
                cmat, cmat, cmat, cmat, cmat, cmat, cmat, cmat, cmat,
            ],
            out_specs=[traj, traj],
            out_shape=[
                jax.ShapeDtypeStruct((n_cells, nLc * Lc, C), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, nLc * Lc, C), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, 8), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
            ],
            interpret=interpret,
        )(es, fB, flog, fNp, fJp, fCp, flogp, lens, loops, moves, total,
          *trans)
        return outs

    return jax.jit(run)

# ---------------------------------------------------------------------------
# alignment pass 1: backward, parking match/insert planes as streams
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _stream_align_bwd(Mp: int, C: int, Lc: int, nLc: int, n_cells: int,
                      interpret: bool, nd: Optional[int] = None):
    assert Lc % 4 == 0, "unrolled stream kernels need Lc % 4 == 0"
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = nd if nd is not None else int(math.log2(Mp))

    def kernel(es_ref, lens_ref, loops_ref, moves_ref,
               nm_ref, tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref,
               bMp_ref, bIp_ref, blog_ref, bNl_ref, bJl_ref, bCl_ref,
               bM_s, bI_s, sc_s, binit_s, ekeep_s):
        t = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)

        def shiftL(a):
            return pltpu.roll(a, shift=Mp - 1, axis=1)

        nm = nm_ref[0]
        tmm = tmm_ref[0]
        tim = tim_ref[0]
        tdm = tdm_ref[0]
        tmi = tmi_ref[0]
        tii = tii_ref[0]
        tmd = tmd_ref[0]
        tdd = tdd_ref[0]
        bm = bm_ref[0]
        lens = lens_ref[0, 0][:, None]
        loop = loops_ref[0, 0][:, None]
        move = moves_ref[0, 0][:, None]
        o_base = (nLc - 1 - t) * Lc
        tiny = 1e-38

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

        @pl.when(t == 0)
        def _init():
            bE0 = move * 0.5
            bD_L = dchain_bwd(nm * bE0)
            binit_s[...] = nm * bE0 + tmd * shiftL(bD_L)
            bM_s[...] = jnp.zeros((C, Mp), jnp.float32)
            bI_s[...] = jnp.zeros((C, Mp), jnp.float32)
            sc_s[...] = jnp.zeros((C, 8), jnp.float32)
            ekeep_s[...] = jnp.zeros((C, Mp), jnp.float32)

        binit = binit_s[...]

        def step(kk, carry):
            bM, bI, bN, bJ, bC, ls = carry
            k = Lc - 1 - kk
            o_f = jnp.float32(0) + (o_base + k)
            alive = o_f < lens
            is_init = o_f == lens - 1.0

            e_blk = es_ref[0, jnp.minimum(k + 1, Lc - 1)]
            e_next = jnp.where(k == Lc - 1, ekeep_s[...], e_blk)
            q = shiftL(e_next * bM)
            bBn = jnp.sum(bm * e_next * bM, axis=1, keepdims=True)
            bJn = loop * bJ + move * bBn
            bCn = loop * bC
            bNn = loop * bN + move * bBn
            bEn = 0.5 * bJn + 0.5 * bCn
            bIn = tim * q + tii * bI
            bDn = dchain_bwd(nm * bEn + tdm * q)
            bMn = nm * bEn + tmm * q + tmi * bI + tmd * shiftL(bDn)
            scale = bNn + bJn + bCn + bBn + 1e-30
            inv = 1.0 / scale
            ls_n = ls + jnp.log(scale)

            bM_e = jnp.where(is_init, binit, bMn * inv)
            bI_e = jnp.where(is_init, 0.0, bIn * inv)
            ls_e = jnp.where(is_init, 0.0, ls_n)
            bN_l = jnp.where(is_init, NEG,
                             jnp.log(bNn * inv + tiny) + ls_n)
            bJ_l = jnp.where(is_init, NEG,
                             jnp.log(bJn * inv + tiny) + ls_n)
            bC_l = jnp.where(is_init, jnp.log(move),
                             jnp.log(bCn * inv + tiny) + ls_n)

            bMp_ref[0, k] = bM_e.astype(jnp.bfloat16)
            bIp_ref[0, k] = bI_e.astype(jnp.bfloat16)
            blog_ref[0, k] = ls_e[:, 0]
            bNl_ref[0, k] = bN_l[:, 0]
            bJl_ref[0, k] = bJ_l[:, 0]
            bCl_ref[0, k] = bC_l[:, 0]

            sel = jnp.logical_and(alive, ~is_init)
            return (jnp.where(is_init, binit, jnp.where(sel, bMn * inv, bM)),
                    jnp.where(is_init, 0.0, jnp.where(sel, bIn * inv, bI)),
                    jnp.where(is_init, 0.0, jnp.where(sel, bNn * inv, bN)),
                    jnp.where(is_init, 0.0, jnp.where(sel, bJn * inv, bJ)),
                    jnp.where(is_init, move, jnp.where(sel, bCn * inv, bC)),
                    jnp.where(is_init, 0.0, jnp.where(sel, ls_n, ls)))

        @pl.when(jnp.float32(0) + o_base < jnp.max(lens))
        def _body():
            sc = sc_s[...]
            carry = (bM_s[...], bI_s[...],
                     sc[:, 0][:, None], sc[:, 1][:, None], sc[:, 2][:, None],
                     sc[:, 3][:, None])
            # Lc is a multiple of 4: unrolled blocks amortize per-step
            # scalar overhead (same transform as kernels._pallas_fwd)
            def _block(b, carry):
                for u in range(4):
                    carry = step(b * 4 + u, carry)
                return carry

            carry = jax.lax.fori_loop(0, Lc // 4, _block, carry)
            bM_s[...] = carry[0]
            bI_s[...] = carry[1]
            sc_s[...] = jnp.concatenate(
                [carry[2], carry[3], carry[4], carry[5],
                 jnp.zeros((C, 4), jnp.float32)], axis=1)
            ekeep_s[...] = es_ref[0, 0]

    def run(es, lens, loops, moves, *trans):
        lens, loops, moves = (a[:, None, :] for a in (lens, loops, moves))
        rev = lambda c, t: (c, nLc - 1 - t, 0, 0)
        rev3 = lambda c, t: (c, nLc - 1 - t, 0)
        cvec = pl.BlockSpec((1, 1, C), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        cmat = pl.BlockSpec((1, C, Mp), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        plane = pl.BlockSpec((1, Lc, C, Mp), rev, memory_space=pltpu.VMEM)
        traj = pl.BlockSpec((1, Lc, C), rev3, memory_space=pltpu.VMEM)
        L = nLc * Lc
        outs = pl.pallas_call(
            kernel,
            grid=(n_cells, nLc),
            in_specs=[
                pl.BlockSpec((1, Lc, C, Mp), rev, memory_space=pltpu.VMEM),
                cvec, cvec, cvec,
                cmat, cmat, cmat, cmat, cmat, cmat, cmat, cmat, cmat,
            ],
            out_specs=[plane, plane, traj, traj, traj, traj],
            out_shape=[
                jax.ShapeDtypeStruct((n_cells, L, C, Mp), jnp.bfloat16),
                jax.ShapeDtypeStruct((n_cells, L, C, Mp), jnp.bfloat16),
                jax.ShapeDtypeStruct((n_cells, L, C), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, L, C), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, L, C), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, L, C), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, 8), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
            ],
            interpret=interpret,
        )(es, lens, loops, moves, *trans)
        return outs

    return jax.jit(run)

# ---------------------------------------------------------------------------
# alignment pass 2: forward + posteriors + envelope rescore + OA + null2
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _stream_align_fwd(Mp: int, C: int, Lc: int, nLc: int, n_cells: int,
                      interpret: bool, nd: Optional[int] = None):
    assert Lc % 4 == 0, "unrolled stream kernels need Lc % 4 == 0"
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = int(math.log2(Mp))
    nd_fwd = nd if nd is not None else n_doubling
    BIG = 1e9

    def kernel(es_ref, bMp_ref, bIp_ref, blog_ref, bNl_ref, bJl_ref, bCl_ref,
               lens_ref, loops_ref, moves_ref, iv_ref, jv_ref, total_ref,
               eg_ref,
               nm_ref, tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref,
               envsc_ref, logn2_ref, tf_ref, tt_ref, hf_ref, ht_ref,
               M_s, I_s, D_s, eM_s, eI_s, eD_s,
               sM_s, sI_s, sD_s, siM_s, skM_s, siI_s, skI_s, siD_s, skD_s,
               mat_s, ins_s, sca_s, scb_s):
        t = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)
        first_lane = lane == 0
        lane_f = lane.astype(jnp.float32)

        def shiftR(a):
            return pltpu.roll(a, shift=1, axis=1)

        def shiftR_neg(a):
            rolled = pltpu.roll(a, shift=1, axis=1)
            return jnp.where(first_lane, NEG, rolled)

        nm = nm_ref[0]
        tmm = tmm_ref[0]
        tim = tim_ref[0]
        tdm = tdm_ref[0]
        tmi = tmi_ref[0]
        tii = tii_ref[0]
        tmd = tmd_ref[0]
        tdd = tdd_ref[0]
        bm = bm_ref[0]
        node_neg = jnp.where(nm > 0, 0.0, NEG)
        g_mm = jnp.where(tmm > 0, 0.0, NEG)
        g_im = jnp.where(tim > 0, 0.0, NEG)
        g_dm = jnp.where(tdm > 0, 0.0, NEG)
        g_mi = jnp.where(tmi > 0, 0.0, NEG)
        g_ii = jnp.where(tii > 0, 0.0, NEG)
        g_md = jnp.where(tmd > 0, 0.0, NEG)
        g_dd = jnp.where(tdd > 0, 0.0, NEG)
        tdd_shifted = shiftR(tdd)
        lens = lens_ref[0, 0][:, None]
        loop = loops_ref[0, 0][:, None]
        move = moves_ref[0, 0][:, None]
        iv = iv_ref[0, 0][:, None]
        jv = jv_ref[0, 0][:, None]
        total_log = total_ref[0, 0][:, None]
        log_loop = jnp.log(loop)
        Ld = jnp.maximum(jv - iv + 1.0, 1.0)
        eloop = Ld / (Ld + 3.0)
        emove = 3.0 / (Ld + 3.0)
        tiny = 1e-38

        def dchain_fwd(m_new):
            a = tdd_shifted
            b = shiftR(m_new * tmd)
            shift = 1
            for _ in range(nd_fwd):
                rolled_a = pltpu.roll(a, shift=shift, axis=1)
                rolled_b = pltpu.roll(b, shift=shift, axis=1)
                mask = lane >= shift
                b = jnp.where(mask, rolled_b, 0.0) * a + b
                a = jnp.where(mask, rolled_a, 1.0) * a
                shift *= 2
            return b

        @pl.when(t == 0)
        def _init():
            zero = jnp.zeros((C, Mp), jnp.float32)
            negs = jnp.full((C, Mp), NEG, jnp.float32)
            M_s[...] = zero
            I_s[...] = zero
            D_s[...] = zero
            eM_s[...] = zero
            eI_s[...] = zero
            eD_s[...] = zero
            for ref in (sM_s, sI_s, sD_s, siM_s, skM_s, siI_s, skI_s,
                        siD_s, skD_s):
                ref[...] = negs
            mat_s[...] = zero
            ins_s[...] = zero
            col = jax.lax.broadcasted_iota(jnp.int32, (C, 8), 1)
            sca = jnp.where(col == 0, 1.0, 0.0)                   # fwd N
            sca = jnp.where(col == 1, jnp.broadcast_to(move, (C, 8)), sca)
            sca_s[...] = sca                        # fwd J, C, ls = 0
            scb = jnp.where(col == 0, 1.0, 0.0)                   # env N
            scb = jnp.where(col == 1, jnp.broadcast_to(emove, (C, 8)), scb)
            scb = jnp.where(col == 5, NEG, scb)     # OA best
            scb_s[...] = scb                        # env J/C/elog, xocc = 0

        def step(k, carry):
            (M, I, D, N, B, J, Cc, lsf,
             eM, eI, eD, eN, eB, eJ, eC, elog,
             sM, sI, sD, siM, skM, siI, skI, siD, skD,
             best, b_tf, b_tt, b_hf, b_ht,
             matocc, insocc, xocc) = carry
            i_f = jnp.float32(0) + (t * Lc + k) + 1.0   # 1-based residue
            alive = i_f <= lens
            in_env = jnp.logical_and(i_f >= iv, i_f <= jv)
            e = es_ref[0, k]

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

            # -- posterior rows from the parked backward planes
            pscale = jnp.exp(lsf_n + blog_ref[0, k][:, None] - total_log)
            ppM = (Mn * inv) * bMp_ref[0, k].astype(jnp.float32) * pscale
            ppI = (In * inv) * bIp_ref[0, k].astype(jnp.float32) * pscale
            matocc = matocc + jnp.where(in_env, ppM, 0.0)
            insocc = insocc + jnp.where(in_env, ppI, 0.0)
            ppN = jnp.exp(jnp.log(N + tiny) + lsf + log_loop
                          + bNl_ref[0, k][:, None] - total_log)
            ppJ = jnp.exp(jnp.log(J + tiny) + lsf + log_loop
                          + bJl_ref[0, k][:, None] - total_log)
            ppC = jnp.exp(jnp.log(Cc + tiny) + lsf + log_loop
                          + bCl_ref[0, k][:, None] - total_log)
            xp = jnp.clip(ppN + ppJ + ppC, 0.0, 1.0)
            xocc = xocc + jnp.where(in_env, xp, 0.0)

            # -- envelope forward rescore
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
            fromM = shiftR_neg(sM + g_mm)
            fromI = shiftR_neg(sI + g_im)
            fromD = shiftR_neg(sD + g_dm)
            pM = jnp.maximum(fromM, jnp.maximum(fromI, fromD))
            entry = pM <= 0.0
            useM = fromM >= pM
            useI = jnp.logical_and(~useM, fromI >= pM)
            si_prev = jnp.where(useM, shiftR_neg(siM),
                                jnp.where(useI, shiftR_neg(siI), shiftR_neg(siD)))
            sk_prev = jnp.where(useM, shiftR_neg(skM),
                                jnp.where(useI, shiftR_neg(skI), shiftR_neg(skD)))
            sMn = node_neg + ppM + jnp.maximum(pM, 0.0)
            siMn = jnp.where(entry, i_f + jnp.zeros_like(lane_f), si_prev)
            skMn = jnp.where(entry, lane_f + 1.0, sk_prev)
            fromMi = sM + g_mi
            fromIi = sI + g_ii
            useMi = fromMi >= fromIi
            sIn = node_neg + ppI + jnp.maximum(fromMi, fromIi)
            siIn = jnp.where(useMi, siM, siI)
            skIn = jnp.where(useMi, skM, skI)
            dsc = shiftR_neg(sMn + g_md)
            dsi = shiftR_neg(siMn)
            dsk = shiftR_neg(skMn)
            gate = shiftR_neg(g_dd)
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

            sM = jnp.where(in_env, sMn, sM)
            sI = jnp.where(in_env, sIn, sI)
            sD = jnp.where(in_env, sDn, sD)
            siM = jnp.where(in_env, siMn, siM)
            skM = jnp.where(in_env, skMn, skM)
            siI = jnp.where(in_env, siIn, siI)
            skI = jnp.where(in_env, skIn, skI)
            siD = jnp.where(in_env, siDn, siD)
            skD = jnp.where(in_env, skDn, skD)

            rowmax = jnp.max(sM, axis=1, keepdims=True)
            upd = jnp.logical_and(in_env, rowmax > best)
            at_max = sM == rowmax
            k_end = jnp.min(jnp.where(at_max, lane_f, BIG), axis=1, keepdims=True)
            sel2 = lane_f == k_end
            si_at = jnp.max(jnp.where(sel2, siM, -BIG), axis=1, keepdims=True)
            sk_at = jnp.max(jnp.where(sel2, skM, -BIG), axis=1, keepdims=True)
            best = jnp.where(upd, rowmax, best)
            b_tf = jnp.where(upd, si_at, b_tf)
            b_tt = jnp.where(upd, i_f + jnp.zeros_like(best), b_tt)
            b_hf = jnp.where(upd, sk_at, b_hf)
            b_ht = jnp.where(upd, k_end + 1.0, b_ht)

            return (jnp.where(alive, Mn * inv, M),
                    jnp.where(alive, In * inv, I),
                    jnp.where(alive, Dn * inv, D),
                    jnp.where(alive, Nn * inv, N),
                    jnp.where(alive, Bn * inv, B),
                    jnp.where(alive, Jn * inv, J),
                    jnp.where(alive, Cn * inv, Cc),
                    jnp.where(alive, lsf_n, lsf),
                    eM, eI, eD, eN, eB, eJ, eC, elog,
                    sM, sI, sD, siM, skM, siI, skI, siD, skD,
                    best, b_tf, b_tt, b_hf, b_ht,
                    matocc, insocc, xocc)

        maxlen = jnp.max(lens)

        @pl.when(jnp.float32(0) + t * Lc < maxlen)
        def _body():
            sca = sca_s[...]
            scb = scb_s[...]
            carry = (M_s[...], I_s[...], D_s[...],
                     sca[:, 0][:, None], sca[:, 1][:, None], sca[:, 2][:, None],
                     sca[:, 3][:, None], sca[:, 4][:, None],
                     eM_s[...], eI_s[...], eD_s[...],
                     scb[:, 0][:, None], scb[:, 1][:, None], scb[:, 2][:, None],
                     scb[:, 3][:, None], scb[:, 4][:, None],
                     sM_s[...], sI_s[...], sD_s[...], siM_s[...], skM_s[...],
                     siI_s[...], skI_s[...], siD_s[...], skD_s[...],
                     scb[:, 5][:, None], sca[:, 5][:, None], sca[:, 6][:, None],
                     sca[:, 7][:, None], scb[:, 6][:, None],
                     mat_s[...], ins_s[...], scb[:, 7][:, None])
            # NOT unrolled: this kernel's step body is the largest
            # (envelope rescore + OA + null2) and the 4x unroll's extra
            # temporaries push the scoped VMEM stack past 16 MB
            carry = jax.lax.fori_loop(0, Lc, step, carry)
            M_s[...] = carry[0]
            I_s[...] = carry[1]
            D_s[...] = carry[2]
            eM_s[...] = carry[8]
            eI_s[...] = carry[9]
            eD_s[...] = carry[10]
            for ref, val in zip(
                (sM_s, sI_s, sD_s, siM_s, skM_s, siI_s, skI_s, siD_s, skD_s),
                carry[16:25],
            ):
                ref[...] = val
            mat_s[...] = carry[30]
            ins_s[...] = carry[31]
            sca_s[...] = jnp.concatenate(
                [carry[3], carry[4], carry[5], carry[6], carry[7],
                 carry[26], carry[27], carry[28]], axis=1)
            scb_s[...] = jnp.concatenate(
                [carry[11], carry[12], carry[13], carry[14], carry[15],
                 carry[25], carry[29], carry[32]], axis=1)

        # emit results on the LAST live chunk (later ones are skipped)
        t_f = jnp.float32(0) + t * Lc

        @pl.when(jnp.logical_and(t_f < maxlen, t_f + Lc >= maxlen))
        def _finish():
            eC_f = scb_s[...][:, 3][:, None]
            elog_f = scb_s[...][:, 4][:, None]
            envsc_ref[0, 0] = (jnp.log(eC_f * emove + 1e-38) + elog_f)[:, 0]
            tf_ref[0, 0] = sca_s[...][:, 5]
            tt_ref[0, 0] = sca_s[...][:, 6]
            hf_ref[0, 0] = sca_s[...][:, 7]
            ht_ref[0, 0] = scb_s[...][:, 6]
            matocc = mat_s[...]
            insocc = jnp.sum(ins_s[...], axis=1, keepdims=True)
            xocc = scb_s[...][:, 7][:, None]
            total_occ = jnp.sum(matocc, axis=1, keepdims=True) + insocc + xocc
            inv_tot = 1.0 / jnp.maximum(total_occ, 1e-30)
            cols = []
            for a in range(21):
                dot = jnp.sum(matocc * eg_ref[a, 0], axis=1, keepdims=True)
                n2 = (dot + insocc + xocc) * inv_tot
                cols.append(jnp.log(jnp.maximum(n2, 1e-300)))
            cols += [cols[-1]] * 3
            logn2_ref[0] = jnp.concatenate(cols, axis=1)

    def run(es, bMp, bIp, blog, bNl, bJl, bCl, lens, loops, moves,
            iv, jv, total, eg, *trans):
        lens, loops, moves, iv, jv, total = (
            a[:, None, :] for a in (lens, loops, moves, iv, jv, total))
        fwd4 = lambda c, t: (c, t, 0, 0)
        fwd3 = lambda c, t: (c, t, 0)
        cvec = pl.BlockSpec((1, 1, C), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        cmat = pl.BlockSpec((1, C, Mp), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        plane = pl.BlockSpec((1, Lc, C, Mp), fwd4, memory_space=pltpu.VMEM)
        traj = pl.BlockSpec((1, Lc, C), fwd3, memory_space=pltpu.VMEM)
        cn2 = pl.BlockSpec((1, C, 24), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(n_cells, nLc),
            in_specs=[
                pl.BlockSpec((1, Lc, C, Mp), fwd4, memory_space=pltpu.VMEM),
                plane, plane, traj, traj, traj, traj,
                cvec, cvec, cvec, cvec, cvec, cvec,
                pl.BlockSpec((21, 1, C, Mp), lambda c, t: (0, c, 0, 0),
                             memory_space=pltpu.VMEM),
                cmat, cmat, cmat, cmat, cmat, cmat, cmat, cmat, cmat,
            ],
            out_specs=[cvec, cn2, cvec, cvec, cvec, cvec],
            out_shape=[
                jax.ShapeDtypeStruct((n_cells, 1, C), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, C, 24), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, 1, C), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, 1, C), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, 1, C), jnp.float32),
                jax.ShapeDtypeStruct((n_cells, 1, C), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((C, Mp), jnp.float32)] * 15
            + [pltpu.VMEM((C, Mp), jnp.float32)] * 2
            + [pltpu.VMEM((C, 8), jnp.float32)] * 2,
            interpret=interpret,
        )(es, bMp, bIp, blog, bNl, bJl, bCl, lens, loops, moves,
          iv, jv, total, eg, *trans)
        return [outs[0][:, 0], outs[1]] + [o[:, 0] for o in outs[2:]]

    return jax.jit(run)

# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

_LC = 32          # residues per stream chunk (the minor grid dimension)
_C_POST = 64      # pair rows per posterior cell
_C_ALIGN = 32     # envelope rows per alignment cell
_MAX_LPS = 4096   # streams beyond this fall back to the host engine

#: fixed device slots: regions per pair, envelopes per region
_N_REGIONS = 8
_N_ENVS = 4


def _pow2(n: int, lo: int = 1) -> int:
    return max(lo, 1 << (max(1, int(n)) - 1).bit_length())


@functools.lru_cache(maxsize=None)
def _jit_envelopes(R: int, E: int):
    """Jitted region finding + envelope splitting over device posteriors.

    Vectorized restatement of ``engine._find_regions`` (maximal runs
    with ``mocc ≥ RT2`` whose peak reaches ``RT1``) and
    ``engine._split_region`` (cut where cumulative expected-B mass
    crosses ``m + 0.5``); fixed capacity ``R × E`` slots, 1-based
    inclusive coordinates, slot invalid when ``jenv < ienv``, overflow
    flag per pair for the exact host fallback.
    """
    import jax
    import jax.numpy as jnp

    from . import engine

    RT1, RT2 = engine.RT1, engine.RT2

    def run(mocc, pb, lens):
        # mocc, pb: [N, C, Lp] f32; lens: [N, C] int32
        Lp = mocc.shape[-1]
        pos = jnp.arange(Lp, dtype=jnp.int32)[None, None, :]
        vpos = pos < lens[:, :, None]
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
            n_r = jnp.round(expected).astype(jnp.int32)
            valid_r = jnp.logical_and(any_r, peak >= RT1)
            overflow = jnp.logical_or(
                overflow, jnp.logical_and(valid_r, n_r[..., 0] > E)
            )
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


class _Bucket:
    """Device tensors of one padded-width sub-bank."""

    def __init__(self, bank: ProfileBank):
        import jax.numpy as jnp

        from .kernels import dchain_depth

        self.bank = bank
        self.Mp = bank.Mp
        self.nd = dchain_depth(bank)
        self.e_odds = jnp.asarray(bank.e_odds)      # [21, P, Mp]
        self.trans9 = tuple(jnp.asarray(a) for a in (
            bank.e_odds[20], bank.tmm, bank.tim, bank.tdm, bank.tmi,
            bank.tii, bank.tmd, bank.tdd, bank.bm,
        ))


class StreamBank:
    """The full bank split into power-of-two-width device buckets.

    One instance is SHARED by every stream stage of a pipeline
    (:class:`StreamScores` for the F2/Forward rescores and
    :class:`StreamDomains` for domain definition) so the bucketed
    emission/transition tensors are uploaded once, not per stage.
    """

    def __init__(self, bank: ProfileBank, lane: int = 128):
        self.bank = bank
        caps: Dict[int, List[int]] = {}
        for i, m in enumerate(bank.lengths):
            # power-of-two widths: every stream kernel runs the
            # delete-chain doubling scan over the full node axis
            cap = _round_up(max(8, int(m) + 1), lane)
            caps.setdefault(1 << (cap - 1).bit_length(), []).append(i)
        #: global profile index -> (bucket number, local row)
        self.local = numpy.zeros((bank.P, 2), dtype=numpy.int32)
        self.buckets: List[Tuple["numpy.ndarray", _Bucket]] = []
        for b, cap in enumerate(sorted(caps)):
            idx = numpy.asarray(caps[cap], dtype=numpy.int64)
            self.local[idx, 0] = b
            self.local[idx, 1] = numpy.arange(len(idx), dtype=numpy.int32)
            self.buckets.append((idx, _Bucket(bank.select(idx, lane=lane, width=cap))))


# ---------------------------------------------------------------------------
# score-only stream kernel (F2 Viterbi gate / Forward rescore)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _stream_score(Mp: int, C: int, Lc: int, nLc: int, n_cells: int,
                  viterbi: bool, interpret: bool, nd: Optional[int] = None):
    """Full-sequence Forward or Viterbi scores of C packed pairs/cell.

    The score-only sibling of :func:`_stream_fwd`: same pre-gathered
    emission streams, same chunked grid with per-cell chunk skipping
    and frozen finished rows, but no trajectory outputs — just the
    final ``log P`` (sum-product) or best-path log score (max-plus)
    per pair.  This replaces the per-sequence pair kernels for the
    hmmsearch F2 ``ViterbiFilter`` gate and the Forward rescore: pair
    rows pack at 100% occupancy regardless of how many profiles each
    sequence's survivor set holds, and the big ``[C, Mp]`` blocks keep
    the VPU pipeline full where per-sequence cells ran ~30% occupied.
    """
    assert Lc % 4 == 0, "unrolled stream kernels need Lc % 4 == 0"
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_doubling = nd if nd is not None else int(math.log2(Mp))
    add = jnp.maximum if viterbi else (lambda a, b: a + b)

    def kernel(es_ref, lens_ref, loops_ref, moves_ref,
               tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref,
               score_ref, M_s, I_s, D_s, sc_s):
        t = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)

        def shiftR(a):
            return pltpu.roll(a, shift=1, axis=1)

        tmm = tmm_ref[0]
        tim = tim_ref[0]
        tdm = tdm_ref[0]
        tmi = tmi_ref[0]
        tii = tii_ref[0]
        tmd = tmd_ref[0]
        tdd = tdd_ref[0]
        bm = bm_ref[0]
        lens = lens_ref[0, 0][:, None]        # [C, 1] f32
        loop = loops_ref[0, 0][:, None]
        move = moves_ref[0, 0][:, None]
        tdd_shifted = shiftR(tdd)

        def dchain(m_new):
            a = tdd_shifted
            b = shiftR(m_new * tmd)
            shift = 1
            for _ in range(n_doubling):
                rolled_a = pltpu.roll(a, shift=shift, axis=1)
                rolled_b = pltpu.roll(b, shift=shift, axis=1)
                mask = lane >= shift
                b = add(jnp.where(mask, rolled_b, 0.0) * a, b)
                a = jnp.where(mask, rolled_a, 1.0) * a
                shift *= 2
            return b

        @pl.when(t == 0)
        def _init():
            zero = jnp.zeros((C, Mp), jnp.float32)
            M_s[...] = zero
            I_s[...] = zero
            D_s[...] = zero
            col = jax.lax.broadcasted_iota(jnp.int32, (C, 8), 1)
            sc = jnp.where(col == 0, 1.0, 0.0)                    # N
            sc = jnp.where(col == 1, jnp.broadcast_to(move, (C, 8)), sc)  # B
            sc_s[...] = sc                             # J=C=ls=score=0

        def step(k, carry):
            M, I, D, N, B, J, Cc, ls, score = carry
            i_f = jnp.float32(0) + (t * Lc + k)
            alive = i_f < lens                          # [C, 1]
            e = es_ref[0, k]                            # [C, Mp]
            stay = shiftR(add(add(M * tmm, I * tim), D * tdm))
            Mn = e * add(stay, B * bm)
            In = add(M * tmi, I * tii)
            Dn = dchain(Mn)
            if viterbi:
                E = jnp.max(jnp.maximum(Mn, Dn), axis=1, keepdims=True)
            else:
                E = jnp.sum(Mn + Dn, axis=1, keepdims=True)
            Jn = add(J * loop, E * 0.5)
            Cn = add(Cc * loop, E * 0.5)
            Nn = N * loop
            Bn = add(Nn, Jn) * move
            total = E + Bn + Nn + Cn + 1e-30
            inv = 1.0 / total
            ls_n = ls + jnp.log(total)
            done = i_f == lens - 1.0
            score_n = jnp.where(
                done, jnp.log(Cn * inv * move + 1e-38) + ls_n, score
            )
            return (jnp.where(alive, Mn * inv, M),
                    jnp.where(alive, In * inv, I),
                    jnp.where(alive, Dn * inv, D),
                    jnp.where(alive, Nn * inv, N),
                    jnp.where(alive, Bn * inv, B),
                    jnp.where(alive, Jn * inv, J),
                    jnp.where(alive, Cn * inv, Cc),
                    jnp.where(alive, ls_n, ls),
                    score_n)

        # skip chunks past the cell's longest row (cells are built
        # length-sorted, so the skipped tail is usually large)
        @pl.when(jnp.float32(0) + t * Lc < jnp.max(lens))
        def _body():
            sc = sc_s[...]
            carry = (M_s[...], I_s[...], D_s[...],
                     sc[:, 0][:, None], sc[:, 1][:, None], sc[:, 2][:, None],
                     sc[:, 3][:, None], sc[:, 4][:, None], sc[:, 5][:, None])

            def _block(b, carry):
                for u in range(4):
                    carry = step(b * 4 + u, carry)
                return carry

            carry = jax.lax.fori_loop(0, Lc // 4, _block, carry)
            M_s[...] = carry[0]
            I_s[...] = carry[1]
            D_s[...] = carry[2]
            sc = jnp.concatenate(
                [carry[3], carry[4], carry[5], carry[6], carry[7], carry[8],
                 jnp.zeros((C, 2), jnp.float32)], axis=1)
            sc_s[...] = sc
            score_ref[0, 0] = carry[8][:, 0]

    def run(es, lens, loops, moves, *trans):
        lens, loops, moves = (a[:, None, :] for a in (lens, loops, moves))
        cvec = pl.BlockSpec((1, 1, C), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        cmat = pl.BlockSpec((1, C, Mp), lambda c, t: (c, 0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(n_cells, nLc),
            in_specs=[
                pl.BlockSpec((1, Lc, C, Mp), lambda c, t: (c, t, 0, 0),
                             memory_space=pltpu.VMEM),
                cvec, cvec, cvec,
                cmat, cmat, cmat, cmat, cmat, cmat, cmat, cmat,
            ],
            out_specs=pl.BlockSpec((1, 1, C), lambda c, t: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_cells, 1, C), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, Mp), jnp.float32),
                pltpu.VMEM((C, 8), jnp.float32),
            ],
            interpret=interpret,
        )(es, lens, loops, moves, *trans)
        return out[:, 0]

    return jax.jit(run)


class StreamScores:
    """Pair-packed Forward/Viterbi rescoring of filter survivors.

    Drop-in for :class:`gecco_tpu.hmm.kernels.PairBucketed` on the
    Pallas backend (same ``flat_packed`` contract) built on the
    pre-gathered emission streams of this module: every (sequence,
    profile) pair is one kernel row, packed C-per-cell at full
    occupancy — a sequence with 3 survivors and one with 300 cost
    exactly their own DP cells, where the per-sequence pair kernels
    padded every dispatch group to its widest survivor set.

    Hot-loop reference: hmmsearch's ``ViterbiFilter``/``ForwardParser``
    stages (``/root/reference/gecco/hmmer/__init__.py:131-140``).
    """

    #: per-dispatch cap on the materialized emission stream (bytes);
    #: streams are ~4 B per padded DP cell
    BYTES_BUDGET = 1 << 30

    def __init__(self, bank: ProfileBank, viterbi: bool = False,
                 lane: int = 128, shared: Optional[StreamBank] = None):
        self.bank = bank
        self.viterbi = viterbi
        shared = shared if shared is not None else StreamBank(bank, lane=lane)
        self.local = shared.local
        self.buckets = shared.buckets
        self._fallback = None  # PairBucketed for > _MAX_LPS sequences

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _jit_score(Mp, C, Lc, nLc, cells, viterbi, interp, nd):
        import jax
        import jax.numpy as jnp

        Lps = nLc * Lc
        R = cells * C
        fwd = _stream_score(Mp, C, Lc, nLc, cells, viterbi, interp, nd)

        def run(xs_all, loops_all, moves_all, e_odds, t8, rows, prof, lens):
            xs = xs_all[rows][:, :Lps]
            eg = e_odds[:, prof, :]
            es = eg[xs, jnp.arange(R, dtype=jnp.int32)[:, None]]
            es = es.reshape(cells, C, Lps, Mp).transpose(0, 2, 1, 3)
            trans = tuple(t[prof].reshape(cells, C, Mp) for t in t8)
            loops = loops_all[rows].reshape(cells, C)
            moves = moves_all[rows].reshape(cells, C)
            return fwd(es, lens, loops, moves, *trans)

        return jax.jit(run)

    def flat_packed(self, pack, seq_rows, survivors, interpret=False):
        """Scores for surviving pairs as flat arrays.

        Same contract as ``PairBucketed.flat_packed``: ``survivors[s]``
        lists global profile indices for local sequence ``s``,
        ``seq_rows[s]`` is its pack row; returns ``(seq_indices,
        profile_indices, scores)``.
        """
        from ..profiling import TIMER

        t_pack = time.perf_counter()
        interp = _auto_interpret(interpret)
        lens_of = getattr(pack, 'lens_host', None)
        if lens_of is None:
            lens_of = numpy.asarray(pack.lens)
        out_s: List["numpy.ndarray"] = []
        out_p: List["numpy.ndarray"] = []
        out_v: List["numpy.ndarray"] = []
        pending: List[tuple] = []
        long_pairs: Dict[int, List[int]] = {}
        bucket_of = self.local[:, 0]
        row_of = self.local[:, 1]
        import jax.numpy as jnp

        for b, (_global_idx, bk) in enumerate(self.buckets):
            # members of this width bucket, length-sorted for tight cells
            members: List[Tuple[int, int]] = []   # (local seq s, global p)
            for s, profs in enumerate(survivors):
                profs = numpy.asarray(profs, dtype=numpy.int64)
                mine = profs[bucket_of[profs] == b]
                if not len(mine):
                    continue
                L = int(lens_of[seq_rows[s]])
                if L == 0:
                    # an empty sequence scores -inf everywhere; the
                    # kernel's finish step never fires at lens == 0 and
                    # would report the scratch-init 0.0 (review r5).
                    # Each profile belongs to exactly one bucket, so
                    # emitting per bucket covers every pair once.
                    out_s.append(numpy.full(len(mine), s, numpy.int64))
                    out_p.append(mine)
                    out_v.append(numpy.full(
                        len(mine), -1e30, numpy.float32))
                    continue
                if _pow2(L, _LC * 4) > min(_MAX_LPS, pack.Lp):
                    long_pairs.setdefault(s, []).extend(mine.tolist())
                    continue
                members.extend((s, int(p)) for p in mine)
            if not members:
                continue
            members.sort(key=lambda sp: lens_of[seq_rows[sp[0]]])
            C = min(256, max(8, 32768 // bk.Mp))
            # walk length-sorted cells, grouping runs of equal padded
            # stream length into one dispatch each (budget-bounded)
            cells: List[List[Tuple[int, int]]] = [
                members[i0 : i0 + C] for i0 in range(0, len(members), C)
            ]
            groups: List[Tuple[int, List[List[Tuple[int, int]]]]] = []
            for cell in cells:
                Lmax = max(int(lens_of[seq_rows[s]]) for s, _ in cell)
                Lps = min(_pow2(Lmax, _LC * 4), pack.Lp)
                cap = max(1, self.BYTES_BUDGET // (Lps * C * bk.Mp * 4))
                # _pow2(len(gcells)) pads the dispatch up to the next
                # power of two — floor the cap so the padded dispatch
                # still honors the byte budget (review r5)
                cap = 1 << (cap.bit_length() - 1)
                if (groups and groups[-1][0] == Lps
                        and len(groups[-1][1]) < cap):
                    groups[-1][1].append(cell)
                else:
                    groups.append((Lps, [cell]))
            for Lps, gcells in groups:
                n_cells = _pow2(len(gcells))
                R = n_cells * C
                rows = numpy.zeros(R, dtype=numpy.int32)
                prof = numpy.zeros(R, dtype=numpy.int32)
                lens_np = numpy.zeros(R, dtype=numpy.float32)
                flat: List[Tuple[int, int]] = []
                for c, cell in enumerate(gcells):
                    for r, (s, p) in enumerate(cell):
                        slot = c * C + r
                        rows[slot] = seq_rows[s]
                        prof[slot] = row_of[p]
                        lens_np[slot] = lens_of[seq_rows[s]]
                        flat.append((s, p))
                handle = self._jit_score(
                    bk.Mp, C, _LC, Lps // _LC, n_cells,
                    self.viterbi, interp, bk.nd,
                )(
                    pack.xs, pack.loops_exp, pack.moves_exp,
                    bk.e_odds, bk.trans9[1:],
                    jnp.asarray(rows), jnp.asarray(prof),
                    jnp.asarray(lens_np.reshape(n_cells, C)),
                )
                pending.append((flat, n_cells, C, handle))

        TIMER.records.append(
            ("stream.pack+dispatch", time.perf_counter() - t_pack))
        t_fetch = time.perf_counter()
        if pending:
            import jax

            # one host round trip for all dispatched groups
            fetched = jax.device_get([h for *_m, h in pending])
            for (flat, n_cells, C, _h), scores in zip(pending, fetched):
                scores = scores.reshape(n_cells * C)
                arr = numpy.asarray(flat, dtype=numpy.int64)
                out_s.append(arr[:, 0])
                out_p.append(arr[:, 1])
                out_v.append(scores[: len(flat)].astype(numpy.float32))
        TIMER.records.append(("stream.fetch", time.perf_counter() - t_fetch))

        if long_pairs:
            # over-long sequences take the per-sequence pair kernels
            # (any length; rare — giant proteins only)
            from .kernels import PairBucketed

            if self._fallback is None:
                self._fallback = PairBucketed(self.bank, viterbi=self.viterbi)
            keys = sorted(long_pairs)
            s_loc, p_arr, v_arr = self._fallback.flat_packed(
                pack, numpy.asarray([seq_rows[s] for s in keys],
                                    dtype=numpy.int32),
                [long_pairs[s] for s in keys], interpret=interpret,
            )
            out_s.append(numpy.asarray([keys[i] for i in s_loc], dtype=numpy.int64))
            out_p.append(p_arr)
            out_v.append(v_arr)

        if not out_s:
            z = numpy.zeros(0)
            return (z.astype(numpy.int64), z.astype(numpy.int64),
                    z.astype(numpy.float32))
        return (numpy.concatenate(out_s), numpy.concatenate(out_p),
                numpy.concatenate(out_v).astype(numpy.float32))


class StreamDomains:
    """Streamed pair-packed device domain definition (drop-in for
    :class:`gecco_tpu.hmm.domains.PairDomains`)."""

    def __init__(self, bank: ProfileBank, profiles, lane: int = 128,
                 shared: Optional[StreamBank] = None):
        self.bank = bank
        self.profiles = list(profiles)
        shared = shared if shared is not None else StreamBank(bank, lane=lane)
        self.local = shared.local
        self.buckets = shared.buckets

    # -- stream builders ---------------------------------------------------
    #
    # Each stage below is ONE jitted function covering gather + kernels
    # (+ envelope finding): through a remote-attached device every
    # eager op pays ~5-15 ms dispatch latency, so the whole stage must
    # go out as a single dispatch.

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _jit_posterior(Mp, C, Lc, nLc, cells, interp, nd):
        import jax
        import jax.numpy as jnp

        Lps = nLc * Lc
        R = cells * C
        fwd = _stream_fwd(Mp, C, Lc, nLc, cells, interp, nd)
        bwd = _stream_bwd(Mp, C, Lc, nLc, cells, interp, nd)
        envf = _jit_envelopes(_N_REGIONS, _N_ENVS)

        def run(xs_all, loops_all, moves_all, e_odds, t9, rows, prof, lens):
            xs = xs_all[rows][:, :Lps]
            eg = e_odds[:, prof, :]
            es = eg[xs, jnp.arange(R, dtype=jnp.int32)[:, None]]
            es = es.reshape(cells, C, Lps, Mp).transpose(0, 2, 1, 3)
            trans = tuple(t[prof].reshape(cells, C, Mp) for t in t9)
            loops = loops_all[rows].reshape(cells, C)
            moves = moves_all[rows].reshape(cells, C)
            fN, fB, fJ, fC, flog, score = fwd(
                es, lens, loops, moves, *trans[1:]
            )

            def shift1(a):
                return jnp.concatenate(
                    [jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1
                )

            mocc, pb = bwd(
                es, fB, flog, shift1(fN), shift1(fJ), shift1(fC), shift1(flog),
                lens, loops, moves, score, *trans,
            )
            env_i, env_j, over = envf(
                mocc.transpose(0, 2, 1), pb.transpose(0, 2, 1),
                lens.astype(jnp.int32),
            )
            return score, env_i, env_j, over

        return jax.jit(run)

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _jit_align(Mp, C, Lc, nLc, cells, interp, nd):
        import jax
        import jax.numpy as jnp

        Lps = nLc * Lc
        R = cells * C
        abwd = _stream_align_bwd(Mp, C, Lc, nLc, cells, interp, nd)
        afwd = _stream_align_fwd(Mp, C, Lc, nLc, cells, interp, nd)

        def run(xs_all, loops_all, moves_all, e_odds, t9, rows, prof,
                lens, iv, jv, tot):
            xs = xs_all[rows][:, :Lps]
            eg0 = e_odds[:, prof, :]
            es = eg0[xs, jnp.arange(R, dtype=jnp.int32)[:, None]]
            es = es.reshape(cells, C, Lps, Mp).transpose(0, 2, 1, 3)
            trans = tuple(t[prof].reshape(cells, C, Mp) for t in t9)
            loops = loops_all[rows].reshape(cells, C)
            moves = moves_all[rows].reshape(cells, C)
            eg = eg0.reshape(21, cells, C, Mp)
            planes = abwd(es, lens, loops, moves, *trans)
            return afwd(
                es, *planes, lens, loops, moves, iv, jv, tot, eg, *trans
            )

        return jax.jit(run)

    # -- stage 3a+3b -------------------------------------------------------

    def define(self, sequences, pairs, pad_to=None, interpret=False, pack=None):
        import jax.numpy as jnp

        from . import engine
        from .engine import DomainHit, exp_surv
        from .profile import length_model, null1_score

        out: Dict[Tuple[int, int], List[DomainHit]] = {}
        if not pairs:
            return out
        interp = _auto_interpret(interpret)

        by_bucket: Dict[int, List[Tuple[int, int]]] = {}
        for s, p in dict.fromkeys(pairs):   # dedupe: a repeated pair
            out.setdefault((s, p), [])      # must not report twice
            L = len(sequences[s])
            if L == 0:
                continue                    # no residues, no domains
            if _pow2(L, _LC * 4) > _MAX_LPS:
                out[(s, p)] = engine.define_domains(self.profiles[p], sequences[s])
                continue
            by_bucket.setdefault(int(self.local[p, 0]), []).append((s, p))

        if not by_bucket:
            return out
        rowmap: Optional[Dict[int, int]] = None
        if pack is None:
            from .kernels import SeqPack

            # the stream slices ``xs_all[:, :Lps]`` with Lps a power of
            # two >= _LC*4 — the auto-built pack must be at least that
            # wide.  Pack ONLY the device-path sequences (a too-long
            # sequence elsewhere in the batch already fell back to the
            # host engine and must not widen the pack past _MAX_LPS).
            used = sorted({s for mem in by_bucket.values() for s, _ in mem})
            maxlen = max(len(sequences[s]) for s in used)
            Lp = pad_to or min(_pow2(maxlen, _LC * 4), _MAX_LPS)
            pack = SeqPack([sequences[s] for s in used], Lp)
            rowmap = {s: i for i, s in enumerate(used)}

        # phase 1: dispatch every bucket's posterior stage before any
        # sync — the host assembly of one bucket then overlaps the
        # device work of the next
        from ..profiling import TIMER

        t_ph = time.perf_counter()
        # split each bucket's members into groups whose gathered
        # posterior emission stream stays under the same per-dispatch
        # byte budget StreamScores enforces (review r5: one unbounded
        # dispatch could materialize a multi-GB stream and OOM)
        work: List[Tuple[int, List[Tuple[int, int]]]] = []
        for b, members in sorted(by_bucket.items()):
            _idx, bk = self.buckets[b]
            members = sorted(members, key=lambda sp: len(sequences[sp[0]]))
            Lmax_b = max(len(sequences[s]) for s, _ in members)
            Lps_b = min(_pow2(Lmax_b, _LC), _MAX_LPS)
            cap = max(8, int(StreamScores.BYTES_BUDGET
                             // (Lps_b * bk.Mp * 4)))
            for g0 in range(0, len(members), cap):
                work.append((b, members[g0 : g0 + cap]))
        posted: Dict[int, tuple] = {}
        for w, (b, members) in enumerate(work):
            _idx, bk = self.buckets[b]
            R0 = len(members)
            Lmax = max(len(sequences[s]) for s, _ in members)
            # wide buckets take narrower cells: the [Lc, C, Mp]
            # emission-stream block must fit VMEM (double buffered;
            # Lc x C x Mp f32 x 2 + (C, Mp) state); narrow buckets
            # (capped at C=_C_POST sublanes) spend the leftover VMEM
            # on LONGER residue chunks instead — per-grid-step fixed
            # cost, not DP math, dominates these thin-block kernels
            C = min(_C_POST, max(8, 32768 // bk.Mp))
            Lc = _LC * max(1, min(4, 32768 // (C * bk.Mp)))
            Lps = min(_pow2(Lmax, Lc), _MAX_LPS)
            if pack.Lp < Lps:  # caller passed a narrower pad_to/pack
                # shrink the chunk until the Lc-truncated stream still
                # covers the bucket's longest sequence; silently
                # dropping trailing residues would leave those rows'
                # domains unfinished (ADVICE r4)
                while Lc > _LC and (pack.Lp // Lc) * Lc < Lmax:
                    Lc //= 2
                Lps = max(Lc, (pack.Lp // Lc) * Lc)
                if Lps < Lmax or Lps > pack.Lp:
                    raise ValueError(
                        f"pack width {pack.Lp} cannot cover the longest "
                        f"sequence ({Lmax} residues) at stream-chunk "
                        f"granularity {Lc}; pass pad_to >= "
                        f"{_pow2(Lmax, Lc)}")
            nLc = Lps // Lc
            cells = _pow2((R0 + C - 1) // C)
            R = cells * C
            rows = numpy.zeros(R, dtype=numpy.int32)
            prof = numpy.zeros(R, dtype=numpy.int32)
            rows[:R0] = [
                s if rowmap is None else rowmap[s] for s, _ in members
            ]
            prof[:R0] = [self.local[p, 1] for _, p in members]
            # zero out the padding rows' lengths so they stay dead
            lens_np = numpy.zeros(R, dtype=numpy.float32)
            lens_np[:R0] = [len(sequences[s]) for s, _ in members]
            handles = self._jit_posterior(
                bk.Mp, C, Lc, nLc, cells, interp, bk.nd
            )(
                pack.xs, pack.loops_exp, pack.moves_exp,
                bk.e_odds, bk.trans9,
                jnp.asarray(rows), jnp.asarray(prof),
                jnp.asarray(lens_np.reshape(cells, C)),
            )
            posted[w] = (handles, R, nLc, Lc)

        TIMER.records.append(
            ("dom.post-dispatch", time.perf_counter() - t_ph))
        t_ph = time.perf_counter()
        # phase 2: fetch EVERY bucket's envelopes in one host round
        # trip, then assemble + dispatch the alignment passes (each
        # per-array fetch over a remote device costs ~25 ms of tunnel
        # latency — per-bucket fetching made the device 90% idle here)
        import jax

        fetched_post = dict(zip(sorted(posted), jax.device_get(
            [posted[w][0] for w in sorted(posted)])))
        aligned: Dict[int, tuple] = {}
        for w, (b, members) in enumerate(work):
            _idx, bk = self.buckets[b]
            _handles, R, nLc, Lc = posted[w]
            score_d, env_i_d, env_j_d, over_d = fetched_post[w]
            score = score_d.reshape(R)
            env_i = env_i_d.reshape(R, -1)
            env_j = env_j_d.reshape(R, -1)
            over = over_d.reshape(R)

            # assemble envelopes; overflow -> exact host fallback
            env_rows: List[Tuple[int, int, int, int, float]] = []
            env_pair: List[Tuple[int, int]] = []
            for r0, (s, p) in enumerate(members):
                if over[r0]:
                    out[(s, p)] = engine.define_domains(
                        self.profiles[p], sequences[s]
                    )
                    continue
                for k in range(env_i.shape[1]):
                    i0, j0 = int(env_i[r0, k]), int(env_j[r0, k])
                    if j0 >= i0:
                        env_rows.append(
                            (s, int(self.local[p, 1]), i0, j0, float(score[r0]))
                        )
                        env_pair.append((s, p))
            if not env_rows:
                continue

            # ---- alignment cells over envelope rows
            order = sorted(range(len(env_rows)),
                           key=lambda e: len(sequences[env_rows[e][0]]))
            NE = len(env_rows)
            # the align pass streams f32 emissions AND two bf16 state
            # streams per block -> tighter budget than the posterior;
            # narrow buckets spend the VMEM leftover on longer chunks
            Ca = min(_C_ALIGN, max(8, 16384 // bk.Mp))
            Lc_a = _LC * max(1, min(4, 16384 // (Ca * bk.Mp)))
            if (nLc * Lc) % Lc_a:
                Lc_a = Lc   # keep full residue coverage when the align
                            # chunk would not divide the stream length
            nLc_a = (nLc * Lc) // Lc_a
            cells_a = _pow2((NE + Ca - 1) // Ca)
            Ra = cells_a * Ca
            rows_a = numpy.zeros(Ra, dtype=numpy.int32)
            prof_a = numpy.zeros(Ra, dtype=numpy.int32)
            iv = numpy.ones(Ra, dtype=numpy.float32)
            jv = numpy.zeros(Ra, dtype=numpy.float32)
            tot = numpy.zeros(Ra, dtype=numpy.float32)
            lens_a = numpy.zeros(Ra, dtype=numpy.float32)
            for slot, e in enumerate(order):
                s, ploc, i0, j0, sc = env_rows[e]
                rows_a[slot] = s if rowmap is None else rowmap[s]
                prof_a[slot] = ploc
                iv[slot] = i0
                jv[slot] = j0
                tot[slot] = sc
                lens_a[slot] = len(sequences[s])
            outs = self._jit_align(
                bk.Mp, Ca, Lc_a, nLc_a, cells_a, interp, bk.nd
            )(
                pack.xs, pack.loops_exp, pack.moves_exp,
                bk.e_odds, bk.trans9,
                jnp.asarray(rows_a), jnp.asarray(prof_a),
                jnp.asarray(lens_a.reshape(cells_a, Ca)),
                jnp.asarray(iv.reshape(cells_a, Ca)),
                jnp.asarray(jv.reshape(cells_a, Ca)),
                jnp.asarray(tot.reshape(cells_a, Ca)),
            )
            aligned[w] = (outs, Ra, order, env_rows, env_pair)

        TIMER.records.append(
            ("dom.env+align-dispatch", time.perf_counter() - t_ph))
        t_ph = time.perf_counter()
        # phase 3: ONE round trip for every bucket's alignment results
        fetched_align = dict(zip(sorted(aligned), jax.device_get(
            [aligned[w][0] for w in sorted(aligned)])))
        class_cum: Dict[int, "numpy.ndarray"] = {}
        for w, (_outs, Ra, order, env_rows, env_pair) in sorted(aligned.items()):
            outs = fetched_align[w]
            envsc = outs[0].reshape(Ra)
            logn2 = outs[1].reshape(Ra, 24)
            tfv = outs[2].reshape(Ra)
            ttv = outs[3].reshape(Ra)
            hfv = outs[4].reshape(Ra)
            htv = outs[5].reshape(Ra)

            for slot, e in enumerate(order):
                s, _ploc, ienv, jenv, _sc = env_rows[e]
                p = env_pair[e][1]
                gm = self.profiles[p]
                x = sequences[s]
                L = len(x)
                if s not in class_cum:
                    onehot = numpy.zeros((L + 1, 21), dtype=numpy.float64)
                    onehot[numpy.arange(1, L + 1), numpy.minimum(x, 20)] = 1.0
                    class_cum[s] = numpy.cumsum(onehot, axis=0)
                cum = class_cum[s]
                counts_env = cum[jenv] - cum[ienv - 1]
                corr = float(counts_env @ logn2[slot, :21])
                loop, _ = length_model(L)
                Ldv = jenv - ienv + 1
                env_sc = envsc[slot] + (L - Ldv) * loop
                dombias = float(numpy.logaddexp(
                    0.0, math.log(engine.OMEGA) + corr
                ))
                bits = (env_sc - (null1_score(L) + dombias)) / LOG2
                tau, lam = gm.hmm.stats.get("FORWARD", (0.0, LOG2))
                out[env_pair[e]].append(DomainHit(
                    ienv=ienv, jenv=jenv,
                    target_from=int(round(float(tfv[slot]))),
                    target_to=int(round(float(ttv[slot]))),
                    hmm_from=int(round(float(hfv[slot]))),
                    hmm_to=int(round(float(htv[slot]))),
                    envsc=float(env_sc), dombias=dombias,
                    bitscore=float(bits),
                    pvalue=float(exp_surv(bits, tau, lam)),
                ))
        TIMER.records.append(
            ("dom.align-fetch", time.perf_counter() - t_ph))
        # domains come out in envelope-slot order per pair; restore
        # coordinate order (the host engine emits them left-to-right)
        for key in out:
            out[key].sort(key=lambda d: (d.ienv, d.jenv))
        return out
