#!/usr/bin/env python
"""A/B variants of the pair-posterior kernel to isolate the cost of the
per-step dynamic scratch stores/loads.

  full    — the production kernel (kernels._pallas_pair_posterior)
  nostore — same DP math, but NO per-step trajectory stores/loads
            (emit writes to row 0 only; loads replaced by carries)
"""

import math
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gecco_tpu.hmm.batch import ProfileBank
from gecco_tpu.hmm.kernels import NEG, PairPosteriorKernel
from gecco_tpu.hmm.synthetic import synthetic_profiles, synthetic_proteins
from gecco_tpu.hmm.profile import length_model

N_ENTRIES = 704
C0 = 8
LP = 512


def _pallas_pair_posterior_nostore(Mp, Lp, C):
    n_doubling = int(math.log2(Mp))

    def kernel(xs_ref, lens_ref, loops_ref, moves_ref,
               e_ref, tmm_ref, tim_ref, tdm_ref, tmi_ref, tii_ref,
               tmd_ref, tdd_ref, bm_ref,
               score_ref, mocc_ref, pb_ref, pe_ref):
        j = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, Mp), dimension=1)
        first_lane = lane == 0

        def shiftR(a):
            return jnp.where(first_lane, 0.0, pltpu.roll(a, shift=1, axis=1))

        def shiftL(a):
            return jnp.where(lane == Mp - 1, 0.0, pltpu.roll(a, shift=Mp - 1, axis=1))

        tmm = tmm_ref[0]
        tim = tim_ref[0]
        tdm = tdm_ref[0]
        tmi = tmi_ref[0]
        tii = tii_ref[0]
        tmd = tmd_ref[0]
        tdd = tdd_ref[0]
        bm = bm_ref[0]
        nm = e_ref[20, 0]
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
            return (Mn * inv, In * inv, Dn * inv,
                    Nn * inv, Bn * inv, Jn * inv, Cn * inv, ls)

        zeros = jnp.zeros((C, Mp), jnp.float32)
        z1 = jnp.zeros((C, 1), jnp.float32)
        carry = jax.lax.fori_loop(
            0, L, fstep, (zeros, zeros, zeros, z1 + 1.0, z1 + move, z1, z1, z1)
        )
        total_log = jnp.log(carry[6] * move + 1e-38) + carry[7]
        score_ref[0, j, :] = total_log[:, 0]

        acc0 = jnp.zeros((C, Lp), jnp.float32)

        def bstep(t, carry):
            bM, bI, bN, bB, bJ, bCs, logscale, accm, accb, acce = carry
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
            # emit-equivalent math WITHOUT trajectory loads: use current
            # backward values and constants in place of fwd trajectories
            sc = jnp.exp(ls - total_log)
            ppN = loop * (bNn * inv) * sc
            ppJ = loop * (bJn * inv) * sc
            ppC = loop * (bCn * inv) * sc
            mocc = jnp.clip(1.0 - (ppN + ppJ + ppC), 0.0, 1.0)
            pB = (bBn * inv) * sc
            pE = (bEn * inv) * sc
            # accumulate into a [C, Lp] register plane via lane select
            lsel = jax.lax.broadcasted_iota(jnp.int32, (C, Lp), 1) == row
            accm = jnp.where(lsel, mocc, accm)
            accb = jnp.where(lsel, pB, accb)
            acce = jnp.where(lsel, pE, acce)
            return (bMn * inv, bIn * inv, bNn * inv, bBn * inv,
                    bJn * inv, bCn * inv, ls, accm, accb, acce)

        bC0 = move
        bE0 = bC0 * 0.5
        bD_L = dchain_bwd(nm * bE0)
        bM_L = nm * bE0 + tmd * shiftL(bD_L)
        out = jax.lax.fori_loop(1, L, bstep, (
            bM_L, zeros, z1, z1, z1, z1 + move, z1, acc0, acc0, acc0,
        ))
        mocc_ref[0, 0] = out[7]
        pb_ref[0, 0] = out[8]
        pe_ref[0, 0] = out[9]

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
        score, mocc, pb, pe = pl.pallas_call(
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
                vec_spec, vec_spec, vec_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((St, 8, C), jnp.float32),
                jax.ShapeDtypeStruct((St, 8, C, Lp), jnp.float32),
                jax.ShapeDtypeStruct((St, 8, C, Lp), jnp.float32),
                jax.ShapeDtypeStruct((St, 8, C, Lp), jnp.float32),
            ],
        )(xs, lens, loops, moves, e_g, *trans_g)
        return (score.reshape(S, C), mocc.reshape(S, C, Lp),
                pb.reshape(S, C, Lp), pe.reshape(S, C, Lp))

    return jax.jit(run)


profiles = synthetic_profiles(256, min_length=40, max_length=250, seed=0)
bank = ProfileBank.build(profiles)
seqs = [x[:512] for x in synthetic_proteins(N_ENTRIES, mean_length=280, seed=1)]
rng = numpy.random.default_rng(3)
pair_idx = rng.integers(0, bank.P, size=(N_ENTRIES, C0)).astype(numpy.int32)

post = PairPosteriorKernel(bank)


def run_nostore():
    S = len(seqs)
    C = 8
    St = 1 << ((numpy.ceil(S / 8).astype(int) - 1).bit_length())
    n = St * 8
    xs = numpy.zeros((n, LP), dtype=numpy.int32)
    lens = numpy.ones(n, dtype=numpy.int32)
    loops = numpy.full(n, 0.5, dtype=numpy.float32)
    moves = numpy.full(n, 0.5, dtype=numpy.float32)
    for i, x in enumerate(seqs):
        L = len(x)
        xs[i, :L] = x
        lens[i] = max(L, 1)
        lo, mo = length_model(L)
        loops[i] = math.exp(lo)
        moves[i] = math.exp(mo)
    idx = numpy.zeros((n, C), dtype=numpy.int32)
    idx[:S, :C0] = pair_idx
    fn = _pallas_pair_posterior_nostore(bank.Mp, LP, C)
    out = fn(
        jnp.asarray(xs.reshape(St, 8, LP)),
        jnp.asarray(lens.reshape(St, 1, 8)),
        jnp.asarray(loops.reshape(St, 1, 8)),
        jnp.asarray(moves.reshape(St, 1, 8)),
        jnp.asarray(idx),
        jnp.asarray(bank.e_odds),
        *(jnp.asarray(a) for a in (bank.tmm, bank.tim, bank.tdm, bank.tmi,
                                   bank.tii, bank.tmd, bank.tdd, bank.bm)),
    )
    return numpy.asarray(out[0])


def timeit(name, fn):
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:30s} {best*1000:9.1f} ms")


timeit("full (production)", lambda: post(seqs, pair_idx, pad_to=LP))
timeit("nostore", run_nostore)
