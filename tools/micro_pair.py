"""Sweep pair-kernel parameters on TPU: C width, unroll, dchain depth."""
import os, sys, time
import numpy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from gecco_tpu.hmm.synthetic import pfam_shaped_profiles, synthetic_proteins
from gecco_tpu.hmm.batch import ProfileBank
from gecco_tpu.hmm.kernels import SeqPack, _pallas_pair_fwd_packed, _round_up

P = 400
profiles = [p for p in pfam_shaped_profiles(P, seed=0) if p.M <= 255 and p.M >= 129]
print(f"profiles in Mp=256 bucket: {len(profiles)}", flush=True)
bank = ProfileBank.build(profiles, lane=128)
# pad bank width to pow2 256
bank = bank.select(range(bank.P), lane=128, width=256)
S = 256
seqs = [x[:500] for x in synthetic_proteins(S, mean_length=380, seed=3)]
pack = SeqPack(seqs, 512)
Mp = bank.Mp
import gecco_tpu.hmm.kernels as K

for C in (32, 64, 128, 256):
    for unroll in (4, 8):
        for nd in (4,):
            R = 1024 if C <= 64 else (512 if C == 128 else 256)
            rng = numpy.random.default_rng(0)
            rows = jnp.asarray(rng.integers(0, S, R).astype(numpy.int32))
            valid = jnp.asarray(numpy.ones(R, numpy.int32))
            idx = jnp.asarray(rng.integers(0, bank.P, (R, C)).astype(numpy.int32))
            starts = jnp.asarray(numpy.zeros(R, numpy.int32))
            e_odds = jnp.asarray(bank.e_odds)
            trans = tuple(jnp.asarray(a) for a in (
                bank.tmm, bank.tim, bank.tdm, bank.tmi, bank.tii,
                bank.tmd, bank.tdd, bank.bm))
            key = (Mp, 512, C, False, False, False, nd, True, unroll)
            inner = K._pallas_pair_fwd(Mp, 512, C, False, False, nd, True, unroll)
            def run():
                St = R // 8
                xs = pack.xs[rows].reshape(St, 8, 512)
                e0 = (pack.lens[rows] * valid).reshape(St, 1, 8)
                s0 = starts.reshape(St, 1, 8)
                loops = pack.loops_exp[rows].reshape(St, 1, 8)
                moves = pack.moves_exp[rows].reshape(St, 1, 8)
                return inner(xs, s0, e0, loops, moves, idx, e_odds, *trans)
            run_j = jax.jit(run)
            out = run_j(); out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(3):
                out = run_j(); out.block_until_ready()
            dt = (time.perf_counter()-t0)/3
            # true cells: sum over rows of L * sum(M of idx)
            Ls = numpy.asarray(pack.lens)[numpy.asarray(rows)]
            Ms = bank.lengths[numpy.asarray(idx)]
            cells = float((Ls[:, None] * Ms).sum())
            padded = float(Ls.sum()) * C * Mp / 1  # wait padded = L*C*Mp per row
            padded = float((Ls * C * Mp).sum())
            print(f"C={C} unroll={unroll} nd={nd}: {dt*1000:.0f} ms "
                  f"{cells/1e9:.2f} Gtrue {padded/1e9:.2f} Gpad "
                  f"-> {cells/1e9/dt:.1f} Gtrue/s {padded/1e9/dt:.1f} Gpad/s", flush=True)
