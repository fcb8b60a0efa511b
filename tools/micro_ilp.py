"""ILP pair kernel vs single-row, realistic bench shapes."""
import os, sys, time
import numpy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from gecco_tpu.hmm.synthetic import pfam_shaped_profiles, synthetic_proteins
from gecco_tpu.hmm.batch import ProfileBank
import gecco_tpu.hmm.kernels as K
from gecco_tpu.hmm.kernels import SeqPack

P = 400
profiles = [p for p in pfam_shaped_profiles(P, seed=0) if 129 <= p.M <= 255]
bank = ProfileBank.build(profiles, lane=128).select(
    range(len(profiles)), lane=128, width=256)
S = 256
seqs = [x[:500] for x in synthetic_proteins(S, mean_length=380, seed=3)]
pack = SeqPack(seqs, 512)
Mp = bank.Mp
e_odds = jnp.asarray(bank.e_odds)
trans = tuple(jnp.asarray(a) for a in (
    bank.tmm, bank.tim, bank.tdm, bank.tmi, bank.tii,
    bank.tmd, bank.tdd, bank.bm))
from gecco_tpu.hmm.kernels import dchain_depth
nd = dchain_depth(bank)

for C in (32, 64):
    R = 1024 if C == 32 else 512
    rng = numpy.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, S, R).astype(numpy.int32))
    idx = jnp.asarray(rng.integers(0, bank.P, (R, C)).astype(numpy.int32))
    starts = jnp.asarray(numpy.zeros(R, numpy.int32))
    for name, factory in (("1row", K._pallas_pair_fwd), ("2row", K._pallas_pair_fwd_ilp)):
        inner = factory(Mp, 512, C, False, False, nd, True)
        def run():
            St = R // 8
            xs = pack.xs[rows].reshape(St, 8, 512)
            e0 = pack.lens[rows].reshape(St, 1, 8)
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
        Ls = numpy.asarray(pack.lens)[numpy.asarray(rows)]
        padded = float((Ls.astype(numpy.int64) * C * Mp).sum())
        print(f"C={C} {name}: {dt*1000:.0f} ms {padded/1e9:.2f} Gpad -> {padded/1e9/dt:.1f} Gpad/s", flush=True)
    # value agreement
    a = K._pallas_pair_fwd(Mp, 512, C, False, False, nd, True)
    b = K._pallas_pair_fwd_ilp(Mp, 512, C, False, False, nd, True)
    St = R // 8
    args = (pack.xs[rows].reshape(St, 8, 512), starts.reshape(St, 1, 8),
            pack.lens[rows].reshape(St, 1, 8),
            pack.loops_exp[rows].reshape(St, 1, 8),
            pack.moves_exp[rows].reshape(St, 1, 8), idx, e_odds, *trans)
    d = float(jnp.max(jnp.abs(a(*args) - b(*args))))
    print(f"C={C} max|1row-2row| = {d}", flush=True)

# unroll sweep on the 2row kernel
for C in (32, 64):
    R = 1024 if C == 32 else 512
    rng = numpy.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, S, R).astype(numpy.int32))
    idx = jnp.asarray(rng.integers(0, bank.P, (R, C)).astype(numpy.int32))
    starts = jnp.asarray(numpy.zeros(R, numpy.int32))
    for unroll in (4,):
        inner = K._pallas_pair_fwd_ilp(Mp, 512, C, False, False, nd, True, unroll)
        def run():
            St = R // 8
            xs = pack.xs[rows].reshape(St, 8, 512)
            e0 = pack.lens[rows].reshape(St, 1, 8)
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
        Ls = numpy.asarray(pack.lens)[numpy.asarray(rows)]
        padded = float((Ls.astype(numpy.int64) * C * Mp).sum())
        print(f"C={C} 2row unroll={unroll}: {dt*1000:.0f} ms -> {padded/1e9/dt:.1f} Gpad/s", flush=True)
