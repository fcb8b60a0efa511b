"""Log-space ILP pair-Viterbi kernel rates (prefix-sum-factored dchain).

Measures `_pallas_pair_fwd_ilp(log_space=True)` with the
`viterbi_log_tensors` transition layout at bench-like shapes, plus a
value check against the prob-space single-row kernel.  Measured on the
v5e (round 5, nd=4 bank): C=64/rpc=2 25.7 Gpad/s, C=32/rpc=4 20.6,
C=48/rpc=4 15.0 (non-power-of-two sublane blocks), C=16/rpc=8 11.1 —
see docs/kernels.md #3.
"""
import os, sys, time
import numpy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from gecco_tpu.hmm.synthetic import pfam_shaped_profiles, synthetic_proteins
from gecco_tpu.hmm.batch import ProfileBank
import gecco_tpu.hmm.kernels as K
from gecco_tpu.hmm.kernels import SeqPack, dchain_depth, viterbi_log_tensors

profiles = [p for p in pfam_shaped_profiles(400, seed=0) if 129 <= p.M <= 255]
bank = ProfileBank.build(profiles, lane=128).select(
    range(len(profiles)), lane=128, width=256)
S = 256
seqs = [x[:500] for x in synthetic_proteins(S, mean_length=380, seed=3)]
pack = SeqPack(seqs, 512)
Mp = bank.Mp
nd = dchain_depth(bank)
print(f"nd={nd}", flush=True)
e_log, trans_log = viterbi_log_tensors(bank)

for C, rpc in ((16, 8), (32, 4), (64, 2)):
    R = max(256, 32768 // (C * Mp) * 256)
    rng = numpy.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, S, R).astype(numpy.int32))
    idx = jnp.asarray(rng.integers(0, bank.P, (R, C)).astype(numpy.int32))
    starts = jnp.asarray(numpy.zeros(R, numpy.int32))
    inner = K._pallas_pair_fwd_ilp(Mp, 512, C, False, False, nd, True,
                                   rows_per_cell=rpc, log_space=True)
    St = R // 8
    def run():
        return inner(pack.xs[rows].reshape(St, 8, 512), starts.reshape(St, 1, 8),
                     pack.lens[rows].reshape(St, 1, 8),
                     pack.loops_log[rows].reshape(St, 1, 8),
                     pack.moves_log[rows].reshape(St, 1, 8), idx, e_log, *trans_log)
    run_j = jax.jit(run)
    out = run_j(); out.block_until_ready()
    best = 9e9
    for _ in range(4):
        t0 = time.perf_counter(); out = run_j(); out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    padded = float((pack.lens_host[numpy.asarray(rows)].astype(numpy.int64)
                    * C * Mp).sum())
    print(f"C={C} rpc={rpc}: {best*1000:.0f} ms {padded/1e9:.2f} Gpad -> "
          f"{padded/1e9/best:.1f} Gpad/s", flush=True)

# value agreement vs the prob-space single-row kernel
C, R = 32, 64
rng = numpy.random.default_rng(1)
rows = jnp.asarray(rng.integers(0, S, R).astype(numpy.int32))
idx = jnp.asarray(rng.integers(0, bank.P, (R, C)).astype(numpy.int32))
starts = jnp.asarray(numpy.zeros(R, numpy.int32))
trans_p = tuple(jnp.asarray(a) for a in (
    bank.tmm, bank.tim, bank.tdm, bank.tmi, bank.tii,
    bank.tmd, bank.tdd, bank.bm))
a = K._pallas_pair_fwd(Mp, 512, C, False, False, nd, True)
b = K._pallas_pair_fwd_ilp(Mp, 512, C, False, False, nd, True,
                           rows_per_cell=2, log_space=True)
St = R // 8
xs8 = pack.xs[rows].reshape(St, 8, 512)
s8 = starts.reshape(St, 1, 8); e8 = pack.lens[rows].reshape(St, 1, 8)
va = a(xs8, s8, e8, pack.loops_exp[rows].reshape(St, 1, 8),
       pack.moves_exp[rows].reshape(St, 1, 8), idx,
       jnp.asarray(bank.e_odds), *trans_p)
vb = b(xs8, s8, e8, pack.loops_log[rows].reshape(St, 1, 8),
       pack.moves_log[rows].reshape(St, 1, 8), idx, e_log, *trans_log)
d = float(jnp.max(jnp.abs(va - vb)))
print(f"log-ILP vs prob single-row max |diff| = {d:.2e}", flush=True)
assert d < 5e-3, d
