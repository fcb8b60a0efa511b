"""Gather strategies + kernel throughput at above-latency-floor sizes."""
import os, sys, time
import numpy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from gecco_tpu.hmm.synthetic import pfam_shaped_profiles, synthetic_proteins
from gecco_tpu.hmm.batch import ProfileBank
from gecco_tpu.hmm.kernels import SeqPack
from gecco_tpu.hmm.stream import StreamScores, _stream_score, _LC

P = 600
profiles = pfam_shaped_profiles(P, seed=0)
bank = ProfileBank.build(profiles)
S = 512
seqs = [x[:500] for x in synthetic_proteins(S, mean_length=300, seed=3)]
pack = SeqPack(seqs, 512)
scorer = StreamScores(bank, viterbi=True)
gidx, bk = scorer.buckets[1]     # Mp=256
Mp = bk.Mp
C = 128
cells_n = 64                      # 64*128 rows * 512 * 256 * 4 = 4.3 GB
R = cells_n * C
Lps = 512
rng = numpy.random.default_rng(1)
prof = jnp.asarray(rng.integers(0, len(gidx), R, dtype=numpy.int32))
rws = jnp.asarray(rng.integers(0, S, R, dtype=numpy.int32))
gb = R * Lps * Mp * 4 / 1e9

@jax.jit
def build_idx(rws, prof):
    xs = pack.xs[rws][:, :Lps]
    eg = bk.e_odds[:, prof, :]
    es = eg[xs, jnp.arange(R, dtype=jnp.int32)[:, None]]
    return es.reshape(cells_n, C, Lps, Mp).transpose(0, 2, 1, 3)

@jax.jit
def build_onehot(rws, prof):
    xs = pack.xs[rws][:, :Lps]                     # [R, Lps] int
    eg = bk.e_odds[:, prof, :]                     # [21, R, Mp]
    oh = jax.nn.one_hot(xs, 21, dtype=jnp.bfloat16)  # [R, Lps, 21]
    es = jnp.einsum("rik,krm->rim", oh, eg.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    return es.reshape(cells_n, C, Lps, Mp).transpose(0, 2, 1, 3)

for name, fn in (("index-gather", build_idx), ("onehot-mxu", build_onehot)):
    es = fn(rws, prof); es.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        es = fn(rws, prof); es.block_until_ready()
    dt = (time.perf_counter()-t0)/3
    print(f"{name}: {dt*1000:.0f} ms for {gb:.2f} GB -> {gb/dt:.0f} GB/s", flush=True)

# kernel on the big batch
kern = _stream_score(Mp, C, _LC, Lps//_LC, cells_n, True, False, bk.nd)
lens = jnp.asarray(numpy.full((cells_n, C), 500, numpy.float32))
loops = pack.loops_exp[rws].reshape(cells_n, C)
moves = pack.moves_exp[rws].reshape(cells_n, C)
trans = tuple(t[prof].reshape(cells_n, C, Mp) for t in bk.trans9[1:])
out = kern(es, lens, loops, moves, *trans); out.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    out = kern(es, lens, loops, moves, *trans); out.block_until_ready()
dt = (time.perf_counter()-t0)/3
pc = R * Lps * Mp / 1e9
print(f"kernel: {dt*1000:.0f} ms for {pc:.2f} Gpadded -> {pc/dt:.1f} Gpadded/s", flush=True)

# value check idx vs onehot
d = float(jnp.max(jnp.abs(build_idx(rws, prof) - build_onehot(rws, prof))))
print("max |idx - onehot| =", d, flush=True)
