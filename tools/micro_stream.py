"""Micro-bench the stream scorer pieces on TPU: gather vs kernel vs PairBucketed."""
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
# restrict to profiles that land in the Mp=256 bucket for a clean test
bank = ProfileBank.build(profiles)

S = 512
seqs = synthetic_proteins(S, mean_length=300, seed=3)
seqs = [x[:500] for x in seqs]
pack = SeqPack(seqs, 512)
rows = numpy.arange(S, dtype=numpy.int32)
rng = numpy.random.default_rng(0)
# ~80 survivors per sequence, like the bench's F1 output
survivors = [sorted(rng.choice(P, size=80, replace=False).tolist()) for _ in range(S)]
n_pairs = sum(len(v) for v in survivors)
print(f"pairs={n_pairs}", flush=True)

scorer = StreamScores(bank, viterbi=True)
# warm
t0 = time.perf_counter(); scorer.flat_packed(pack, rows, survivors)
print(f"stream warm: {time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(3):
    t0 = time.perf_counter()
    s_arr, p_arr, v_arr = scorer.flat_packed(pack, rows, survivors)
    dt = time.perf_counter()-t0
    cells = sum(len(seqs[s])*profiles[p].M for s, p in zip(s_arr, p_arr))
    print(f"stream viterbi: {dt:.3f}s {cells/1e9:.2f} Gcells -> {cells/1e9/dt:.1f} Gcells/s", flush=True)

from gecco_tpu.hmm.kernels import PairBucketed
pb = PairBucketed(bank, viterbi=True)
t0 = time.perf_counter(); pb.flat_packed(pack, rows, survivors)
print(f"pairbucketed warm: {time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(3):
    t0 = time.perf_counter()
    s2, p2, v2 = pb.flat_packed(pack, rows, survivors)
    dt = time.perf_counter()-t0
    print(f"pairbucketed viterbi: {dt:.3f}s -> {cells/1e9/dt:.1f} Gcells/s", flush=True)

# agreement sanity
d1 = {(int(a), int(b)): float(v) for a, b, v in zip(s_arr, p_arr, v_arr)}
d2 = {(int(a), int(b)): float(v) for a, b, v in zip(s2, p2, v2)}
diff = max(abs(d1[k]-d2[k]) for k in d1)
print("max |stream - pair| =", diff, flush=True)

# now isolate: gather+transpose alone vs kernel alone for the Mp=256 bucket
for bidx, (gidx, bk) in enumerate(scorer.buckets):
    print(f"bucket {bidx}: Mp={bk.Mp} profiles={len(gidx)}", flush=True)
bidx, (gidx, bk) = 1, scorer.buckets[1]
C = min(256, max(8, 32768 // bk.Mp))
cells_n = 8
R = cells_n * C
Lps = 512
prof = jnp.asarray(numpy.random.default_rng(1).integers(0, len(gidx), R, dtype=numpy.int32))
rws = jnp.asarray(numpy.random.default_rng(2).integers(0, S, R, dtype=numpy.int32))

@jax.jit
def build_es(rws, prof):
    xs = pack.xs[rws][:, :Lps]
    eg = bk.e_odds[:, prof, :]
    es = eg[xs, jnp.arange(R, dtype=jnp.int32)[:, None]]
    return es.reshape(cells_n, C, Lps, bk.Mp).transpose(0, 2, 1, 3)

es = build_es(rws, prof); es.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    es = build_es(rws, prof); es.block_until_ready()
dt = (time.perf_counter()-t0)/3
gb = R*Lps*bk.Mp*4/1e9
print(f"gather+transpose: {dt*1000:.0f} ms for {gb:.2f} GB -> {gb/dt:.0f} GB/s", flush=True)

kern = _stream_score(bk.Mp, C, _LC, Lps//_LC, cells_n, True, False, bk.nd)
lens = jnp.asarray(numpy.full((cells_n, C), 500, numpy.float32))
loops = pack.loops_exp[rws].reshape(cells_n, C)
moves = pack.moves_exp[rws].reshape(cells_n, C)
trans = tuple(t[prof].reshape(cells_n, C, bk.Mp) for t in bk.trans9[1:])
out = kern(es, lens, loops, moves, *trans); out.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    out = kern(es, lens, loops, moves, *trans); out.block_until_ready()
dt = (time.perf_counter()-t0)/3
pc = R*Lps*bk.Mp/1e9
print(f"kernel alone: {dt*1000:.0f} ms for {pc:.2f} Gpadded -> {pc/dt:.1f} Gpadded/s", flush=True)
