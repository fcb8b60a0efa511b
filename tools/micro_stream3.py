"""f32 one-hot einsum es-builders (exact) + kernel C-scaling for stream scorer."""
import os, sys, time
import numpy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from gecco_tpu.hmm.synthetic import pfam_shaped_profiles, synthetic_proteins
from gecco_tpu.hmm.batch import ProfileBank
from gecco_tpu.hmm.kernels import SeqPack
from gecco_tpu.hmm.stream import _stream_score, _LC

P = 600
profiles = pfam_shaped_profiles(P, seed=0)
bank0 = ProfileBank.build(profiles)
S = 512
seqs = [x[:500] for x in synthetic_proteins(S, mean_length=300, seed=3)]
pack = SeqPack(seqs, 512)

from gecco_tpu.hmm.stream import StreamBank
sb = StreamBank(bank0)
for tag, bidx in (("Mp=128", 0), ("Mp=256", 1)):
    gidx, bk = sb.buckets[bidx]
    Mp = bk.Mp
    C = min(256, 32768 // Mp)
    cells_n = 32 if Mp == 128 else 32
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
    def build_oh32(rws, prof):
        xs = pack.xs[rws][:, :Lps]
        eg = bk.e_odds[:, prof, :]
        oh = jax.nn.one_hot(xs, 21, dtype=jnp.float32)
        es = jnp.einsum("rik,krm->rim", oh, eg,
                        preferred_element_type=jnp.float32)
        return es.reshape(cells_n, C, Lps, Mp).transpose(0, 2, 1, 3)

    @jax.jit
    def build_oh32_direct(rws, prof):
        xs = pack.xs[rws][:, :Lps].reshape(cells_n, C, Lps)
        eg = bk.e_odds[:, prof, :].reshape(21, cells_n, C, Mp)
        oh = jax.nn.one_hot(xs, 21, dtype=jnp.float32)   # [t, c, i, k]
        return jnp.einsum("tcik,ktcm->ticm", oh, eg,
                          preferred_element_type=jnp.float32)

    for name, fn in (("idx", build_idx), ("oh32", build_oh32),
                     ("oh32-direct", build_oh32_direct)):
        es = fn(rws, prof); es.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            es = fn(rws, prof); es.block_until_ready()
        dt = (time.perf_counter()-t0)/3
        print(f"{tag} {name}: {dt*1000:.0f} ms for {gb:.2f} GB -> {gb/dt:.0f} GB/s", flush=True)
    # exactness
    d = float(jnp.max(jnp.abs(build_idx(rws, prof) - build_oh32(rws, prof))))
    print(f"{tag} max|idx-oh32| = {d}", flush=True)

    # kernel rate at this C
    kern = _stream_score(Mp, C, _LC, Lps // _LC, cells_n, True, False, bk.nd)
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
    print(f"{tag} kernel C={C}: {dt*1000:.0f} ms for {pc:.2f} Gpad -> {pc/dt:.1f} Gpad/s", flush=True)
