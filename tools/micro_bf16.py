"""bf16-emission SSV: speed + score error vs f32."""
import os, sys, time
import numpy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import math, functools

from gecco_tpu.hmm.synthetic import pfam_shaped_profiles, synthetic_proteins
from gecco_tpu.hmm.batch import ProfileBank, _round_up
from gecco_tpu.hmm.kernels import Bucketed, SSVKernel, SeqPack, _legal_pc, NEG
from gecco_tpu.hmm.profile import length_model

profiles = pfam_shaped_profiles(2766, seed=0)
bank = ProfileBank.build(profiles)
seqs = [x[:512] for x in synthetic_proteins(512, mean_length=300, seed=3)]
pack = SeqPack(seqs, 512)
cells = sum(len(x) for x in seqs) * float(bank.lengths.sum())

def make_ssv(P, Mp, Lp, S, Pc, masked, dtype):
    def kernel(xs_ref, lens_ref, loops_ref, moves_ref, e_ref, tbm_ref, out_ref):
        if masked:
            lane = jax.lax.broadcasted_iota(jnp.int32, (Pc, Mp), dimension=1)
        def one_sequence(s, _):
            L = lens_ref[0, 0, s]
            loop = loops_ref[0, 0, s]
            move = moves_ref[0, 0, s]
            cb0 = jnp.broadcast_to(tbm_ref[:] + move, (Pc, Mp))
            def substep(i, carry):
                A, G = carry
                xi = xs_ref[0, s, i]
                e = e_ref[xi].astype(jnp.float32)
                shifted = pltpu.roll(A, shift=1, axis=1)
                if masked:
                    shifted = jnp.where(lane == 0, NEG, shifted)
                An = (e - loop) + jnp.maximum(shifted, cb0)
                return (An, jnp.maximum(G, An))
            def step(b, carry):
                for u in range(4):
                    carry = substep(b * 4 + u, carry)
                return carry
            M0 = jnp.full((Pc, Mp), NEG, jnp.float32)
            carry = jax.lax.fori_loop(0, L // 4, step, (M0, M0))
            carry = jax.lax.fori_loop((L // 4) * 4, L, substep, carry)
            out_ref[s, :] = jnp.max(carry[1], axis=1) + (
                L.astype(jnp.float32) * loop + math.log(0.5) + move)
            return 0
        jax.lax.fori_loop(0, S, one_sequence, 0)
    n_chunks = P // Pc
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
        )(xs, lens, loops, moves, e_log, tbm)
    return jax.jit(run)

# one representative bucket: Mp=256
idx = [i for i, m in enumerate(bank.lengths) if 129 <= m <= 255]
sub = bank.select(idx, lane=128, width=256)
Pc = _legal_pc(sub.P, sub.Mp, 512, 65536)
P_pad = _round_up(sub.P, Pc)
print(f"bucket profiles={sub.P} Pc={Pc}", flush=True)
with numpy.errstate(divide="ignore"):
    e_log = numpy.full((21, P_pad, sub.Mp), NEG, dtype=numpy.float32)
    e_log[:, :sub.P] = numpy.where(sub.e_odds > 0, numpy.log(numpy.maximum(sub.e_odds, 1e-300)), NEG)
    tbm = numpy.full((P_pad, 1), NEG, dtype=numpy.float32)
    tbm[:sub.P, 0] = numpy.log(sub.msv_tbm)
S = 8
St = len(seqs) // S
xs = numpy.asarray(pack.xs[:St*S]).reshape(St, S, 512)
lens = numpy.asarray(pack.lens[:St*S]).reshape(St, 1, S)
loops = numpy.asarray(pack.loops_log[:St*S]).reshape(St, 1, S)
moves = numpy.asarray(pack.moves_log[:St*S]).reshape(St, 1, S)
args32 = (jnp.asarray(xs), jnp.asarray(lens), jnp.asarray(loops), jnp.asarray(moves),
          jnp.asarray(e_log), jnp.asarray(tbm))
args16 = args32[:4] + (jnp.asarray(e_log, dtype=jnp.bfloat16), args32[5])
sub_cells = float(numpy.asarray(pack.lens[:St*S]).sum()) * float(sub.lengths.sum())
for name, dtype, args in (("f32", jnp.float32, args32), ("bf16", jnp.bfloat16, args16)):
    fn = make_ssv(P_pad, sub.Mp, 512, S, Pc, False, dtype)
    out = fn(*args); out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args); out.block_until_ready()
    dt = (time.perf_counter()-t0)/3
    print(f"{name}: {dt*1000:.0f} ms -> {sub_cells/1e9/dt:.0f} Gcells/s", flush=True)
f32 = numpy.asarray(make_ssv(P_pad, sub.Mp, 512, S, Pc, False, jnp.float32)(*args32))[:, :sub.P]
b16 = numpy.asarray(make_ssv(P_pad, sub.Mp, 512, S, Pc, False, jnp.bfloat16)(*args16))[:, :sub.P]
d = b16 - f32
print(f"score err: max {numpy.abs(d).max():.3f} p99.9 {numpy.percentile(numpy.abs(d), 99.9):.3f} nats", flush=True)
