"""SSV filter unroll sweep on the real bank shape."""
import os, sys, time
import numpy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from gecco_tpu.hmm.synthetic import pfam_shaped_profiles, synthetic_proteins
from gecco_tpu.hmm.batch import ProfileBank
from gecco_tpu.hmm.kernels import Bucketed, SSVKernel, SeqPack

profiles = pfam_shaped_profiles(2766, seed=0)
bank = ProfileBank.build(profiles)
seqs = [x[:512] for x in synthetic_proteins(512, mean_length=300, seed=3)]
pack = SeqPack(seqs, 512)
cells = sum(len(x) for x in seqs) * float(bank.lengths.sum())
for unroll in (4, 8):
    kern = Bucketed(SSVKernel, bank, pow2=True, unroll=unroll)
    m = kern.masks(pack, 0.02)          # warm (compile)
    t0 = time.perf_counter()
    for _ in range(2):
        m = kern.masks(pack, 0.02)
    dt = (time.perf_counter() - t0) / 2
    print(f"unroll={unroll}: {dt:.3f}s {cells/1e9:.1f} Gcells -> {cells/1e9/dt:.1f} Gcells/s", flush=True)
