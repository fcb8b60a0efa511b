#!/usr/bin/env python
"""Micro-benchmarks isolating stage-3 kernel costs on the bench workload shape.

Times, per call (best of 3 after warm):
  A. PairForwardKernel  C=8   (same pair count/layout as posterior)
  B. PairPosteriorKernel C=8  (fwd+bwd+trajectories)
  C. PairAlignKernel            (envelope rescore + OA)
  D. dispatch floor: a no-op jit call round-trip
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

from gecco_tpu.hmm.batch import ProfileBank
from gecco_tpu.hmm.kernels import PairAlignKernel, PairForwardKernel, PairPosteriorKernel
from gecco_tpu.hmm.synthetic import synthetic_profiles, synthetic_proteins

N_ENTRIES = 704          # ~bench stage-3 entry count
C0 = 8
LP = 512

profiles = synthetic_profiles(256, min_length=40, max_length=250, seed=0)
bank = ProfileBank.build(profiles)
print("bank: P=%d Mp=%d" % (bank.P, bank.Mp))
seqs = [x[:512] for x in synthetic_proteins(N_ENTRIES, mean_length=280, seed=1)]
rng = numpy.random.default_rng(3)
pair_idx = rng.integers(0, bank.P, size=(N_ENTRIES, C0)).astype(numpy.int32)

fwd = PairForwardKernel(bank)
post = PairPosteriorKernel(bank)
align = PairAlignKernel(bank)

envelopes = []
totals = []
for n in range(N_ENTRIES):
    L = len(seqs[n])
    for c in range(3):  # ~3 envelopes per sequence like the bench
        i0 = max(1, L // 4)
        j0 = min(L, i0 + 150)
        envelopes.append((n, int(pair_idx[n, c]), i0, j0))
        totals.append(50.0)


def timeit(name, fn):
    fn()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:30s} {best*1000:9.1f} ms")
    return best


noop = jax.jit(lambda x: x + 1)
x0 = jnp.zeros((8, 128))
timeit("D. dispatch no-op", lambda: numpy.asarray(noop(x0)))
timeit("A. pair_fwd C=8", lambda: fwd(seqs, pair_idx, pad_to=LP))
timeit("B. posterior C=8", lambda: post(seqs, pair_idx, pad_to=LP))
timeit("C. align 3 env/seq", lambda: align(seqs, envelopes, totals, pad_to=LP))
