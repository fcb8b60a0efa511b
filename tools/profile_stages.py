#!/usr/bin/env python
"""Per-stage wall-clock breakdown of SearchPipeline.search on the bench workload.

Times (best-of-2 after a warm pass): stage-1 filter masks, stage-2
pair-dense Forward, stage-3 posterior+envelope device work, stage-3
alignment kernel, and the leftover host logic.
"""

import sys
sys.path.insert(0, "/root/repo")
import time

import numpy

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gecco_tpu.hmm.pipeline import SearchPipeline
from gecco_tpu.hmm.synthetic import plant_domain, synthetic_profiles, synthetic_proteins

N_PROFILES = 2766
N_PROTEINS = 3000

profiles = synthetic_profiles(N_PROFILES, min_length=40, max_length=250, seed=0)
seqs = [x[:512] for x in synthetic_proteins(N_PROTEINS, mean_length=280, seed=1)]
rng = numpy.random.default_rng(7)
for i in range(len(seqs)):
    if i % 4 != 3:
        seqs[i] = plant_domain(seqs[i], profiles[(i * 13) % N_PROFILES], rng)

from gecco_tpu.hmm.calibrate import calibrate
calibrate(profiles)
pipeline = SearchPipeline(profiles, Z=N_PROFILES, domZ=N_PROFILES)

times = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        times[name] = times.get(name, 0.0) + (time.perf_counter() - t0)
        return out
    return wrap


hits = pipeline.search(seqs)  # warm / compile
print("hits:", len(hits), "domains:", sum(len(h.domains) for h in hits))

fk = pipeline._filter_kernel
pf = pipeline._pair_forward
pd = pipeline._pair_domains
orig = (fk.masks, pf.flat_packed, pd.define)

best = None
for trial in range(3):
    times.clear()
    fk.masks = timed("1.filter_masks", orig[0])
    pf.flat_packed = timed("2.pair_fwd", orig[1])
    pd.define = timed("3.domains_total", orig[2])

    t0 = time.perf_counter()
    hits = pipeline.search(seqs)
    total = time.perf_counter() - t0

    fk.masks, pf.flat_packed = orig[0], orig[1]
    del pd.define
    snapshot = dict(times, total=total)
    if best is None or total < best["total"]:
        best = snapshot

for k in sorted(best):
    print(f"{k:20s} {best[k]:8.3f} s")
other = best["total"] - best["1.filter_masks"] - best["2.pair_fwd"] - best["3.domains_total"]
print(f"{'other_host':20s} {other:8.3f} s")
