#!/usr/bin/env python
"""Per-stage wall-clock breakdown of SearchPipeline.search on the bench workload.

Times (best-of-2 after a warm pass): stage-1 filter kernel, stage-2
pair-dense Forward, stage-3 posterior kernel, stage-3 host region
logic, stage-3 alignment kernel, and the per-envelope host post-math.
"""

import math
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
N_PROTEINS = 768

profiles = synthetic_profiles(N_PROFILES, min_length=40, max_length=250, seed=0)
seqs = [x[:512] for x in synthetic_proteins(N_PROTEINS, mean_length=280, seed=1)]
rng = numpy.random.default_rng(7)
for i in range(len(seqs)):
    if i % 4 != 3:
        seqs[i] = plant_domain(seqs[i], profiles[(i * 13) % N_PROFILES], rng)

pipeline = SearchPipeline(profiles, Z=N_PROFILES, domZ=N_PROFILES)

# monkeypatch timers around the pipeline internals
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

best = None
for trial in range(2):
    times.clear()
    # wrap the cached kernel callables
    fk = pipeline._filter_kernel
    pf = pipeline._pair_forward
    pd = pipeline._pair_domains
    orig = (fk.__call__, pf.flat, pd.define)
    pipeline._filter_kernel = timed("1.filter", fk)
    pf_flat = pf.flat
    pf.flat = timed("2.pair_fwd", pf_flat)

    # instrument inside PairDomains.define: wrap the bucket kernels
    kern_orig = []
    for b, (idx, post_kern, align_kern) in enumerate(pd.buckets):
        kern_orig.append((post_kern.__call__, align_kern.__call__))
        pd.buckets[b] = (idx, timed("3a.posterior", post_kern), timed("3c.align", align_kern))
    pd.define = timed("3.domains_total", pd.define)

    t0 = time.perf_counter()
    hits = pipeline.search(seqs)
    total = time.perf_counter() - t0

    pipeline._filter_kernel = fk
    pf.flat = pf_flat
    del pd.define
    for b, (idx, _, _) in enumerate(pd.buckets):
        pd.buckets[b] = (idx, None, None)
    pd.buckets = [
        (idx, pk, ak)
        for (idx, _, _), (pk, ak) in zip(pd.buckets, kern_orig)
    ]
    # restore real kernel objects
    pipeline._pair_domains = pd
    snapshot = dict(times, total=total)
    if best is None or total < best["total"]:
        best = snapshot

for k in sorted(best):
    print(f"{k:20s} {best[k]:8.3f} s")
host3 = best["3.domains_total"] - best.get("3a.posterior", 0) - best.get("3c.align", 0)
other = best["total"] - best["1.filter"] - best["2.pair_fwd"] - best["3.domains_total"]
print(f"{'3b.host_regions':20s} {host3:8.3f} s")
print(f"{'other_host':20s} {other:8.3f} s")
