#!/usr/bin/env python
"""Per-stage wall-clock breakdown of SearchPipeline.search on the bench
workload (the real-Pfam-shaped bank).

The pipeline records its own per-stage seconds / DP cells
(``stage_seconds``/``stage_cells``; filter -> viterbi -> forward ->
domains) — this tool runs the bench-shaped search three times after a
warm pass and prints the best breakdown plus Gcells/s per stage.
"""

import sys
sys.path.insert(0, "/root/repo")
import time

import numpy

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gecco_tpu.hmm.calibrate import calibrate
from gecco_tpu.hmm.pipeline import SearchPipeline
from gecco_tpu.hmm.synthetic import (
    pfam_shaped_profiles, plant_domain, synthetic_proteins)

N_PROFILES = 2766
N_PROTEINS = 3000

profiles = pfam_shaped_profiles(N_PROFILES, seed=0)
seqs = [x[:512] for x in synthetic_proteins(N_PROTEINS, mean_length=280, seed=1)]
rng = numpy.random.default_rng(7)
for i in range(len(seqs)):
    if i % 4 != 3:
        gm = profiles[(i * 13) % N_PROFILES]
        seqs[i] = plant_domain(seqs[i], gm, rng, max_len=min(150, gm.M))

calibrate(profiles)
pipeline = SearchPipeline(profiles, Z=N_PROFILES, domZ=N_PROFILES)

hits = pipeline.search(seqs)  # warm / compile
print("hits:", len(hits), "domains:", sum(len(h.domains) for h in hits))
print("survivors:", pipeline.stage_counts)

best = None
for _ in range(3):
    t0 = time.perf_counter()
    hits = pipeline.search(seqs)
    total = time.perf_counter() - t0
    if best is None or total < best[0]:
        best = (total, dict(pipeline.stage_seconds), dict(pipeline.stage_cells))

total, seconds, cells = best
accounted = 0.0
for name in ("filter", "viterbi", "forward", "domains"):
    s = seconds.get(name, 0.0)
    accounted += s
    rate = cells.get(name, 0.0) / 1e9 / max(s, 1e-9)
    print(f"{name:12s} {s:8.3f} s   {cells.get(name, 0.0) / 1e9:9.3f} Gcells  "
          f"{rate:8.1f} Gcells/s")
print(f"{'other_host':12s} {total - accounted:8.3f} s")
print(f"{'total':12s} {total:8.3f} s")
