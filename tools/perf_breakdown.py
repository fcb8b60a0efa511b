"""Run the bench workload once and print the fine-grained stage breakdown."""
import os, sys, time
import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from gecco_tpu.hmm.io import encode_sequence
from gecco_tpu.hmm.pipeline import SearchPipeline
from gecco_tpu.hmm.synthetic import pfam_shaped_profiles, plant_domain, synthetic_genome
from gecco_tpu.orf.scan import ScanFinder
from gecco_tpu.seq import Seq, SeqRecord
from gecco_tpu.profiling import TIMER

N_PROFILES = int(os.environ.get("NPROF", "2766"))
N_GENES = int(os.environ.get("NGENES", "3000"))

genome = synthetic_genome(N_GENES, seed=4)
record = SeqRecord(id="bench", seq=Seq(genome))
finder = ScanFinder()
genes = list(finder.find_genes([record]))
profiles = pfam_shaped_profiles(N_PROFILES, seed=0)
rng = numpy.random.default_rng(7)
seqs = [encode_sequence(str(g.protein.seq))[:512] for g in genes]
for i in range(len(seqs)):
    if i % 4 != 3:
        gm = profiles[(i * 13) % N_PROFILES]
        seqs[i] = plant_domain(seqs[i], gm, rng, max_len=min(150, gm.M))

total_nodes = sum(gm.M for gm in profiles)
stats_cache = os.path.expanduser(
    f"~/.gecco_bench_stats_{N_PROFILES}x{total_nodes}_v1.npz")
if os.path.exists(stats_cache):
    payload = numpy.load(stats_cache)
    for p, gm in enumerate(profiles):
        gm.hmm.stats["MSV"] = (float(payload["msv"][p]), float(payload["lam"][p]))
        gm.hmm.stats["VITERBI"] = (float(payload["vit"][p]), float(payload["lam"][p]))
        gm.hmm.stats["FORWARD"] = (float(payload["fwd"][p]), float(payload["lam"][p]))
else:
    from gecco_tpu.hmm.calibrate import calibrate
    calibrate(profiles)
    numpy.savez_compressed(
        stats_cache,
        msv=numpy.array([gm.hmm.stats["MSV"][0] for gm in profiles]),
        vit=numpy.array([gm.hmm.stats["VITERBI"][0] for gm in profiles]),
        fwd=numpy.array([gm.hmm.stats["FORWARD"][0] for gm in profiles]),
        lam=numpy.array([gm.hmm.stats["MSV"][1] for gm in profiles]),
    )

pipeline = SearchPipeline(profiles, Z=N_PROFILES, domZ=N_PROFILES)
print("warming...", flush=True)
t0 = time.perf_counter()
hits = pipeline.search(seqs)
print(f"warm search: {time.perf_counter()-t0:.1f}s, {len(hits)} hits", flush=True)

for run in range(2):
    TIMER.reset()
    t0 = time.perf_counter()
    hits = pipeline.search(seqs)
    dt = time.perf_counter() - t0
    print(f"\n=== run {run}: search={dt:.3f}s hits={len(hits)}", flush=True)
    print("stage_seconds:", {k: round(v, 3) for k, v in pipeline.stage_seconds.items()})
    print("stage_counts:", pipeline.stage_counts)
    for name, (calls, total) in TIMER.summary().items():
        print(f"  {name}: {calls} calls, {total:.3f}s", flush=True)
