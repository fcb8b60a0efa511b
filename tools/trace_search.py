"""Capture an XLA profiler trace of one warmed search and summarize device ops."""
import glob, os, sys, time
import numpy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from gecco_tpu.hmm.io import encode_sequence
from gecco_tpu.hmm.pipeline import SearchPipeline
from gecco_tpu.hmm.synthetic import pfam_shaped_profiles, plant_domain, synthetic_genome
from gecco_tpu.orf.scan import ScanFinder
from gecco_tpu.seq import Seq, SeqRecord

N = int(os.environ.get("NPROF", "2766"))
genome = synthetic_genome(int(os.environ.get("NGENES", "3230")), seed=4)
genes = list(ScanFinder().find_genes([SeqRecord(id="b", seq=Seq(genome))]))
profiles = pfam_shaped_profiles(N, seed=0)
rng = numpy.random.default_rng(7)
seqs = [encode_sequence(str(g.protein.seq))[:512] for g in genes]
for i in range(len(seqs)):
    if i % 4 != 3:
        gm = profiles[(i * 13) % N]
        seqs[i] = plant_domain(seqs[i], gm, rng, max_len=min(150, gm.M))
total_nodes = sum(gm.M for gm in profiles)
cache = os.path.expanduser(f"~/.gecco_bench_stats_{N}x{total_nodes}_v1.npz")
payload = numpy.load(cache)
for p, gm in enumerate(profiles):
    gm.hmm.stats["MSV"] = (float(payload["msv"][p]), float(payload["lam"][p]))
    gm.hmm.stats["VITERBI"] = (float(payload["vit"][p]), float(payload["lam"][p]))
    gm.hmm.stats["FORWARD"] = (float(payload["fwd"][p]), float(payload["lam"][p]))
pipeline = SearchPipeline(profiles, Z=N, domZ=N)
print("warming...", flush=True)
hits = pipeline.search(seqs)
print("tracing...", flush=True)
logdir = "/tmp/jaxtrace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
t0 = time.perf_counter()
hits = pipeline.search(seqs)
wall = time.perf_counter() - t0
jax.profiler.stop_trace()
print(f"traced search: {wall:.2f}s, stages={pipeline.stage_seconds}", flush=True)

# summarize: find the xplane pb and extract top ops by self time
files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", files, flush=True)
if files:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    open("/tmp/op_stats.json", "w").write(data if isinstance(data, str) else str(data))
    print("wrote /tmp/op_stats.json (first 3000 chars):")
    print((data if isinstance(data, str) else str(data))[:3000])
