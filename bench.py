#!/usr/bin/env python
"""Single-chip benchmark: annotate+decode throughput (genomes/hour/chip).

Times the REAL production path on one chip:

1. **annotate** — the full ``SearchPipeline.search`` over a
   2,766-profile bank (the size of GECCO's pruned Pfam library,
   ``BASELINE.md``): SSV filter of all pairs, pair-dense Forward of
   filter survivors, and on-device domain definition (posterior
   trajectories, envelope splitting, envelope rescore, null2,
   optimal-accuracy alignment) for the reported hits.  The workload
   plants one real domain into most proteins so the hit rate — and
   therefore the stage-3 load — matches production (~1 reported
   domain per gene).
2. **decode** — windowed CRF forward–backward marginals (W=20, step 1)
   for a full-genome gene chain with max-pooling.

The bank is synthetic (the real Pfam ``.h3m`` cannot be downloaded in a
hermetic environment) with a Pfam-like length distribution — identical
kernels, identical shapes.  A "genome" is normalized to 3,000 proteins
(typical bacterial proteome).

Baseline: the reference (pyrodigal/pyhmmer/CRFsuite on a multicore CPU
node) runs ``gecco run`` at roughly 40 genomes/hour (≈90 s/genome); no
official number is published (``BASELINE.md``), so ``vs_baseline`` is
measured against that documented estimate.

Prints one JSON line:
``{"metric": "genomes/hour/chip", "value": N, "unit": "genomes/hour", "vs_baseline": R}``
"""

import json
import os
import sys
import time

import numpy

GENOME_PROTEINS = 3000
GENOME_GENES = 3000
BASELINE_GENOMES_PER_HOUR = 40.0
N_PROFILES = 2766
N_PROTEINS = 3000  # one full bacterial proteome per search batch


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gecco_tpu.crf.decode import marginals_jax
    from gecco_tpu.hmm.pipeline import SearchPipeline
    from gecco_tpu.hmm.synthetic import plant_domain, synthetic_profiles, synthetic_proteins

    # ---- numeric parity of the compiled kernels ON THIS DEVICE first:
    # every tests/ parity check is interpret-mode CPU; this is the one
    # place the production Pallas path is validated where it runs.
    parity = "skipped"
    if os.environ.get("GECCO_BENCH_PARITY", "1") != "0":
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        import tpu_check

        try:
            tpu_check.run(verbose=True)
            parity = "ok"
        except tpu_check.ParityError as exc:
            print(json.dumps({
                "metric": "genomes/hour/chip", "value": 0.0,
                "unit": "genomes/hour", "vs_baseline": 0.0,
                "parity": f"FAIL: {exc}",
            }))
            sys.exit(1)

    # ---- build the workload: background proteins with planted domains
    profiles = synthetic_profiles(N_PROFILES, min_length=40, max_length=250, seed=0)
    seqs = [x[:512] for x in synthetic_proteins(N_PROTEINS, mean_length=280, seed=1)]
    rng = numpy.random.default_rng(7)
    for i in range(len(seqs)):
        if i % 4 != 3:  # ~75% of proteins carry one real Pfam-like domain
            seqs[i] = plant_domain(seqs[i], profiles[(i * 13) % N_PROFILES], rng)

    # hmmbuild-style E-value calibration (one-time, at bank build like
    # HMMER's own): the shipped Pfam .h3m profiles carry simulation-
    # fitted STATS lines; synthetic profiles need the same fit or the
    # filter pass rates (and so the stage-2/3 load) are unrealistic.
    from gecco_tpu.hmm.calibrate import calibrate

    calibrate(profiles)

    pipeline = SearchPipeline(profiles, Z=N_PROFILES, domZ=N_PROFILES)

    # NB: through the remote-execution tunnel ``block_until_ready`` can
    # return before the work is done; searching twice and timing the
    # second run both warms every kernel shape and synchronizes via the
    # host-side results.
    hits = pipeline.search(seqs)  # compile/warm every stage
    t_search = float("inf")
    for _ in range(2):  # best-of-2: the tunnel adds ±20% timing noise
        t0 = time.perf_counter()
        hits = pipeline.search(seqs)
        t_search = min(t_search, time.perf_counter() - t0)
    n_domains = sum(len(h.domains) for h in hits)

    # ---- CRF decode of one genome-sized gene chain
    rng = numpy.random.default_rng(0)
    emissions = rng.normal(size=(GENOME_GENES, 2)).astype(numpy.float32) * 2.0
    W = 20
    index = numpy.arange(GENOME_GENES - W + 1)[:, None] + numpy.arange(W)[None, :]
    windows = emissions[index]
    trans = numpy.array([[2.67, -2.6], [-2.6, 2.57]], dtype=numpy.float32)
    float(jnp.sum(marginals_jax(windows, trans)))  # compile at full shape
    t0 = time.perf_counter()
    float(jnp.sum(marginals_jax(windows, trans)))
    t_crf = time.perf_counter() - t0

    # ---- normalize to genomes/hour
    scale = GENOME_PROTEINS / len(seqs)
    seconds_per_genome = t_search * scale + t_crf
    genomes_per_hour = 3600.0 / seconds_per_genome
    result = {
        "metric": "genomes/hour/chip",
        "value": round(genomes_per_hour, 2),
        "unit": "genomes/hour",
        "vs_baseline": round(genomes_per_hour / BASELINE_GENOMES_PER_HOUR, 2),
        "parity": parity,
    }
    print(json.dumps(result))
    print(
        f"# search={t_search:.3f}s ({len(hits)} hits, {n_domains} domains, "
        f"{len(seqs)} proteins x {N_PROFILES} profiles) crf={t_crf:.3f}s "
        f"sec/genome={seconds_per_genome:.2f} device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
