#!/usr/bin/env python
"""Single-chip benchmark: annotate+decode throughput (genomes/hour/chip).

Measures the two on-device hot paths of the pipeline on one chip,
mirroring the production SearchPipeline stages:

1. **annotate** — SSV filter of every (protein, profile) pair against a
   2,766-profile bank (the size of GECCO's pruned Pfam library,
   ``BASELINE.md``), plus pair-dense Forward rescoring of filter
   survivors (~2% of pairs at F1=0.02, gathered per sequence);
2. **decode** — windowed CRF forward–backward marginals (W=20, step 1)
   for a full-genome gene chain with max-pooling.

The bank is synthetic (the real Pfam ``.h3m`` cannot be downloaded in a
hermetic environment) with a Pfam-like length distribution — identical
kernels, identical shapes.  A "genome" is normalized to 3,000 proteins
(typical bacterial proteome).

Baseline: the reference (pyhmmer/CRFsuite on a multicore CPU node) runs
``gecco run`` at roughly 40 genomes/hour (≈90 s/genome); no official
number is published (``BASELINE.md``), so ``vs_baseline`` is measured
against that documented estimate.

Prints one JSON line:
``{"metric": "genomes/hour/chip", "value": N, "unit": "genomes/hour", "vs_baseline": R}``
"""

import json
import math
import sys
import time

import numpy

GENOME_PROTEINS = 3000
GENOME_GENES = 3000
BASELINE_GENOMES_PER_HOUR = 40.0
N_PROFILES = 2766
N_PROTEINS = 768
BATCH = 64


def pad_batch(seqs, Lp):
    from gecco_tpu.hmm.profile import length_model

    S = len(seqs)
    xs = numpy.zeros((S, Lp), dtype=numpy.int32)
    masks = numpy.zeros((S, Lp), dtype=bool)
    loops = numpy.zeros(S, dtype=numpy.float32)
    moves = numpy.zeros(S, dtype=numpy.float32)
    for i, x in enumerate(seqs):
        L = min(len(x), Lp)
        xs[i, :L] = x[:L]
        masks[i, :L] = True
        loop, move = length_model(L)
        loops[i] = math.exp(loop)
        moves[i] = math.exp(move)
    return xs, masks, loops, moves


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gecco_tpu.crf.decode import marginals_jax
    from gecco_tpu.hmm.batch import ProfileBank, _bank_tuple, _jit_forward, _jit_msv
    from gecco_tpu.hmm.synthetic import synthetic_profiles, synthetic_proteins

    # ---- build the workload
    profiles = synthetic_profiles(N_PROFILES, min_length=40, max_length=250, seed=0)
    bank = ProfileBank.build(profiles, lane=128)
    seqs = synthetic_proteins(N_PROTEINS, mean_length=280, seed=1)
    Lp = 512
    seqs = [x[:Lp] for x in seqs]
    total_cells = sum(len(x) for x in seqs) * int(bank.lengths.sum())

    on_tpu = jax.devices()[0].platform == "tpu"
    batches = [
        pad_batch(seqs[i : i + BATCH], Lp) for i in range(0, len(seqs), BATCH)
    ]
    batches_dev = [
        tuple(jnp.asarray(a) for a in b) for b in batches
    ]

    # SSV filter stage (pipeline stage 1): Pallas kernel on TPU (bank
    # resident in VMEM), XLA batch engine elsewhere — one dispatch per
    # length bucket for the whole protein set, as the SearchPipeline
    # flushes it.  NB: through the remote-execution tunnel
    # ``block_until_ready`` can return before the work is done; a host
    # reduction is the only reliable synchronization, so every stage is
    # timed through a host-side sum.
    if on_tpu:
        from gecco_tpu.hmm.kernels import Bucketed, SSVKernel

        kern = Bucketed(SSVKernel, bank, seq_tile=8, profile_chunk=256)
        float(kern(seqs, pad_to=Lp).sum())  # compile
        t0 = time.perf_counter()
        acc = float(kern(seqs, pad_to=Lp).sum())
        t_msv = time.perf_counter() - t0
    else:
        from gecco_tpu.hmm.batch import _jit_ssv

        ssv = _jit_ssv(bank.P, bank.Mp, Lp)
        bank_dev = tuple(jnp.asarray(a) for a in _bank_tuple(bank))
        float(jnp.sum(ssv(bank_dev, *batches_dev[0])))
        t0 = time.perf_counter()
        acc = 0.0
        for b in batches_dev:
            acc += float(jnp.sum(ssv(bank_dev, *b)))
        t_msv = time.perf_counter() - t0

    # Forward stage on filter survivors (pipeline stage 2): pair-dense —
    # at the hmmsearch default F1=0.02 each protein keeps ~2% of the
    # 2,766 profiles (~55, padded to 64); the kernel gathers each
    # sequence's survivor rows on device and scores only real pairs.
    SURV = 64
    rng = numpy.random.default_rng(2)
    survivors = [rng.choice(bank.P, size=SURV, replace=False).tolist() for _ in seqs]
    if on_tpu:
        from gecco_tpu.hmm.kernels import PairBucketed

        fkern = PairBucketed(bank)
        fkern(seqs, survivors, pad_to=Lp)  # compile at the full shape
        t0 = time.perf_counter()
        got = fkern(seqs, survivors, pad_to=Lp)
        t_fwd = time.perf_counter() - t0
        assert len(got) == len(seqs) * SURV
    else:
        sub = bank.select(list(range(SURV)))
        sub_dev = tuple(jnp.asarray(a) for a in _bank_tuple(sub))
        fwd_fn = _jit_forward(sub.P, sub.Mp, Lp)
        float(jnp.sum(fwd_fn(sub_dev, *batches_dev[0])))
        t0 = time.perf_counter()
        acc = 0.0
        for b in batches_dev:
            acc += float(jnp.sum(fwd_fn(sub_dev, *b)))
        t_fwd = time.perf_counter() - t0

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
    seconds_per_genome = (t_msv + t_fwd) * scale + t_crf
    genomes_per_hour = 3600.0 / seconds_per_genome
    result = {
        "metric": "genomes/hour/chip",
        "value": round(genomes_per_hour, 2),
        "unit": "genomes/hour",
        "vs_baseline": round(genomes_per_hour / BASELINE_GENOMES_PER_HOUR, 2),
    }
    print(json.dumps(result))
    print(
        f"# msv={t_msv:.3f}s ({total_cells/max(t_msv,1e-9)/1e9:.1f} Gcells/s) "
        f"fwd={t_fwd:.3f}s crf={t_crf:.3f}s "
        f"sec/genome={seconds_per_genome:.2f} device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
