#!/usr/bin/env python
"""Empirical tile-size tuning of the Pallas MSV/Forward kernels on the
real chip.  Prints Gcells/s (real DP cells: residues × model nodes) for
a grid of (seq_tile, profile_chunk) choices at production-like shapes.

Usage: python tools/tune_kernels.py [msv|fwd] [n_profiles] [n_seqs]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "msv"
    n_profiles = int(sys.argv[2]) if len(sys.argv) > 2 else 2766
    n_seqs = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gecco_tpu.hmm.batch import ProfileBank
    from gecco_tpu.hmm.kernels import ForwardKernel, MSVKernel
    from gecco_tpu.hmm.synthetic import synthetic_profiles, synthetic_proteins

    profiles = synthetic_profiles(n_profiles, min_length=40, max_length=250, seed=0)
    bank = ProfileBank.build(profiles, lane=128)
    seqs = [x[:512] for x in synthetic_proteins(n_seqs, mean_length=280, seed=1)]
    cells = sum(len(x) for x in seqs) * int(bank.lengths.sum())
    print(f"# device={jax.devices()[0].platform} P={bank.P} Mp={bank.Mp} "
          f"seqs={len(seqs)} cells={cells/1e9:.2f}G", file=sys.stderr)

    cls = MSVKernel if which == "msv" else ForwardKernel
    for seq_tile in (4, 8, 16):
        for chunk in (64, 128, 256, 512):
            try:
                kern = cls(bank, seq_tile=seq_tile, profile_chunk=chunk)
                float(kern(seqs[:seq_tile], pad_to=512).sum())  # compile
                t0 = time.perf_counter()
                float(kern(seqs, pad_to=512).sum())
                dt = time.perf_counter() - t0
                print(f"{which} seq_tile={seq_tile:3d} chunk={chunk:4d} "
                      f"{cells/dt/1e9:8.1f} Gcells/s  ({dt*1e3:7.1f} ms)")
            except Exception as err:  # noqa: BLE001
                print(f"{which} seq_tile={seq_tile:3d} chunk={chunk:4d} FAILED: "
                      f"{type(err).__name__}: {str(err)[:120]}")


if __name__ == "__main__":
    main()
