#!/usr/bin/env python
"""Install a ``gecco_tpu train`` output directory as the embedded model.

Reference equivalent: ``setup.py update_model``
(``/root/reference/setup.py:184-238``), which verifies a trained model
directory and copies its artifacts over the package's embedded data.

Our model directory layout (written by ``python -m gecco_tpu train``):

* ``crf_model.npz`` (+ ``.sha256`` sidecar) — CRF weights;
* ``domains.tsv``  — the annotation whitelist / feature vocabulary;
* ``types.tsv``    — labelled cluster types;
* ``compositions.npz`` — sparse domain compositions;
* ``forest.npz``   — the frozen type-classifier forest (optional:
  retrained here from the compositions when missing).

Usage:  python tools/update_model.py MODEL_DIR [DATA_DIR]
"""

import hashlib
import os
import shutil
import sys

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gecco_tpu", "data",
)

REQUIRED = ("crf_model.npz", "domains.tsv", "types.tsv", "compositions.npz")


def update_model(model_dir: str, data_dir: str = DATA_DIR) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for name in REQUIRED:
        if not os.path.exists(os.path.join(model_dir, name)):
            raise FileNotFoundError(f"missing model artifact: {name!r}")
    # verify the checksum sidecar before installing (setup.py:205-230
    # verifies the reference's md5 sidecar the same way)
    npz = os.path.join(model_dir, "crf_model.npz")
    sidecar = npz + ".sha256"
    if os.path.exists(sidecar):
        digest = hashlib.sha256(open(npz, "rb").read()).hexdigest()
        expected = open(sidecar).read().split()[0]
        if digest != expected:
            raise ValueError("crf_model.npz does not match its checksum sidecar")
    # sanity-load through the real loaders before overwriting anything
    from gecco_tpu.crf import ClusterCRF
    from gecco_tpu.types import TypeClassifier

    ClusterCRF.trained(model_dir)
    TypeClassifier.trained(model_dir)

    os.makedirs(data_dir, exist_ok=True)
    names = list(REQUIRED) + ["crf_model.npz.sha256"]
    if os.path.exists(os.path.join(model_dir, "forest.npz")):
        names.append("forest.npz")
    else:
        # freeze a forest from the new compositions so run-time never
        # needs to re-fit (the reference refits on every load,
        # types/__init__.py:90-105 — we deliberately freeze instead)
        from gecco_tpu.types import TypeClassifier as TC

        TC.trained(model_dir).save(model_dir)
        names.append("forest.npz")
    for name in names:
        src = os.path.join(model_dir, name)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(data_dir, name))
    print(f"installed {model_dir!r} -> {data_dir!r} ({', '.join(names)})")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    update_model(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else DATA_DIR)
