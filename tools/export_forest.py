"""One-time export of the reference type-classifier forest to an open format.

The reference *re-fits* a ``RandomForestClassifier(random_state=0)`` on its
embedded training data at every load (``/root/reference/gecco/types/__init__.py:86-92``)
— 1,870 labelled MIBiG clusters × 2,766 Pfam domains.  We freeze that fit
once here (sklearn is used only offline, never at runtime) and store the
trees as flat arrays in ``gecco_tpu/data/forest.npz``; runtime inference
is our own (``gecco_tpu.types.forest``).

Arrays (all trees concatenated, with per-tree node offsets):
* ``children_left``/``children_right`` — int32, -1 at leaves
* ``feature`` — int32 split feature (domain index), -2 at leaves
* ``threshold`` — float64 split threshold (go left if x <= t)
* ``value`` — float64 [n_nodes, n_outputs] P(class 0) per output at node
* ``tree_offsets`` — int64 [n_trees + 1]
* ``classes`` — class (cluster type) names, ``domains`` — feature names

Usage: python tools/export_forest.py
"""

import os
import sys

import numpy
import scipy.sparse

REFERENCE = "/root/reference/gecco/types"
DST = "gecco_tpu/data/forest.npz"


def load_training_data(path: str = REFERENCE):
    compositions = scipy.sparse.load_npz(os.path.join(path, "compositions.npz"))
    with open(os.path.join(path, "domains.tsv")) as f:
        domains = [line.strip() for line in f]
    types = []
    unique = set()
    with open(os.path.join(path, "types.tsv")) as f:
        for line in f:
            names = set(filter(None, line.split("\t")[1].strip().split(";")))
            unique.update(names)
            types.append(names)
    classes = sorted(unique)
    y = numpy.zeros((len(types), len(classes)))
    for i, names in enumerate(types):
        for j, cls in enumerate(classes):
            y[i, j] = cls in names
    return compositions, y, classes, domains


def export(dst: str = DST) -> None:
    from sklearn.ensemble import RandomForestClassifier

    compositions, y, classes, domains = load_training_data()
    model = RandomForestClassifier(random_state=0)
    model.fit(compositions, y)

    lefts, rights, feats, thresholds, values = [], [], [], [], []
    offsets = [0]
    for estimator in model.estimators_:
        tree = estimator.tree_
        # child indices are local to the tree; Forest walks the
        # concatenated arrays with global node indices, so offset them
        offset = offsets[-1]
        lefts.append(numpy.where(tree.children_left >= 0, tree.children_left + offset, -1))
        rights.append(numpy.where(tree.children_right >= 0, tree.children_right + offset, -1))
        feats.append(tree.feature)
        thresholds.append(tree.threshold)
        # tree.value: [n_nodes, n_outputs, 2] class-count (or fraction)
        # distributions; store P(class 0) per output — the reference's
        # positive probabilities are computed as 1 - P(class 0)
        # (types/__init__.py:125-128) and replaying that exact float
        # arithmetic keeps Forest.predict_proba bit-equal to sklearn
        raw = tree.value  # type: ignore[attr-defined]
        totals = raw.sum(axis=2, keepdims=True)
        probs = numpy.where(totals > 0, raw / numpy.maximum(totals, 1e-300), 0.0)
        values.append(probs[:, :, 0])
        offsets.append(offsets[-1] + tree.node_count)

    numpy.savez_compressed(
        dst,
        children_left=numpy.concatenate(lefts).astype(numpy.int32),
        children_right=numpy.concatenate(rights).astype(numpy.int32),
        feature=numpy.concatenate(feats).astype(numpy.int32),
        threshold=numpy.concatenate(thresholds).astype(numpy.float64),
        value=numpy.concatenate(values).astype(numpy.float64),
        tree_offsets=numpy.array(offsets, dtype=numpy.int64),
        classes=numpy.array(classes, dtype=object),
        domains=numpy.array(domains, dtype=object),
    )
    total_nodes = offsets[-1]
    print(
        f"wrote {dst}: {len(offsets)-1} trees, {total_nodes} nodes, "
        f"{len(classes)} classes {classes}, {len(domains)} domains"
    )


if __name__ == "__main__":
    export(*sys.argv[1:])
