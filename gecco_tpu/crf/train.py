"""CRF training: elastic-net-regularized maximum likelihood in JAX.

Behavioral reference: ``/root/reference/gecco/crf/__init__.py:275-378``
(``ClusterCRF.fit``): optional Fisher feature selection, contig
grouping + shuffling, one training instance per sliding window, then an
L1(+L2)-regularized linear-chain CRF fit (CRFsuite L-BFGS/OWL-QN with
``c1=0.4, c2=0.0`` for the shipped model).  Our optimizer is proximal
Adam on the convex negative log-likelihood — batched over all windows
on the accelerator — with soft-thresholding for the L1 term, yielding
the same model family (sparse indicator-feature weights).
"""

import random as _random
import warnings
from typing import Dict, Iterable, List, Optional

import numpy

from ..model import Gene
from . import features as _features

__all__ = ["fit_crf"]


def _build_instances(crf, genes: Iterable[Gene], shuffle: bool, seed: int):
    if crf.feature_type == "protein":
        extract_features = _features.extract_features_protein
        extract_labels = _features.extract_labels_protein
    else:
        extract_features = _features.extract_features_domain
        extract_labels = _features.extract_labels_domain

    import itertools
    import operator

    genes = sorted(genes, key=operator.attrgetter("source.id"))
    for gene in genes:
        gene.protein.domains.sort(key=operator.attrgetter("start"))

    groups = itertools.groupby(genes, key=operator.attrgetter("source.id"))
    sequences = [sorted(group, key=operator.attrgetter("start")) for _, group in groups]
    if shuffle:
        _random.Random(seed).shuffle(sequences)

    window, step = crf.window_size, crf.window_step
    all_features: List[List[Dict[str, bool]]] = []
    all_labels: List[List[str]] = []
    from .._meta import sliding_window

    for sequence in sequences:
        feats = extract_features(sequence)
        labels = extract_labels(sequence)
        if all(label == "0" for label in labels):
            warnings.warn(
                f"only negative labels found in sequence {sequence[0].source.id!r}",
                UserWarning,
            )
        elif all(label == "1" for label in labels):
            warnings.warn(
                f"only positive labels found in sequence {sequence[0].source.id!r}",
                UserWarning,
            )
        if len(feats) != len(labels):
            raise ValueError("different number of features and labels found, something is wrong")
        if len(feats) < window:
            raise ValueError(
                f"{sequence[0].source.id!r} has not enough observations "
                f"({len(feats)}) for requested window size ({window})"
            )
        for win in sliding_window(len(feats), window, step):
            all_features.append(feats[win])
            all_labels.append(labels[win])
    return all_features, all_labels


def fit_crf(
    crf,
    genes: Iterable[Gene],
    *,
    select: Optional[float] = None,
    shuffle: bool = True,
    correction_method: Optional[str] = None,
    seed: int = 42,
    max_iterations: int = 500,
    learning_rate: float = 0.05,
    tolerance: float = 1e-6,
) -> None:
    """Fit ``crf`` in place on the given training genes."""
    import jax
    import jax.numpy as jnp
    import optax

    genes = list(genes)

    # -- optional Fisher feature selection (crf/__init__.py:319-345)
    if select is not None:
        from .select import fisher_significance

        if select <= 0 or select > 1:
            raise ValueError(f"invalid value for select: {select}")
        crf.significance = sig = fisher_significance(
            (gene.protein for gene in genes),
            correction_method=correction_method,
        )
        sorted_sig = sorted(sig, key=sig.get)[: int(select * len(sig))]
        crf.significant_features = frozenset(sorted_sig)
        if sig[sorted_sig[-1]] == 1.0:
            warnings.warn(
                "Selected features still include domains with a p-value "
                "of 1, consider reducing the selected fraction.",
                UserWarning,
            )
        genes = [
            gene.with_protein(
                gene.protein.with_domains([
                    domain for domain in gene.protein.domains
                    if domain.name in crf.significant_features
                ])
            )
            for gene in genes
        ]

    windows, labels = _build_instances(crf, genes, shuffle, seed)
    if not windows:
        raise ValueError("no training instances")

    # -- vocabulary over observed features
    vocabulary = sorted({name for window in windows for feats in window for name in feats})
    attr_index = {name: i for i, name in enumerate(vocabulary)}
    A = len(vocabulary)
    W = crf.window_size
    N = len(windows)
    dmax = max(
        (len(feats) for window in windows for feats in window), default=1
    )
    dmax = max(dmax, 1)

    idx = numpy.full((N, W, dmax), A, dtype=numpy.int32)  # A = padding row
    y = numpy.zeros((N, W), dtype=numpy.int32)
    for n, (window, window_labels) in enumerate(zip(windows, labels)):
        for t, feats in enumerate(window):
            for d, name in enumerate(feats):
                idx[n, t, d] = attr_index[name]
        y[n] = [1 if label == "1" else 0 for label in window_labels]

    c1 = float(crf._options.get("c1", 0.0))
    c2 = float(crf._options.get("c2", 0.0))

    idx_j = jnp.asarray(idx)
    y_j = jnp.asarray(y)

    def nll(params):
        state, trans = params  # [A+1, 2] (last row frozen 0), [2, 2]
        e = state[idx_j].sum(axis=2)  # [N, W, 2]
        path = jnp.take_along_axis(e, y_j[..., None], axis=2)[..., 0].sum(axis=1)
        path = path + trans[y_j[:, :-1], y_j[:, 1:]].sum(axis=1)

        def step(alpha, e_t):
            alpha = jax.scipy.special.logsumexp(
                alpha[:, :, None] + trans[None, :, :], axis=1
            ) + e_t
            return alpha, None

        alpha0 = e[:, 0, :]
        alpha, _ = jax.lax.scan(step, alpha0, jnp.moveaxis(e[:, 1:, :], 1, 0))
        logZ = jax.scipy.special.logsumexp(alpha, axis=1)
        loss = (logZ - path).sum()
        if c2 > 0:
            loss = loss + c2 * (jnp.sum(state**2) + jnp.sum(trans**2))
        return loss

    optimizer = optax.adam(learning_rate)
    state0 = jnp.zeros((A + 1, 2), jnp.float32)
    trans0 = jnp.zeros((2, 2), jnp.float32)
    params = (state0, trans0)
    opt_state = optimizer.init(params)
    grad_fn = jax.value_and_grad(nll)

    @jax.jit
    def train_step(params, opt_state, lr_scale):
        loss, grads = grad_fn(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = jax.tree_util.tree_map(lambda p, u: p + u * lr_scale, params, updates)
        if c1 > 0:
            # proximal soft-threshold for the L1 penalty
            threshold = c1 * learning_rate * lr_scale
            state, trans = params
            state = jnp.sign(state) * jnp.maximum(jnp.abs(state) - threshold, 0.0)
            state = state.at[A].set(0.0)  # keep the padding row at zero
            params = (state, trans)
        else:
            state, trans = params
            params = (state.at[A].set(0.0), trans)
        return params, opt_state, loss

    previous = numpy.inf
    for iteration in range(max_iterations):
        lr_scale = 1.0 if iteration < max_iterations * 3 // 4 else 0.1
        params, opt_state, loss = train_step(params, opt_state, lr_scale)
        loss = float(loss)
        if abs(previous - loss) < tolerance * max(1.0, abs(loss)):
            break
        previous = loss

    state, trans = (numpy.asarray(p, dtype=numpy.float64) for p in params)
    crf._set_weights(vocabulary, ["0", "1"], state[:A], trans)
