"""Generate a synthetic Planetoid-format dataset (pubmed-scale path exercise).

The upstream snapshot is missing pubmed's ind.pubmed.allx blob (see
data/planetoid.py), so the 19717-node sparse path cannot run on real data. This
writes a clearly-synthetic dataset in the exact ind.* pickle format the loader
parses — a degree-heterogeneous random graph with class-correlated sparse
features — to exercise the large-graph ELL/BSR operator paths end-to-end.

Usage:
    python tools/make_synthetic_planetoid.py --name pubmed_synth --n 19717 \
        --features 500 --classes 3 --out data
"""

import argparse
import os
import pickle

import numpy as np
import scipy.sparse as sp


def make_dataset(name: str, n: int, n_features: int, n_classes: int,
                 out_dir: str, seed: int = 0, n_train_per_class: int = 20,
                 n_test: int = 1000, avg_degree: float = 4.5) -> str:
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, n_classes, size=n)

    # class-correlated sparse features: each class owns a feature band
    rows, cols, vals = [], [], []
    band = n_features // n_classes
    for i in range(n):
        k = rng.randint(5, 25)
        own = rng.randint(labels[i] * band, (labels[i] + 1) * band, size=k // 2)
        other = rng.randint(0, n_features, size=k - k // 2)
        for c in np.concatenate([own, other]):
            rows.append(i)
            cols.append(c)
            vals.append(rng.rand())
    features = sp.csr_matrix((vals, (rows, cols)), shape=(n, n_features))

    # preferential-attachment-ish neighbor dict with homophily
    graph = {i: [] for i in range(n)}
    n_edges = int(n * avg_degree / 2)
    src = rng.randint(0, n, size=n_edges)
    dst = rng.randint(0, n, size=n_edges)
    same = rng.rand(n_edges) < 0.7  # homophilous edges rewired within class
    by_class = [np.flatnonzero(labels == c) for c in range(n_classes)]
    for s, d, hm in zip(src, dst, same):
        if hm and labels[s] != labels[d]:
            candidates = by_class[labels[s]]
            d = int(candidates[rng.randint(len(candidates))])
        if s != d:
            graph[int(s)].append(int(d))
            graph[int(d)].append(int(s))

    onehot = np.eye(n_classes, dtype=np.int32)[labels]
    test_idx = rng.permutation(n)[:n_test]
    train_idx = []
    for c in range(n_classes):
        pool = np.setdiff1d(np.flatnonzero(labels == c), test_idx)
        train_idx.extend(pool[:n_train_per_class].tolist())
    train_idx = np.array(sorted(train_idx))
    n_train = len(train_idx)

    # Planetoid layout: the first len(y) rows of allx are the labeled train
    # nodes; tx rows are the test nodes; allx covers everything not in test.
    # We emit a permutation placing train first, then the rest, then test.
    rest = np.setdiff1d(np.arange(n), np.concatenate([train_idx, test_idx]))
    order = np.concatenate([train_idx, rest, test_idx])
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)

    feats_p = features[order]
    labels_p = onehot[order]
    graph_p = {int(inv[i]): [int(inv[j]) for j in nbrs]
               for i, nbrs in graph.items()}

    n_all = n - n_test
    payload = {
        "x": feats_p[:n_train].tocsr(),
        "y": labels_p[:n_train],
        "tx": feats_p[n_all:].tocsr(),
        "ty": labels_p[n_all:],
        "allx": feats_p[:n_all].tocsr(),
        "ally": labels_p[:n_all],
        "graph": graph_p,
    }
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    for part, obj in payload.items():
        with open(os.path.join(d, f"ind.{name}.{part}"), "wb") as f:
            pickle.dump(obj, f)
    np.savetxt(os.path.join(d, f"ind.{name}.test.index"),
               np.arange(n_all, n), fmt="%d")
    return d


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--name", type=str, default="pubmed_synth")
    p.add_argument("--n", type=int, default=19717)
    p.add_argument("--features", type=int, default=500)
    p.add_argument("--classes", type=int, default=3)
    p.add_argument("--out", type=str, default="data")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    d = make_dataset(args.name, args.n, args.features, args.classes, args.out,
                     args.seed)
    print(f"wrote synthetic Planetoid dataset to {d}")


if __name__ == "__main__":
    main()
