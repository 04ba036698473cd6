"""Synthetic graph construction (host-side, networkx/numpy).

Capability parity with the reference's graph zoo (heat_dynamics.py:83-114,
utils_in_learn_dynamics.py:137-157, 212-247): 8-neighbor grid, Erdős–Rényi,
Barabási–Albert, Newman–Watts–Strogatz, random-partition community graphs, and
community/degree node reordering. The grid builder is vectorized instead of the
reference's O(n·8) python loop.
"""

from __future__ import annotations

from typing import Optional

import networkx as nx
import numpy as np
import scipy.sparse as sp

NETWORKS = ("grid", "random", "power_law", "small_world", "community")
LAYOUTS = ("community", "degree", None)


def grid_8_neighbor_adjacency(side: int) -> np.ndarray:
    """Adjacency of a side×side grid where each cell connects to its 8 neighbors."""
    side = int(side)
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    xs, ys = xs.ravel(), ys.ravel()  # node i = x * side + y
    a = np.zeros((side * side, side * side), dtype=np.float32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nxs, nys = xs + dx, ys + dy
            valid = (nxs >= 0) & (nxs < side) & (nys >= 0) & (nys < side)
            a[xs[valid] * side + ys[valid], nxs[valid] * side + nys[valid]] = 1.0
    return a


def generate_node_mapping(g: nx.Graph, kind: Optional[str] = None):
    """Node relabeling by degree rank or modularity-community blocks
    (utils_in_learn_dynamics.py:212-230)."""
    if kind == "degree":
        ranked = sorted(g.degree, key=lambda kv: kv[1], reverse=True)
        return {node: i for i, (node, _) in enumerate(ranked)}
    if kind == "community":
        blocks = list(nx.algorithms.community.greedy_modularity_communities(g))
        order = [node for block in blocks for node in block]
        return {node: i for i, node in enumerate(order)}
    return None


def reorder_nodes(g: nx.Graph, kind: Optional[str] = None) -> nx.Graph:
    """Permute node ids so adjacency plots show block structure
    (utils_in_learn_dynamics.py:233-247)."""
    mapping = generate_node_mapping(g, kind)
    if mapping is None:
        return g
    coo = nx.to_scipy_sparse_array(g, format="coo")
    row = np.array([mapping[r] for r in coo.row], dtype=np.int64)
    col = np.array([mapping[c] for c in coo.col], dtype=np.int64)
    permuted = sp.coo_matrix((coo.data, (row, col)), shape=coo.shape)
    return nx.from_scipy_sparse_array(permuted)


def build_network(kind: str, n: int, seed: int = 0,
                  layout: Optional[str] = "community") -> np.ndarray:
    """The --network switch of the dynamics drivers (heat_dynamics.py:83-114).

    Returns a dense float32 adjacency matrix. Parameters mirror the reference:
    random: ER(p=.1); power_law: BA(m=5); small_world: NWS(400, 5, .5) — note the
    reference hardcodes 400 nodes for small_world regardless of --n; community:
    random_partition([n/3, n/3, n/4, rest], .25, .01). The grid uses ceil(sqrt(n))²
    nodes with 8-neighbor connectivity and no reordering.
    """
    if kind == "grid":
        side = int(np.ceil(np.sqrt(n)))
        return grid_8_neighbor_adjacency(side)
    if kind == "random":
        g = nx.erdos_renyi_graph(n, 0.1, seed=seed)
    elif kind == "power_law":
        g = nx.barabasi_albert_graph(n, 5, seed=seed)
    elif kind == "small_world":
        g = nx.newman_watts_strogatz_graph(400, 5, 0.5, seed=seed)
    elif kind == "community":
        n1 = n2 = int(n / 3)
        n3 = int(n / 4)
        n4 = n - n1 - n2 - n3
        g = nx.random_partition_graph([n1, n2, n3, n4], 0.25, 0.01, seed=seed)
    else:
        raise ValueError(f"unknown network kind {kind!r}; choose from {NETWORKS}")
    g = reorder_nodes(g, layout)
    return np.asarray(nx.to_numpy_array(g), dtype=np.float32)


def girvan_newman_labels(adj: np.ndarray, n_splits: int = 10) -> np.ndarray:
    """Community labels via Girvan-Newman edge-betweenness splitting
    (reference utils.py:26-48, a side-experiment used to relabel citation graphs).

    Takes ``n_splits`` steps of the divisive hierarchy and labels each node by
    its community index (1-based, like the reference)."""
    g = nx.from_numpy_array(np.asarray(adj))
    gen = nx.algorithms.community.girvan_newman(g)
    communities = None
    for _ in range(n_splits):
        try:
            communities = next(gen)
        except StopIteration:
            break
    labels = np.zeros(g.number_of_nodes(), dtype=np.int32)
    if communities is not None:
        for i, block in enumerate(communities, start=1):
            for node in block:
                labels[node] = i
    return labels


def grid_block_initial_value(side: int) -> np.ndarray:
    """The three-hot-block initial condition of the dynamics scripts
    (heat_dynamics.py:178-183): 25/20/17-valued rectangles on the side×side grid.
    Returns an (side*side, 1) float32 column."""
    x0 = np.zeros((side, side), dtype=np.float32)
    x0[int(0.05 * side):int(0.25 * side), int(0.05 * side):int(0.25 * side)] = 25.0
    x0[int(0.45 * side):int(0.75 * side), int(0.45 * side):int(0.75 * side)] = 20.0
    x0[int(0.05 * side):int(0.25 * side), int(0.35 * side):int(0.65 * side)] = 17.0
    return x0.reshape(-1, 1)
