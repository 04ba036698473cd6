"""The three physical dynamics the framework learns, as pure jittable RHSs.

Capability parity with the nn.Module RHS classes defined inline in the reference
drivers (SURVEY.md L3):

- heat diffusion     dX/dt = -k L X                     (heat_dynamics.py:186-204)
- mutualistic        dx_i/dt = b + x_i(1-x_i/k)(x_i/c-1)
                              + sum_j A_ij x_i x_j / (d + e x_i + h x_j)
                                                        (mutualistic_dynamics.py:186-232)
- gene regulation    dx_i/dt = -b x_i^f + sum_j A_ij x_j^h/(1+x_j^h)
                                                        (gene_dynamics.py:186-205)

TPU-native differences: the mutualistic interaction is computed in closed
vectorized form for ANY feature dimension — the reference loops over edges in
python for d>1 (mutualistic_dynamics.py:218-231) and materializes a dense n×n
outer product for d=1 (:206-216); here the dense path is one broadcasted
(n, n, d) contraction and the ELL path a (n, k, d) gather — no python loops, no
O(n²) memory on sparse graphs.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ndcn_tpu.graph.sparse import DenseGraph, EllGraph, GraphOperator, matvec


def heat_diffusion(op: GraphOperator, t, x, k: float = 1.0):
    """dX/dt = -k L X. ``op`` holds the Laplacian L; the sign lives here."""
    return -k * matvec(op, x)


def gene_dynamics(op: GraphOperator, t, x, b: float = 1.0, f: float = 1.0,
                  h: float = 2.0):
    """Michaelis-Menten regulatory dynamics; the coupling is one operator matvec."""
    activation = x ** h / (x ** h + 1.0)
    return -b * (x ** f) + matvec(op, activation)


def mutualistic_dynamics(op: GraphOperator, t, x, b: float = 0.1, k: float = 5.0,
                         c: float = 1.0, d: float = 5.0, e: float = 0.9,
                         h: float = 0.1, convention: str = "reference"):
    """Logistic growth with saturating pairwise mutualistic interaction.

    Interaction term for node i, feature dim m (paper form):
        sum_j A_ij * x_im * x_jm / (d + e*x_im + h*x_jm)

    ``convention``: the reference's two code paths disagree — its d=1 matrix
    trick (mutualistic_dynamics.py:206-216, the path every reference experiment
    actually runs since x0 is (n,1)) evaluates ``d + e*x_j + h*x_i``, while its
    docstring and its d>1 per-edge loop (:218-231) evaluate ``d + e*x_i + h*x_j``.
    'reference' (default) matches the operative d=1 behavior, 'paper' the written
    equation; with e=0.9, h=0.1 they produce different trajectories.
    """
    if convention == "reference":
        e, h = h, e
    elif convention != "paper":
        raise ValueError("convention must be 'reference' or 'paper'")
    f = b + x * (1.0 - x / k) * (x / c - 1.0)
    if isinstance(op, DenseGraph):
        xi = x[:, None, :]                       # (n, 1, dim)
        xj = x[None, :, :]                       # (1, n, dim)
        pair = (xi * xj) / (d + e * xi + h * xj)  # (n, n, dim)
        inter = jnp.einsum("ij,ijm->im", op.mat.astype(x.dtype), pair)
    else:
        assert isinstance(op, EllGraph)
        xj = jnp.take(x, op.cols, axis=0)        # (n, K, dim)
        xi = x[:, None, :]                       # (n, 1, dim)
        pair = (xi * xj) / (d + e * xi + h * xj)  # (n, K, dim)
        inter = jnp.einsum("nk,nkm->nm", op.vals.astype(x.dtype), pair)
    return f + inter


_RHS = {
    "heat": heat_diffusion,
    "mutualistic": mutualistic_dynamics,
    "gene": gene_dynamics,
}

DYNAMICS = tuple(_RHS)


def make_rhs(kind: str, op: GraphOperator, **params):
    """Bind a dynamics kind + operator into an ``f(t, x)`` for odeint."""
    if kind not in _RHS:
        raise ValueError(f"unknown dynamics {kind!r}; choose from {DYNAMICS}")
    return partial(_RHS[kind], op, **params)
