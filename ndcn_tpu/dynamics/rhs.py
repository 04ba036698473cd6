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

import jax
import jax.numpy as jnp

from ndcn_tpu.graph.sparse import (CooGraph, DenseGraph, EllGraph,
                                   GraphOperator, matvec)


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
    elif isinstance(op, CooGraph):
        inter = _coo_mutual_inter(op, x, float(d), float(e), float(h))
    else:
        assert isinstance(op, EllGraph), \
            "mutualistic couples through neighbor STATES; use a dense, ELL " \
            "or COO operator (BSR blocks do not expose per-edge endpoints)"
        xj = jnp.take(x, op.cols, axis=0)        # (n, K, dim)
        xi = x[:, None, :]                       # (n, 1, dim)
        pair = (xi * xj) / (d + e * xi + h * xj)  # (n, K, dim)
        inter = jnp.einsum("nk,nkm->nm", op.vals.astype(x.dtype), pair)
    return f + inter


# ------------------------------------------------- COO edge-list interaction
# The sparse-scalable form of the mutualistic coupling (VERDICT r2 missing #2):
# per edge (r, c, v): gather (x_r, x_c), evaluate the saturating pairwise term,
# sorted segment-sum over destinations. ELL pays O(n·max_degree·dim), which
# explodes on power-law degree distributions; this is O(nnz·dim). The custom
# VJP keeps BOTH backward scatter terms sorted: the x_i-side reduces over the
# forward triplets, the x_j-side over the transpose triplets (CooGraph.*_t) —
# exactly the CooGraph.matvec design. On TPU with a tile packing present, the
# reductions run through the Pallas segment-sum kernel (kernels/coo_spmv).
# Reference capability: the d>1 per-edge python loop at
# /root/reference/mutualistic_dynamics.py:218-231.


def _use_tiles(op: CooGraph) -> bool:
    from ndcn_tpu.graph.sparse import use_tiled_kernel

    return op.tiles is not None and use_tiled_kernel()


def _feature_major(x: jnp.ndarray):
    from ndcn_tpu.kernels.coo_spmv import sublane_pad

    d = x.shape[1]
    d_sub = sublane_pad(d)
    return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, d_sub - d))).T


def _tiled_weighted_reduce(tiles, weightsT, n, d, out_dtype):
    """Σ_slot vals·weights per destination row via the Pallas kernel;
    weightsT (d_sub, S·E) feature-major."""
    from ndcn_tpu.kernels.coo_spmv import _reduce_call

    out = _reduce_call(tiles, weightsT)[:, :n]
    return out[:d].T.astype(out_dtype)


def _tile_endpoints(tiles, xT):
    """(x_dst, x_src) per tile slot, feature-major: dst = the slot's global
    row (tile·R + local_row), src = its column."""
    rows_g = jnp.repeat(tiles.tile_of, tiles.E) * tiles.R + tiles.local_rows
    return jnp.take(xT, rows_g, axis=1), jnp.take(xT, tiles.cols, axis=1), rows_g


def _safe_div(num, den):
    # pad slots (val 0) can hit a zero denominator; 0·inf would poison the sum
    return num / jnp.where(den == 0.0, 1.0, den)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _coo_mutual_inter(op: CooGraph, x, d: float, e: float, h: float):
    return _coo_mutual_impl(op, x, d, e, h)


def _coo_mutual_impl(op, x, d, e, h):
    if _use_tiles(op):
        xT = _feature_major(x)
        xi, xj, _ = _tile_endpoints(op.tiles, xT)
        pair = _safe_div(xi * xj, d + e * xi + h * xj)
        return _tiled_weighted_reduce(op.tiles, pair, op.n, x.shape[1], x.dtype)
    xi = jnp.take(x, op.rows, axis=0)
    xj = jnp.take(x, op.cols, axis=0)
    contrib = op.vals.astype(x.dtype)[:, None] * _safe_div(
        xi * xj, d + e * xi + h * xj)
    return jax.ops.segment_sum(contrib, op.rows, num_segments=op.n,
                               indices_are_sorted=True)


def _coo_mutual_fwd(op, x, d, e, h):
    return _coo_mutual_impl(op, x, d, e, h), (op, x)


def _coo_mutual_bwd(d, e, h, res, g):
    # per-edge partials of p = x_i x_j / D, D = d + e x_i + h x_j:
    #   ∂p/∂x_i = x_j (d + h x_j) / D²   (accumulates at the edge's ROW)
    #   ∂p/∂x_j = x_i (d + e x_i) / D²   (accumulates at the edge's COLUMN —
    #                                     reduced over the TRANSPOSE ordering)
    op, x = res
    if _use_tiles(op):
        xT = _feature_major(x)
        gT = _feature_major(g)
        n, dim = x.shape
        # x_i-side over the forward tiles (dst = row)
        xi, xj, rows_g = _tile_endpoints(op.tiles, xT)
        Df = d + e * xi + h * xj
        gi = jnp.take(gT, rows_g, axis=1)
        wi = gi * _safe_div(xj * (d + h * xj), Df * Df)
        dx = _tiled_weighted_reduce(op.tiles, wi, n, dim, x.dtype)
        # x_j-side over the transpose tiles: slot dst = original column,
        # slot col = original row (where the cotangent lives)
        xj_t, xi_t, _ = _tile_endpoints(op.tiles_t, xT)
        Dt = d + e * xi_t + h * xj_t
        gt = jnp.take(gT, op.tiles_t.cols, axis=1)
        wj = gt * _safe_div(xi_t * (d + e * xi_t), Dt * Dt)
        dx = dx + _tiled_weighted_reduce(op.tiles_t, wj, n, dim, x.dtype)
    else:
        xi = jnp.take(x, op.rows, axis=0)
        xj = jnp.take(x, op.cols, axis=0)
        Df = d + e * xi + h * xj
        gi = jnp.take(g, op.rows, axis=0)
        term_i = op.vals.astype(x.dtype)[:, None] * gi * _safe_div(
            xj * (d + h * xj), Df * Df)
        dx = jax.ops.segment_sum(term_i, op.rows, num_segments=op.n,
                                 indices_are_sorted=True)
        xi_t = jnp.take(x, op.cols_t, axis=0)   # original row endpoint
        xj_t = jnp.take(x, op.rows_t, axis=0)   # original column endpoint
        Dt = d + e * xi_t + h * xj_t
        gt = jnp.take(g, op.cols_t, axis=0)
        term_j = op.vals_t.astype(x.dtype)[:, None] * gt * _safe_div(
            xi_t * (d + e * xi_t), Dt * Dt)
        dx = dx + jax.ops.segment_sum(term_j, op.rows_t, num_segments=op.n,
                                      indices_are_sorted=True)
    from ndcn_tpu.graph.sparse import poison_coo_cotangent

    return poison_coo_cotangent(op), dx


_coo_mutual_inter.defvjp(_coo_mutual_fwd, _coo_mutual_bwd)


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
