"""Graph operator / generator / container tests (property-based, SURVEY.md §4b)."""

import numpy as np
import pytest
import scipy.sparse as sp

from ndcn_tpu.graph import generators, operators
from ndcn_tpu.graph.sparse import as_operator, from_dense, from_scipy, matvec, to_dense_matrix


def _random_adj(n=30, p=0.2, seed=0):
    rng = np.random.RandomState(seed)
    a = (rng.rand(n, n) < p).astype(np.float64)
    a = np.maximum(a, a.T)
    np.fill_diagonal(a, 0.0)
    return a


def test_zipf_smoothing_spectrum_and_symmetry():
    a = _random_adj()
    op = operators.zipf_smoothing(a)
    np.testing.assert_allclose(op, op.T, atol=1e-6)
    eigs = np.linalg.eigvalsh(op.astype(np.float64))
    assert eigs.max() <= 1.0 + 1e-6  # (D+I)^-1/2 (A+I) (D+I)^-1/2 has spectrum in [-1, 1]
    assert eigs.min() >= -1.0 - 1e-6


def test_normalized_laplacian_psd():
    a = _random_adj()
    lap = operators.normalized_laplacian(a).astype(np.float64)
    eigs = np.linalg.eigvalsh((lap + lap.T) / 2)
    assert eigs.min() >= -1e-6
    assert eigs.max() <= 2.0 + 1e-6


def test_laplacian_rows_sum_zero():
    a = _random_adj()
    lap = operators.laplacian_dense(a)
    np.testing.assert_allclose(lap.sum(1), 0.0, atol=1e-5)


def test_sparse_dense_agree():
    a = _random_adj()
    dense = operators.zipf_smoothing(a)
    sparse = operators.zipf_smoothing_sparse(sp.csr_matrix(a)).todense()
    np.testing.assert_allclose(dense, np.asarray(sparse, np.float32), atol=1e-6)

    dense_nl = operators.normalized_laplacian(a)
    sparse_nl = operators.normalized_laplacian_sparse(sp.csr_matrix(a)).todense()
    np.testing.assert_allclose(dense_nl, np.asarray(sparse_nl, np.float32), atol=1e-6)


def test_zipf_alpha_limits():
    a = _random_adj()
    # alpha=1 → identity; alpha=0 → D^-1/2 A D^-1/2
    one = operators.zipf_smoothing_alpha(sp.csr_matrix(a), 1.0).todense()
    np.testing.assert_allclose(np.asarray(one), np.eye(a.shape[0]), atol=1e-6)
    zero = operators.zipf_smoothing_alpha(sp.csr_matrix(a), 0.0).todense()
    np.testing.assert_allclose(np.asarray(zero), operators.normalized_adj(a), atol=1e-6)


def test_self_loop_rejection():
    a = _random_adj()
    a[0, 0] = 1.0
    with pytest.raises(ValueError):
        operators.zipf_smoothing_sparse(sp.csr_matrix(a))


def test_row_normalization():
    a = _random_adj()
    rn = np.asarray(operators.row_normalization(sp.csr_matrix(a)).todense())
    rowsums = rn.sum(1)
    nz = a.sum(1) > 0
    np.testing.assert_allclose(rowsums[nz], 1.0, atol=1e-6)


def test_grid_8_neighbor():
    a = generators.grid_8_neighbor_adjacency(4)
    assert a.shape == (16, 16)
    np.testing.assert_allclose(a, a.T)
    # corner has 3 neighbors, center has 8
    assert a[0].sum() == 3
    assert a[5].sum() == 8
    assert np.trace(a) == 0


@pytest.mark.parametrize("kind", ["grid", "random", "power_law", "small_world", "community"])
def test_build_network(kind):
    a = generators.build_network(kind, 100, seed=0)
    assert a.shape[0] == a.shape[1]
    np.testing.assert_allclose(a, a.T, atol=0)
    assert np.trace(a) == 0
    # reproducible with the same seed (grid is deterministic anyway)
    b = generators.build_network(kind, 100, seed=0)
    np.testing.assert_allclose(a, b)


def test_ell_matvec_matches_dense():
    import jax.numpy as jnp
    a = _random_adj(40)
    x = np.random.RandomState(1).rand(40, 5).astype(np.float32)
    dense = from_dense(a)
    ell = from_scipy(sp.csr_matrix(a))
    y_dense = matvec(dense, jnp.asarray(x))
    y_ell = matvec(ell, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_ell), atol=1e-5)
    np.testing.assert_allclose(np.asarray(to_dense_matrix(ell)), a.astype(np.float32),
                               atol=1e-6)


def test_as_operator_switch():
    a = _random_adj(10)
    assert as_operator(a, sparse=False).__class__.__name__ == "DenseGraph"
    assert as_operator(a, sparse=True).__class__.__name__ == "CooGraph"
    assert as_operator(a, sparse=True, format="ell").__class__.__name__ == "EllGraph"
    assert as_operator(sp.csr_matrix(a), sparse=True,
                       format="bsr").__class__.__name__ == "BsrGraph"


def test_coo_matvec_matches_dense():
    import jax
    import jax.numpy as jnp
    a = _random_adj(50)
    x = np.random.RandomState(3).rand(50, 7).astype(np.float32)
    op = as_operator(a, sparse=True, format="coo")
    np.testing.assert_allclose(np.asarray(matvec(op, jnp.asarray(x))), a @ x,
                               atol=1e-5)
    g = jax.grad(lambda xx: (matvec(op, xx) ** 2).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), 2 * (a.T @ (a @ x)), rtol=1e-4,
                               atol=1e-4)


def test_grid_block_initial_value():
    x0 = generators.grid_block_initial_value(20)
    assert x0.shape == (400, 1)
    vals = set(np.unique(x0).tolist())
    assert vals == {0.0, 17.0, 20.0, 25.0}
    assert float(x0.sum()) > 0


def test_coo_custom_vjp_matches_dense_gradient():
    """The COO matvec's sorted-transpose backward (CooGraph.*_t) must equal the
    dense operator's gradient — on an ASYMMETRIC operator, so a wrong
    transpose (e.g. reusing the forward triplets) fails loudly."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    dense = (rng.rand(40, 40) * (rng.rand(40, 40) < 0.15)).astype(np.float32)
    np.fill_diagonal(dense, 0)
    op_coo = as_operator(sp.csr_matrix(dense), sparse=True, format="coo")
    op_dense = from_dense(dense)
    assert op_coo.rows_t is not None  # transpose triplets built

    x = jnp.asarray(rng.randn(40, 6).astype(np.float32))
    ct = jnp.asarray(rng.randn(40, 6).astype(np.float32))

    def loss(o, xx):
        return jnp.sum(matvec(o, xx) * ct)

    g_coo = jax.grad(loss, argnums=1)(op_coo, x)
    g_dense = jax.grad(loss, argnums=1)(op_dense, x)
    np.testing.assert_allclose(np.asarray(g_coo), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-5)
    # d=1 fast path too
    x1 = x[:, :1]; ct1 = ct[:, :1]
    g1 = jax.grad(lambda xx: jnp.sum(matvec(op_coo, xx) * ct1))(x1)
    gd1 = jax.grad(lambda xx: jnp.sum(matvec(op_dense, xx) * ct1))(x1)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(gd1), rtol=1e-5,
                               atol=1e-5)


def test_coo_operator_cotangent_is_nan_poisoned():
    """A learned-sparse-operator model differentiating through the COO custom
    VJP must fail LOUDLY: the vals cotangent is NaN, never a silent zero
    (advisor r2 finding; same policy as the fused dense kernel)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    dense = (rng.rand(20, 20) * (rng.rand(20, 20) < 0.2)).astype(np.float32)
    op = as_operator(sp.csr_matrix(dense), sparse=True, format="coo")
    x = jnp.asarray(rng.randn(20, 4).astype(np.float32))

    gv = jax.grad(lambda v: jnp.sum(matvec(op._replace(vals=v), x) ** 2))(
        op.vals)
    assert bool(jnp.all(jnp.isnan(gv)))
    # x-gradient stays finite through the same call
    gx = jax.grad(lambda xx: jnp.sum(matvec(op, xx) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(gx)))


def test_remaining_propagation_builders():
    """Direct formula checks for the builders no other test names:
    normalized_plus, zipf_smoothing_prime, first_order_gcn, residual_smoothing
    (reference Propagation methods, propagation.py:95-146)."""
    rng = np.random.RandomState(11)
    a = (rng.rand(30, 30) < 0.2).astype(np.float64)
    a = np.triu(a, 1)
    a = a + a.T
    acsr = sp.csr_matrix(a)
    eye = np.eye(30)

    def sym(m, d):
        inv = np.where(d > 0, d ** -0.5, 0.0)
        return inv[:, None] * m * inv[None, :]

    # normalized_plus: D^-1/2 (A+I) D^-1/2 with degrees of A (pre-self-loop)
    np.testing.assert_allclose(
        operators.normalized_plus(a), sym(a + eye, a.sum(1)), atol=1e-6)

    # zipf' = zipf - I
    zp = np.asarray(operators.zipf_smoothing_prime(acsr).todense())
    z = np.asarray(operators.zipf_smoothing_sparse(acsr).todense())
    np.testing.assert_allclose(zp, z - eye, atol=1e-12)

    # first-order GCN: I + D^-1/2 A D^-1/2
    fo = np.asarray(operators.first_order_gcn(acsr).todense())
    np.testing.assert_allclose(fo, eye + sym(a, a.sum(1)), atol=1e-12)

    # residual smoothing at delta=1 == zipf smoothing; spectrum stays bounded
    r1 = np.asarray(operators.residual_smoothing(acsr, 1.0).todense())
    np.testing.assert_allclose(r1, z, atol=1e-12)
    r_half = np.asarray(operators.residual_smoothing(acsr, 0.5).todense())
    ap = 0.5 * a + eye
    np.testing.assert_allclose(r_half, sym(ap, ap.sum(1)), atol=1e-12)
