"""Pallas kernel tests (interpret mode on CPU; the real TPU path is exercised by
bench.py and the TPU smoke runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ndcn_tpu.graph.sparse import as_operator, matvec, to_dense_matrix
from ndcn_tpu.kernels import bsr_spmm, bsr_spmm_raw, from_scipy_bsr, fused_graph_rhs


def _rand_sparse(n, density=0.02, seed=0):
    rng = np.random.RandomState(seed)
    return sp.random(n, n, density=density, random_state=rng, format="csr"), rng


def test_bsr_spmm_forward():
    a, rng = _rand_sparse(500)
    x = rng.rand(500, 70).astype(np.float32)
    y = bsr_spmm_raw(from_scipy_bsr(a), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), a @ x, atol=1e-4)


def test_bsr_spmm_gradient():
    a, rng = _rand_sparse(300, density=0.05, seed=1)
    x = rng.rand(300, 40).astype(np.float32)
    A, At = from_scipy_bsr(a), from_scipy_bsr(a.T.tocsr())

    g = jax.grad(lambda xx: jnp.sum(bsr_spmm(A, At, xx) ** 2))(jnp.asarray(x))
    g_ref = 2 * (a.T @ (a @ x))
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-4, atol=1e-4)


def test_bsr_operator_roundtrip():
    a, rng = _rand_sparse(200, density=0.05, seed=2)
    op = as_operator(a, sparse=True, format="bsr")
    x = rng.rand(200, 16).astype(np.float32)
    np.testing.assert_allclose(np.asarray(matvec(op, jnp.asarray(x))), a @ x,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(to_dense_matrix(op)),
                               np.asarray(a.todense()), atol=1e-6)


def test_bsr_rectangular_tail():
    """Node counts not divisible by the 128 block must round-trip exactly."""
    a, rng = _rand_sparse(257, density=0.05, seed=3)
    x = rng.rand(257, 5).astype(np.float32)
    y = bsr_spmm_raw(from_scipy_bsr(a), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), a @ x, atol=1e-4)


def test_fused_graph_rhs():
    rng = np.random.RandomState(0)
    a = rng.rand(400, 400).astype(np.float32)
    h = rng.rand(400, 20).astype(np.float32)
    w = rng.randn(20, 20).astype(np.float32)
    b = rng.randn(20).astype(np.float32)
    y = fused_graph_rhs(jnp.asarray(a), jnp.asarray(h), jnp.asarray(w),
                        jnp.asarray(b))
    ref = np.maximum((a @ h) @ w + b, 0)
    # rtol matters: outputs reach ~300 and the kernel's f32 accumulation order
    # differs from numpy's, so abs deviations up to ~1e-3 are expected
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4, rtol=1e-4)


def test_fused_graph_rhs_unaligned():
    rng = np.random.RandomState(1)
    n, k = 275, 13
    a = rng.rand(n, n).astype(np.float32)
    h = rng.rand(n, k).astype(np.float32)
    w = rng.randn(k, k).astype(np.float32)
    b = rng.randn(k).astype(np.float32)
    y = fused_graph_rhs(jnp.asarray(a), jnp.asarray(h), jnp.asarray(w),
                        jnp.asarray(b))
    ref = np.maximum((a @ h) @ w + b, 0)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4, rtol=1e-4)


def test_fused_ode_rhs_gradients():
    """The differentiable fused RHS must match the unfused math and grads."""
    from ndcn_tpu.kernels.fused_rhs import fused_ode_rhs

    rng = np.random.RandomState(2)
    a = rng.rand(64, 64).astype(np.float32)
    h = rng.randn(64, 16).astype(np.float32)
    w = rng.randn(16, 16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)

    def ref(h_, w_, b_):
        return jax.nn.relu((jnp.asarray(a) @ h_) @ w_ + b_)

    out = fused_ode_rhs(jnp.asarray(a), jnp.asarray(h), jnp.asarray(w),
                        jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref(jnp.asarray(h), jnp.asarray(w),
                                              jnp.asarray(b))), atol=1e-5)

    g_f = jax.grad(lambda hh, ww, bb: jnp.sum(
        fused_ode_rhs(jnp.asarray(a), hh, ww, bb) ** 2), argnums=(0, 1, 2))(
        jnp.asarray(h), jnp.asarray(w), jnp.asarray(b))
    g_r = jax.grad(lambda hh, ww, bb: jnp.sum(ref(hh, ww, bb) ** 2),
                   argnums=(0, 1, 2))(jnp.asarray(h), jnp.asarray(w),
                                      jnp.asarray(b))
    for gf, gr in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4,
                                   atol=1e-4)


def test_ndcn_forward_fused_matches_unfused():
    from ndcn_tpu.graph.sparse import from_dense
    from ndcn_tpu.models import init_ndcn, ndcn_forward

    rng = np.random.RandomState(0)
    a = rng.rand(40, 40).astype(np.float32)
    op = from_dense(a)
    x0 = jnp.asarray(rng.rand(40, 1), jnp.float32)
    vt = jnp.linspace(0.0, 1.0, 6)
    params = init_ndcn(jax.random.PRNGKey(3), 1, 8, 1)
    out_u, _ = ndcn_forward(params, op, vt, x0, method="rk4")
    out_f, _ = ndcn_forward(params, op, vt, x0, method="rk4", fused=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u), atol=1e-4)


def test_bsr_fused_rhs_forward():
    """Fused sparse RHS == relu((A @ x) @ w + b) elementwise."""
    from ndcn_tpu.kernels.bsr_spmm import bsr_fused_rhs

    a, rng = _rand_sparse(300, density=0.05, seed=3)
    d = 40
    x = rng.rand(300, d).astype(np.float32)
    w = rng.randn(d, d).astype(np.float32) * 0.3
    b = rng.randn(d).astype(np.float32) * 0.1
    A, At = from_scipy_bsr(a), from_scipy_bsr(a.T.tocsr())
    y = bsr_fused_rhs(A, At, jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    expected = np.maximum((a @ x) @ w + b, 0.0)
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-4)


def test_bsr_fused_rhs_gradients():
    """VJP of the fused sparse RHS vs autodiff of the unfused expression."""
    from ndcn_tpu.kernels.bsr_spmm import bsr_fused_rhs

    a, rng = _rand_sparse(200, density=0.05, seed=4)
    d = 24
    x = jnp.asarray(rng.rand(200, d).astype(np.float32))
    w = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    A, At = from_scipy_bsr(a), from_scipy_bsr(a.T.tocsr())
    a_dense = jnp.asarray(a.todense().astype(np.float32))

    def fused(x_, w_, b_):
        return jnp.sum(bsr_fused_rhs(A, At, x_, w_, b_) ** 2)

    def ref(x_, w_, b_):
        return jnp.sum(jnp.maximum((a_dense @ x_) @ w_ + b_, 0.0) ** 2)

    gf = jax.grad(fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(ref, argnums=(0, 1, 2))(x, w, b)
    for got, want in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, rtol=1e-3)


def test_ndcn_forward_fused_bsr_matches_unfused():
    """ndcn_forward(fused=True) over a BsrGraph == the unfused sparse path."""
    from ndcn_tpu.graph import generators, operators
    from ndcn_tpu.models import init_ndcn, ndcn_forward

    n = 150
    adj = generators.build_network("random", n, seed=6)
    om = operators.normalized_laplacian(adj)
    op_bsr = as_operator(sp.csr_matrix(om), sparse=True, format="bsr")
    x0 = jnp.asarray(np.random.RandomState(0).rand(n, 1), jnp.float32)
    vt = jnp.asarray(np.linspace(0.0, 1.0, 5), jnp.float32)
    params = init_ndcn(jax.random.PRNGKey(0), 1, 16, 1)

    out_f, stats_f = ndcn_forward(params, op_bsr, vt, x0, method="rk4",
                                  fused=True)
    out_u, stats_u = ndcn_forward(params, op_bsr, vt, x0, method="rk4",
                                  fused=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=1e-4, rtol=1e-4)


def test_pallas_interpret_honors_default_device():
    """The interpret decision must follow jax.default_device overrides — the
    drivers' step-budget probes run solves under default_device(cpu) while the
    process backend stays the TPU (see kernels/platform.py)."""
    from ndcn_tpu.kernels.platform import pallas_interpret

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        assert pallas_interpret() is True
    # outside the scope the decision falls back to the process backend
    assert pallas_interpret() == (jax.default_backend() != "tpu")


def test_fused_rhs_operator_cotangent_is_loud():
    """Differentiating the fused kernel wrt the operator must NOT return silent
    zeros (a learned-operator model would look like a vanishing gradient) —
    the cotangent is NaN-poisoned; such models belong on the XLA matmul path."""
    from ndcn_tpu.kernels.fused_rhs import fused_ode_rhs

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(16, 16).astype(np.float32))
    h = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    da = jax.grad(lambda aa: jnp.sum(fused_ode_rhs(aa, h, w, b)))(a)
    assert np.all(np.isnan(np.asarray(da)))
    # ...while the supported cotangents stay clean
    dh = jax.grad(lambda hh: jnp.sum(fused_ode_rhs(a, hh, w, b)))(h)
    assert np.all(np.isfinite(np.asarray(dh)))


def test_bsr_dtype_rejected():
    import pytest
    import scipy.sparse as sp
    from ndcn_tpu.graph.sparse import as_operator

    m = sp.random(64, 64, density=0.05, format="csr", random_state=0)
    with pytest.raises(ValueError, match="float32 only"):
        as_operator(m, sparse=True, format="bsr", dtype=jnp.bfloat16)


def test_fused_dispatch_raises_when_impossible():
    """fused=True on a non-fusable configuration must fail at trace time, not
    warn and silently run the unfused path (VERDICT r2 item 9)."""
    import pytest
    from ndcn_tpu.graph.sparse import as_operator, from_dense
    from ndcn_tpu.models import init_ndcn, ndcn_forward

    rng = np.random.RandomState(0)
    a = rng.rand(24, 24).astype(np.float32)
    x0 = jnp.asarray(rng.rand(24, 1), jnp.float32)
    vt = jnp.linspace(0.0, 1.0, 4)
    params = init_ndcn(jax.random.PRNGKey(0), 1, 8, 1)

    # ELL operator: no fused kernel exists for it
    op_ell = as_operator(sp.csr_matrix(a * (a > 0.8)), sparse=True, format="ell")
    with pytest.raises(ValueError, match="fused=True requires"):
        ndcn_forward(params, op_ell, vt, x0, method="rk4", fused=True)
    # dropout on: RHS is not the fusable relu((A h)W+b) form
    op = from_dense(a)
    with pytest.raises(ValueError, match="fused=True requires"):
        ndcn_forward(params, op, vt, x0, method="rk4", fused=True,
                     dropout=0.5, rng=jax.random.PRNGKey(1))
    # 'auto' on the same configs runs the standard path silently
    out, _ = ndcn_forward(params, op_ell, vt, x0, method="rk4", fused="auto")
    assert np.all(np.isfinite(np.asarray(out)))


def test_fused_auto_never_picks_parity_breaking_path():
    """fused='auto' must produce the same numbers as fused=False on every
    configuration (the heuristic may only change WHICH correct kernel runs,
    VERDICT r2 item 5)."""
    from ndcn_tpu.graph.sparse import as_operator, from_dense
    from ndcn_tpu.models import init_ndcn, ndcn_forward

    rng = np.random.RandomState(1)
    a = rng.rand(40, 40).astype(np.float32)
    x0 = jnp.asarray(rng.rand(40, 1), jnp.float32)
    vt = jnp.linspace(0.0, 1.0, 5)
    configs = [
        dict(op=from_dense(a), kw={}),
        dict(op=from_dense(a), kw=dict(no_control=True)),
        dict(op=as_operator(sp.csr_matrix(a * (a > 0.7)), sparse=True,
                            format="bsr"), kw={}),
        dict(op=from_dense(a), kw=dict(dropout=0.3,
                                       rng=jax.random.PRNGKey(2))),
    ]
    for cfg in configs:
        p = init_ndcn(jax.random.PRNGKey(3), 1, 8, 1,
                      no_control=cfg["kw"].get("no_control", False))
        out_a, _ = ndcn_forward(p, cfg["op"], vt, x0, method="rk4",
                                fused="auto", **cfg["kw"])
        out_u, _ = ndcn_forward(p, cfg["op"], vt, x0, method="rk4",
                                fused=False, **cfg["kw"])
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_u),
                                   atol=2e-4)


def _random_power_law_coo(n, m, seed, d=20):
    """Row-sorted COO with hub rows and empty rows (the layouts that break
    naive slicing), plus a dense oracle."""
    rng = np.random.RandomState(seed)
    rows = rng.zipf(1.5, m) % n
    cols = rng.randint(0, n, m)
    vals = rng.randn(m).astype(np.float32)
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    a.sum_duplicates()
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    return a, x, rng


def test_coo_tiled_spmv_matches_dense():
    """Pallas sliced-tile segment-sum SpMV == dense A@X, forward and VJP, on a
    power-law graph with hub rows (slice splitting) and empty row tiles, at an
    n that is not a multiple of the tile height (VERDICT r2 item 1)."""
    from ndcn_tpu.graph.sparse import from_scipy_coo
    from ndcn_tpu.kernels.coo_spmv import tiled_spmv

    a, x, rng = _random_power_law_coo(300, 3000, seed=0)
    op = from_scipy_coo(a, tiled=True)
    assert op.tiles is not None and op.tiles_t is not None
    ref = np.asarray(a @ np.asarray(x))
    # tolerances sized for the kernel's 2-term bf16 split-accumulation
    # (~1.5e-5 relative per contrib element, random-walk over hub-row fan-in;
    # interpret mode executes the same numerics as the TPU)
    scale = np.abs(ref).max()
    got = np.asarray(tiled_spmv(op.tiles, op.tiles_t, x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4 * scale)

    ct = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    g = jax.grad(lambda xx: jnp.sum(tiled_spmv(op.tiles, op.tiles_t, xx) * ct))(x)
    g_ref = np.asarray(a.T @ np.asarray(ct))
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-4,
                               atol=1e-4 * np.abs(g_ref).max())

    # narrow feature dims pad sublanes, not lanes
    for d in (3, 8):
        got_d = np.asarray(tiled_spmv(op.tiles, op.tiles_t, x[:, :d]))
        np.testing.assert_allclose(got_d, ref[:, :d], rtol=1e-4,
                                   atol=1e-4 * scale)


def test_coo_wide_gather_matches_narrow(monkeypatch):
    """GATHER_WIDE routes the gather through a row-major (n, 128) table and
    the wide reduction kernel; forward and VJP must match the narrow
    feature-major path to split-accumulation tolerance, in split2 and bf16
    precision. The mode is a measured null knob — slower end to end at
    1M/11M/d=20 (results/microbench_wide_gather_1m.json) — kept as the
    verified record of the probe; this test pins its correctness."""
    import ndcn_tpu.kernels.coo_spmv as ck
    from ndcn_tpu.graph.sparse import from_scipy_coo
    from ndcn_tpu.kernels.coo_spmv import spmv_T, sublane_pad, tiled_spmv

    a, x, rng = _random_power_law_coo(300, 3000, seed=4)
    op = from_scipy_coo(a, tiled=True)
    ref = np.asarray(a @ np.asarray(x))
    scale = np.abs(ref).max()
    ct = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    g_ref = np.asarray(a.T @ np.asarray(ct))

    d_sub = sublane_pad(x.shape[1])
    xT = jnp.pad(x, ((0, 0), (0, d_sub - x.shape[1]))).T

    for precision in ("split2", "bf16"):
        monkeypatch.setattr(ck, "GATHER_BF16", precision == "bf16")
        tol = 2e-2 if precision == "bf16" else 1e-4
        monkeypatch.setattr(ck, "GATHER_WIDE", True)
        got = np.asarray(tiled_spmv(op.tiles, op.tiles_t, x))
        np.testing.assert_allclose(got, ref, rtol=tol, atol=tol * scale)
        # the feature-major entry (what the million-node solve calls)
        gotT = np.asarray(spmv_T(op.tiles, op.tiles_t, xT))
        np.testing.assert_allclose(gotT[: x.shape[1]].T, ref,
                                   rtol=tol, atol=tol * scale)
        g = jax.grad(lambda xx: jnp.sum(
            tiled_spmv(op.tiles, op.tiles_t, xx) * ct))(x)
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=tol,
                                   atol=tol * np.abs(g_ref).max())
        # wide == narrow at matching precision. Keep the tight 1e-5 bound for
        # f32 only: in the bf16 branch the two kernels contract the edge dim
        # from differently-laid-out operands, so on a real TPU the f32 partial
        # accumulation order can differ — hold them to the per-precision tol
        # instead (CPU interpret mode passes 1e-5, but the suite should stay
        # green on-device too).
        monkeypatch.setattr(ck, "GATHER_WIDE", False)
        narrow = np.asarray(tiled_spmv(op.tiles, op.tiles_t, x))
        cross_tol = 1e-5 if precision != "bf16" else tol
        np.testing.assert_allclose(got, narrow, rtol=cross_tol,
                                   atol=cross_tol * scale)


def test_coo_tiled_operator_cotangent_is_nan_poisoned():
    from ndcn_tpu.graph.sparse import from_scipy_coo
    from ndcn_tpu.kernels.coo_spmv import tiled_spmv

    a, x, _ = _random_power_law_coo(140, 900, seed=1, d=4)
    op = from_scipy_coo(a, tiled=True)
    gv = jax.grad(lambda v: jnp.sum(
        tiled_spmv(op.tiles._replace(vals=v), op.tiles_t, x) ** 2))(
        op.tiles.vals)
    assert bool(jnp.all(jnp.isnan(gv)))


def test_coo_tile_packing_properties():
    """pack_tiles: every edge lands in a slice of its own row tile, pad slots
    are zero-valued, tiles with zero edges still get a zeroing first slice."""
    from ndcn_tpu.kernels.coo_spmv import pack_tiles

    rng = np.random.RandomState(2)
    n = 400
    # one hub row with > E edges, a stretch of empty rows
    rows = np.sort(np.concatenate([
        np.full(1500, 7), rng.randint(256, 384, 500)])).astype(np.int32)
    cols = rng.randint(0, n, rows.size).astype(np.int32)
    vals = rng.rand(rows.size).astype(np.float32)
    t = pack_tiles(rows, cols, vals, n, tile_rows=128, slice_edges=512)
    S = int(t.tile_of.shape[0])
    assert t.n_pad == 512 and S >= 4  # hub tile alone needs >= 3 slices
    tile_of = np.asarray(t.tile_of)
    first = np.asarray(t.first)
    # slices of one tile are consecutive, each tile has exactly one first
    assert np.all(np.diff(tile_of) >= 0)
    for tile in range(4):
        sel = tile_of == tile
        assert sel.any() and first[sel][0] == 1 and first[sel][1:].sum() == 0
    # per-slot invariants: local rows within tile height, values conserved
    lr = np.asarray(t.local_rows).reshape(S, t.E)
    vv = np.asarray(t.vals).reshape(S, t.E)
    assert lr.min() >= 0 and lr.max() < 128
    assert np.isclose(vv.sum(), vals.sum())


def test_matvec_auto_tiles_above_threshold(monkeypatch):
    """from_scipy_coo packs tiles automatically above the edge threshold and
    CPU matvec still routes the XLA path (kernel is TPU-execution only)."""
    import ndcn_tpu.graph.sparse as gs

    a, x, _ = _random_power_law_coo(200, 2500, seed=3, d=6)
    monkeypatch.setattr(gs, "TILE_PACK_THRESHOLD", 1000)
    op = gs.from_scipy_coo(a)
    assert op.tiles is not None
    got = np.asarray(gs.matvec(op, x))   # CPU: XLA segment-sum path
    np.testing.assert_allclose(got, np.asarray(a @ np.asarray(x)),
                               rtol=1e-5, atol=1e-5)


def test_ndcn_trains_through_tiled_coo_kernel(monkeypatch):
    """End-to-end: the full differentiable-dopri5 NDCN train step over a
    tile-packed COO operator routed through the Pallas kernel (interpret mode
    on CPU) matches the XLA segment-sum path — the exact program the 200k-node
    demo runs on TPU."""
    import ndcn_tpu.graph.sparse as gs
    from ndcn_tpu.models import init_ndcn, ndcn_forward

    rng = np.random.RandomState(0)
    n = 80
    dense = (rng.rand(n, n) * (rng.rand(n, n) < 0.1)).astype(np.float32)
    np.fill_diagonal(dense, 0)
    op = gs.from_scipy_coo(sp.csr_matrix(dense), tiled=True)
    x0 = jnp.asarray(rng.rand(n, 1), jnp.float32)
    vt = jnp.linspace(0.0, 1.0, 5)
    params = init_ndcn(jax.random.PRNGKey(0), 1, 8, 1)
    target = jnp.asarray(rng.rand(5, n, 1), jnp.float32)

    def loss(p):
        out, stats = ndcn_forward(p, op, vt, x0, rtol=0.01, atol=0.001,
                                  method="dopri5", max_steps=24)
        return jnp.where(stats.success, jnp.mean(jnp.abs(out - target)),
                         jnp.nan)

    l_xla, g_xla = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(gs, "use_tiled_kernel", lambda: True)
    l_ker, g_ker = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l_ker))
    np.testing.assert_allclose(float(l_ker), float(l_xla), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_ker),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)


def test_tiled_coo_d1_routes_flat_path(monkeypatch):
    """d=1 states keep the flat (nnz,) XLA path even when tiles are present
    and the kernel dispatch is on — (8, E)-padded kernel inputs would waste 8x
    on the physics state, and the flat path is already layout-optimal.
    Forward and gradient must match the dense oracle."""
    import ndcn_tpu.graph.sparse as gs

    rng = np.random.RandomState(5)
    n = 120
    dense = (rng.rand(n, n) * (rng.rand(n, n) < 0.15)).astype(np.float32)
    op = gs.from_scipy_coo(sp.csr_matrix(dense), tiled=True)
    monkeypatch.setattr(gs, "use_tiled_kernel", lambda: True)
    x1 = jnp.asarray(rng.rand(n, 1), jnp.float32)
    y = gs.matvec(op, x1)
    np.testing.assert_allclose(np.asarray(y), dense @ np.asarray(x1),
                               rtol=1e-5, atol=1e-5)
    ct = jnp.asarray(rng.randn(n, 1).astype(np.float32))
    g = jax.grad(lambda xx: jnp.sum(gs.matvec(op, xx) * ct))(x1)
    np.testing.assert_allclose(np.asarray(g), dense.T @ np.asarray(ct),
                               rtol=1e-5, atol=1e-5)


def test_feature_major_layout_matches_nd(monkeypatch):
    """layout='feature_major' (the (d_sub, n) solve state for tiled-COO
    operators at scale) must match the (n, d) layout: bitwise on fixed-grid
    forwards/gradients, and to solver-noise on the adaptive path (its error
    norm spans d_sub/d more elements — zero rows — so step SIZES differ
    slightly; docstring in models/ndcn.ndcn_forward)."""
    import ndcn_tpu.graph.sparse as gs
    from ndcn_tpu.models import init_ndcn, ndcn_forward

    rng = np.random.RandomState(0)
    n = 90
    dense = (rng.rand(n, n) * (rng.rand(n, n) < 0.1)).astype(np.float32)
    np.fill_diagonal(dense, 0)
    op = gs.from_scipy_coo(sp.csr_matrix(dense), tiled=True)
    x0 = jnp.asarray(rng.rand(n, 1), jnp.float32)
    vt = jnp.linspace(0.0, 1.0, 5)
    params = init_ndcn(jax.random.PRNGKey(0), 1, 20, 1)
    target = jnp.asarray(rng.rand(5, n, 1), jnp.float32)
    monkeypatch.setattr(gs, "use_tiled_kernel", lambda: True)

    def loss(p, layout, method):
        out, stats = ndcn_forward(p, op, vt, x0, rtol=0.01, atol=0.001,
                                  method=method, max_steps=24, layout=layout)
        l = jnp.mean(jnp.abs(out - target))
        return l if stats is None else jnp.where(stats.success, l, jnp.nan)

    # fixed grid: identical math, no controller in the way
    g_nd = jax.grad(lambda p: loss(p, "nd", "rk4"))(params)
    g_fm = jax.grad(lambda p: loss(p, "feature_major", "rk4"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_nd),
                    jax.tree_util.tree_leaves(g_fm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
    # adaptive: same solution up to tolerance-level noise
    l_nd = float(loss(params, "nd", "dopri5"))
    l_fm = float(loss(params, "feature_major", "dopri5"))
    assert np.isfinite(l_fm)
    np.testing.assert_allclose(l_fm, l_nd, rtol=1e-3)
    # terminal variant round-trips the transpose correctly
    out_t, _ = ndcn_forward(params, op, vt, x0, method="rk4", terminal=True,
                            layout="feature_major")
    out_n, _ = ndcn_forward(params, op, vt, x0, method="rk4", terminal=True,
                            layout="nd")
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_n), atol=1e-6)


def test_feature_major_auto_predicate(monkeypatch):
    """'auto' picks feature_major exactly for tiled-COO + unfused full RHS +
    lane-padded hidden width on TPU execution."""
    import ndcn_tpu.graph.sparse as gs
    from ndcn_tpu.models.ndcn import _feature_major_ok

    rng = np.random.RandomState(1)
    dense = (rng.rand(40, 40) * (rng.rand(40, 40) < 0.2)).astype(np.float32)
    op_tiled = gs.from_scipy_coo(sp.csr_matrix(dense), tiled=True)
    op_plain = gs.from_scipy_coo(sp.csr_matrix(dense), tiled=False)
    h = jnp.zeros((40, 20))
    monkeypatch.setattr(gs, "use_tiled_kernel", lambda: True)
    assert _feature_major_ok(op_tiled, h, False, False, 0.0, False)
    assert not _feature_major_ok(op_plain, h, False, False, 0.0, False)
    assert not _feature_major_ok(op_tiled, h, True, False, 0.0, False)
    assert not _feature_major_ok(op_tiled, h, False, False, 0.5, False)
    assert not _feature_major_ok(op_tiled, jnp.zeros((40, 128)), False, False,
                                 0.0, False)
    monkeypatch.setattr(gs, "use_tiled_kernel", lambda: False)
    assert not _feature_major_ok(op_tiled, h, False, False, 0.0, False)


def test_layout_auto_picks_feature_major_above_node_threshold(monkeypatch):
    """layout='auto' resolves to feature_major above _FEATURE_MAJOR_AUTO_NODES
    (memory: the (n, d) layout's remat-saved residuals pay the 128-lane pad),
    and stays 'nd' below it. Detected by spying on ode_func_T."""
    import ndcn_tpu.graph.sparse as gs
    import ndcn_tpu.models.ndcn as m
    from ndcn_tpu.models import init_ndcn, ndcn_forward

    rng = np.random.RandomState(2)
    n = 90
    dense = (rng.rand(n, n) * (rng.rand(n, n) < 0.1)).astype(np.float32)
    np.fill_diagonal(dense, 0)
    op = gs.from_scipy_coo(sp.csr_matrix(dense), tiled=True)
    x0 = jnp.asarray(rng.rand(n, 1), jnp.float32)
    vt = jnp.linspace(0.0, 1.0, 4)
    params = init_ndcn(jax.random.PRNGKey(0), 1, 12, 1)
    monkeypatch.setattr(gs, "use_tiled_kernel", lambda: True)

    calls = []
    orig = m.ode_func_T

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(m, "ode_func_T", spy)

    monkeypatch.setattr(m, "_FEATURE_MAJOR_AUTO_NODES", n + 1)
    out_nd, _ = ndcn_forward(params, op, vt, x0, method="rk4", layout="auto")
    assert not calls, "below threshold, auto must stay nd"

    monkeypatch.setattr(m, "_FEATURE_MAJOR_AUTO_NODES", n)
    out_fm, _ = ndcn_forward(params, op, vt, x0, method="rk4", layout="auto")
    assert calls, "at threshold, auto must pick feature_major"
    np.testing.assert_allclose(np.asarray(out_fm), np.asarray(out_nd),
                               atol=1e-6)
