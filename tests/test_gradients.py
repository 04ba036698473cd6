"""Gradient tests: backprop-through-solver and continuous adjoint vs analytics.

Mirrors SURVEY.md §4's plan item (c): finite differences vs reverse-mode through
the solver vs the adjoint method. The reference's default training path backprops
through solver internals (heat_dynamics.py:333); the adjoint is the --adjoint
equivalent (torchdiffeq/_impl/adjoint.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndcn_tpu.ode import odeint
from ndcn_tpu.ode.adjoint import odeint_adjoint


def test_grad_wrt_decay_rate():
    # y' = -p y, y(T) = y0 exp(-p T); dL/dp with L = y(T) is -T y0 exp(-p T)
    t = jnp.linspace(0.0, 1.5, 8)

    def loss(p):
        sol = odeint(lambda tt, y: -p * y, jnp.array([2.0]), t,
                     rtol=1e-6, atol=1e-8, method="dopri5")
        return sol[-1, 0]

    p0 = 0.7
    g = jax.grad(loss)(jnp.asarray(p0))
    expected = -1.5 * 2.0 * np.exp(-p0 * 1.5)
    np.testing.assert_allclose(float(g), expected, rtol=1e-3)


def test_grad_wrt_y0():
    # y' = -y: dy(T)/dy(0) = exp(-T)
    t = jnp.linspace(0.0, 1.0, 5)

    def loss(y0):
        sol = odeint(lambda tt, y: -y, y0, t, rtol=1e-6, atol=1e-8, method="dopri5")
        return jnp.sum(sol[-1])

    g = jax.grad(loss)(jnp.array([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(g), np.exp(-1.0) * np.ones(2), rtol=1e-3)


@pytest.mark.parametrize("method", ["euler", "rk4", "fixed_adams"])
def test_grad_fixed_grid(method):
    t = jnp.linspace(0.0, 1.0, 40)

    def loss(p):
        sol = odeint(lambda tt, y: -p * y, jnp.array([1.0]), t, method=method)
        return sol[-1, 0]

    g = jax.grad(loss)(jnp.asarray(1.0))
    # analytic for the continuous problem; discretization error dominates tolerance
    np.testing.assert_allclose(float(g), -np.exp(-1.0), rtol=5e-2)


def test_grad_matches_finite_difference():
    t = jnp.linspace(0.0, 1.0, 6)

    def loss(p):
        def f(tt, y):
            return jnp.stack([y[1], -p * y[0]])
        sol = odeint(f, jnp.array([1.0, 0.0]), t, rtol=1e-6, atol=1e-8,
                     method="dopri5")
        return jnp.sum(sol[-1] ** 2)

    p0 = jnp.asarray(2.0)
    g = jax.grad(loss)(p0)
    eps = 1e-3
    fd = (loss(p0 + eps) - loss(p0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-3, atol=1e-4)


def test_adjoint_matches_backprop():
    t = jnp.linspace(0.0, 1.2, 7)
    params = {"w": jnp.array([[-0.5, 0.2], [-0.1, -0.7]]), "b": jnp.array([0.05, -0.03])}
    y0 = jnp.array([1.0, -0.5])

    def func(tt, y, p):
        return p["w"] @ y + p["b"]

    def loss_adjoint(p, y):
        sol = odeint_adjoint(func, y, t, p, rtol=1e-7, atol=1e-9, method="dopri5")
        return jnp.sum(sol[-1] ** 2)

    def loss_direct(p, y):
        sol = odeint(lambda tt, yy: func(tt, yy, p), y, t,
                     rtol=1e-7, atol=1e-9, method="dopri5")
        return jnp.sum(sol[-1] ** 2)

    ga_p, ga_y = jax.grad(loss_adjoint, argnums=(0, 1))(params, y0)
    gd_p, gd_y = jax.grad(loss_direct, argnums=(0, 1))(params, y0)

    np.testing.assert_allclose(np.asarray(ga_y), np.asarray(gd_y), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_p["w"]), np.asarray(gd_p["w"]), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_p["b"]), np.asarray(gd_p["b"]), rtol=2e-3, atol=1e-5)


def test_grad_through_loss_on_full_trajectory():
    """Gradients flow through dense-output interpolation at every obs time."""
    rng = np.random.RandomState(1)
    t_np = np.sort(rng.uniform(0.0, 2.0, 25))
    t_np[0] = 0.0
    t = jnp.asarray(t_np, jnp.float32)
    target = jnp.asarray(np.exp(-1.3 * t_np), jnp.float32)

    def loss(p):
        sol = odeint(lambda tt, y: -p * y, jnp.array([1.0]), t,
                     rtol=1e-6, atol=1e-8, method="dopri5")
        return jnp.mean((sol[:, 0] - target) ** 2)

    # minimizing from p=1.0 should move toward 1.3
    g = jax.grad(loss)(jnp.asarray(1.0))
    assert float(g) < 0.0
    g_at_sol = jax.grad(loss)(jnp.asarray(1.3))
    assert abs(float(g_at_sol)) < 1e-3


# --------------------------------------------------------- reference grad parity


def _load_grad_fixture(name="ndcn_grads_grid400"):
    import os
    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures",
                       name + ".npz")
    return dict(np.load(fix))


def _grad_fixture_problem(f):
    from ndcn_tpu.graph import generators, operators
    from ndcn_tpu.graph.sparse import from_dense

    adj = generators.build_network("grid", 400, seed=0)
    op = from_dense(operators.normalized_laplacian(adj))
    params = {
        "enc1": {"w": jnp.asarray(f["enc1_w"].T), "b": jnp.asarray(f["enc1_b"])},
        "enc2": {"w": jnp.asarray(f["enc2_w"].T), "b": jnp.asarray(f["enc2_b"])},
        "wt": {"w": jnp.asarray(f["wt_w"].T), "b": jnp.asarray(f["wt_b"])},
        "dec": {"w": jnp.asarray(f["dec_w"].T), "b": jnp.asarray(f["dec_b"])},
    }
    return op, params, jnp.asarray(f["x0"]), jnp.asarray(f["t"]), jnp.asarray(f["target"])


def _rel_l1(a, b):
    return float(np.abs(a - b).sum() / (np.abs(b).sum() + 1e-30))


@pytest.mark.parametrize("mode", ["backprop", "adjoint"])
def test_ndcn_gradient_parity_vs_reference(mode):
    """Gradients of the flagship l1 training loss vs the reference's actual
    loss.backward() through its vendored torchdiffeq at fixed weights
    (heat_dynamics.py:317-333; fixture provenance tests/fixtures/README.md).
    backprop = default path (autograd through solver internals) vs our bounded
    differentiable scan; adjoint = --adjoint (adjoint.py:22-102) vs our
    continuous-adjoint custom_vjp. SURVEY §4(c)."""
    from ndcn_tpu.models import ndcn_forward

    f = _load_grad_fixture()
    op, params, x0, vt, target = _grad_fixture_problem(f)

    def loss_fn(p):
        out, _ = ndcn_forward(p, op, vt, x0, rtol=0.01, atol=0.001,
                              method="dopri5", max_steps=64,
                              adjoint=(mode == "adjoint"))
        # F.l1_loss(pred.squeeze().t(), target): mean |(n,T) - (n,T)|
        return jnp.mean(jnp.abs(out[..., 0].T - target))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss) - float(f[f"loss_{mode}"])) / abs(
        float(f[f"loss_{mode}"])) < 1e-4

    for name in ("enc1", "enc2", "wt", "dec"):
        gw = np.asarray(grads[name]["w"]).T  # ours (in,out) -> torch (out,in)
        gb = np.asarray(grads[name]["b"])
        assert _rel_l1(gw, f[f"g_{name}_w_{mode}"]) < 1e-3, name
        assert _rel_l1(gb, f[f"g_{name}_b_{mode}"]) < 1e-3, name


@pytest.mark.parametrize("mode", ["backprop", "adjoint"])
@pytest.mark.parametrize("dyn", ["mutualistic", "gene"])
def test_ndcn_gradient_parity_per_dynamics(dyn, mode):
    """Per-dynamics NDCN loss/grad parity (round-4 verdict: grad fixtures were
    heat-only). Same flagship l1 training signal (heat_dynamics.py:317-333 and
    its clones), but the target is the REFERENCE's ground-truth trajectory of
    that dynamics on random60 and the operator is its normalized Laplacian.
    Fixture provenance: tools/make_parity_fixtures.py §7c.

    Tolerances (measured, docs/PARITY.md "gradient-parity floor"): loss and
    decoder grads match to ≤1e-4 (the emission/readout path), but encoder/wt
    grads are held to 2e-2, NOT the heat fixture's 1e-3 — and that floor is
    fundamental, not slack. Both autodiffs are EXACT for their programs
    (h-scaling FD on this fixture converges to our grad at 4e-8 by h=1e-8),
    both take the identical 4-step accept sequence (nfe 26 == 26), and the
    trajectories agree to 2.4e-7 — yet backprop-through-the-controller is only
    piecewise-smooth (step-size clamp and accept boundaries), and this fixture
    sits within 1e-7 of a derivative kink whose one-sided gradients differ by
    ~0.5% (measured: forward/backward one-sided FD at h=1e-7 give -7.72 vs
    -7.68 on the largest enc1 entry). Two float32 programs equal to roundoff
    land on opposite sides of that kink, so ~0.7% grad deviation is the parity
    floor for ANY correct implementation at these weights."""
    from ndcn_tpu.graph import operators
    from ndcn_tpu.graph.sparse import from_dense
    from ndcn_tpu.models import ndcn_forward

    f = _load_grad_fixture(f"ndcn_grads_random60_{dyn}")
    op = from_dense(operators.normalized_laplacian(f["adj"]))
    params = {
        "enc1": {"w": jnp.asarray(f["enc1_w"].T), "b": jnp.asarray(f["enc1_b"])},
        "enc2": {"w": jnp.asarray(f["enc2_w"].T), "b": jnp.asarray(f["enc2_b"])},
        "wt": {"w": jnp.asarray(f["wt_w"].T), "b": jnp.asarray(f["wt_b"])},
        "dec": {"w": jnp.asarray(f["dec_w"].T), "b": jnp.asarray(f["dec_b"])},
    }
    x0, vt, target = (jnp.asarray(f["x0"]), jnp.asarray(f["t"]),
                      jnp.asarray(f["target"]))

    def loss_fn(p):
        out, _ = ndcn_forward(p, op, vt, x0, rtol=0.01, atol=0.001,
                              method="dopri5", max_steps=64,
                              adjoint=(mode == "adjoint"))
        return jnp.mean(jnp.abs(out[..., 0].T - target))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss) - float(f[f"loss_{mode}"])) / abs(
        float(f[f"loss_{mode}"])) < 1e-4
    for name in ("enc1", "enc2", "wt", "dec"):
        gw = np.asarray(grads[name]["w"]).T
        gb = np.asarray(grads[name]["b"])
        tol = 1e-4 if name == "dec" else 2e-2  # see docstring
        assert _rel_l1(gw, f[f"g_{name}_w_{mode}"]) < tol, name
        assert _rel_l1(gb, f[f"g_{name}_b_{mode}"]) < tol, name


def test_ndcn_gradient_parity_vs_reference_euler():
    """Same flagship l1 loss, but down the EULER path — the dynamics scripts'
    default method (heat_dynamics.py:22): fixed-grid steps over the requested
    grid itself (solvers.py:51), gradients by backprop through those steps.
    Fixture generated by the reference at the same frozen weights as the
    dopri5 one (tools/make_parity_fixtures.py §7b)."""
    from ndcn_tpu.models import ndcn_forward

    f = _load_grad_fixture("ndcn_grads_grid400_euler")
    op, params, x0, vt, target = _grad_fixture_problem(f)

    def loss_fn(p):
        out, _ = ndcn_forward(p, op, vt, x0, method="euler")
        return jnp.mean(jnp.abs(out[..., 0].T - target))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss) - float(f["loss_backprop"])) / abs(
        float(f["loss_backprop"])) < 1e-4

    for name in ("enc1", "enc2", "wt", "dec"):
        gw = np.asarray(grads[name]["w"]).T
        gb = np.asarray(grads[name]["b"])
        assert _rel_l1(gw, f[f"g_{name}_w_backprop"]) < 1e-3, name
        assert _rel_l1(gb, f[f"g_{name}_b_backprop"]) < 1e-3, name
