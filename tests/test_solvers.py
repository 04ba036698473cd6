"""Solver unit tests against closed-form ODEs.

The reference ships no tests; this suite is the strategy SURVEY.md §4 prescribes:
(a) solvers vs closed forms, (b) dense-output/interpolation accuracy, (c) pytree
states, (d) both adaptive execution strategies agreeing, (e) stats sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndcn_tpu.ode import odeint, odeint_with_stats

ALL_METHODS = ["dopri5", "tsit5", "euler", "midpoint", "rk4",
               "explicit_adams", "fixed_adams", "adams"]
ADAPTIVE = ["dopri5", "tsit5", "adams"]

# accuracy expectations on exp decay over [0, 2] with a 50-point grid
TOL = {
    "dopri5": 2e-4, "tsit5": 2e-4, "adams": 2e-3,
    "rk4": 1e-5, "midpoint": 1e-3, "euler": 2e-2,
    "explicit_adams": 1e-4, "fixed_adams": 1e-4,
}


def exp_decay(t, y):
    return -y


@pytest.mark.parametrize("method", ALL_METHODS)
def test_exp_decay(method):
    t = jnp.linspace(0.0, 2.0, 50)
    y0 = jnp.ones((3, 2))
    kwargs = dict(rtol=1e-6, atol=1e-8) if method in ADAPTIVE else {}
    if method == "explicit_adams":
        # order-11 explicit AB is unstable at lambda*dt = -0.04 (true of the
        # reference too); cap the order to stay inside the stability region.
        kwargs["options"] = {"max_order": 5}
    sol = odeint(exp_decay, y0, t, method=method, **kwargs)
    expected = np.exp(-np.asarray(t))[:, None, None] * np.ones((1, 3, 2))
    np.testing.assert_allclose(np.asarray(sol), expected, atol=TOL[method], rtol=0)


@pytest.mark.parametrize("method", ["dopri5", "tsit5", "rk4", "fixed_adams"])
def test_harmonic_oscillator(method):
    # y'' = -y as a 2-D system; solution (cos t, -sin t)
    def f(t, y):
        return jnp.stack([y[1], -y[0]])

    t = jnp.linspace(0.0, 6.0, 80)
    y0 = jnp.array([1.0, 0.0])
    kwargs = dict(rtol=1e-6, atol=1e-8) if method in ADAPTIVE else {}
    sol = odeint(f, y0, t, method=method, **kwargs)
    tn = np.asarray(t)
    expected = np.stack([np.cos(tn), -np.sin(tn)], axis=1)
    np.testing.assert_allclose(np.asarray(sol), expected, atol=5e-4, rtol=0)


@pytest.mark.parametrize("method", ["dopri5", "tsit5"])
def test_irregular_observation_grid(method):
    """Dense output must hit arbitrary (non-step-aligned) observation times."""
    rng = np.random.RandomState(0)
    t = np.sort(rng.uniform(0.0, 3.0, size=37))
    t[0] = 0.0
    t = jnp.asarray(np.unique(t), jnp.float32)
    y0 = jnp.array([2.0])
    sol = odeint(exp_decay, y0, t, rtol=1e-7, atol=1e-9, method=method)
    expected = 2.0 * np.exp(-np.asarray(t))[:, None]
    np.testing.assert_allclose(np.asarray(sol), expected, atol=1e-5, rtol=0)


def test_pytree_state():
    def f(t, y):
        return {"a": -y["a"], "b": (2.0 * y["b"][0],)}

    t = jnp.linspace(0.0, 1.0, 20)
    y0 = {"a": jnp.ones((4,)), "b": (jnp.full((2, 2), 0.5),)}
    sol = odeint(f, y0, t, rtol=1e-6, atol=1e-8, method="dopri5")
    tn = np.asarray(t)
    np.testing.assert_allclose(np.asarray(sol["a"]), np.exp(-tn)[:, None] * np.ones((1, 4)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol["b"][0]),
                               0.5 * np.exp(2 * tn)[:, None, None] * np.ones((1, 2, 2)),
                               atol=1e-3)


def test_scan_and_while_paths_agree():
    t = jnp.linspace(0.0, 2.0, 30)
    y0 = jnp.arange(1.0, 7.0).reshape(2, 3)
    sol_scan, stats_scan = odeint_with_stats(
        exp_decay, y0, t, rtol=1e-5, atol=1e-7, method="dopri5",
        options={"differentiable": True})
    sol_while, stats_while = odeint_with_stats(
        exp_decay, y0, t, rtol=1e-5, atol=1e-7, method="dopri5",
        options={"differentiable": False})
    # identical step sequences; small float32 drift from different XLA fusions
    np.testing.assert_allclose(np.asarray(sol_scan), np.asarray(sol_while),
                               rtol=3e-5, atol=1e-5)
    assert int(stats_scan.n_accepted) == int(stats_while.n_accepted)
    assert int(stats_scan.nfe) == int(stats_while.nfe)
    assert bool(stats_scan.success) and bool(stats_while.success)


def test_decreasing_time():
    t = jnp.linspace(2.0, 0.0, 25)
    y0 = jnp.array([np.exp(-2.0)], jnp.float32)
    sol = odeint(exp_decay, y0, t, rtol=1e-6, atol=1e-8, method="dopri5")
    expected = np.exp(-np.asarray(t))[:, None]
    np.testing.assert_allclose(np.asarray(sol), expected, atol=1e-5, rtol=0)


def test_stats_accounting():
    t = jnp.linspace(0.0, 2.0, 10)
    y0 = jnp.ones((5,))
    _, stats = odeint_with_stats(exp_decay, y0, t, rtol=1e-6, atol=1e-8,
                                 method="dopri5")
    # 1 initial eval + 1 in Hairer init + 6 per attempt
    n_attempts = int(stats.n_accepted) + int(stats.n_rejected)
    assert int(stats.nfe) == 2 + 6 * n_attempts
    assert int(stats.n_accepted) > 0
    assert bool(stats.success)


def test_max_steps_exhaustion_flags_failure():
    t = jnp.linspace(0.0, 2.0, 10)
    y0 = jnp.ones((5,))
    _, stats = odeint_with_stats(exp_decay, y0, t, rtol=1e-10, atol=1e-12,
                                 method="dopri5",
                                 options={"max_steps": 2})
    assert not bool(stats.success)


def test_odeint_poisons_trajectory_on_exhaustion():
    """The public seam must be loud: a stiff solve truncated by max_steps
    returns NaN everywhere, never extrapolated garbage (the reference raises
    on max_num_steps; silent wrong results are worse than either)."""
    t = jnp.linspace(0.0, 2.0, 10)
    y0 = jnp.ones((5,))
    sol = odeint(lambda tt, y: -50.0 * y, y0, t, rtol=1e-7, atol=1e-9,
                 method="dopri5", options={"max_steps": 8})
    assert np.all(np.isnan(np.asarray(sol)))
    # and an ample budget stays NaN-free
    sol_ok = odeint(lambda tt, y: -50.0 * y, y0, t, rtol=1e-4, atol=1e-6,
                    method="dopri5", options={"max_steps": 512})
    assert np.all(np.isfinite(np.asarray(sol_ok)))


def test_traced_decreasing_time_is_correct():
    """A decreasing grid passed THROUGH jit (traced, so it cannot be host-
    inspected) must still integrate in the right direction — the direction is
    handled symbolically, not assumed increasing."""
    t_dec = jnp.linspace(2.0, 0.0, 25)
    y0 = jnp.array([np.exp(-2.0)], jnp.float32)

    @jax.jit
    def solve(tgrid):
        return odeint(exp_decay, y0, tgrid, rtol=1e-6, atol=1e-8,
                      method="dopri5")

    sol = solve(t_dec)
    expected = np.exp(-np.asarray(t_dec))[:, None]
    np.testing.assert_allclose(np.asarray(sol), expected, atol=1e-5, rtol=0)
    # increasing grids through the same traced path stay correct too
    t_inc = jnp.linspace(0.0, 2.0, 25)
    np.testing.assert_allclose(
        np.asarray(solve(t_inc)),
        float(y0[0]) * np.exp(-np.asarray(t_inc))[:, None], atol=1e-5, rtol=0)


def test_decreasing_python_list_grid():
    """A plain-list decreasing grid used to hit `-t` on an unconverted list."""
    t = [2.0, 1.5, 1.0, 0.5, 0.0]
    y0 = jnp.array([np.exp(-2.0)], jnp.float32)
    sol = odeint(exp_decay, y0, t, rtol=1e-6, atol=1e-8, method="dopri5")
    np.testing.assert_allclose(np.asarray(sol), np.exp(-np.asarray(t))[:, None],
                               atol=1e-5, rtol=0)


def test_fixed_grid_step_size_option():
    t = jnp.linspace(0.0, 2.0, 7)
    y0 = jnp.ones((2,))
    sol = odeint(exp_decay, y0, t, method="rk4", options={"step_size": 0.01})
    expected = np.exp(-np.asarray(t))[:, None] * np.ones((1, 2))
    np.testing.assert_allclose(np.asarray(sol), expected, atol=1e-4, rtol=0)


def test_jit_and_vmap_compose():
    t = jnp.linspace(0.0, 1.0, 12)

    @jax.jit
    def solve(y0):
        return odeint(exp_decay, y0, t, rtol=1e-5, atol=1e-7, method="dopri5")

    y0s = jnp.stack([jnp.ones((3,)), 2.0 * jnp.ones((3,))])
    sols = jax.vmap(solve)(y0s)
    tn = np.asarray(t)
    np.testing.assert_allclose(np.asarray(sols[0]), np.exp(-tn)[:, None] * np.ones((1, 3)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sols[1]), 2 * np.exp(-tn)[:, None] * np.ones((1, 3)),
                               atol=1e-4)


def test_time_dependent_rhs():
    # dy/dt = t  -> y = y0 + t^2/2
    def f(t, y):
        return jnp.full_like(y, t.astype(y.dtype))

    t = jnp.linspace(0.0, 2.0, 15)
    y0 = jnp.zeros((2,))
    sol = odeint(f, y0, t, rtol=1e-6, atol=1e-8, method="dopri5")
    expected = (np.asarray(t) ** 2 / 2)[:, None] * np.ones((1, 2))
    np.testing.assert_allclose(np.asarray(sol), expected, atol=1e-5)


@pytest.mark.parametrize("method", ["euler", "midpoint"])
def test_fixed_grid_step_size_euler_midpoint(method):
    t = jnp.linspace(0.0, 1.5, 6)
    y0 = jnp.ones((3,))
    sol = odeint(exp_decay, y0, t, method=method, options={"step_size": 0.005})
    expected = np.exp(-np.asarray(t))[:, None] * np.ones((1, 3))
    # euler's global error at dt=0.005 over T=1.5 is ~1e-3 (first order)
    tol = 2e-3 if method == "euler" else 5e-5
    np.testing.assert_allclose(np.asarray(sol), expected, atol=tol, rtol=0)


def test_first_step_honored():
    """Deviation guard: a provided first_step is used as given (the reference
    replaces any caller value with 0.01, dopri5.py:81-82)."""
    t = jnp.linspace(0.0, 1.0, 4)
    y0 = jnp.ones((2,))
    _, stats_small = odeint_with_stats(exp_decay, y0, t, rtol=1e-3, atol=1e-5,
                                       method="dopri5",
                                       options={"first_step": 1e-4})
    _, stats_big = odeint_with_stats(exp_decay, y0, t, rtol=1e-3, atol=1e-5,
                                     method="dopri5",
                                     options={"first_step": 0.5})
    # a tiny first step needs strictly more accepted steps than a large one
    assert int(stats_small.n_accepted) > int(stats_big.n_accepted)


def test_unknown_option_warns():
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        odeint(exp_decay, jnp.ones(2), jnp.linspace(0, 1, 4), method="dopri5",
               options={"max_step": 5})
    assert any("unexpected options" in str(x.message) for x in w)


@pytest.mark.parametrize("method", ["tsit5", "midpoint", "fixed_adams"])
def test_dynamics_driver_all_methods(method):
    """Each solver trains through the real dynamics driver."""
    from ndcn_tpu.experiments.dynamics import build_parser, run

    args = build_parser("t").parse_args(
        ["--n", "36", "--time_tick", "8", "--niters", "4", "--test_freq", "4",
         "--platform", "cpu", "--method", method, "--max_steps", "32"])
    out = run("heat", args)
    assert np.isfinite(out["final"]["abs_error"])


@pytest.mark.parametrize("method", ["dopri5", "tsit5"])
def test_rejected_overflow_step_does_not_poison_output(method):
    """A cleanly-REJECTED trial step whose stage values overflow to inf must not
    NaN the trajectory: every emitted dense-output slot participates in the
    scan path's output matmul (0-weight x inf = NaN), so rejected emissions are
    masked to zero. Forcing the scenario: dy/dt = e^y from y0=0 with an
    oversized first step — the trial stages blow past the f32 exp range (inf),
    the step rejects on an inf error ratio, and the controller's retry at
    dt/ifactor succeeds."""

    def stiff_exp(t, y):
        return jnp.exp(y)

    y0 = jnp.zeros((3,), jnp.float32)
    t = jnp.linspace(0.0, 0.5, 6).astype(jnp.float32)
    sol, stats = odeint_with_stats(stiff_exp, y0, t, rtol=1e-3, atol=1e-6,
                                   method=method,
                                   options={"first_step": 80.0,
                                            "max_steps": 64})
    assert int(stats.n_rejected) >= 1          # the oversized attempt rejected
    assert bool(stats.success)
    assert np.all(np.isfinite(np.asarray(sol)))
    # truth: y(t) = -log(1 - t); rtol 1e-3 on the controller ~ 1% trajectory
    np.testing.assert_allclose(np.asarray(sol[:, 0]),
                               -np.log(1.0 - np.asarray(t)), rtol=3e-2,
                               atol=1e-3)


@pytest.mark.parametrize("method", ["dopri5", "tsit5"])
def test_gradients_survive_rejected_overflow(method):
    """d(loss)/d(params) must stay finite when a TRIAL step overflows and is
    rejected: reverse-mode AD through the poisoned attempt yields 0·inf = NaN
    in the op VJPs even with zero cotangents, so the guarded attempt's
    backward switches to the forced-reject linearization. The same solve with
    a sane first step gives the reference gradient; the guarded gradient must
    match it closely (the overflowing attempts contribute ~nothing)."""
    from ndcn_tpu.ode import odeint

    t = jnp.linspace(0.0, 0.5, 6).astype(jnp.float32)
    y0 = jnp.zeros((3,), jnp.float32)

    def loss(scale, first_step):
        def rhs(tt, y):
            return scale * jnp.exp(y)
        sol = odeint(rhs, y0, t, rtol=1e-3, atol=1e-6, method=method,
                     options={"first_step": first_step, "max_steps": 64})
        return jnp.sum(sol)

    g_overflow = jax.grad(loss)(1.0, 80.0)   # first attempt overflows, rejected
    g_clean = jax.grad(loss)(1.0, 0.01)      # never overflows
    assert np.isfinite(float(g_overflow)), "gradient poisoned by rejected step"
    assert np.isfinite(float(g_clean))
    # both solves produce near-identical trajectories, so gradients agree
    np.testing.assert_allclose(float(g_overflow), float(g_clean), rtol=5e-2)


def test_vcabm_gradients_survive_rejected_overflow(monkeypatch):
    """Same guard as the RK solvers, VCABM flavor: an overflowing predictor
    attempt must neither poison the forward (forced reject + maximal shrink)
    nor the gradient (grad_guard fallback linearization). Forced via a huge
    Hairer initial step."""
    import ndcn_tpu.ode.vcabm as vcabm_mod
    from ndcn_tpu.ode import odeint, odeint_with_stats

    monkeypatch.setattr(
        vcabm_mod, "select_initial_step",
        lambda func, t0, y0, order, rtol, atol, f0, tdtype:
            jnp.asarray(80.0, tdtype))

    t = jnp.linspace(0.0, 0.5, 6).astype(jnp.float32)
    y0 = jnp.zeros((3,), jnp.float32)

    def loss(scale):
        def rhs(tt, y):
            return scale * jnp.exp(y)
        sol = odeint(rhs, y0, t, rtol=1e-3, atol=1e-6, method="adams",
                     options={"max_steps": 128})
        return jnp.sum(sol)

    sol, stats = odeint_with_stats(
        lambda tt, y: jnp.exp(y), y0, t, rtol=1e-3, atol=1e-6, method="adams",
        options={"max_steps": 128})
    assert int(stats.n_rejected) >= 1
    assert bool(stats.success)
    assert np.all(np.isfinite(np.asarray(sol)))
    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g)), "VCABM gradient poisoned by rejected step"


def test_emission_dtype_bf16_close_and_differentiable():
    """emission_dtype=bf16 stores the scan path's dense-output buffers (and
    their cotangents) at half width for HBM headroom at scale; observation
    values must stay within bf16 resolution of the f32 run and the solve must
    remain differentiable. Solver STEPS are unaffected (full-precision carry):
    accepted/rejected counts must match the f32 run exactly."""
    t = jnp.linspace(0.0, 2.0, 17)
    y0 = jnp.ones((5, 3))

    def solve(dtype):
        return odeint_with_stats(exp_decay, y0, t, rtol=1e-6, atol=1e-8,
                                 method="dopri5",
                                 options={"max_steps": 64,
                                          "emission_dtype": dtype})

    ref, sref = solve(None)
    out, s = solve(jnp.bfloat16)
    assert out.dtype == ref.dtype == jnp.float32
    assert int(s.n_accepted) == int(sref.n_accepted)
    assert int(s.n_rejected) == int(sref.n_rejected)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-2, rel
    assert float(jnp.max(jnp.abs(out - ref))) > 0.0  # bf16 genuinely applied

    def loss(scale):
        out, stats = odeint_with_stats(
            lambda tt, y: -scale * y, y0, t, rtol=1e-6, atol=1e-8,
            method="dopri5", options={"max_steps": 64,
                                      "emission_dtype": jnp.bfloat16})
        return jnp.sum(out)

    g = jax.grad(loss)(jnp.asarray(1.0))
    g_ref = jax.grad(lambda s: jnp.sum(odeint(
        lambda tt, y: -s * y, y0, t, rtol=1e-6, atol=1e-8,
        method="dopri5", options={"max_steps": 64})))(jnp.asarray(1.0))
    assert np.isfinite(float(g))
    assert abs(float(g) - float(g_ref)) / abs(float(g_ref)) < 2e-2


def test_emission_readout_exact_and_differentiable():
    """A LINEAR emission_readout commutes with dense-output interpolation, so
    readout-during-solve must equal readout-after-solve to float tolerance
    (it is the same contraction reordered), and gradients must match. This is
    the memory path that keeps 1M-node trajectories from materializing."""
    t = jnp.linspace(0.0, 1.5, 11)
    y0 = jnp.asarray(np.random.RandomState(0).rand(6, 4).astype(np.float32))
    R = jnp.asarray(np.random.RandomState(1).randn(4, 2).astype(np.float32))

    def rhs(tt, y):
        return -0.7 * y + 0.1 * jnp.roll(y, 1, axis=0)

    opts = {"max_steps": 64}
    full = odeint(rhs, y0, t, rtol=1e-5, atol=1e-7, method="dopri5",
                  options=opts)
    ref = full @ R                                        # (T, 6, 2)
    out = odeint(rhs, y0, t, rtol=1e-5, atol=1e-7, method="dopri5",
                 options=dict(opts, emission_readout=lambda y: y @ R))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)

    def loss(scale, use_readout):
        o = dict(opts)
        if use_readout:
            o["emission_readout"] = lambda y: y @ R
        sol = odeint(lambda tt, y: scale * rhs(tt, y), y0, t, rtol=1e-5,
                     atol=1e-7, method="dopri5", options=o)
        if not use_readout:
            sol = sol @ R
        return jnp.sum(sol ** 2)

    g_ref = jax.grad(loss)(jnp.asarray(1.3), False)
    g_ro = jax.grad(loss)(jnp.asarray(1.3), True)
    np.testing.assert_allclose(float(g_ro), float(g_ref), rtol=1e-4)

    # Gradient WRT THE READOUT MATRIX itself: R is captured inside the
    # guarded scan attempt (closure-converted const of the custom_vjp) — the
    # decoder-weight path every folded training run uses. Must match the
    # readout-after-solve gradient.
    def loss_R(Rm, use_readout):
        o = dict(opts)
        if use_readout:
            o["emission_readout"] = lambda y: y @ Rm
        sol = odeint(rhs, y0, t, rtol=1e-5, atol=1e-7, method="dopri5",
                     options=o)
        if not use_readout:
            sol = sol @ Rm
        return jnp.sum(sol ** 2)

    gR_ref = jax.grad(loss_R)(R, False)
    gR_ro = jax.grad(loss_R)(R, True)
    np.testing.assert_allclose(np.asarray(gR_ro), np.asarray(gR_ref),
                               rtol=1e-4, atol=1e-6)
    assert float(jnp.abs(gR_ro).sum()) > 0.0
