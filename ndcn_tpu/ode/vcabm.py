"""Variable-coefficient Adams-Bashforth-Moulton (adaptive step & order 1-12).

Counterpart of /root/reference/torchdiffeq/_impl/adams.py, with fixed-size
newest-first history buffers and the g / phi divided-difference recurrences
vectorized over a static max order with masking. Two execution strategies share
one step function (mirroring ode/adaptive.py):

- ``solve_vcabm``: minimal-FLOP ``lax.while_loop`` (inference).
- ``solve_vcabm_scan``: bounded rematerialized ``lax.scan`` — reverse-mode
  differentiable, so --method adams trains without the continuous adjoint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ndcn_tpu.ode import grad_guard
from ndcn_tpu.ode.adaptive import SolveStats
from ndcn_tpu.ode.step_control import (Controller, accept_and_max_ratio,
                                       error_ratios, optimal_step_size,
                                       select_initial_step)
from ndcn_tpu.ode.tree_math import tree_map, tree_where

_MIN_ORDER = 1
_MAX_ORDER = 12

# gamma* coefficients for the order-(k+1) error estimate (adams.py:12-16)
_GAMMA_STAR = (
    1, -1 / 2, -1 / 12, -1 / 24, -19 / 720, -3 / 160, -863 / 60480, -275 / 24192,
    -33953 / 3628800, -0.00789255, -0.00678585, -0.00592406, -0.00523669,
    -0.0046775, -0.00421495, -0.0038269,
)


def _g_and_explicit_phi(prev_t, next_t, implicit_phi, k_max):
    """g coefficients and explicit phi, masked to dynamic order (adams.py:26-50).

    prev_t: (H,) newest-first times (H = max_order + 1).
    implicit_phi: pytree with leading axis H (newest-first divided differences).
    Returns g (k_max + 2,) and explicit_phi pytree with leading axis k_max + 1;
    entries beyond the live order are garbage — callers must mask by order.
    """
    curr_t = prev_t[0]
    dt = next_t - curr_t

    # beta_j for j = 0..k_max : beta_0 = 1, beta_j = beta_{j-1} * (next_t - prev_t[j-1]) / (curr_t - prev_t[j])
    num = next_t - prev_t  # (H,)
    den = curr_t - prev_t  # (H,)  den[0] == 0, unused
    ratios = jnp.concatenate([jnp.ones((1,), prev_t.dtype),
                              num[:-1] / jnp.where(den[1:] == 0, 1.0, den[1:])])
    beta = jnp.cumprod(ratios)  # (H,) beta[j]

    def scale_leaf(p):
        b = beta[: p.shape[0]].astype(p.dtype)
        return p * b.reshape((-1,) + (1,) * (p.ndim - 1))

    explicit_phi = tree_map(scale_leaf, implicit_phi)

    # c recurrence for g (adams.py:39-48): c_j updated via successive differences.
    kk = k_max + 2
    c = 1.0 / jnp.arange(1, kk + 2, dtype=prev_t.dtype)
    g = jnp.zeros((kk,), prev_t.dtype).at[0].set(1.0)

    def body(j, state):
        c, g = state
        factor = jnp.where(j == 1, 1.0, dt / (next_t - prev_t[j - 1]))
        c = c.at[:-1].set(c[:-1] - c[1:] * jnp.where(j == 1, 1.0, factor))
        # j == 1 uses plain difference c[:-1] - c[1:] (adams.py:45)
        g = g.at[j].set(c[0])
        return c, g

    c, g = jax.lax.fori_loop(1, kk, body, (c, g))
    return g, explicit_phi


def _make_vcabm_machine(func, y0, t, rtol: float, atol: float, max_order: int,
                        time_dtype=None, safety: float = 0.9,
                        ifactor: float = 10.0, dfactor: float = 0.2):
    """Shared VCABM stepping machinery: returns (carry0, attempt, T).

    Reproduces the reference's control flow, including its predictor-advance quirk:
    on accepted steps both the state stored for the next step AND the value
    returned at observation times are the *predictor* ``p_next`` (adams.py:170 sets
    y_n = p_next and advance() returns y_n); the corrector only refines the error
    estimate and the divided differences.

    ``time_dtype`` optionally widens the time/step-control arithmetic (the g/β
    divided-difference recurrences are the precision-sensitive part) to match the
    reference's float64 time scalars (solvers.py:28). float64 requires running
    under ``jax.experimental.enable_x64()`` (CPU parity runs); state dtype is
    unaffected.
    """
    max_order = int(max(_MIN_ORDER, min(max_order, _MAX_ORDER)))
    H = max_order + 1
    T = t.shape[0]
    if time_dtype is not None:
        t = t.astype(time_dtype)
    tdtype = t.dtype
    # order supplied per call; safety/ifactor/dfactor honored like the
    # reference's VariableCoefficientAdamsBashforth kwargs (adams.py:63-64)
    ctrl = Controller(rtol=rtol, atol=atol, safety=safety, ifactor=ifactor,
                      dfactor=dfactor, order=0)

    f0 = func(t[0], y0)
    first_step = select_initial_step(func, t[0], y0, 2, rtol, atol, f0, tdtype)

    def hist_init(f):
        return tree_map(lambda l: jnp.zeros((H,) + l.shape, l.dtype).at[0].set(l), f)

    state0 = dict(
        y=y0,
        prev_f=hist_init(f0),
        prev_t=jnp.full((H,), t[0], tdtype),
        n_hist=jnp.asarray(1, jnp.int32),
        next_t=t[0] + first_step,
        phi=hist_init(f0),   # divided differences, newest-first
        order=jnp.asarray(1, jnp.int32),
    )
    sol0 = tree_map(lambda y: jnp.zeros((T,) + y.shape, y.dtype).at[0].set(y), y0)

    # the (T, ...) solution buffer stays OUT of the stepping carry: each attempt
    # emits (reached, obs index, predictor state) and the callers either fold
    # the emission immediately (while path) or scatter all emissions once after
    # the scan — a carried buffer would cost a full copy per cond-skipped
    # iteration and a per-step save in the backward pass.
    carry0 = dict(st=state0, obs_i=jnp.asarray(1, jnp.int32),
                  nfe=jnp.asarray(2, jnp.int32), nacc=jnp.asarray(0, jnp.int32),
                  nrej=jnp.asarray(0, jnp.int32), ok=jnp.asarray(True))

    def compute_implicit_phi(explicit_phi, f_n, k):
        """Newest-first divided differences from f at the new point (adams.py:53-58).

        implicit_phi[0] = f_n; implicit_phi[j] = implicit_phi[j-1] - explicit_phi[j-1].
        Computed up to H entries; mask by k via callers.
        """
        del k

        def per_leaf(ep, fn):
            out = jnp.zeros_like(ep)
            out = out.at[0].set(fn)

            def body(j, o):
                return o.at[j].set(o[j - 1] - ep[j - 1])

            return jax.lax.fori_loop(1, ep.shape[0], body, out)

        return tree_map(per_leaf, explicit_phi, f_n)

    def masked_sdp(scale, g_vec, weights_mask, stacked):
        """scale * sum_j (g_vec[j] * mask[j]) * stacked[j]."""
        w = g_vec * weights_mask

        def per_leaf(k):
            c = w[: k.shape[0]].astype(k.dtype)
            return jnp.asarray(scale, k.dtype) * jnp.tensordot(c, k[: w.shape[0]], axes=1)

        return tree_map(per_leaf, stacked)

    def attempt(c):
        st = c["st"]
        order = st["order"]
        next_t = jnp.minimum(st["next_t"], t[c["obs_i"]])
        # reference: if next_t > final_t: next_t = final_t — here the pending
        # observation time bounds the step so advance() lands exactly on it.
        dt = next_t - st["prev_t"][0]

        g, phi = _g_and_explicit_phi(st["prev_t"], next_t, st["phi"], max_order)

        # predictor: y0 + dt * sum_{j < max(1, order-1)} g[j] * phi[j]
        jidx = jnp.arange(H, dtype=jnp.int32)
        pred_mask = (jidx < jnp.maximum(1, order - 1)).astype(tdtype)
        p_next = tree_map(jnp.add, st["y"],
                          masked_sdp(dt, g[:H], pred_mask, phi))

        f_pred = func(next_t, p_next)
        implicit_phi_p = compute_implicit_phi(phi, f_pred, order + 1)

        # corrector: p_next + dt * g[order-1] * implicit_phi_p[order-1]
        g_om1 = g[jnp.maximum(order - 1, 0)]
        iphi_om1 = tree_map(lambda l: l[jnp.maximum(order - 1, 0)], implicit_phi_p)
        y_next = tree_map(
            lambda p, ip: p + dt.astype(p.dtype) * g_om1.astype(p.dtype) * ip,
            p_next, iphi_om1)

        # error: dt * (g[order] - g[order-1]) * implicit_phi_p[order]
        gdiff = g[order] - g_om1
        iphi_o = tree_map(lambda l: l[order], implicit_phi_p)
        local_error = tree_map(lambda ip: dt.astype(ip.dtype) * gdiff.astype(ip.dtype) * ip,
                               iphi_o)
        ratios = error_ratios(local_error, st["y"], y_next, rtol, atol, tdtype)
        accept, max_ratio = accept_and_max_ratio(ratios)

        # ---------------- accepted branch (adams.py:140-170)
        f_corr = func(next_t, y_next)
        implicit_phi = compute_implicit_phi(phi, f_corr, order + 2)

        # non-finite internals force a reject with maximal dt shrink whatever
        # the (garbage) error ratio claims — same policy as the RK attempts
        # (adaptive._attempt_step_core); the scan path additionally cuts the
        # backward through the poisoned evals (grad_guard)
        finite = grad_guard.all_finite(p_next, f_pred, y_next, f_corr,
                                       local_error)
        accept = accept & finite

        # ---------------- rejected branch: shrink dt, try again (adams.py:135-138)
        dt_rej = jnp.where(finite,
                           optimal_step_size(dt, max_ratio,
                                             ctrl._replace(order=order)),
                           dt * ctrl.dfactor)
        st_rej = dict(st, next_t=st["prev_t"][0] + dt_rej)

        # order adaptation
        def err_at(k):
            gd = g[jnp.maximum(k, 1)] - g[jnp.maximum(k - 1, 0)]
            ip = tree_map(lambda l: l[jnp.maximum(k, 0)], implicit_phi_p)
            e = tree_map(lambda l: dt.astype(l.dtype) * gd.astype(l.dtype) * l, ip)
            r = error_ratios(e, st["y"], y_next, rtol, atol, tdtype)
            return jnp.max(jnp.stack(r)), jnp.min(jnp.stack(r))

        err_k_max = max_ratio
        ekm1_max, ekm1_min = err_at(order - 1)
        ekm2_max, ekm2_min = err_at(order - 2)
        gamma = jnp.asarray(_GAMMA_STAR, tdtype)[jnp.clip(order, 0, len(_GAMMA_STAR) - 1)]
        ikp1 = tree_map(lambda l: l[order], implicit_phi_p)
        ekp1_leaves = error_ratios(
            tree_map(lambda l: dt.astype(l.dtype) * gamma.astype(l.dtype) * l, ikp1),
            st["y"], y_next, rtol, atol, tdtype)
        ekp1_max = jnp.max(jnp.stack(ekp1_leaves))

        ramp = (st["n_hist"] <= 4) | (order < 3)
        next_order_ramp = jnp.minimum(jnp.minimum(order + 1, 3), max_order)
        dec = jnp.minimum(ekm1_min, ekm2_min) < err_k_max
        inc = (~dec) & (order < max_order) & (ekp1_max < err_k_max)
        next_order_adapt = jnp.where(dec, order - 1, jnp.where(inc, order + 1, order))
        next_order = jnp.where(ramp, next_order_ramp, next_order_adapt)

        dt_acc = jnp.where(next_order > order, dt,
                           optimal_step_size(dt, max_ratio,
                                             ctrl._replace(order=order + 1)))

        def push_t(buf, v):
            return jnp.concatenate([v[None], buf[:-1]])

        def push_f(hist, f):
            return tree_map(lambda h, f_: jnp.concatenate([f_[None], h[:-1]], axis=0),
                            hist, f)

        st_acc = dict(
            y=p_next,  # reference quirk: predictor is what advances (adams.py:170)
            prev_f=push_f(st["prev_f"], f_corr),
            prev_t=push_t(st["prev_t"], next_t),
            n_hist=jnp.minimum(st["n_hist"] + 1, H),
            next_t=next_t + dt_acc,
            phi=implicit_phi,
            order=next_order,
        )

        st_new = tree_where(accept, st_acc, st_rej)
        # the reference reports the PREDICTOR at observation times (advance()
        # returns y_n, which the accepted state sets to p_next, adams.py:100-103,170)
        underflow = ~(next_t > st["prev_t"][0])
        reached = accept & (next_t >= t[c["obs_i"]])
        # NFE accounting: the branch-free attempt always evaluates predictor AND
        # corrector, so a rejected attempt counts 2 evals where the reference's
        # early-exit counts 1 (adams.py:135-138) — reported NFE is an upper
        # bound on the reference's under rejection-heavy solves (docs/PARITY.md
        # row 5). The wasted eval is inherent to the branch-free design.
        c_new = dict(
            c, st=st_new,
            obs_i=c["obs_i"] + reached.astype(jnp.int32),
            nfe=c["nfe"] + 2,
            nacc=c["nacc"] + accept.astype(jnp.int32),
            nrej=c["nrej"] + (~accept).astype(jnp.int32),
            ok=c["ok"] & ~underflow)
        emit = dict(reached=reached, obs_i=c["obs_i"], y_obs=p_next)
        return c_new, emit, finite

    emit_zero = dict(reached=jnp.asarray(False), obs_i=jnp.asarray(0, jnp.int32),
                     y_obs=tree_map(jnp.zeros_like, carry0["st"]["y"]))

    # guarded float-view attempt for the differentiable scan path: the guard
    # requires all-inexact leaves (see grad_guard contract)
    def attempt_f(c_f):
        c = grad_guard.unfloat_view(c_f, carry0)
        c_new, emit, finite = attempt(c)
        return (grad_guard.float_view(c_new), grad_guard.float_view(emit),
                finite.astype(jnp.float32))

    def fallback_f(c_f):
        # exact primal of a forced-reject attempt, no RHS call on the tape
        c = grad_guard.unfloat_view(c_f, carry0)
        st = c["st"]
        next_t = jnp.minimum(st["next_t"], t[c["obs_i"]])
        dt = next_t - st["prev_t"][0]
        underflow = ~(next_t > st["prev_t"][0])
        st_rej = dict(st, next_t=st["prev_t"][0] + dt * ctrl.dfactor)
        c_new = dict(c, st=st_rej, nfe=c["nfe"] + 2, nrej=c["nrej"] + 1,
                     ok=c["ok"] & ~underflow)
        emit = dict(reached=jnp.asarray(False), obs_i=c["obs_i"],
                    y_obs=tree_map(jnp.zeros_like, st["y"]))
        return (grad_guard.float_view(c_new), grad_guard.float_view(emit),
                jnp.zeros((), jnp.float32))

    guarded_f = grad_guard.guard_attempt(attempt_f, fallback_f)

    def attempt_scan(c):
        c_f, emit_f, _fin = guarded_f(grad_guard.float_view(c))
        return (grad_guard.unfloat_view(c_f, carry0),
                grad_guard.unfloat_view(emit_f, emit_zero))

    return carry0, attempt, attempt_scan, T, sol0


def solve_vcabm(func, y0, t, rtol: float, atol: float, max_order: int = _MAX_ORDER,
                max_steps: int = 1 << 16, time_dtype=None, safety: float = 0.9,
                ifactor: float = 10.0, dfactor: float = 0.2):
    """Minimal-FLOP while_loop solve (non-differentiable)."""
    carry0, attempt, _, T, sol0 = _make_vcabm_machine(func, y0, t, rtol, atol,
                                                      max_order,
                                                      time_dtype=time_dtype,
                                                      safety=safety,
                                                      ifactor=ifactor,
                                                      dfactor=dfactor)
    # The carried solution buffer is FLATTENED per leaf ((T, numel)) so the
    # while carry never holds a small minor dim in the 128-lane position —
    # the (8, 128) tiling pads such buffers 128/d x and the loop pays the
    # padded copy every iteration (measured on the dopri5 twin: ~330 ms per
    # 200k-node solve; see adaptive.solve_while).
    carry0 = dict(carry0, sol=tree_map(
        lambda y: jnp.zeros((T, y.size), y.dtype).at[0].set(y.reshape(-1)),
        y0))

    def cond(c):
        return (c["obs_i"] < T) & ((c["nacc"] + c["nrej"]) < max_steps) & c["ok"]

    def body(c):
        c_new, emit, _ = attempt({k: v for k, v in c.items() if k != "sol"})
        # un-reached attempts write at index T, which mode="drop" discards —
        # one indexed write, never a full-buffer select
        idx = jnp.where(emit["reached"], emit["obs_i"], T)
        sol = tree_map(
            lambda buf, v: buf.at[idx].set(v.reshape(-1), mode="drop"),
            c["sol"], emit["y_obs"])
        return dict(c_new, sol=sol)

    final = jax.lax.while_loop(cond, body, carry0)
    stats = SolveStats(nfe=final["nfe"], n_accepted=final["nacc"],
                       n_rejected=final["nrej"],
                       success=final["ok"] & (final["obs_i"] >= T))
    sol = tree_map(lambda buf, y: buf.reshape((T,) + y.shape), final["sol"], y0)
    return sol, stats


def solve_vcabm_scan(func, y0, t, rtol: float, atol: float,
                     max_order: int = _MAX_ORDER, max_steps: int = 256,
                     time_dtype=None, safety: float = 0.9,
                     ifactor: float = 10.0, dfactor: float = 0.2):
    """Reverse-differentiable bounded solve: exactly ``max_steps`` attempts with
    cond-skipped iterations once all observation times are reached, each step
    rematerialized in the backward pass (the same strategy as adaptive.solve_scan;
    gradients flow through the step/order controller like the reference's
    backprop-through-solver default). Observation states are emitted per step
    and scattered into the solution buffer once after the scan, so the (T, ...)
    buffer never rides in the carry."""
    carry0, _, attempt_scan, T, sol0 = _make_vcabm_machine(func, y0, t, rtol,
                                                           atol, max_order,
                                                           time_dtype=time_dtype,
                                                           safety=safety,
                                                           ifactor=ifactor,
                                                           dfactor=dfactor)
    emit_zero = dict(reached=jnp.asarray(False), obs_i=jnp.asarray(0, jnp.int32),
                     y_obs=tree_map(jnp.zeros_like, carry0["st"]["y"]))

    @jax.checkpoint
    def body_fn(c):
        done = (c["obs_i"] >= T) | (~c["ok"])
        return jax.lax.cond(done, lambda x: (x, emit_zero), attempt_scan, c)

    final, emits = jax.lax.scan(lambda c, _: body_fn(c), carry0, None,
                                length=max_steps)
    # one scatter for all observation writes; un-reached emissions drop via an
    # out-of-range index (mode="drop")
    idx = jnp.where(emits["reached"], emits["obs_i"], T)
    sol = tree_map(
        lambda buf, v: buf.at[idx].set(v, mode="drop"), sol0, emits["y_obs"])
    stats = SolveStats(nfe=final["nfe"], n_accepted=final["nacc"],
                       n_rejected=final["nrej"],
                       success=final["ok"] & (final["obs_i"] >= T))
    return sol, stats
