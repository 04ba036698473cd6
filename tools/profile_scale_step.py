"""Decompose the 200k-node train step: SpMV -> RHS -> solve -> grad -> step.

Times each level of the stack on the same graph/model the scale demo uses
(examples/large_graph.py) so the per-level deltas attribute the step cost:
gather-bound SpMV, solver arithmetic, backward, optimizer. Chained
data-dependent repetition keeps XLA from hoisting work out of the timed loop.

Usage: python tools/profile_scale_step.py [--n 200000] [--kernel_precision bf16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ndcn_jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=10, warm=2):
    import jax
    for _ in range(warm):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--deg", type=int, default=10)
    ap.add_argument("--hidden", type=int, default=20)
    ap.add_argument("--kernel_precision", default="bf16",
                    choices=["split2", "bf16"])
    ap.add_argument("--seed", type=int, default=0)
    # the million-node levers (examples/large_graph.py): profile the EXACT
    # configuration the committed scale records run, not just the 200k default
    ap.add_argument("--layout", default="auto",
                    choices=["auto", "nd", "feature_major"])
    ap.add_argument("--emission_precision", default="f32",
                    choices=["f32", "bf16"])
    ap.add_argument("--residual_precision", default="f32",
                    choices=["f32", "bf16"])
    from ndcn_tpu.utils.platform import add_platform_flag
    add_platform_flag(ap)
    args = ap.parse_args()

    from ndcn_tpu.utils.platform import (enable_compile_cache, force_platform,
                                         set_matmul_precision)
    force_platform(args.platform)
    set_matmul_precision(args.precision)
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.kernel_precision == "bf16":
        from ndcn_tpu.kernels import coo_spmv
        coo_spmv.GATHER_BF16 = True

    from examples.large_graph import build_sparse_graph
    from ndcn_tpu.graph.operators import normalized_laplacian_sparse
    from ndcn_tpu.graph.sparse import as_operator, matvec
    from ndcn_tpu.models import init_ndcn, ndcn_forward
    from ndcn_tpu.models.ndcn import ode_func
    from ndcn_tpu.train.budget import probe_step_budget, to_cpu
    from ndcn_tpu.train.losses import l1_loss, relative_l1
    from ndcn_tpu.train.optim import make_sgd_step, torch_adam
    from ndcn_tpu.train.sampling import sample_times

    adj = build_sparse_graph(args.n, args.deg, args.seed)
    n = adj.shape[0]
    emission_dtype = jnp.bfloat16 if args.emission_precision == "bf16" else None
    residual_dtype = jnp.bfloat16 if args.residual_precision == "bf16" else None
    lev = dict(layout=args.layout, emission_dtype=emission_dtype,
               residual_dtype=residual_dtype)
    op = as_operator(normalized_laplacian_sparse(adj), sparse=True, format="coo")
    log(f"graph {n:,} nodes {adj.nnz:,} edges")

    rng = np.random.RandomState(0)
    d = args.hidden
    h = jnp.asarray(rng.rand(n, d).astype(np.float32))
    params = init_ndcn(jax.random.PRNGKey(0), 1, d, 1)
    splits = sample_times(5.0, 40, "irregular", seed=0)
    t_train = jnp.asarray(splits.t[splits.id_train])
    x0 = jnp.asarray(rng.uniform(0, 25, size=(n, 1)).astype(np.float32))
    target = jnp.asarray(rng.rand(len(splits.id_train), n, 1).astype(np.float32))

    # the CPU budget probe needs the triplet path — copy before the drop below
    cpu_probe = to_cpu((params, op, t_train, x0))

    # examples/large_graph.py's million-node arg plumbing: the axon compile
    # endpoint caps requests at ~256 MB, so the big FLOAT leaves (tile vals,
    # x0, target) ride as jit arguments, not closure constants, and the plain
    # COO triplets are dropped when the tiled kernel serves matvec (the int
    # index arrays stay closures — int tracers cannot cross the grad guard)
    from ndcn_tpu.graph.sparse import use_tiled_kernel
    has_tiles = getattr(op, "tiles", None) is not None and use_tiled_kernel()
    if has_tiles:
        op = op._replace(rows=None, cols=None, vals=None,
                         rows_t=None, cols_t=None, vals_t=None)
        fl = (op.tiles.vals, op.tiles_t.vals)
    else:
        fl = (None, None)

    def with_vals(flv):
        if not has_tiles:
            return op
        tv, tvt = flv
        return op._replace(tiles=op.tiles._replace(vals=tv),
                           tiles_t=op.tiles_t._replace(vals=tvt))

    results = {}

    # sections 1-2 probe the SAME layout the solve below resolves to, so the
    # SpMV row of the breakdown is the cost the solve actually pays per eval
    # (the feature-major solve skips tiled_spmv's per-call (n, d) <-> (d_sub, n)
    # relayout — ~5 ms of the ~102 ms nd matvec at 1M nodes).
    # Mirrors models/ndcn.ndcn_forward's 'auto' resolution.
    from ndcn_tpu.models.ndcn import _FEATURE_MAJOR_AUTO_NODES, ode_func_T
    fm = has_tiles and (args.layout == "feature_major"
                        or (args.layout == "auto"
                            and n >= _FEATURE_MAJOR_AUTO_NODES))
    results["resolved_layout"] = "feature_major" if fm else "nd"
    if fm:
        from ndcn_tpu.kernels.coo_spmv import spmv_T, sublane_pad
        d_sub = sublane_pad(d)
        hT = jnp.pad(h, ((0, 0), (0, d_sub - d))).T      # (d_sub, n)

        @jax.jit
        def spmv_chain(x, flv):
            op_ = with_vals(flv)

            def b(_, acc):
                return spmv_T(op_.tiles, op_.tiles_t, acc) * 1e-3 + x
            return jax.lax.fori_loop(0, 10, b, x)

        @jax.jit
        def rhs_chain(x, flv):
            op_ = with_vals(flv)

            def b(_, acc):
                return ode_func_T(params, op_, 0.0, acc) * 1e-3 + x
            return jax.lax.fori_loop(0, 10, b, x)

        probe_x = hT
    else:
        # 1. chained SpMV (fwd tiles)
        @jax.jit
        def spmv_chain(x, flv):
            op_ = with_vals(flv)

            def b(_, acc):
                return matvec(op_, acc) * 1e-3 + x
            return jax.lax.fori_loop(0, 10, b, x)

        # 2. full RHS eval (A·h then W·h etc.)
        @jax.jit
        def rhs_chain(x, flv):
            op_ = with_vals(flv)

            def b(_, acc):
                return ode_func(params, op_, 0.0, acc) * 1e-3 + x
            return jax.lax.fori_loop(0, 10, b, x)

        probe_x = h

    dt, _ = timeit(spmv_chain, probe_x, fl, reps=5)
    results["spmv_ms"] = round(dt / 10 * 1e3, 2)
    log(f"SpMV ({results['resolved_layout']}): {dt/10*1e3:.2f} ms")

    try:
        dt, _ = timeit(rhs_chain, probe_x, fl, reps=5)
        results["rhs_ms"] = round(dt / 10 * 1e3, 2)
        log(f"RHS: {dt/10*1e3:.2f} ms")
    except Exception as e:
        log(f"rhs probe skipped: {e}")

    # 3. forward solve, inference path (while_loop)
    @jax.jit
    def fwd_nondiff(p, flv, x0_, target_):
        out, stats = ndcn_forward(p, with_vals(flv), t_train, x0_,
                                  rtol=0.01, atol=0.001,
                                  method="dopri5", max_steps=1 << 14,
                                  nondiff=True, **lev)
        return l1_loss(out, target_), stats.nfe

    dt, (loss, nfe) = timeit(fwd_nondiff, params, fl, x0, target, reps=5)
    results["fwd_while_ms"] = round(dt * 1e3, 1)
    results["nfe"] = int(nfe)
    log(f"fwd solve (while): {dt*1e3:.1f} ms, nfe {int(nfe)}")

    def probe():
        p, op_c, t_c, x_c = cpu_probe
        return ndcn_forward(p, op_c, t_c, x_c, rtol=0.01, atol=0.001,
                            method="dopri5", max_steps=1 << 14,
                            nondiff=True)[1]

    max_steps = probe_step_budget(probe, floor=8, headroom=2.5, slack=4,
                                  quantum=4)
    results["max_steps"] = int(max_steps)
    log(f"budget {max_steps}")

    # 4. forward solve, differentiable path (bounded scan), no grad
    @jax.jit
    def fwd_scan(p, flv, x0_, target_):
        out, stats = ndcn_forward(p, with_vals(flv), t_train, x0_,
                                  rtol=0.01, atol=0.001,
                                  method="dopri5", max_steps=max_steps, **lev)
        return l1_loss(out, target_)

    dt, _ = timeit(fwd_scan, params, fl, x0, target, reps=5)
    results["fwd_scan_ms"] = round(dt * 1e3, 1)
    log(f"fwd solve (scan): {dt*1e3:.1f} ms")

    # 5. value_and_grad only
    @jax.jit
    def vgrad(p, flv, x0_, target_):
        def obj(q):
            out, stats = ndcn_forward(q, with_vals(flv), t_train, x0_,
                                      rtol=0.01,
                                      atol=0.001, method="dopri5",
                                      max_steps=max_steps, **lev)
            return jnp.where(stats.success, l1_loss(out, target_), jnp.nan)
        return jax.value_and_grad(obj)(p)

    dt, _ = timeit(vgrad, params, fl, x0, target, reps=5)
    results["grad_ms"] = round(dt * 1e3, 1)
    log(f"value_and_grad: {dt*1e3:.1f} ms")

    # 6. full train step
    opt = torch_adam(0.01, 1e-3)

    def objective_with(flv, x0_, target_):
        def objective(p, _rng):
            out, stats = ndcn_forward(p, with_vals(flv), t_train, x0_,
                                      rtol=0.01, atol=0.001,
                                      method="dopri5", max_steps=max_steps,
                                      **lev)
            loss = l1_loss(out, target_)
            return (jnp.where(stats.success, loss, jnp.nan),
                    relative_l1(out, target_))
        return objective

    @jax.jit
    def step(p, s, k, flv, x0_, target_):
        return make_sgd_step(opt, objective_with(flv, x0_, target_))(p, s, k)

    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)

    def full(p, s):
        return step(p, s, key, fl, x0, target)

    dt, _ = timeit(full, params, opt_state, reps=5)
    results["step_ms"] = round(dt * 1e3, 1)
    log(f"full step: {dt*1e3:.1f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
