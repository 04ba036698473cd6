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

    adj = build_sparse_graph(args.n, args.deg, args.seed if hasattr(args, "seed") else 0)
    n = adj.shape[0]
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

    results = {}

    # 1. chained SpMV (fwd tiles)
    @jax.jit
    def spmv_chain(x):
        def b(_, acc):
            return matvec(op, acc) * 1e-3 + x
        return jax.lax.fori_loop(0, 10, b, x)

    dt, _ = timeit(spmv_chain, h, reps=5)
    results["spmv_ms"] = round(dt / 10 * 1e3, 2)
    log(f"SpMV: {dt/10*1e3:.2f} ms")

    # 2. full RHS eval (A·h then W·h etc.)
    @jax.jit
    def rhs_chain(x):
        def b(_, acc):
            return ode_func(params, op, 0.0, acc) * 1e-3 + x
        return jax.lax.fori_loop(0, 10, b, x)

    try:
        dt, _ = timeit(rhs_chain, h, reps=5)
        results["rhs_ms"] = round(dt / 10 * 1e3, 2)
        log(f"RHS: {dt/10*1e3:.2f} ms")
    except Exception as e:
        log(f"rhs probe skipped: {e}")

    # 3. forward solve, inference path (while_loop)
    @jax.jit
    def fwd_nondiff(p):
        out, stats = ndcn_forward(p, op, t_train, x0, rtol=0.01, atol=0.001,
                                  method="dopri5", max_steps=1 << 14,
                                  nondiff=True)
        return l1_loss(out, target), stats.nfe

    dt, (loss, nfe) = timeit(fwd_nondiff, params, reps=5)
    results["fwd_while_ms"] = round(dt * 1e3, 1)
    results["nfe"] = int(nfe)
    log(f"fwd solve (while): {dt*1e3:.1f} ms, nfe {int(nfe)}")

    # budget like the demo
    cpu_probe = to_cpu((params, op, t_train, x0))

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
    def fwd_scan(p):
        out, stats = ndcn_forward(p, op, t_train, x0, rtol=0.01, atol=0.001,
                                  method="dopri5", max_steps=max_steps)
        return l1_loss(out, target)

    dt, _ = timeit(fwd_scan, params, reps=5)
    results["fwd_scan_ms"] = round(dt * 1e3, 1)
    log(f"fwd solve (scan): {dt*1e3:.1f} ms")

    # 5. value_and_grad only
    @jax.jit
    def vgrad(p):
        def obj(q):
            out, stats = ndcn_forward(q, op, t_train, x0, rtol=0.01,
                                      atol=0.001, method="dopri5",
                                      max_steps=max_steps)
            return jnp.where(stats.success, l1_loss(out, target), jnp.nan)
        return jax.value_and_grad(obj)(p)

    dt, _ = timeit(vgrad, params, reps=5)
    results["grad_ms"] = round(dt * 1e3, 1)
    log(f"value_and_grad: {dt*1e3:.1f} ms")

    # 6. full train step
    opt = torch_adam(0.01, 1e-3)

    def objective(p, _rng):
        out, stats = ndcn_forward(p, op, t_train, x0, rtol=0.01, atol=0.001,
                                  method="dopri5", max_steps=max_steps)
        loss = l1_loss(out, target)
        return jnp.where(stats.success, loss, jnp.nan), relative_l1(out, target)

    step = jax.jit(make_sgd_step(opt, objective))
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)

    def full(p, s):
        return step(p, s, key)

    dt, _ = timeit(full, params, opt_state, reps=5)
    results["step_ms"] = round(dt * 1e3, 1)
    log(f"full step: {dt*1e3:.1f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
