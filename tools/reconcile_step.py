"""Reconcile the scale demo's steps/s with the profiler's step time (one session).

VERDICT r4 weak #1: tools/profile_scale_step.py reported ~4.6 s/step at
max_steps=12 while examples/large_graph.py recorded 6.25 s/step at max_steps=8
— a smaller budget that should be FASTER — and the two numbers came from
different sessions through the axon tunnel (whose host-load sensitivity is
documented to skew device timings uniformly). This tool eliminates every
cross-session variable: ONE process builds the exact flagship configuration
(examples/large_graph.py at --n 1M, feature-major, split2 kernel, bf16
emission/residual levers) and times the SAME compiled train step under

  1. the profiler's discipline — block_until_ready around every call,
     warm-up excluded (tools/profile_scale_step.py::timeit), and
  2. the demo's discipline — async dispatch with a key-split per iteration
     and a blocking elastic check + device-copy snapshot every 10 iterations
     (examples/large_graph.py timed loop),

at BOTH budgets (the demo's probe: headroom 1.5/slack 2 -> 8; the profiler's:
headroom 2.5/slack 4 -> 12). Timing both budgets also decomposes the step
linearly: per_slot_s = (t[ms_hi] - t[ms_lo]) / (ms_hi - ms_lo) and
fixed_s = t[ms_lo] - ms_lo * per_slot_s, which a single-budget measurement
cannot see.

Roofline accounting (VERDICT r4 weak #3): the same session times the bare
tiled SpMV (forward tiles and transpose tiles, feature-major spmv_T) and
derives the step's gather floor from the solve's EXECUTED eval count
(train/roofline.py: nfe forward gathers + nfe transpose gathers for the
cotangents; cond-skipped scan slots cost only a ~10 ms carry copy, which the
per-slot decomposition below measures directly).

What the first run of this tool established (results/reconcile_1m_step.json,
closing VERDICT r4 weak #1): the 4.6-vs-6.25 s/step "overhead" was never
overhead. (a) Budget is irrelevant — ms 8 -> 12 moves the blocking step
5.595 -> 5.635 s (per_slot_s 0.01). (b) The demo's async loop is FASTER than
blocking timeit (5.30 vs 5.60 s/step — pipelining hides the tunnel dispatch),
so the demo's loop discipline never cost anything. (c) Step cost is
TRAINING-STATE-dependent: the first post-init step runs 4.52 s, steady state
5.85-5.90 s blocking — the solve's accepted-attempt count (hence nfe, hence
SpMV gathers) grows as training bends the trajectory. The committed 6.25
s/step averaged 60 such iterations in a different session; the profiler's
4.6 s was near-init. The reference has no analogue of any of this (single CPU
process, torch.sparse.mm, /root/reference/neural_dynamics.py:28-31).

Usage:
    python tools/reconcile_step.py [--n 1000000] [--iters 20] \
        [--out results/reconcile_1m_step.json]

Run on an IDLE host (the axon tunnel is a host-side proxy; CLAUDE.md).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--deg", type=int, default=10)
    ap.add_argument("--hidden", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--iters", type=int, default=20,
                    help="iterations per demo-discipline loop")
    ap.add_argument("--reps", type=int, default=5,
                    help="blocking-discipline repetitions")
    ap.add_argument("--kernel_precision", default="split2",
                    choices=["split2", "bf16"])
    ap.add_argument("--emission_precision", default="bf16",
                    choices=["f32", "bf16"])
    ap.add_argument("--residual_precision", default="bf16",
                    choices=["f32", "bf16"])
    ap.add_argument("--out", type=str, default=None)
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
    from ndcn_tpu.graph.sparse import as_operator, use_tiled_kernel
    from ndcn_tpu.kernels.coo_spmv import spmv_T, sublane_pad
    from ndcn_tpu.models import init_ndcn, ndcn_forward
    from ndcn_tpu.train.budget import probe_step_budget, to_cpu
    from ndcn_tpu.train.elastic import device_copy
    from ndcn_tpu.train.losses import l1_loss, relative_l1
    from ndcn_tpu.train.optim import make_sgd_step, torch_adam
    from ndcn_tpu.train.sampling import sample_times

    adj = build_sparse_graph(args.n, args.deg, args.seed)
    n = adj.shape[0]
    log(f"graph {n:,} nodes {adj.nnz:,} edges")
    op = as_operator(normalized_laplacian_sparse(adj), sparse=True,
                     format="coo")
    splits = sample_times(5.0, 40, "irregular", seed=args.seed)
    t_train = jnp.asarray(splits.t[splits.id_train])
    rng = np.random.RandomState(args.seed)
    x0 = jnp.asarray(rng.uniform(0.0, 25.0, size=(n, 1)).astype(np.float32))
    # target VALUES do not affect step time (same program, same shapes); a
    # random target dodges the 15-min ground-truth solve / cache dependency
    target = jnp.asarray(
        rng.rand(len(splits.id_train), n, 1).astype(np.float32))
    params = init_ndcn(jax.random.PRNGKey(args.seed), 1, args.hidden, 1)
    cpu_probe = to_cpu((params, op, t_train, x0))

    has_tiles = getattr(op, "tiles", None) is not None and use_tiled_kernel()
    if has_tiles:
        op = op._replace(rows=None, cols=None, vals=None,
                         rows_t=None, cols_t=None, vals_t=None)
        fl = (op.tiles.vals, op.tiles_t.vals)
    else:
        raise SystemExit("reconcile_step expects the tiled TPU kernel path")

    probe_nfe = [0]

    def probe():
        p, op_c, t_c, x_c = cpu_probe
        stats = ndcn_forward(p, op_c, t_c, x_c, rtol=0.01, atol=0.001,
                             method="dopri5", max_steps=1 << 14,
                             nondiff=True)[1]
        probe_nfe[0] = int(stats.nfe)
        return stats

    # both probes, verbatim from their homes (examples/large_graph.py:323 and
    # tools/profile_scale_step.py:207)
    ms_demo = probe_step_budget(probe, floor=8, headroom=1.5, slack=2,
                                quantum=4)
    ms_prof = probe_step_budget(probe, floor=8, headroom=2.5, slack=4,
                                quantum=4)
    log(f"budgets: demo {ms_demo}, profiler {ms_prof} "
        f"(init-state nfe {probe_nfe[0]})")

    emission_dtype = (jnp.bfloat16 if args.emission_precision == "bf16"
                      else None)
    residual_dtype = (jnp.bfloat16 if args.residual_precision == "bf16"
                      else None)
    opt = torch_adam(0.01, 1e-3)

    def build_step(ms):
        """examples/large_graph.py::build_step, minus the elastic wrapper."""
        def objective(op_, x0_, target_):
            def obj(p, _rng):
                out, stats = ndcn_forward(
                    p, op_, t_train, x0_, rtol=0.01, atol=0.001,
                    method="dopri5", max_steps=ms, layout="auto",
                    emission_dtype=emission_dtype,
                    residual_dtype=residual_dtype)
                loss = l1_loss(out, target_)
                return (jnp.where(stats.success, loss, jnp.nan),
                        relative_l1(out, target_))
            return obj

        def step_fn(p, s, k, flv, x0_, target_):
            tv, tvt = flv
            op_ = op._replace(tiles=op.tiles._replace(vals=tv),
                              tiles_t=op.tiles_t._replace(vals=tvt))
            return make_sgd_step(opt, objective(op_, x0_, target_))(p, s, k)

        wrapped = jax.jit(step_fn, donate_argnums=(0, 1))

        def step(p, s, k):
            return wrapped(p, s, k, fl, x0, target)
        return step

    results = {"n_nodes": n, "nnz": int(adj.nnz),
               "ms_demo": int(ms_demo), "ms_prof": int(ms_prof),
               "kernel_precision": args.kernel_precision,
               "emission_precision": args.emission_precision,
               "residual_precision": args.residual_precision}

    # ------------------------------------------------------------ SpMV floor
    d_sub = sublane_pad(args.hidden)
    hT = jnp.asarray(rng.rand(d_sub, n).astype(np.float32))

    @jax.jit
    def spmv_fwd_chain(x, flv):
        tv, tvt = flv
        tiles = op.tiles._replace(vals=tv)
        tiles_t = op.tiles_t._replace(vals=tvt)

        def b(_, acc):
            return spmv_T(tiles, tiles_t, acc) * 1e-3 + x
        return jax.lax.fori_loop(0, 10, b, x)

    @jax.jit
    def spmv_t_chain(x, flv):
        # the transpose gather the backward pays: A^T @ cotangent rides the
        # sorted-transpose tile packing (tiles_t fwd <-> tiles as ITS transpose)
        tv, tvt = flv
        tiles = op.tiles._replace(vals=tv)
        tiles_t = op.tiles_t._replace(vals=tvt)

        def b(_, acc):
            return spmv_T(tiles_t, tiles, acc) * 1e-3 + x
        return jax.lax.fori_loop(0, 10, b, x)

    def timeit(fn, *fargs, reps=5, warm=2):
        for _ in range(warm):
            out = jax.block_until_ready(fn(*fargs))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.block_until_ready(fn(*fargs))
        return (time.perf_counter() - t0) / reps, out

    dt, _ = timeit(spmv_fwd_chain, hT, fl, reps=5)
    spmv_fwd_s = dt / 10
    dt, _ = timeit(spmv_t_chain, hT, fl, reps=5)
    spmv_t_s = dt / 10
    slots = int(op.tiles.cols.size)
    results.update(
        spmv_fwd_ms=round(spmv_fwd_s * 1e3, 2),
        spmv_t_ms=round(spmv_t_s * 1e3, 2),
        slots=slots,
        slot_rate_m_per_s=round(slots / spmv_fwd_s / 1e6, 1),
        gather_gb_per_spmv=round(slots * d_sub
                                 * (2 if args.kernel_precision == "bf16"
                                    else 4) / 1e9, 3))
    log(f"SpMV fwd {spmv_fwd_s*1e3:.1f} ms, transpose {spmv_t_s*1e3:.1f} ms, "
        f"{slots:,} slots ({results['slot_rate_m_per_s']}M slots/s)")

    # ------------------------------------------------- step, two disciplines
    per_budget = {}
    for label, ms in (("demo_budget", ms_demo), ("prof_budget", ms_prof)):
        step = build_step(ms)
        p = device_copy(params)
        s = opt.init(p)
        key = jax.random.PRNGKey(1)

        # compile + first call (excluded from all timings)
        t0 = time.time()
        p, s, loss, rel = step(p, s, key)
        jax.block_until_ready(loss)
        log(f"[{label} ms={ms}] compile+first {time.time() - t0:.1f}s")

        # discipline 1: profiler-style blocking reps
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            p, s, loss, rel = step(p, s, key)
            jax.block_until_ready(loss)
            ts.append(time.perf_counter() - t0)
        blocking_s = float(np.mean(ts))
        blocking_trace = [round(t, 3) for t in ts]

        # discipline 2: the demo's loop, verbatim semantics
        # (examples/large_graph.py:471-487): async dispatch, key split per
        # iter, finite-check (blocks on loss) + device-copy snapshot every 10
        snap = None
        key = jax.random.PRNGKey(1)
        t_run = time.time()
        i = 0
        while i < args.iters:
            key, k = jax.random.split(key)
            p, s, loss, rel = step(p, s, k)
            i += 1
            if i % 10 == 0 or i == args.iters:
                assert bool(np.all(np.isfinite(np.asarray(loss))))
                snap = (i, key, device_copy((p, s)))
        jax.block_until_ready(loss)
        demo_s = (time.time() - t_run) / args.iters

        # init-state floor: nfe forward gathers + nfe transpose gathers
        # (train/roofline.py census; per-step nfe grows with training)
        gather_floor_s = probe_nfe[0] * (spmv_fwd_s + spmv_t_s)
        per_budget[label] = {
            "max_steps": int(ms),
            "blocking_s_per_step": round(blocking_s, 3),
            "blocking_trace_s": blocking_trace,
            "demo_loop_s_per_step": round(demo_s, 3),
            "gather_floor_s": round(gather_floor_s, 3),
            "pct_of_gather_floor_blocking": round(
                100 * gather_floor_s / blocking_s, 1),
            "pct_of_gather_floor_demo": round(
                100 * gather_floor_s / demo_s, 1),
        }
        log(f"[{label} ms={ms}] blocking {blocking_s:.3f}s/step "
            f"{blocking_trace}; demo-loop {demo_s:.3f}s/step; "
            f"floor {gather_floor_s:.3f}s "
            f"({per_budget[label]['pct_of_gather_floor_blocking']}% / "
            f"{per_budget[label]['pct_of_gather_floor_demo']}%)")
        del p, s, loss, rel, snap

    # linear decomposition across the two budgets (same discipline)
    lo, hi = per_budget["demo_budget"], per_budget["prof_budget"]
    if hi["max_steps"] > lo["max_steps"]:
        dms = hi["max_steps"] - lo["max_steps"]
        per_slot = (hi["blocking_s_per_step"] - lo["blocking_s_per_step"]) / dms
        results["per_slot_s"] = round(per_slot, 4)
        results["fixed_s"] = round(
            lo["blocking_s_per_step"] - lo["max_steps"] * per_slot, 4)
        # what a slot WOULD cost if its 6 stage evals executed when skipped —
        # the measured per_slot_s vs this is the proof that cond-skipped
        # slots are genuinely skipped
        results["per_slot_if_6evals_s"] = round(6 * (spmv_fwd_s + spmv_t_s), 4)
    results["probe_nfe"] = int(probe_nfe[0])
    results["per_budget"] = per_budget
    results["device"] = str(jax.devices()[0])

    print(json.dumps(results))
    if args.out:
        from ndcn_tpu.utils.io import atomic_write
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        atomic_write(args.out, json.dumps(
            {**results, "argv": sys.argv[1:]}, indent=1).encode())


if __name__ == "__main__":
    main()
