"""Scale demo: learn heat diffusion on a graph ~10-25x the reference's largest.

The reference tops out at pubmed (19,717 nodes, utils.py:91) and its dynamics
experiments at 400 nodes — its heat pipeline materializes the DENSE Laplacian
(heat_dynamics.py:150-167), which is 160 GB at 200k nodes. Everything here
stays sparse end to end: scipy CSR on the host, the COO segment-sum operator
on device, ground truth through the minimal-FLOP while_loop solve, and NDCN
training through the differentiable bounded-scan dopri5 with a probe-sized
step budget — the same machinery as the main drivers, at a scale the
reference cannot represent.

Usage:
    python examples/large_graph.py --n 200000 --deg 10 [--platform cpu]

Prints one JSON line: train steps/s, RHS node-evals/s, final relative loss.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def build_sparse_graph(n: int, avg_degree: int, seed: int) -> sp.csr_matrix:
    """Random symmetric graph with ~avg_degree edges per node, no dense step."""
    rng = np.random.RandomState(seed)
    m = n * avg_degree // 2
    rows = rng.randint(0, n, size=m)
    cols = rng.randint(0, n, size=m)
    keep = rows != cols
    a = sp.coo_matrix((np.ones(keep.sum(), np.float32),
                       (rows[keep], cols[keep])), shape=(n, n)).tocsr()
    a = a + a.T
    a.data[:] = 1.0
    return a


def main(argv=None):
    ap = argparse.ArgumentParser("large_graph")
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--deg", type=int, default=10)
    ap.add_argument("--dynamics", type=str, default="heat",
                    choices=["heat", "mutualistic", "gene"],
                    help="physics for the ground truth; mutualistic exercises "
                         "the COO edge-list interaction at a scale its ELL "
                         "form cannot represent (max-degree padding)")
    ap.add_argument("--hidden", type=int, default=20)
    ap.add_argument("--time_tick", type=int, default=40)
    ap.add_argument("--T", type=float, default=5.0)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fmt", type=str, default="coo", choices=["coo", "ell"],
                    help="sparse layout: COO (Pallas sliced-tile segment-sum "
                         "kernel on TPU) or ELL gather+einsum (pads rows to "
                         "max degree; only viable on tight degree "
                         "distributions)")
    ap.add_argument("--kernel_precision", type=str, default="split2",
                    choices=["split2", "bf16"],
                    help="COO kernel numerics: split2 (two-term bf16 split "
                         "accumulation, ~2e-6 rel err) or bf16 (gather and "
                         "reduce in bf16, ~4e-3 — sound for SGD at rtol "
                         "0.01, ~1.5x faster train steps)")
    ap.add_argument("--layout", type=str, default="auto",
                    choices=["auto", "nd", "feature_major"],
                    help="ODE-state layout for the solve. feature_major keeps "
                         "the state (d_sub, n) so saved SpMV residuals and "
                         "solver arithmetic dodge the (8, 128) lane-pad tax "
                         "(6.4x at d=20) — REQUIRED above ~500k nodes, where "
                         "the padded (n, d) residuals alone would exceed HBM")
    ap.add_argument("--emission_precision", type=str, default="f32",
                    choices=["f32", "bf16"],
                    help="dtype of the training scan's dense-output emission "
                         "buffers (the dominant residual at scale: ~3.8 GB "
                         "per direction at 1M nodes in f32). bf16 halves "
                         "them at ~4e-3 on interpolated observations")
    ap.add_argument("--residual_precision", type=str, default="f32",
                    choices=["f32", "bf16"],
                    help="dtype of the remat-SAVED SpMV outputs (the largest "
                         "per-step residuals: nfe x n*d per solve, 4.6 GB at "
                         "1M nodes in f32). bf16 halves them; it rounds the "
                         "integrated RHS (~4e-3, fwd/bwd consistent) — sound "
                         "for SGD at rtol 0.01")
    ap.add_argument("--gt_cache", type=str, default=None,
                    help="npz path to cache the ground-truth trajectory; "
                         "loaded if present (caller owns key uniqueness — "
                         "the file stores n/deg/dynamics/seed and mismatches "
                         "are rejected). The 1M-node CPU solve takes ~15 min")
    ap.add_argument("--gt_only", action="store_true",
                    help="compute (and --gt_cache) the ground-truth trajectory "
                         "then exit — precompute the ~15 min 1M-node CPU solve "
                         "once, so the TPU training run starts instantly. Run "
                         "with --platform cpu; requires --gt_cache")
    ap.add_argument("--estimate", action="store_true",
                    help="print the shape-derived HBM breakdown of the train "
                         "step (emissions, saved residuals, tiles, data) for "
                         "this configuration and exit — size a million-node "
                         "run without burning a tunnel compile. Run with "
                         "--platform cpu; only shapes are used")
    ap.add_argument("--mesh", action="store_true",
                    help="row-shard the operator and node-major arrays over "
                         "all visible devices ('model' axis); prints a "
                         "sharded-vs-unsharded first-step parity delta")
    ap.add_argument("--roofline", action="store_true",
                    help="after the timed loop, measure the tiled SpMV "
                         "(forward + transpose packings) at this exact shape "
                         "and record the step's gather floor and "
                         "pct_of_gather_floor (train/roofline.py) — the "
                         "distance-from-ceiling a future regression is "
                         "judged against")
    ap.add_argument("--hbm_probe", action="store_true",
                    help="after the timed loop, bisect the largest ballast "
                         "allocation that coexists with one more train step "
                         "— a MEASURED high-water bound (hbm_peak_gb = limit "
                         "- ballast) on backends whose memory_stats() is "
                         "empty (the axon plugin)")
    ap.add_argument("--out", type=str, default=None,
                    help="also write the result JSON (plus the argv) to this "
                         "path — the committed scale records under results/ "
                         "are produced this way (tools/bench_scale.py)")
    from ndcn_tpu.utils.platform import add_platform_flag
    add_platform_flag(ap)
    args = ap.parse_args(argv)

    from ndcn_tpu.utils.platform import (enable_compile_cache, force_platform,
                                         set_matmul_precision)
    force_platform(args.platform)
    set_matmul_precision(args.precision)
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    if args.kernel_precision == "bf16":
        from ndcn_tpu.kernels import coo_spmv
        coo_spmv.GATHER_BF16 = True
    from ndcn_tpu.dynamics import make_rhs
    from ndcn_tpu.graph.operators import normalized_laplacian_sparse
    from ndcn_tpu.graph.sparse import as_operator
    from ndcn_tpu.models import init_ndcn, ndcn_forward
    from ndcn_tpu.train.budget import probe_step_budget, to_cpu
    from ndcn_tpu.train.losses import l1_loss, relative_l1
    from ndcn_tpu.train.optim import make_sgd_step, torch_adam
    from ndcn_tpu.train.sampling import sample_times

    t0_wall = time.time()
    adj = build_sparse_graph(args.n, args.deg, args.seed)
    n = adj.shape[0]
    print(f"graph: {n:,} nodes, {adj.nnz:,} directed edges "
          f"({time.time() - t0_wall:.1f}s host build)", file=sys.stderr)

    # The MODEL always propagates through the normalized Laplacian (spectrum
    # in [0, 2]): with the raw D - A operator, lambda_max ~ 2*max_degree (~60
    # here) makes the explicit solve stability-limited to O(lambda*T) steps —
    # at 200k nodes the scan's per-step dense-output emissions then exceed
    # HBM. Heat PHYSICS uses the same normalized operator (same diffusion in
    # the explicit-solver regime, ~15 steps — the honest way to run non-stiff
    # RK at this scale); mutualistic/gene couple through the raw adjacency
    # (their saturating/Hill couplings keep the dynamics tame). Everything
    # stays sparse on device; mutualistic requires the COO edge-list form —
    # ELL's max-degree padding cannot represent this graph (docs/PARITY.md).
    model_op = as_operator(normalized_laplacian_sparse(adj), sparse=True,
                           format=args.fmt)
    if args.dynamics == "heat":
        physics_op = model_op
    else:
        if args.dynamics == "mutualistic" and args.fmt != "coo":
            raise SystemExit("mutualistic at this scale requires --fmt coo")
        physics_op = as_operator(adj, sparse=True, format=args.fmt)

    splits = sample_times(args.T, args.time_tick, "irregular", seed=args.seed)
    t_full = jnp.asarray(splits.t)
    t_train = jnp.asarray(splits.t[splits.id_train])
    rng = np.random.RandomState(args.seed)
    x0 = jnp.asarray(rng.uniform(0.0, 25.0, size=(n, 1)).astype(np.float32))

    from ndcn_tpu.ode import odeint_with_stats

    if args.estimate:
        # Shape-derived HBM breakdown of the train step — no ground truth, no
        # device compile; the same probe sizes the budget as the real run.
        from ndcn_tpu.kernels.coo_spmv import sublane_pad
        from ndcn_tpu.ode import adaptive
        from ndcn_tpu.train.budget import accelerator_memory_limit

        params = init_ndcn(jax.random.PRNGKey(args.seed), 1, args.hidden, 1)
        p_c, op_c, t_c, x_c = to_cpu((params, model_op, t_train, x0))
        stats = ndcn_forward(p_c, op_c, t_c, x_c, rtol=0.01, atol=0.001,
                             method="dopri5", max_steps=1 << 14,
                             nondiff=True)[1]
        ms = probe_step_budget(lambda: stats, floor=8, headroom=1.5, slack=2,
                               quantum=4)
        # Which solve layout will the real run use? The (n, d) layout's
        # per-step residents tile to (n, ≥128) lanes on TPU — 128/d x padding
        # at small hidden widths (the models/ndcn layout rationale); the
        # feature-major (d_sub, n) layout pads only d -> d_sub sublanes.
        # NB train/budget.scan_train_bytes is the generic (validated) solve
        # estimator; this breakdown adds the demo-specific terms it cannot
        # know (readout-sized emissions, bf16 levers, tile packing, padding).
        from ndcn_tpu.models.ndcn import _FEATURE_MAJOR_AUTO_NODES
        fm = (args.layout == "feature_major"
              or (args.layout == "auto" and n >= _FEATURE_MAJOR_AUTO_NODES))
        d_sub = sublane_pad(args.hidden)
        d_lane = -(-args.hidden // 128) * 128           # (n, d) lane padding
        st32 = n * (d_sub if fm else d_lane) * 4        # one padded state f32
        em_scale = 0.5 if args.emission_precision == "bf16" else 1.0
        rs_scale = 0.5 if args.residual_precision == "bf16" else 1.0
        y_sds = jax.ShapeDtypeStruct((d_sub, n), jnp.float32)
        interp32 = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                       for l in jax.tree_util.tree_leaves(jax.eval_shape(
                           adaptive.DOPRI5_METHOD.interp_init, y_sds)))
        n_coeff = interp32 // (n * d_sub * 4)           # 5 for dopri5
        # the decoder folds through the solver's emissions (emission_readout,
        # applied per coefficient INSIDE the scan): each emitted slot is
        # readout-sized (flattened n x num_classes=1), not state-sized
        emissions = int(ms * n_coeff * n * 4 * em_scale) * 2  # fwd + bwd
        carry_saves = ms * 2 * st32                     # (y, f) per scan slot
        spmv_saves = int(ms * 6 * st32 * rs_scale)      # 6 new evals/attempt
        tiles_b = 0
        gather_b = 0
        tiles = getattr(model_op, "tiles", None)
        if tiles is not None:
            slots = int(tiles.cols.size)
            tiles_b = 2 * slots * (4 + 4 + 4)           # cols+vals+local_rows
            # the per-eval (d_sub, slots) gather buffer is a TRANSIENT, but
            # it coexists with every resident above at eval time, so it
            # belongs in the fit total
            g_item = 2 if args.kernel_precision == "bf16" else 4
            gather_b = slots * d_sub * g_item
        data_b = (len(splits.id_train) + 1) * n * 4     # target + x0
        total = (emissions + carry_saves + spmv_saves + tiles_b + gather_b
                 + data_b)
        limit = accelerator_memory_limit()
        for name, b in [("emissions(fwd+bwd)", emissions),
                        ("carry_saves", carry_saves),
                        ("spmv_saves", spmv_saves), ("tiles", tiles_b),
                        ("gather_transient", gather_b),
                        ("data", data_b)]:
            print(f"  {name:<20s} {b / 1e9:6.2f} GB", file=sys.stderr)
        print(json.dumps({
            "estimate_gb": round(total / 1e9, 2),
            "hbm_limit_gb": round(limit / 1e9, 2),
            "fits": total < 0.85 * limit, "max_steps": int(ms),
            "layout": "feature_major" if fm else "nd",
            "n_nodes": n, "nnz": int(adj.nnz), "hidden": args.hidden,
            "emission_precision": args.emission_precision,
            "residual_precision": args.residual_precision}))
        return None, None

    # Ground truth on the CPU backend, like the main driver (dynamics.py):
    # the d=1 physics state is (n, 1), whose minor dim pads 128x under the
    # TPU's (8, 128) tiling — every elementwise solver op then moves 100 MB
    # instead of 0.8 MB (measured 144 s for the solve on-TPU vs ~3 s on CPU).
    gt_t0 = time.time()
    gt_key = dict(n=n, deg=args.deg, dynamics=args.dynamics, seed=args.seed,
                  T=args.T, time_tick=args.time_tick)
    cached = None
    if args.gt_cache and os.path.exists(args.gt_cache):
        blob = np.load(args.gt_cache)
        if all(blob[k] == v for k, v in gt_key.items()):
            cached = blob["truth"]
            print(f"ground truth: loaded from {args.gt_cache}", file=sys.stderr)
        else:
            raise SystemExit(f"--gt_cache {args.gt_cache} was generated for "
                             f"different run parameters; delete it or point "
                             f"at a fresh path")
    if cached is not None:
        truth = jax.device_put(cached)
        gt_s = 0.0
    else:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            physics_cpu = to_cpu(physics_op)
            rhs = make_rhs(args.dynamics, physics_cpu)
            truth, gt_stats = odeint_with_stats(
                rhs, jax.device_put(x0, cpu), jax.device_put(t_full, cpu),
                rtol=1e-6, atol=1e-8, method="dopri5",
                options={"differentiable": False})
            truth = jax.block_until_ready(truth)
        if args.gt_cache:
            np.savez(args.gt_cache, truth=np.asarray(truth), **gt_key)
        truth = jax.device_put(np.asarray(truth))
        gt_s = time.time() - gt_t0
        assert bool(gt_stats.success)
        print(f"ground truth: {int(gt_stats.nfe)} RHS evals in {gt_s:.2f}s "
              f"({int(gt_stats.nfe) * n / gt_s:,.0f} node-evals/s)",
              file=sys.stderr)
    if args.gt_only:
        if not args.gt_cache:
            raise SystemExit("--gt_only without --gt_cache computes a "
                             "trajectory nobody keeps; pass --gt_cache")
        print(json.dumps({"gt_only": True, "gt_cache": args.gt_cache,
                          "ground_truth_s": round(gt_s, 2), "n_nodes": n,
                          "cached": cached is not None}))
        return None, None
    target = truth[jnp.asarray(splits.id_train)]
    # free the full-trajectory device copy and the physics alias so the
    # dropped triplets below are actually collectable
    del truth, cached, physics_op

    params = init_ndcn(jax.random.PRNGKey(args.seed), 1, args.hidden, 1)
    cpu_probe = to_cpu((params, model_op, t_train, x0))

    from ndcn_tpu.graph.sparse import use_tiled_kernel
    if (getattr(model_op, "tiles", None) is not None and not args.mesh
            and use_tiled_kernel()):
        # the tiled TPU path never reads the plain COO triplets — drop them
        # from the DEVICE operator so their ~480 MB (at 1M nodes) of HBM goes
        # to the train step instead (the CPU probe copy above keeps its own).
        # Guarded on use_tiled_kernel(): on CPU matvec falls through to the
        # triplet segment-sum path, which still needs them
        model_op = model_op._replace(rows=None, cols=None, vals=None,
                                     rows_t=None, cols_t=None, vals_t=None)

    probe_nfe = [0]

    def probe():
        p, op_c, t_c, x_c = cpu_probe
        stats = ndcn_forward(p, op_c, t_c, x_c, rtol=0.01, atol=0.001,
                             method="dopri5", max_steps=1 << 14,
                             nondiff=True)[1]
        probe_nfe[0] = int(stats.nfe)
        return stats

    # snug sizing, two reasons: at 200k nodes every scan slot is a ~75 MB
    # emission buffer (x several live copies through the backward) AND a
    # frozen slot still costs ~7 ms of step time (measured slope, 6->16
    # slots: 524->593 ms vgrad). Exhaustion is recoverable — the loop below
    # rolls back to the last finite snapshot and doubles the budget
    # (train/elastic.py), so headroom stays at 1.5 instead of insurance-grade
    max_steps = probe_step_budget(probe, floor=8, headroom=1.5, slack=2,
                                  quantum=4)
    print(f"step budget: {max_steps} (train solve nfe {probe_nfe[0]})",
          file=sys.stderr)

    emission_dtype = jnp.bfloat16 if args.emission_precision == "bf16" else None
    residual_dtype = jnp.bfloat16 if args.residual_precision == "bf16" else None

    def objective_with(op_, x0_, target_, ms):
        def objective(p, _rng):
            out, stats = ndcn_forward(p, op_, t_train, x0_, rtol=0.01,
                                      atol=0.001, method="dopri5",
                                      max_steps=ms, layout=args.layout,
                                      emission_dtype=emission_dtype,
                                      residual_dtype=residual_dtype)
            loss = l1_loss(out, target_)
            return (jnp.where(stats.success, loss, jnp.nan),
                    relative_l1(out, target_))
        return objective

    opt = torch_adam(0.01, 1e-3)

    def hoisted_parity_step(op_, x0_, target_):
        """One-shot (undonated) train step with the big FLOAT leaves hoisted
        to jit arguments — the same hoist build_step below documents. The
        parity check must use it too: with the tile vals as closure
        constants, lowering the 1M-node parity steps exceeds the axon
        remote-compile request cap (HTTP 413 'length limit exceeded')."""
        has_tiles_ = getattr(op_, "tiles", None) is not None

        def step_fn(p, s, k, fl, x0a, ta):
            tv, tvt = fl
            opx = op_._replace(tiles=op_.tiles._replace(vals=tv),
                               tiles_t=op_.tiles_t._replace(vals=tvt)) \
                if has_tiles_ else op_
            return make_sgd_step(opt, objective_with(opx, x0a, ta,
                                                     max_steps))(p, s, k)

        wrapped = jax.jit(step_fn)
        fl = ((op_.tiles.vals, op_.tiles_t.vals) if has_tiles_
              else (None, None))
        return lambda p, s, k: wrapped(p, s, k, fl, x0_, target_)

    mesh_parity = None
    if args.mesh:
        if len(jax.devices()) < 2:
            # a 1-device mesh is still the REAL shard_map program (row-block
            # kernel, psum'd cotangent) — it isolates the sharded step's
            # end-to-end overhead vs the unsharded record on the same chip
            # (VERDICT r4 weak #6); multi-chip projections then rest on a
            # measured per-device cost, not just the SpMV microbench
            print("--mesh: single device; timing the sharded program on a "
                  "1-device mesh", file=sys.stderr)
        # Row-shard the operator (COO -> shard_map row-block SpMV, sorted
        # transpose backward) and every node-major array over the mesh's
        # 'model' axis; params stay replicated. Before committing to the
        # sharded run, one train step runs BOTH ways from identical init and
        # the parity delta is printed — sharding must not change the math.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ndcn_tpu.parallel.mesh import (make_mesh, node_sharding,
                                            replicated)
        from ndcn_tpu.parallel.sweep import shard_operator

        mesh = make_mesh(data_divides=1, model_divides=n)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
              file=sys.stderr)
        op_u, x0_u, target_u = model_op, x0, target
        model_op = shard_operator(mesh, model_op)
        x0 = jax.device_put(x0, node_sharding(mesh))
        target = jax.device_put(target, NamedSharding(mesh, P(None, "model",
                                                              None)))
        rep = replicated(mesh)
        params = jax.tree_util.tree_map(lambda l: jax.device_put(l, rep),
                                        params)
        step_u = hoisted_parity_step(op_u, x0_u, target_u)
        step_s = hoisted_parity_step(model_op, x0, target)
        pk = jax.random.PRNGKey(2)
        _, _, l_u, r_u = step_u(params, opt.init(params), pk)
        _, _, l_s, r_s = step_s(params, opt.init(params), pk)
        mesh_parity = abs(float(l_s) - float(l_u)) / (abs(float(l_u)) + 1e-30)
        print(f"mesh parity: sharded vs unsharded first-step loss rel delta "
              f"{mesh_parity:.3e} ({float(l_s):.6f} vs {float(l_u):.6f})",
              file=sys.stderr)
        assert mesh_parity < 1e-4, "sharded step diverged from unsharded math"
        # free the unsharded copies before the timed loop — at 1M nodes the
        # operator (triplets + two tile packings) plus x0/target hold ~0.6 GB
        # of HBM the sharded step needs; and apply the same triplet drop as
        # the single-device path above: the tiled sharded matvec
        # (parallel/coo_shard._rs_tiled_matvec) never reads the plain
        # (p, m) row-block triplets
        del op_u, x0_u, target_u, step_u, step_s
        if model_op.tiles is not None and use_tiled_kernel():
            model_op = model_op._replace(
                local_rows=None, cols=None, vals=None,
                local_rows_t=None, cols_t=None, vals_t=None)

    opt_state = opt.init(params)
    if args.mesh:
        # Commit the fresh opt state to the replicated mesh sharding like the
        # params above (the drivers already do this — dgnn.py/dynamics.py mesh
        # branches). optax's init leaves its int32[] step counter UNCOMMITTED,
        # so the first step call keys the jit cache on UnspecifiedValue while
        # the RETURNED state comes back committed as NamedSharding P() — the
        # second call then recompiles the whole train step INSIDE the timed
        # loop. Through the axon tunnel that silent recompile is ~40 s at the
        # 200k shape: it alone turned the measured 2.33 steps/s into the 0.90
        # of the first scale_200k_heat_mesh.json (60 iters / (25.8 s + 40 s)),
        # masquerading as a 2.6x shard_map tax that tools/analyze_mesh_tax.py
        # shows does not exist (step_s 439 vs step_u 437 ms on the chip).
        opt_state = jax.tree_util.tree_map(
            lambda l: jax.device_put(l, rep), opt_state)

    # The FLOAT arrays (tile vals, x0, target) ride as jit ARGUMENTS, not
    # closures: closed-over arrays embed in the compiled program as constants,
    # and the axon tunnel's remote-compile endpoint caps the request at
    # ~256 MB (measured; HTTP 413 beyond it) — at 1M nodes the closures total
    # ~0.5 GB. The INT index arrays stay as concrete closure constants
    # (~180 MB at 1M, under the cap): traced integers cannot cross the
    # solver's gradient guard — jax.closure_convert hoists only inexact
    # tracers, so an int tracer captured in a remat'd cond branch fails to
    # lower ("No constant handler for DynamicJaxprTracer").
    # Works for both operator kinds: the single-device CooGraph and the
    # --mesh RowShardedCoo each carry a .tiles/.tiles_t packing with a big
    # float .vals leaf when tiled (coo_shard.ShardedCooTiles shards the
    # packing per device), and both are NamedTuples so the same _replace
    # hoist applies
    has_tiles = getattr(model_op, "tiles", None) is not None

    def build_step(ms):
        def step_fn(p, s, k, fl, x0_, target_):
            tv, tvt = fl
            op_ = model_op._replace(tiles=model_op.tiles._replace(vals=tv),
                                    tiles_t=model_op.tiles_t._replace(
                                        vals=tvt)) \
                if has_tiles else model_op
            return make_sgd_step(opt, objective_with(op_, x0_, target_,
                                                     ms))(p, s, k)
        wrapped = jax.jit(step_fn, donate_argnums=(0, 1))
        fl = ((model_op.tiles.vals, model_op.tiles_t.vals)
              if has_tiles else (None, None))

        def step(p, s, k):
            return wrapped(p, s, k, fl, x0, target)

        def footprint(p, s, k):
            # Compile-time HBM reservation of the train-step program — the
            # measured check on --estimate. args = residents (params, opt
            # state, tiles, x0, target), temp = in-step transients (emission
            # buffers, remat-saved SpMV outputs, solver carry). The axon
            # backend exposes no allocator peak (memory_stats() is None), so
            # the XLA buffer-assignment total is the honest device-side
            # number; the persistent compile cache makes the re-lower cheap.
            try:
                ma = wrapped.lower(p, s, k, fl, x0, target).compile() \
                    .memory_analysis()
                if ma is None:
                    return None
                live = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                        + ma.output_size_in_bytes - ma.alias_size_in_bytes)
                return {"total_gb": round(live / 1e9, 2),
                        "args_gb": round(ma.argument_size_in_bytes / 1e9, 2),
                        "temp_gb": round(ma.temp_size_in_bytes / 1e9, 2),
                        "out_gb": round(ma.output_size_in_bytes / 1e9, 2),
                        "alias_gb": round(ma.alias_size_in_bytes / 1e9, 2)}
            except Exception:
                return None
        return step, footprint

    # rollback-and-regrow protection for the snug budget (train/elastic.py):
    # snapshot at finite-loss boundaries; a NaN loss rolls back, doubles the
    # budget, recompiles, and deterministically replays (same rng stream)
    from ndcn_tpu.train.elastic import ElasticBudget
    elastic = ElasticBudget(max_steps, enabled=True)
    step, footprint = build_step(elastic.max_steps)

    key = jax.random.PRNGKey(1)
    elastic.snapshot(0, key, (params, opt_state))
    c_t0 = time.time()
    while True:
        params, opt_state, loss, rel = step(params, opt_state, key)
        jax.block_until_ready(loss)
        if elastic.exhausted(loss):
            _, key, (params, opt_state) = elastic.rollback()
            print(f"[elastic] first step exhausted the budget; regrown to "
                  f"max_steps={elastic.max_steps}", file=sys.stderr)
            step, footprint = build_step(elastic.max_steps)
            continue
        break
    print(f"train step compiled+first in {time.time() - c_t0:.1f}s; "
          f"initial rel loss {float(rel):.4f}", file=sys.stderr)
    rel0 = float(rel)
    elastic.snapshot(0, key, (params, opt_state))

    check_freq = 10
    t_run = time.time()
    i = 0
    while i < args.iters:
        key, k = jax.random.split(key)
        params, opt_state, loss, rel = step(params, opt_state, k)
        i += 1
        if i % check_freq == 0 or i == args.iters:
            if elastic.exhausted(loss):       # blocks; one sync per 10 iters
                prev = i
                i, key, (params, opt_state) = elastic.rollback()
                print(f"[elastic] budget exhausted by iter {prev}; rolled "
                      f"back to iter {i} with max_steps={elastic.max_steps}",
                      file=sys.stderr)
                step, footprint = build_step(elastic.max_steps)
                continue
            elastic.snapshot(i, key, (params, opt_state))
    jax.block_until_ready(loss)
    dt = time.time() - t_run
    steps_per_s = args.iters / dt
    relf = float(rel)
    # the NaN-poisoned loss (not relf, which is computed pre-poisoning) is the
    # exhaustion signal — asserting relf alone would let a budget-exhausted run
    # report plausible-but-stalled numbers
    assert np.isfinite(float(loss)), \
        "training diverged or exhausted the step budget"
    assert np.isfinite(relf)

    # HBM high-water (device allocator peak): the measured check on the
    # --estimate prediction. Not every backend exposes memory_stats.
    hbm_peak_gb = None
    hbm_peak_source = None
    try:
        mstats = jax.devices()[0].memory_stats()
        if mstats and mstats.get("peak_bytes_in_use"):
            hbm_peak_gb = round(mstats["peak_bytes_in_use"] / 1e9, 2)
            hbm_peak_source = "memory_stats"
    except Exception:
        pass

    def ballast_probe():
        # Ballast probe: the allocator exposes no peak (axon plugin), so
        # MEASURE one — find the largest resident ballast under which one
        # more train step still executes; the step's true high-water is then
        # bounded by (HBM limit - ballast). The step runs on device-copies
        # (donation would otherwise consume the final train state). Trial
        # order matters: a failed (OOM-driving) execution was observed to
        # poison the arena for LATER allocations at the 1M shape (the r5b
        # run's bisection started at 8.6 GB, failed, and every smaller trial
        # failed too — lo stayed 0 while the plain step had just run fine),
        # so grow ballast ASCENDING by doubling — every success lands on a
        # clean arena and genuinely raises lo — then refine by bisection,
        # where a post-OOM spurious failure only costs tightness: the bound
        # is built from successes alone (peak <= limit - lo). Only
        # allocation-failure errors narrow the bracket — anything else is a
        # real bug and re-raises.
        from ndcn_tpu.train.budget import accelerator_memory_limit
        from ndcn_tpu.train.elastic import device_copy
        limit = accelerator_memory_limit()
        quantum = 256 << 20
        trials = 0

        def trial(nbytes):
            nonlocal trials
            trials += 1
            ballast = p2 = s2 = out = None
            try:
                # allocate ON device (device_put would ship GBs of zeros
                # through the axon tunnel every trial)
                ballast = jax.block_until_ready(
                    jnp.zeros(nbytes // 4, jnp.float32))
                p2, s2 = device_copy((params, opt_state))
                out = step(p2, s2, key)
                jax.block_until_ready(out[2])
                return True
            except Exception as e:
                msg = str(e)
                if ("RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()
                        or "allocat" in msg.lower()):
                    return False
                raise
            finally:
                del ballast, p2, s2, out

        lo, hi = 0, limit
        size = quantum
        while size < limit and trial(size):
            lo, size = size, size * 2
        hi = min(size, limit)
        while hi - lo > quantum and trials < 12:
            mid = (lo + hi) // 2
            if trial(mid):
                lo = mid
            else:
                hi = mid
        if lo > 0:
            print(f"hbm probe: step executes beside {lo / 1e9:.2f} GB "
                  f"ballast ({trials} trials) -> peak <= "
                  f"{(limit - lo) / 1e9:.2f} GB of {limit / 1e9:.2f}",
                  file=sys.stderr)
            return round((limit - lo) / 1e9, 2), "ballast_bisection"
        print(f"hbm probe: even {quantum >> 20} MB ballast fails on a clean "
              f"arena ({trials} trials): the step runs within {quantum >> 20}"
              f" MB of the {limit / 1e9:.2f} GB limit; recording the limit "
              "as the measured bound", file=sys.stderr)
        return round(limit / 1e9, 2), "ballast_no_headroom"

    roofline = None
    if args.roofline and args.mesh:
        print("roofline: --mesh operator is shard_map-wrapped; use the "
              "unsharded run for the floor (same chip, same tiles)",
              file=sys.stderr)
    elif args.roofline:
        from ndcn_tpu.train.roofline import gather_floor_s, measure_spmv
        spmv = measure_spmv(model_op, args.hidden,
                            kernel_precision=args.kernel_precision)
        if spmv is None:
            print("roofline: no tile packing on this operator; skipped",
                  file=sys.stderr)
        else:
            # floor at the budget probe's init-state nfe; the per-step nfe
            # grows with training (train/roofline.py), so >100% of floor is
            # possible late in a run and means MORE gathers, not magic
            floor = gather_floor_s(probe_nfe[0], spmv)
            step_s = 1.0 / steps_per_s
            roofline = {**spmv,
                        "nfe_init": probe_nfe[0],
                        "gather_floor_s": round(floor, 3),
                        "pct_of_gather_floor": round(100 * floor / step_s, 1)}
            print(f"roofline: SpMV fwd {spmv['spmv_fwd_ms']} ms / transpose "
                  f"{spmv['spmv_t_ms']} ms ({spmv['slot_rate_m_per_s']}M "
                  f"slots/s); floor {floor:.2f}s = "
                  f"{roofline['pct_of_gather_floor']}% of the "
                  f"{step_s:.2f}s step", file=sys.stderr)

    # The OOM-driving ballast probe runs AFTER roofline (its failed trials
    # can poison later allocations — the r5b 1M run crashed roofline's
    # device_put even through a 20 s retry loop when the probe ran first)
    # and BEFORE the footprint re-lower (whose second executable pins the
    # arena: with footprint first the probe measured zero headroom at 1M).
    if args.hbm_probe and hbm_peak_gb is None:
        if jax.devices()[0].platform == "cpu":
            # host allocations never OOM against the 16 GB default limit;
            # the probe would just memset tens of GB of host RAM
            print("hbm probe: cpu backend has no device arena; skipped",
                  file=sys.stderr)
        else:
            hbm_peak_gb, hbm_peak_source = ballast_probe()

    # Compile-time HBM reservation — LAST among the probes: the re-lowered
    # executable's device arena can coexist with (and at million-node scale
    # evict/pin) the training program's, which was measured to depress the
    # timed steps/s 0.16 -> 0.06 at 1M nodes when this ran before the loop
    # and to zero out the ballast probe's headroom when it ran before that.
    hbm = footprint(params, opt_state, key)
    hbm_program_gb = hbm["total_gb"] if hbm else None
    if hbm is not None:
        print(f"train-step program HBM: {hbm['total_gb']} GB "
              f"(XLA buffer assignment: args {hbm['args_gb']} + temps "
              f"{hbm['temp_gb']} + out {hbm['out_gb']} - alias "
              f"{hbm['alias_gb']})", file=sys.stderr)

    record = {
        "n_nodes": n, "nnz": int(adj.nnz),
        "train_steps_per_sec": round(steps_per_s, 2),
        "node_evals_per_sec": round(steps_per_s * probe_nfe[0] * n, 0),
        "ground_truth_s": round(gt_s, 2),
        "rel_loss_initial": round(rel0, 4), "rel_loss_final": round(relf, 4),
        "device": str(jax.devices()[0]), "fmt": args.fmt,
        "dynamics": args.dynamics, "max_steps": int(elastic.max_steps),
        "elastic_rollbacks": int(elastic.total_rollbacks),
        "mesh_devices": len(jax.devices()) if args.mesh else 1,
        "mesh_parity": mesh_parity,
        "hbm_peak_gb": hbm_peak_gb,
        "hbm_peak_source": hbm_peak_source,
        "roofline": roofline,
        "hbm_program_gb": hbm_program_gb,
        "hbm_breakdown_gb": hbm,
        "layout": args.layout,
        "kernel_precision": args.kernel_precision,
        "emission_precision": args.emission_precision,
        "residual_precision": args.residual_precision,
        "iters": args.iters, "hidden": args.hidden,
    }
    print(json.dumps(record))
    if args.out:
        from ndcn_tpu.utils.io import atomic_write
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        atomic_write(args.out, json.dumps(
            {**record, "argv": sys.argv[1:]}, indent=1).encode())
    return relf, rel0


if __name__ == "__main__":
    main()
