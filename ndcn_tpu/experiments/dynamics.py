"""Shared driver for the network-dynamics learning experiments.

One parameterized driver replaces the reference's three structural clones
(heat_dynamics.py / mutualistic_dynamics.py / gene_dynamics.py — identical except
for the RHS and output paths, SURVEY.md §1 L6). Flag surface, defaults, split
semantics, loss definitions, and the printed progress format all match the
reference so existing tooling (and eyeballs) carry over.

TPU-first structure: graph build / operator construction / time sampling happen
once on the host; ground truth is one compiled adaptive solve; training is a
jitted ``(params, opt_state) -> (params, opt_state, losses)`` step with donated
buffers, and evaluation a second jitted function over the full grid. The
reference pays ~6 python-dispatched RHS evals per solver step per iteration;
here one XLA program runs the whole solve.
"""

from __future__ import annotations

import argparse
import time
from functools import partial
from typing import Any, Dict

import numpy as np


def build_parser(name: str) -> argparse.ArgumentParser:
    """The 25-flag surface of the dynamics drivers (heat_dynamics.py:19-64)."""
    p = argparse.ArgumentParser(name)
    p.add_argument("--method", type=str, default="euler",
                   choices=["dopri5", "adams", "explicit_adams", "fixed_adams",
                            "tsit5", "euler", "midpoint", "rk4"])
    p.add_argument("--rtol", type=float, default=0.01)
    p.add_argument("--atol", type=float, default=0.001)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--weight_decay", type=float, default=1e-3)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--hidden", type=int, default=20)
    p.add_argument("--time_tick", type=int, default=100)
    p.add_argument("--sampled_time", type=str, default="irregular",
                   choices=["irregular", "equal"])
    p.add_argument("--niters", type=int, default=2000)
    p.add_argument("--test_freq", type=int, default=20)
    p.add_argument("--viz", action="store_true")
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--sparse", action="store_true")
    p.add_argument("--sparse_format", type=str, default="ell",
                   choices=["coo", "ell", "bsr"],
                   help="sparse layout; mutualistic physics supports ell "
                        "(neighbor gather) and coo (edge list, scalable) — "
                        "bsr falls back to coo there")
    p.add_argument("--kernel_precision", type=str, default="split2",
                   choices=["split2", "bf16"],
                   help="tiled-COO Pallas kernel numerics (engages above "
                        "50k edges on TPU): split2 ~2e-6 rel err, bf16 ~4e-3 "
                        "and ~1.2x faster train steps")
    p.add_argument("--emission_precision", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="dtype of the training scan's dense-output emission "
                        "buffers (the dominant residual at large n; ~4e-3 on "
                        "interpolated observations, solver steps unaffected)")
    p.add_argument("--residual_precision", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="dtype of the remat-saved SpMV outputs (largest "
                        "per-step residuals at large n; rounds the integrated "
                        "RHS ~4e-3, fwd/bwd consistent)")
    p.add_argument("--network", type=str, default="grid",
                   choices=["grid", "random", "power_law", "small_world", "community"])
    p.add_argument("--layout", type=str, default="community",
                   choices=["community", "degree"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--T", type=float, default=5.0)
    p.add_argument("--operator", type=str, default="norm_lap",
                   choices=["lap", "norm_lap", "kipf", "norm_adj"])
    p.add_argument("--baseline", type=str, default="ndcn",
                   choices=["ndcn", "no_embed", "no_control", "no_graph",
                            "lstm_gnn", "rnn_gnn", "gru_gnn"])
    p.add_argument("--dump", action="store_true")
    p.add_argument("--adjoint", action="store_true")
    p.add_argument("--max_steps", type=int, default=0,
                   help="adaptive step budget for the differentiable solve "
                        "(0 = auto-size from a probe solve at init)")
    p.add_argument("--results_dir", type=str, default=None)
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="enable periodic checkpoint/resume in this directory")
    p.add_argument("--ckpt_freq", type=int, default=200)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of training iterations here")
    p.add_argument("--fused_kernel", action="store_true",
                   help="route the NDCN RHS through the fused Pallas kernel "
                        "where measured-profitable (dense/BSR operator, "
                        "control on, dropout 0; fused='auto' dispatch)")
    p.add_argument("--scan_chunk", type=int, default=0,
                   help="run this many training steps per device dispatch "
                        "(lax.scan chunking; 0 = one dispatch per step). "
                        "Cuts per-step host latency ~5x on TPU; incompatible "
                        "with --ckpt_dir/--profile_dir mid-chunk granularity")
    p.add_argument("--mesh", action="store_true",
                   help="multi-chip: with --replicas, shard replicas over the "
                        "mesh 'data' axis and node-major arrays over 'model'; "
                        "on a single model, row-shard the operator and all "
                        "node-major arrays over 'model' (params replicated)")
    p.add_argument("--replicas", type=int, default=1,
                   help="train this many independent replicas simultaneously "
                        "(vmapped; dumps one results file per replica)")
    p.add_argument("--export", type=str, default=None, metavar="PATH",
                   help="after training, serialize the trained model's full "
                        "compiled inference forward (trajectory over the "
                        "run's observation grid) to PATH as a portable "
                        "serving artifact (ndcn_tpu/serve.py; loads with jax "
                        "alone). Continuous baselines, single model only")
    from ndcn_tpu.utils.platform import add_platform_flag
    add_platform_flag(p)
    return p


def run(dynamics_kind: str, args: argparse.Namespace) -> Dict[str, Any]:
    if getattr(args, "export", None):
        # fail BEFORE training, not after a long run
        if args.baseline not in ("ndcn", "no_embed", "no_control", "no_graph"):
            raise SystemExit("--export serializes the continuous-time "
                             "inference forward; use a continuous baseline "
                             "(ndcn / no_embed / no_control / no_graph)")
        if args.replicas > 1:
            raise SystemExit("--export needs the single-model path "
                             "(drop --replicas)")
        if args.mesh:
            raise SystemExit("--export produces a single-device serving "
                             "artifact (drop --mesh)")
    from ndcn_tpu.utils.platform import force_platform, set_matmul_precision
    force_platform(args.platform)
    set_matmul_precision(args.precision)
    from ndcn_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    if getattr(args, "kernel_precision", "split2") == "bf16":
        from ndcn_tpu.kernels import coo_spmv
        coo_spmv.GATHER_BF16 = True
    if getattr(args, "emission_precision", "f32") != "f32" and (
            args.method not in ("dopri5", "tsit5") or args.adjoint):
        # fail-loudly policy: ode_block strips the emission options off the
        # fixed-grid/adjoint paths, so accepting the flag here would silently
        # run 100% of training with the f32 buffers the user asked to halve
        raise SystemExit("--emission_precision bf16 applies only to the "
                         "differentiable adaptive solve (--method dopri5/"
                         "tsit5, without --adjoint); it would be a silent "
                         "no-op for this configuration")

    from ndcn_tpu.dynamics import make_rhs
    from ndcn_tpu.graph import generators, operators
    from ndcn_tpu.graph.sparse import as_operator
    from ndcn_tpu.models import (init_ndcn, init_temporal_gcn, ndcn_forward,
                                 temporal_gcn_forward)
    from ndcn_tpu.ode import odeint_with_stats
    from ndcn_tpu.report import results as results_lib
    from ndcn_tpu.train.losses import l1_loss
    from ndcn_tpu.train.optim import make_sgd_step, torch_adam
    from ndcn_tpu.train.checkpoint import restore_or_init, save_checkpoint
    from ndcn_tpu.train.sampling import sample_times
    from ndcn_tpu.utils.timing import Timer

    t_start = time.time()

    # ---------------------------------------------------------------- graph
    print(f"Choose graph: {args.network}")
    adj = generators.build_network(args.network, args.n, seed=args.seed,
                                   layout=args.layout)
    n = adj.shape[0]
    # side derives from the ACTUAL node count: small_world hardcodes 400 nodes
    # regardless of --n (as in the reference, heat_dynamics.py:98), and the x0
    # block pattern must cover them all.
    side = int(np.ceil(np.sqrt(n)))

    # ---------------------------------------------------------- time splits
    print(f"Build {args.sampled_time}ly-sampled -time dynamics")
    splits = sample_times(args.T, args.time_tick, args.sampled_time, seed=args.seed)
    t_np = splits.t
    id_train, id_test, id_test2 = splits.id_train, splits.id_test, splits.id_test2

    # ------------------------------------------------------------- operator
    om_np = operators.build_dynamics_operator(adj, args.operator)
    if args.baseline in ("lstm_gnn", "rnn_gnn", "gru_gnn"):
        # temporal baselines always use the Kipf operator (heat_dynamics.py:169-173)
        om_np = operators.zipf_smoothing(adj)
    op = as_operator(om_np, sparse=args.sparse, format=args.sparse_format)

    # ------------------------------------------------------ physics operator
    # heat diffusion integrates over L = D - A (the RHS owns the minus sign);
    # mutualistic/gene couple through the raw adjacency. Mutualistic gathers
    # neighbor STATES per edge, so its sparse forms are ELL (gather) and COO
    # (edge list, the scalable one) — BSR blocks don't expose endpoints.
    physics_matrix = operators.laplacian_dense(adj) if dynamics_kind == "heat" else adj
    physics_fmt = args.sparse_format
    if dynamics_kind == "mutualistic" and physics_fmt == "bsr":
        print("mutualistic physics cannot use BSR; using COO for the "
              "ground-truth operator")
        physics_fmt = "coo"
    physics_op = as_operator(physics_matrix, sparse=args.sparse, format=physics_fmt)

    # --------------------------------------------------------- ground truth
    # The block initial condition lives on the side×side grid layout; for non-grid
    # graphs of n != side² nodes, take the first n entries (heat_dynamics.py:177-183).
    x0_np = generators.grid_block_initial_value(side)[:n].astype(np.float32)

    # Data generation runs on the CPU backend: the one-shot while-loop solve
    # compiles in seconds there, versus minutes through the TPU tunnel — and the
    # trajectory matches the (CPU) reference bit-for-bit closer.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), Timer() as gt_timer:
        physics_cpu = jax.tree_util.tree_map(
            lambda l: jax.device_put(l, cpu), physics_op)
        rhs = make_rhs(dynamics_kind, physics_cpu)
        solution, gt_stats = odeint_with_stats(
            rhs, jnp.asarray(x0_np), jnp.asarray(t_np), rtol=1e-7, atol=1e-9,
            method="dopri5", options={"differentiable": False})
        solution = np.asarray(jax.block_until_ready(solution))

    x0 = jnp.asarray(x0_np)
    t_full = jnp.asarray(t_np)
    print(f"{tuple(solution.shape)} ground truth: {int(gt_stats.nfe)} RHS evals "
          f"in {gt_timer.elapsed:.3f}s "
          f"({int(gt_stats.nfe) * n / max(gt_timer.elapsed, 1e-9):,.0f} node-evals/s)")

    true_y = jnp.asarray(np.squeeze(solution, -1).T)  # (n, T_all)
    true_y0 = x0                                    # (n, 1)
    true_y_train = true_y[:, id_train]
    true_y_test = true_y[:, id_test]
    true_y_test2 = true_y[:, id_test2] if id_test2 is not None else None

    t_train = jnp.asarray(t_np[id_train])
    id_train_j = jnp.asarray(id_train)
    id_test_j = jnp.asarray(id_test)
    id_test2_j = jnp.asarray(id_test2) if id_test2 is not None else None

    # ----------------------------------------------------------------- model
    key = jax.random.PRNGKey(args.seed)
    continuous = args.baseline in ("ndcn", "no_embed", "no_control", "no_graph")
    flags = dict(no_embed=args.baseline == "no_embed",
                 no_graph=args.baseline == "no_graph",
                 no_control=args.baseline == "no_control")
    print("Choose model:" + args.baseline)

    rnn_type = args.baseline.split("_")[0] if not continuous else None
    hidden_size_gnn, hidden_size_rnn = 5, 10

    budget_is_auto = False
    if continuous:
        params = init_ndcn(key, 1, args.hidden, 1, no_embed=flags["no_embed"],
                           no_control=flags["no_control"])

        max_steps = args.max_steps
        if max_steps <= 0 and args.method in ("dopri5", "tsit5"):
            from ndcn_tpu.train.budget import (probe_step_budget,
                                               probe_step_budget_multi, to_cpu)

            # probe over COO when the training format is the Pallas BSR kernel:
            # step counts don't depend on the operator layout, and interpret-
            # mode pallas on the CPU probe is minutes-slow at large n
            op_probe = (as_operator(om_np, sparse=True, format="coo")
                        if args.sparse and args.sparse_format == "bsr" else op)
            op_c, t_c, y0_c = to_cpu((op_probe, jnp.asarray(t_np), true_y0))

            def probe_with(p):
                p_c = to_cpu(p)

                def probe():
                    _, stats = ndcn_forward(
                        p_c, op_c, t_c, y0_c,
                        rtol=args.rtol, atol=args.atol, method=args.method,
                        max_steps=1 << 14, nondiff=True, **flags)
                    return stats

                return probe

            probe = probe_with(params)
            if args.replicas > 1:
                # a vmapped sweep cannot roll back one replica: size for the
                # HARDEST of several probed replica inits (same keys the sweep
                # initializes from below), still with generous headroom
                rkeys = jax.random.split(key, args.replicas)
                probes = [probe_with(init_ndcn(
                    rkeys[i], 1, args.hidden, 1, no_embed=flags["no_embed"],
                    no_control=flags["no_control"]))
                    for i in range(min(4, args.replicas))]
                max_steps = probe_step_budget_multi(probes)
            else:
                # snug budget: exhaustion is recoverable (elastic rollback in
                # the training loop below), and every frozen scan slot costs
                # real time on every step
                max_steps = probe_step_budget(probe, floor=8, headroom=2.5,
                                              slack=4, quantum=4)
                budget_is_auto = True
            print(f"auto step budget: max_steps={max_steps}")
        elif max_steps <= 0:
            max_steps = 256
    else:
        max_steps = 0
        params = init_temporal_gcn(key, 1, hidden_size_gnn, n, hidden_size_rnn,
                                   rnn_type)

    emission_dtype = (jnp.bfloat16
                      if getattr(args, "emission_precision", "f32") == "bf16"
                      else None)
    residual_dtype = (jnp.bfloat16
                      if getattr(args, "residual_precision", "f32") == "bf16"
                      else None)

    def make_forward(ms):
        if continuous:
            def forward(p, vt, y0, rng=None):
                out, stats = ndcn_forward(
                    p, op, vt, y0, rtol=args.rtol, atol=args.atol,
                    method=args.method, dropout=args.dropout, rng=rng,
                    adjoint=args.adjoint, max_steps=ms,
                    fused="auto" if args.fused_kernel else False,
                    emission_dtype=emission_dtype,
                    residual_dtype=residual_dtype, **flags)
                return jnp.squeeze(out, -1).T, stats    # (n, T)

            def train_loss(p, rng):
                pred, stats = forward(p, t_train, true_y0, rng)
                loss = l1_loss(pred, true_y_train)
                if stats is not None:
                    # a blown step budget must be loud (NaN), not silently wrong
                    loss = jnp.where(stats.success, loss, jnp.nan)
                return loss, loss / jnp.mean(true_y_train)
        else:
            def forward(p, _vt, y_seq, rng=None, future=0):
                out = temporal_gcn_forward(p, op, y_seq, rnn_type=rnn_type,
                                           future=future, dropout=args.dropout,
                                           rng=rng, deterministic=rng is None)
                return out, None

            def train_loss(p, rng):
                pred, _ = forward(p, None, true_y_train[:, :-1], rng)
                target = true_y_train[:, 1:]
                loss = l1_loss(pred, target)
                return loss, loss / jnp.mean(target)
        return forward, train_loss

    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    print(f"Total {n_params:d} Trainable {n_params:d}")

    # ------------------------------------------------------------- training
    opt = torch_adam(args.lr, args.weight_decay)
    opt_state = opt.init(params)
    params, opt_state, start_iter = restore_or_init(args.ckpt_dir, params, opt_state)

    chunk = max(0, args.scan_chunk)

    def build_fns(ms):
        """(sgd_step, train_step, train_chunk, evaluate) for one step budget.

        Rebuilt (recompiled) when the elastic-recovery path grows the budget."""
        forward, train_loss = make_forward(ms)
        sgd_step = make_sgd_step(opt, train_loss)
        train_step = partial(jax.jit, donate_argnums=(0, 1))(sgd_step)

        @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("length",))
        def train_chunk(p, s, rng, length):
            def body(carry, step_rng):
                p, s, loss, rel = sgd_step(*carry, step_rng)
                return (p, s), (loss, rel)
            (p, s), (losses, rels) = jax.lax.scan(body, (p, s),
                                                  jax.random.split(rng, length))
            return p, s, losses[-1], rels[-1]

        @jax.jit
        def evaluate(p):
            if continuous:
                pred, stats = forward(p, t_full, true_y0)
                nfe = stats.nfe if stats is not None else jnp.asarray(0)
                if stats is not None:
                    # budget exhaustion must be loud HERE too: the full-grid
                    # eval solve can outgrow a budget the train solve still
                    # fits, and a finite-but-truncated trajectory would record
                    # silently wrong test losses (and starve the elastic
                    # rollback check, which watches ev['loss'])
                    pred = jnp.where(stats.success, pred, jnp.nan)
            else:
                pred, _ = forward(p, None, true_y_train, future=len(id_test))
                nfe = jnp.asarray(0)
                # discrete rollout: the future block occupies the trailing columns
                cols = jnp.arange(pred.shape[1] - len(id_test), pred.shape[1])
                loss_t = l1_loss(pred[:, cols], true_y_test)
                out = dict(loss=loss_t, rel=loss_t / jnp.mean(true_y_test),
                           pred_test=pred[:, cols], nfe=nfe)
                out["loss2"] = jnp.asarray(0.0)
                out["rel2"] = jnp.asarray(0.0)
                out["pred_test2"] = jnp.zeros_like(true_y_test2) if id_test2_j is not None else jnp.zeros(())
                return out
            loss_t = l1_loss(pred[:, id_test_j], true_y_test)
            out = dict(loss=loss_t, rel=loss_t / jnp.mean(true_y_test),
                       pred_test=pred[:, id_test_j], nfe=nfe)
            if id_test2_j is not None:
                loss2 = l1_loss(pred[:, id_test2_j], true_y_test2)
                out["loss2"] = loss2
                out["rel2"] = loss2 / jnp.mean(true_y_test2)
                out["pred_test2"] = pred[:, id_test2_j]
            else:
                out["loss2"] = jnp.asarray(0.0)
                out["rel2"] = jnp.asarray(0.0)
                out["pred_test2"] = jnp.zeros(())
            return out

        return sgd_step, train_step, train_chunk, evaluate

    sgd_step, train_step, train_chunk, evaluate = build_fns(max_steps)

    # ------------------------------------------- batched multi-replica training
    if args.replicas > 1:
        # TPU-native sweep: R independent models (different init seeds) train
        # simultaneously in one vmapped program; each replica dumps its own
        # results file, so experiments.summarize aggregates them exactly like
        # the reference's repeated sequential runs.
        if not continuous:
            raise SystemExit("--replicas currently supports the continuous "
                             "(ndcn/ablation) baselines")
        if args.ckpt_dir or args.profile_dir or args.scan_chunk:
            raise SystemExit("--replicas is incompatible with --ckpt_dir/"
                             "--profile_dir/--scan_chunk (per-replica training "
                             "runs as one vmapped program)")
        r = args.replicas
        keys = jax.random.split(key, r)
        params_b = jax.vmap(lambda k: init_ndcn(
            k, 1, args.hidden, 1, no_embed=flags["no_embed"],
            no_control=flags["no_control"]))(keys)
        opt_state_b = jax.vmap(opt.init)(params_b)

        if args.mesh and len(jax.devices()) > 1:
            # multi-chip: replicas over 'data', node rows over 'model' — the
            # shardings drive GSPMD; the training closures below see the
            # sharded arrays through late binding.
            from ndcn_tpu.parallel.mesh import make_mesh
            from ndcn_tpu.parallel.sweep import shard_replica_problem
            mesh = make_mesh(data_divides=r, model_divides=n)
            print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
            node_arrays = {"true_y0": true_y0, "true_y_train": true_y_train,
                           "true_y_test": true_y_test}
            if true_y_test2 is not None:
                node_arrays["true_y_test2"] = true_y_test2
            params_b, opt_state_b, op, shards = shard_replica_problem(
                mesh, params_b, opt_state_b, op, node_arrays)
            true_y0 = shards["true_y0"]
            true_y_train = shards["true_y_train"]
            true_y_test = shards["true_y_test"]
            true_y_test2 = shards.get("true_y_test2", true_y_test2)
        elif args.mesh:
            print("--mesh: single device visible; running unsharded")

        @partial(jax.jit, donate_argnums=(0, 1))
        def step_b(pb, sb, rngs):
            return jax.vmap(sgd_step)(pb, sb, rngs)

        eval_b = jax.jit(jax.vmap(evaluate))

        rng = jax.random.PRNGKey(args.seed + 1)
        for itr in range(1, args.niters + 1):
            rng, step_rng = jax.random.split(rng)
            params_b, opt_state_b, losses, rels = step_b(
                params_b, opt_state_b, jax.random.split(step_rng, r))
            if itr % args.test_freq == 0:
                ev = eval_b(params_b)
                print(f"Iter {itr:04d}| {r} replicas | train rel "
                      f"{float(jnp.mean(rels)):.6f}±{float(jnp.std(rels)):.6f} "
                      f"| test rel {float(jnp.mean(ev['rel'])):.6f}"
                      f"±{float(jnp.std(ev['rel'])):.6f} "
                      f"| Time {time.time() - t_start:.4f}", flush=True)

        ev = eval_b(params_b)
        t_total = time.time() - t_start
        print("Total Time {:.4f}".format(t_total))
        if args.dump:
            results_dir = args.results_dir or f"results/{dynamics_kind}/{args.network}"
            for i in range(r):
                res_i = results_lib.new_results_dict(vars(args))
                p_i = jax.tree_util.tree_map(lambda l: l[i], params_b)
                results_lib.record_eval(
                    res_i, args.niters, float(ev["loss"][i]), float(ev["rel"][i]),
                    ev["pred_test"][i], p_i,
                    abs_error2=float(ev["loss2"][i]) if id_test2 is not None else None,
                    rel_error2=float(ev["rel2"][i]) if id_test2 is not None else None,
                    predict_y2=ev["pred_test2"][i] if id_test2 is not None else None)
                res_i["total_time"] = t_total / r
                path = results_lib.results_path(results_dir, args.baseline,
                                                appendix=f"replica{i:03d}")
                results_lib.dump_results(res_i, path)
            print(f"Dumped {r} replica results under {results_dir}")
        return {
            "final": {
                "abs_error": float(jnp.mean(ev["loss"])),
                "rel_error": float(jnp.mean(ev["rel"])),
                "rel_error_std": float(jnp.std(ev["rel"])),
                "abs_error2": float(jnp.mean(ev["loss2"])),
                "rel_error2": float(jnp.mean(ev["rel2"])),
            },
            "replicas": r, "total_time": t_total,
        }

    if args.mesh:
        # single-model model-parallelism: operator rows and every node-major
        # array shard over the 'model' axis (dense via GSPMD row placement,
        # COO via the shard_map row-block SpMV); params stay replicated. The
        # training/eval closures late-bind these names, so the jitted steps
        # trace against the sharded arrays and XLA inserts the collectives.
        if len(jax.devices()) < 2:
            print("--mesh: single device visible; running unsharded")
        else:
            from ndcn_tpu.parallel.mesh import (make_mesh, node_sharding,
                                                replicated)
            from ndcn_tpu.parallel.sweep import shard_operator
            mesh = make_mesh(data_divides=1, model_divides=n)
            print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
            op = shard_operator(mesh, op)
            node = node_sharding(mesh)
            true_y0 = jax.device_put(true_y0, node)
            true_y_train = jax.device_put(true_y_train, node)
            true_y_test = jax.device_put(true_y_test, node)
            if true_y_test2 is not None:
                true_y_test2 = jax.device_put(true_y_test2, node)
            rep = replicated(mesh)
            params = jax.tree_util.tree_map(
                lambda l: jax.device_put(l, rep), params)
            opt_state = jax.tree_util.tree_map(
                lambda l: jax.device_put(l, rep), opt_state)
    results = results_lib.new_results_dict(vars(args))
    results["true_y"].append(np.asarray(true_y))
    results["nfe_train"] = []

    from ndcn_tpu.utils.timing import profile_trace

    rng = jax.random.PRNGKey(args.seed + 1)
    loss = rel = jnp.asarray(0.0)
    profiled = False
    def periodic_hooks(itr, loss, rel):
        nonlocal profiled
        if args.profile_dir and not profiled and itr > 2:
            # trace a handful of steady-state iterations on throwaway COPIES:
            # the profiled steps must not advance the real params/opt/rng
            # stream, or a profiled run trains niters+3 steps and an elastic
            # rollback replay diverges from the original trajectory
            from ndcn_tpu.train.elastic import device_copy

            p_prof, s_prof = device_copy((params, opt_state))
            prof_rng = jax.random.fold_in(rng, 50)
            with profile_trace(args.profile_dir):
                ploss = loss
                for _ in range(3):
                    prof_rng, step_rng = jax.random.split(prof_rng)
                    p_prof, s_prof, ploss, _ = train_step(p_prof, s_prof,
                                                          step_rng)
                jax.block_until_ready(ploss)
            profiled = True
            print(f"[profile] trace written to {args.profile_dir}")
        if args.ckpt_dir and itr % args.ckpt_freq == 0:
            # never persist NaN-poisoned params: exhaustion under a snug auto
            # budget is only DETECTED at test_freq boundaries, but ckpt_freq
            # can fire in between — a NaN checkpoint would poison any later
            # resume (elastic rollback is in-memory only)
            if np.isfinite(float(loss)):
                save_checkpoint(args.ckpt_dir, itr, params, opt_state)
            else:
                print(f"[ckpt] skipping iter {itr}: loss is non-finite "
                      f"(budget exhaustion pending recovery)", flush=True)
        if itr % args.test_freq == 0:
            ev = evaluate(params)
            if elastic.exhausted(ev["loss"]):
                # the eval solve (full grid, longer horizon than training's)
                # outgrew the shared budget even though the train loss is
                # finite — signal rollback before recording anything
                return False
            if args.dump:
                results_lib.record_eval(
                    results, itr, ev["loss"], ev["rel"], ev["pred_test"], params,
                    abs_error2=float(ev["loss2"]) if id_test2 is not None else None,
                    rel_error2=float(ev["rel2"]) if id_test2 is not None else None,
                    predict_y2=ev["pred_test2"] if id_test2 is not None else None)
                results["nfe_train"].append(int(ev["nfe"]))
            if args.sampled_time == "irregular":
                print("Iter {:04d}| Train Loss {:.6f}({:.6f} Relative) "
                      "| Test Loss {:.6f}({:.6f} Relative) "
                      "| Test Loss2 {:.6f}({:.6f} Relative) "
                      "| Time {:.4f}"
                      .format(itr, float(loss), float(rel), float(ev["loss"]),
                              float(ev["rel"]), float(ev["loss2"]),
                              float(ev["rel2"]), time.time() - t_start))
            else:
                print("Iter {:04d}| Train Loss {:.6f}({:.6f} Relative) "
                      "| Test Loss {:.6f}({:.6f} Relative) "
                      "| Time {:.4f}"
                      .format(itr, float(loss), float(rel), float(ev["loss"]),
                              float(ev["rel"]), time.time() - t_start))
        return True

    # Elastic step-budget recovery (auto budgets only): exhaustion surfaces as
    # a NaN train loss (the solvers flag success=False, train_loss poisons);
    # roll back to the last finite-loss snapshot, double the budget, recompile,
    # and replay — deterministic, same rng stream (see train/elastic.py).
    from ndcn_tpu.train.elastic import ElasticBudget
    elastic = ElasticBudget(max_steps, enabled=budget_is_auto)
    elastic.snapshot(start_iter, rng, (params, opt_state))
    results["elastic_retries"] = 0

    # chunked stepping folds `scan_chunk` steps into one dispatch; hooks fire on
    # chunk boundaries, so align chunks with test_freq for identical log cadence.
    itr = start_iter
    while itr < args.niters:
        if chunk > 1:
            bound = min(itr + chunk,
                        ((itr // args.test_freq) + 1) * args.test_freq,
                        args.niters)
            if args.ckpt_dir and args.ckpt_freq:
                bound = min(bound, ((itr // args.ckpt_freq) + 1) * args.ckpt_freq)
            length = bound - itr
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss, rel = train_chunk(params, opt_state,
                                                       step_rng, length)
            itr = bound
        else:
            itr += 1
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss, rel = train_step(params, opt_state, step_rng)
        at_boundary = itr % args.test_freq == 0 or itr >= args.niters

        def roll_back(prev):
            nonlocal itr, rng, params, opt_state, sgd_step, train_step, \
                train_chunk, evaluate
            itr, rng, (params, opt_state) = elastic.rollback()
            results["elastic_retries"] = elastic.total_rollbacks
            print(f"[elastic] step budget exhausted by iter {prev}; rolled "
                  f"back to iter {itr} with max_steps={elastic.max_steps}",
                  flush=True)
            sgd_step, train_step, train_chunk, evaluate = build_fns(
                elastic.max_steps)

        if at_boundary:
            # the loss fetch syncs the device — only at hook cadence, so the
            # steady-state dispatch pipeline stays full between boundaries
            if elastic.exhausted(loss):
                roll_back(itr)
                continue
            # hooks return False when the EVAL solve exhausted the shared
            # budget (its full-grid horizon can outgrow it before training's)
            if not periodic_hooks(itr, loss, rel):
                roll_back(itr)
                continue
            elastic.snapshot(itr, rng, (params, opt_state))
        else:
            periodic_hooks(itr, loss, rel)

    # ---------------------------------------------------------------- final
    ev = evaluate(params)
    if not np.isfinite(float(ev["loss"])):
        print("[warn] final evaluation is non-finite (step budget exhausted "
              "after the last recovery boundary?); results recorded as-is",
              flush=True)
    t_total = time.time() - t_start
    print("Total Time {:.4f}".format(t_total))
    results["total_time"] = t_total
    results["final"] = {
        "abs_error": float(ev["loss"]), "rel_error": float(ev["rel"]),
        "abs_error2": float(ev["loss2"]), "rel_error2": float(ev["rel2"]),
        "train_loss": float(loss), "train_rel": float(rel),
    }

    if args.dump:
        results_dir = args.results_dir or f"results/{dynamics_kind}/{args.network}"
        path = results_lib.results_path(results_dir, args.baseline)
        results_lib.dump_results(results, path)
        print("Dump results as: " + path)
        rr = results_lib.load_results(path)  # dump round-trip check
        assert rr["v_iter"] == results["v_iter"]

    if args.viz:
        from ndcn_tpu.report import viz
        viz.adjacency_heatmap(adj, args.network)
        viz.dynamics_surfaces(dynamics_kind, args.network, side, np.asarray(true_y),
                              np.asarray(ev["pred_test"]))

    if getattr(args, "export", None):
        # the trained model's trajectory forward over the run's FULL
        # observation grid (the reference's eval protocol) becomes the
        # serving artifact; runtime input is x0 alone
        from ndcn_tpu.serve import export_ndcn, save_artifact

        blob = export_ndcn(params, op, t_full, true_y0.shape,
                           rtol=args.rtol, atol=args.atol, method=args.method,
                           max_steps=1 << 14, **flags)
        save_artifact(args.export, blob)
        print(f"exported serving artifact ({len(blob):,} bytes) -> "
              f"{args.export}", flush=True)
        results["export"] = args.export

    return results


def main(dynamics_kind: str, title: str, argv=None) -> Dict[str, Any]:
    args = build_parser(title).parse_args(argv)
    return run(dynamics_kind, args)
