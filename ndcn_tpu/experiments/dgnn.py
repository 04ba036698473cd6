"""Semi-supervised node classification on citation networks (reference: dgnn.py).

Flag surface, model zoo, training/eval protocol, per-epoch log format, --iter
accumulation semantics (the model keeps training across ITERs — dgnn.py:248-251
builds the model once), TSV dump and the accuracy summary statistics all match
the reference. Defaults: hidden 16, dropout 0.5, wd 5e-4, T=2, tick 5, dopri5
with rtol=atol=0.1, alpha 0.5 (dgnn.py:24-70).

TPU-first: the whole epoch (full-batch forward+backward+update) is one jitted
step with donated optimizer state; evaluation is a second jitted function.

Usage: python -m ndcn_tpu.experiments.dgnn --dataset cora --model differential_gcn \
           --iter 5 --dropout 0 --hidden 256 --T 1.2 --time_tick 16 --epochs 100 \
           --weight_decay 0.024 --no_control --method dopri5 --alpha 0
"""

from __future__ import annotations

import argparse
import datetime
import os
import time
from typing import Any, Dict

import numpy as np

MODELS = ("DeepGCN", "GCN", "DeepGCN2", "DeepGCN3", "DeepGCN4", "resGCN",
          "odeGCN", "differential_gcn")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("dgnn")
    p.add_argument("--fastmode", action="store_true", default=False,
                   help="skip the eval-mode re-forward for val metrics")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--rtol", type=float, default=0.1)
    p.add_argument("--atol", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("-nhl", "--nHiddenLayers", type=int, default=0)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--dataset", type=str, default="cora")
    p.add_argument("--model", type=str, default="GCN", choices=list(MODELS))
    p.add_argument("--iter", type=int, default=1)
    p.add_argument("--dump", action="store_true", default=False)
    p.add_argument("--delta", type=float, default=1.0)
    p.add_argument("--normalize", action="store_true", default=False)
    p.add_argument("--Euler", action="store_true", default=False)
    p.add_argument("--T", type=float, default=2.0)
    p.add_argument("--time_tick", type=int, default=5)
    p.add_argument("--no_control", action="store_true")
    p.add_argument("--method", type=str, default="dopri5",
                   choices=["dopri5", "adams", "explicit_adams", "fixed_adams",
                            "tsit5", "euler", "midpoint", "rk4"])
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--sparse", action="store_true",
                   help="sparse operator (auto for > 8192 nodes)")
    p.add_argument("--sparse_format", type=str, default="coo",
                   choices=["coo", "ell", "bsr"],
                   help="sparse layout: segment-sum COO (scalable default), "
                        "gather-ELL, or the Pallas BSR kernel (suited to "
                        "block-clustered operators; scattered graphs average "
                        "a few edges per 128x128 block and waste the MXU)")
    p.add_argument("--max_steps", type=int, default=0,
                   help="adaptive step budget for the differentiable solve "
                        "(0 = auto-size from a probe solve at init)")
    p.add_argument("--batch_iters", action="store_true",
                   help="train --iter INDEPENDENT replicas simultaneously "
                        "(vmapped; differs from the reference's accumulating "
                        "--iter loop)")
    p.add_argument("--budget_buckets", type=int, default=1,
                   help="with --batch_iters and an auto budget: probe EVERY "
                        "replica init and split the sweep into up to this "
                        "many vmapped programs grouped by step budget, so "
                        "easy replicas stop paying the hardest init's frozen "
                        "scan slots (a batched cond runs every budgeted "
                        "attempt for all replicas). 1 = one shared budget; "
                        ">1 trades extra compiles for tighter budgets "
                        "(single-chip only — ignored under --mesh)")
    p.add_argument("--mesh", action="store_true",
                   help="multi-chip: with --batch_iters, shard replicas over "
                        "the mesh 'data' axis and node-major arrays over "
                        "'model'; on a single model, row-shard the operator "
                        "and features over 'model' (params replicated)")
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="enable periodic checkpoint/resume in this directory "
                        "(single-model path; the reference's 100-iter showcase "
                        "run is ~11 min end to end and restarts from scratch "
                        "without it)")
    p.add_argument("--ckpt_freq", type=int, default=25,
                   help="checkpoint every this many epochs (global step = "
                        "iter*epochs + epoch, so resume lands mid-ITER too)")
    p.add_argument("--export", type=str, default=None, metavar="PATH",
                   help="after training, serialize the final model's full "
                        "compiled inference forward (terminal logits over "
                        "the frozen time grid) to PATH as a portable serving "
                        "artifact (ndcn_tpu/serve.py; loads with jax alone). "
                        "Continuous-time models, single-model path only")
    from ndcn_tpu.utils.platform import add_platform_flag
    add_platform_flag(p)
    return p


def run(args: argparse.Namespace) -> Dict[str, Any]:
    if args.export:
        # fail BEFORE training, not after a long run
        if args.model not in ("differential_gcn", "odeGCN"):
            raise SystemExit("--export serializes the continuous-time "
                             "inference forward; use --model "
                             "differential_gcn or odeGCN")
        if args.batch_iters:
            raise SystemExit("--export needs the single-model path "
                             "(drop --batch_iters)")
        if args.mesh:
            raise SystemExit("--export produces a single-device serving "
                             "artifact (drop --mesh)")
    if args.ckpt_dir and args.batch_iters:
        # the vmapped sweep trains all replicas in one program; a snapshot
        # would have to capture every bucket's stacked state mid-flight. The
        # sweep's unit of recovery is the whole (short) program — rerun it.
        raise SystemExit("--ckpt_dir needs the single-model path "
                         "(drop --batch_iters)")
    from ndcn_tpu.utils.platform import force_platform, set_matmul_precision
    force_platform(args.platform)
    set_matmul_precision(args.precision)
    from ndcn_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ndcn_tpu.data import load_planetoid
    from ndcn_tpu.graph.sparse import as_operator
    from ndcn_tpu.models import gcn_zoo, init_ndcn, ndcn_forward
    from ndcn_tpu.train.losses import accuracy, cross_entropy
    from ndcn_tpu.train.optim import make_sgd_step, torch_adam

    if args.seed != -1:
        np.random.seed(args.seed)
    t_very_beginning = time.time()

    data = load_planetoid(args.dataset, alpha=args.alpha, data_dir=args.data_dir)
    print("Load data done")
    n, in_dim = data.features.shape
    num_classes = int(data.labels.max()) + 1
    use_sparse = args.sparse or n > 8192
    op = as_operator(data.operator, sparse=use_sparse, format=args.sparse_format)

    features = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    idx_train = jnp.asarray(data.idx_train)
    idx_val = jnp.asarray(data.idx_val)
    idx_test = jnp.asarray(data.idx_test)

    key = jax.random.PRNGKey(args.seed if args.seed != -1 else 0)
    key, init_key = jax.random.split(key)

    # ------------------------------------------------------------ model zoo
    model_name = args.model
    nhl = args.nHiddenLayers
    vt = jnp.asarray(np.linspace(0, args.T, args.time_tick), jnp.float32)
    budget_is_auto, make_apply, max_steps = False, None, 0

    if model_name == "GCN":
        params = gcn_zoo.init_gcn(init_key, in_dim, args.hidden, num_classes, nhl)

        def apply(p, rng, deterministic):
            return gcn_zoo.gcn_apply(p, op, features, args.dropout, rng,
                                     deterministic), None
    elif model_name == "DeepGCN":
        params = gcn_zoo.init_deep_gcn(init_key, in_dim, args.hidden, num_classes, nhl)

        def apply(p, rng, deterministic):
            return gcn_zoo.deep_gcn_apply(p, op, features, args.dropout, rng,
                                          deterministic), None
    elif model_name == "DeepGCN2":
        params = gcn_zoo.init_deep_gcn2(init_key, in_dim, args.hidden, num_classes)

        def apply(p, rng, deterministic):
            return gcn_zoo.deep_gcn2_apply(p, op, features, args.dropout, rng,
                                           deterministic), None
    elif model_name == "DeepGCN3":
        params = gcn_zoo.init_deep_gcn3(init_key, in_dim, args.hidden, num_classes, n)

        def apply(p, rng, deterministic):
            return gcn_zoo.deep_gcn3_apply(p, op, features, nhl, args.dropout, rng,
                                           deterministic), None
    elif model_name == "DeepGCN4":
        params = gcn_zoo.init_deep_gcn4(init_key, in_dim, args.hidden, num_classes, nhl)

        def apply(p, rng, deterministic):
            return gcn_zoo.deep_gcn4_apply(p, op, features, args.dropout, rng,
                                           deterministic), None
    elif model_name == "resGCN":
        params = gcn_zoo.init_res_gcn(init_key, in_dim, args.hidden, num_classes,
                                      n_blocks=nhl, euler=args.Euler)

        def apply(p, rng, deterministic):
            return gcn_zoo.res_gcn_apply(p, op, features, args.dropout, rng,
                                         deterministic, normalize=args.normalize), None
    elif model_name in ("odeGCN", "differential_gcn"):
        if model_name == "odeGCN":
            # The reference's odeGCN wiring cannot run (ODEBlock.forward takes
            # (vt, x) but sits in nn.Sequential, dgnn.py:143-160); this implements
            # the evident intent: encoder → ODE(relu(dropout(A h))) over
            # linspace(0,1.9,10), terminal state → decoder (ode_gcn.py:85-109).
            params = init_ndcn(init_key, in_dim, args.hidden, num_classes,
                               no_control=True, encoder_layers=2)
            vt_model = jnp.asarray(np.linspace(0, 1.9, 10), jnp.float32)
            no_control = True
        else:
            print("T : {}, time tick: {}".format(args.T, args.time_tick))
            params = init_ndcn(init_key, in_dim, args.hidden, num_classes,
                               no_control=args.no_control, encoder_layers=1)
            vt_model = vt
            no_control = args.no_control

        max_steps = args.max_steps
        budget_is_auto = False
        replica_budgets = None  # per-replica probe results (--budget_buckets)
        if max_steps <= 0 and args.method in ("dopri5", "tsit5"):
            from ndcn_tpu.train.budget import (probe_step_budget,
                                               probe_step_budget_multi, to_cpu)

            # step counts don't depend on the operator LAYOUT (same matrix), so
            # the CPU probe uses COO when the chosen format is the Pallas BSR
            # kernel — interpret-mode pallas at pubmed scale takes minutes
            op_probe = (as_operator(data.operator, sparse=True, format="coo")
                        if args.sparse_format == "bsr" and use_sparse else op)
            op_c, feats_c, vt_c = to_cpu((op_probe, features, vt_model))

            def probe_with(p):
                p_c = to_cpu(p)

                def probe():
                    _, stats = ndcn_forward(
                        p_c, op_c, vt_c, feats_c, rtol=args.rtol,
                        atol=args.atol, method=args.method, terminal=True,
                        no_control=no_control, max_steps=1 << 14, adjoint=False,
                        nondiff=True)
                    return stats

                return probe

            probe = probe_with(params)
            if args.batch_iters:
                # a vmapped sweep cannot roll back one replica: size for the
                # HARDEST of several probed replica inits (the sweep's actual
                # init keys, split below), with generous headroom
                enc_layers = 2 if model_name == "odeGCN" else 1
                rkeys = jax.random.split(init_key, args.iter)
                if args.budget_buckets > 1:
                    # per-replica probes (CPU, one shared compile): every
                    # replica gets its own quantized budget, grouped below
                    # into <= budget_buckets vmapped programs so easy
                    # replicas stop paying frozen slots for the hardest init
                    from ndcn_tpu.train.budget import probe_step_budget_each
                    probes = [probe_with(init_ndcn(
                        rkeys[i], in_dim, args.hidden, num_classes,
                        no_control=no_control, encoder_layers=enc_layers))
                        for i in range(args.iter)]
                    replica_budgets = probe_step_budget_each(probes)
                    max_steps = int(max(replica_budgets))
                else:
                    probes = [probe_with(init_ndcn(
                        rkeys[i], in_dim, args.hidden, num_classes,
                        no_control=no_control, encoder_layers=enc_layers))
                        for i in range(min(4, args.iter))]
                    max_steps = probe_step_budget_multi(probes)
            else:
                # snug budget: the epoch loop below recovers from exhaustion
                # by rollback + budget doubling (train/elastic.py)
                max_steps = probe_step_budget(probe, floor=8, headroom=2.5,
                                              slack=4, quantum=4)
                budget_is_auto = True
            print(f"auto step budget: max_steps={max_steps}")
        elif max_steps <= 0:
            max_steps = 64

        def make_apply(ms):
            def apply(p, rng, deterministic):
                out, stats = ndcn_forward(
                    p, op, vt_model, features, rtol=args.rtol, atol=args.atol,
                    method=args.method, terminal=True, no_control=no_control,
                    dropout=0.0 if deterministic else args.dropout, rng=rng,
                    max_steps=ms)
                ok = stats.success if stats is not None else None
                return out, ok
            return apply

        apply = make_apply(max_steps)
    else:
        raise ValueError(f"unknown model {model_name}")

    opt = torch_adam(args.lr, args.weight_decay)
    opt_state = opt.init(params)

    from functools import partial as _partial

    def build_fns(a):
        """(sgd_step, epoch_step, eval_logits) over one `apply` closure —
        rebuilt (recompiled) when elastic recovery grows the step budget.

        ``epoch_step`` runs the whole per-epoch protocol — train step, the
        eval-mode re-forward (unless --fastmode), and the epoch-stats vector —
        as three back-to-back ASYNC dispatches with no host sync between them:
        the queue overlaps epoch N's eval/stats with epoch N+1's train step,
        which measures faster than fusing everything into one program (the
        stats themselves are fetched one epoch late by the caller)."""
        def train_objective(q, rng):
            logits, ok = a(q, rng, deterministic=False)
            loss = cross_entropy(logits[idx_train], labels[idx_train])
            if ok is not None:
                loss = jnp.where(ok, loss, jnp.nan)  # blown budget must be loud
            return loss, logits

        sgd_step = make_sgd_step(opt, train_objective)
        train_step = _partial(jax.jit, donate_argnums=(0, 1))(sgd_step)

        def _eval(p):
            logits, ok = a(p, None, deterministic=True)
            if ok is not None:
                # eval-side budget exhaustion must poison the metrics: the
                # deterministic re-forward can outgrow a budget the dropout-
                # masked train solve still fits, and finite-but-truncated
                # logits would corrupt val/test metrics silently (the elastic
                # check watches the full stats vector for exactly this)
                logits = jnp.where(ok, logits, jnp.nan)
            return logits

        eval_logits = jax.jit(_eval)

        def epoch_step(q, s, rng):
            q, s, loss_train, train_logits = train_step(q, s, rng)
            logits = train_logits if args.fastmode else eval_logits(q)
            return q, s, epoch_stats(logits, loss_train)

        return sgd_step, epoch_step, eval_logits

    @jax.jit
    def epoch_stats(logits, loss_train):
        """All per-epoch scalars in one device array -> one host sync per epoch
        (each float() costs a ~30 ms round trip through the TPU tunnel)."""
        return jnp.stack([
            loss_train,
            cross_entropy(logits[idx_train], labels[idx_train]),
            accuracy(logits[idx_train], labels[idx_train]),
            cross_entropy(logits[idx_val], labels[idx_val]),
            accuracy(logits[idx_val], labels[idx_val]),
        ])

    sgd_step, epoch_step, eval_logits = build_fns(apply)

    def metrics(logits, idx):
        return (float(cross_entropy(logits[idx], labels[idx])),
                float(accuracy(logits[idx], labels[idx])))

    # --------------------------------------------- batched independent repeats
    if args.batch_iters:
        # TPU-native sweep: args.iter INDEPENDENT models train simultaneously —
        # one vmapped program instead of the reference's sequential repeats.
        # (Semantics differ from the reference --iter loop, which keeps training
        # ONE model across iterations, dgnn.py:248-251; use the default loop for
        # that accumulation behavior.)
        if model_name not in ("differential_gcn", "odeGCN", "GCN", "DeepGCN",
                              "DeepGCN2", "DeepGCN4"):
            raise SystemExit(f"--batch_iters unsupported for {model_name}")
        r = args.iter
        mesh = None
        if args.mesh:
            if len(jax.devices()) < 2:
                print("--mesh: single device visible; running unsharded")
            else:
                from ndcn_tpu.parallel.mesh import make_mesh
                mesh = make_mesh(data_divides=r, model_divides=n)
                print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        # accelerator-memory guard for the ODE models: the estimate is derived
        # from the actual solve shapes (scan-emitted interp buffers + saved
        # carry per step; see train/budget.scan_train_bytes, validated against
        # compiled memory_analysis). Guard only where it applies: ODE models on
        # an accelerator backend — GCN-family replicas have no solver buffers,
        # and host RAM is not the HBM. With --mesh, replicas spread over the
        # 'data' axis, so the per-DEVICE load is est / data_size.
        if (model_name in ("differential_gcn", "odeGCN")
                and jax.default_backend() != "cpu"):
            from ndcn_tpu.train.budget import (accelerator_memory_limit,
                                               scan_train_bytes)
            sds = jax.ShapeDtypeStruct((n, args.hidden), jnp.float32)

            def bytes_at(ms):
                return scan_train_bytes(args.method, ms, sds,
                                        n_obs=args.time_tick)

            if (args.budget_buckets > 1 and replica_budgets is not None
                    and mesh is None):
                # buckets train SEQUENTIALLY: peak HBM is the largest single
                # bucket's footprint, not all replicas at the hardest budget
                # (that estimate would reject sweeps that actually fit)
                from ndcn_tpu.train.budget import bucket_budgets
                groups = bucket_budgets(replica_budgets, args.budget_buckets)
                est = max(len(ix) * bytes_at(b) for b, ix in groups)
                per_replica = max(bytes_at(b) for b, _ in groups)
                data_size = 1
            else:
                per_replica = bytes_at(max_steps)
                data_size = int(mesh.shape["data"]) if mesh is not None else 1
                est = r * per_replica // data_size
            budget = int(0.85 * accelerator_memory_limit())
            if est > budget:
                fit = data_size * (budget // per_replica)
                advice = (f"run batches of <= {fit} replicas instead (or "
                          f"reduce --hidden/--max_steps)" if fit >= 1 else
                          "not even ONE replica fits this budget — reduce "
                          "--hidden/--max_steps")
                raise SystemExit(
                    f"--batch_iters with {r} replicas needs ~{est / 1e9:.1f} GB "
                    f"of HBM per device for solver buffers "
                    f"(~{per_replica / 1e6:.0f} MB each over {data_size} "
                    f"data-parallel device(s), budget {budget / 1e9:.1f} GB); "
                    f"{advice}")
        init_one = {
            "GCN": lambda k: gcn_zoo.init_gcn(k, in_dim, args.hidden, num_classes, nhl),
            "DeepGCN": lambda k: gcn_zoo.init_deep_gcn(k, in_dim, args.hidden,
                                                       num_classes, nhl),
            "DeepGCN2": lambda k: gcn_zoo.init_deep_gcn2(k, in_dim, args.hidden,
                                                         num_classes),
            "DeepGCN4": lambda k: gcn_zoo.init_deep_gcn4(k, in_dim, args.hidden,
                                                         num_classes, nhl),
        }.get(model_name)
        if init_one is None:  # the ODE models reuse the non-batched init closure
            if model_name == "odeGCN":
                def init_one(k):
                    return init_ndcn(k, in_dim, args.hidden, num_classes,
                                     no_control=True, encoder_layers=2)
            else:
                def init_one(k):
                    return init_ndcn(k, in_dim, args.hidden, num_classes,
                                     no_control=args.no_control, encoder_layers=1)
        params_b = jax.vmap(init_one)(jax.random.split(init_key, r))
        opt_state_b = jax.vmap(opt.init)(params_b)

        if mesh is not None:
            # multi-chip: replicas over 'data', node rows over 'model'. The
            # shardings alone drive GSPMD; the training code below is unchanged
            # (apply/sgd_step close over `op`/`features` late-bound, so the
            # sharded arrays are what the jitted step traces against).
            from ndcn_tpu.parallel.sweep import shard_replica_problem
            params_b, opt_state_b, op, shards = shard_replica_problem(
                mesh, params_b, opt_state_b, op, {"features": features})
            features = shards["features"]
        from functools import partial as _p

        def make_batched_fns(sgd_one, apply_one):
            @_p(jax.jit, donate_argnums=(0, 1))
            def batched_step(pb, sb, rngs):
                def one(p, s, rng):
                    p, s, loss, _ = sgd_one(p, s, rng)
                    return p, s, loss
                return jax.vmap(one)(pb, sb, rngs)

            @jax.jit
            def batched_eval(pb):
                def one(p):
                    out, ok = apply_one(p, None, deterministic=True)
                    if ok is not None:
                        # an exhausted EVAL solve is a truncated trajectory —
                        # poison it per replica, never report silently wrong
                        # logits
                        out = jnp.where(ok, out, jnp.nan)
                    return out
                return jax.vmap(one)(pb)

            return batched_step, batched_eval

        # Bucket replicas by per-init budget (--budget_buckets > 1): each
        # bucket is its own vmapped program with a snugger max_steps, so the
        # easy majority stops paying the hardest init's frozen scan slots
        # (the batched cond degrades to select — every budgeted attempt runs
        # for every replica). Single-chip only: the mesh path shards one
        # replica axis and would need per-bucket remeshing.
        buckets = [(max_steps, np.arange(r))]
        if (args.budget_buckets > 1 and replica_budgets is not None
                and mesh is None):
            from ndcn_tpu.train.budget import bucket_budgets
            buckets = bucket_budgets(replica_budgets, args.budget_buckets)
            print("budget buckets: " + ", ".join(
                f"{len(ix)} replica(s) @ max_steps {b}" for b, ix in buckets),
                flush=True)
        elif args.budget_buckets > 1 and mesh is not None:
            print("--budget_buckets ignored under --mesh (single shared "
                  "budget)", flush=True)

        logits_by_idx = {}
        t_start = time.time()
        for bi, (ms_b, idxs) in enumerate(buckets):
            r_b = len(idxs)
            if len(buckets) == 1:
                sgd_b, apply_b = sgd_step, apply
                pb, sb = params_b, opt_state_b
            else:
                apply_b = make_apply(ms_b)
                sgd_b = build_fns(apply_b)[0]
                pb = jax.tree_util.tree_map(lambda l: l[idxs], params_b)
                sb = jax.tree_util.tree_map(lambda l: l[idxs], opt_state_b)
            bstep, beval = make_batched_fns(sgd_b, apply_b)
            bkey = key if len(buckets) == 1 else jax.random.fold_in(key, bi)
            tag = "" if len(buckets) == 1 else f" [bucket {bi}: ms {ms_b}]"
            for epoch in range(args.epochs):
                bkey, rng = jax.random.split(bkey)
                pb, sb, losses = bstep(pb, sb, jax.random.split(rng, r_b))
                if (epoch + 1) % max(1, args.epochs // 10) == 0:
                    print(f"Epoch {epoch + 1:04d} | mean train loss "
                          f"{float(jnp.mean(losses)):.4f} | {r_b} replicas"
                          f"{tag} | time {time.time() - t_start:.2f}s",
                          flush=True)
            logits_bucket = beval(pb)
            for j, i in enumerate(idxs):
                logits_by_idx[int(i)] = logits_bucket[j]
        logits_b = [logits_by_idx[i] for i in range(r)]
        t_total = time.time() - t_start
        # per-replica exhaustion is NaN-poisoned (the solvers flag
        # success=False per replica); a vmapped sweep cannot roll back one
        # replica, so name the casualties LOUDLY instead of letting NaN rows
        # dilute the aggregate silently
        dead = [i for i in range(r)
                if not bool(jnp.all(jnp.isfinite(logits_b[i])))]
        if dead and model_name in ("differential_gcn", "odeGCN"):
            if args.max_steps > 0:
                origin = f"--max_steps {max_steps} was given explicitly"
            elif args.method not in ("dopri5", "tsit5"):
                origin = f"default max_steps={max_steps} (no probe for " \
                         f"method={args.method})"
            elif len(buckets) > 1:
                origin = "probe-sized one per bucket"
            else:
                origin = (f"probe-sized max_steps={max_steps} from the "
                          f"hardest of {min(4, r)} probed inits")
            print(f"[budget] replicas {dead} exhausted their step budget "
                  f"during training — their rows are NaN; re-run with a "
                  f"larger --max_steps (budgets: {origin})", flush=True)
        elif dead:
            print(f"[warn] replicas {dead} produced non-finite logits",
                  flush=True)
        rows = []
        for i in range(r):
            loss_test = float(cross_entropy(logits_b[i][idx_test], labels[idx_test]))
            acc_test = float(accuracy(logits_b[i][idx_test], labels[idx_test]))
            rows.append((t_total / r, loss_test, acc_test, 0.0))
            print(f"Replica {i}: test loss= {loss_test:.4f} accuracy= {acc_test:.4f}")
        accs = np.array([row[2] for row in rows])
        print("results: {:.3f}% +/- {:.3f}%, {:.3f}% (Median);".format(
            accs.mean() * 100, accs.std(ddof=1) * 100 if r > 1 else 0.0,
            float(np.median(accs)) * 100))
        print(f"batched sweep: {r} replicas x {args.epochs} epochs in "
              f"{t_total:.2f}s total ({t_total / r:.3f}s per replica)")
        return {"rows": rows, "total_time": time.time() - t_very_beginning,
                "fname": None,
                "acc_mean": float(accs.mean()),
                "acc_std": float(accs.std(ddof=1)) if r > 1 else 0.0,
                "acc_median": float(np.median(accs)),
                "acc_min": float(accs.min()), "acc_max": float(accs.max())}

    # -------------------------------------------------------------- training
    if args.mesh:
        # single-model model-parallelism: operator rows and node-major
        # activations shard over the mesh's 'model' axis (dense rows via GSPMD,
        # COO via the shard_map row-block SpMV); params stay replicated. XLA
        # inserts the all-gather of the hidden state that row-parallel A·X
        # needs. This is the scale-out path for graphs beyond one chip's HBM
        # (SURVEY.md §5: pubmed-scale node-axis sharding).
        if len(jax.devices()) < 2:
            print("--mesh: single device visible; running unsharded")
        else:
            from ndcn_tpu.parallel.mesh import (make_mesh, node_sharding,
                                                replicated)
            from ndcn_tpu.parallel.sweep import shard_operator
            mesh = make_mesh(data_divides=1, model_divides=n)
            print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
            op = shard_operator(mesh, op)
            features = jax.device_put(features, node_sharding(mesh))
            rep = replicated(mesh)
            params = jax.tree_util.tree_map(
                lambda l: jax.device_put(l, rep), params)
            opt_state = jax.tree_util.tree_map(
                lambda l: jax.device_put(l, rep), opt_state)
    fout = None
    fname = None
    if args.dump:
        os.makedirs("results", exist_ok=True)
        stamp = datetime.datetime.now().__str__().replace(":", "-")
        fname = f"results/results_{stamp}.txt"
        fout = open(fname, "w")
        fout.write(vars(args).__str__() + "\n")
        fout.write("Time\tLoss\tAccuracy\tStep\n")

    def print_epoch(it, epoch, st, dt):
        print("ITER: {:04d}".format(it + 1),
              "Epoch: {:04d}".format(epoch + 1),
              "loss_train: {:.4f}".format(st[0]),
              "acc_train: {:.4f}".format(st[2]),
              "loss_val: {:.4f}".format(st[3]),
              "acc_val: {:.4f}".format(st[4]),
              "time: {:.4f}s".format(dt))

    # Elastic step-budget recovery (auto ODE budgets only; train/elastic.py):
    # exhaustion poisons loss_train to NaN; detection is one epoch LATE (the
    # stats fetch is pipelined), so snapshot candidates are device-copied
    # BEFORE the step donates the state and promoted only once the preceding
    # epoch's loss is verified finite — a finite loss at epoch e-1 certifies
    # the state ENTERING epoch e, which is exactly what the candidate holds.
    from ndcn_tpu.train.elastic import ElasticBudget, device_copy
    elastic = ElasticBudget(max_steps, enabled=budget_is_auto)
    snap_freq = 10

    # --------------------------------------------------- checkpoint / resume
    # Same subsystem as the dynamics driver (train/checkpoint.py; wiring at
    # experiments/dynamics.py periodic_hooks). The global step is
    # it·epochs + epoch, and the rng key + accumulated result rows ride in the
    # checkpoint's extra dict, so a killed run resumes mid-ITER on the exact
    # trajectory (same dropout/init streams) the uninterrupted run takes.
    rows = []
    start_global = 0
    if args.ckpt_dir:
        from ndcn_tpu.train.checkpoint import restore_with_extra, save_checkpoint
        params, opt_state, start_global, ckpt_extra = restore_with_extra(
            args.ckpt_dir, params, opt_state)
        if start_global:
            if "key" in ckpt_extra:
                key = jnp.asarray(ckpt_extra["key"])
            rows = [tuple(r) for r in ckpt_extra.get("rows", [])]

    for it in range(args.iter):
        g0 = it * args.epochs
        if start_global >= g0 + args.epochs:
            continue  # this ITER completed before the checkpoint (rows restored)
        t_start = time.time()
        pending = None  # (epoch, device stats, wall time) — printed one epoch late
        cand = None     # (cursor, key, state copy) awaiting validation
        ckpt_cand = None  # same shape, promoted to DISK once validated
        # snapshot cursors are GLOBAL (it·epochs + epoch): the elastic retry
        # counter resets only when a snapshot lands strictly PAST the last
        # rollback point, so a per-iter epoch restarting at 0 would never
        # signal progress and max_retries would count rollbacks across the
        # whole multi-iter run instead of consecutive failures
        epoch = max(0, start_global - g0)
        elastic.snapshot(g0 + epoch, key, (params, opt_state))

        def drain_pending():
            """Validate the one-epoch-late stats (the FULL vector: the eval
            re-forward shares the snug budget, so a NaN val metric with a
            finite train loss is still exhaustion). Returns the epoch to
            resume from after a rollback, or None when healthy."""
            nonlocal pending, cand, ckpt_cand, key, params, opt_state, \
                sgd_step, epoch_step, eval_logits
            if pending is None:
                return None
            failed_epoch, st_dev, dt = pending
            st_np = np.asarray(st_dev)
            if elastic.exhausted(st_np):
                cursor, key, (params, opt_state) = elastic.rollback()
                resume = cursor - g0
                print(f"[elastic] step budget exhausted near epoch "
                      f"{failed_epoch}; rolled back to epoch {resume} with "
                      f"max_steps={elastic.max_steps}", flush=True)
                apply_new = make_apply(elastic.max_steps)
                sgd_step, epoch_step, eval_logits = build_fns(apply_new)
                pending = cand = ckpt_cand = None
                return resume
            print_epoch(it, failed_epoch, st_np, dt)
            return None

        while True:
            while epoch < args.epochs:
                t_epoch = time.time()
                if elastic.enabled and epoch % snap_freq == 0:
                    # async device copy; promoted below once validated
                    cand = (g0 + epoch, key, device_copy((params, opt_state)))
                if args.ckpt_dir and (g0 + epoch) % args.ckpt_freq == 0:
                    # disk candidate: holds the state (and rng key) ENTERING
                    # this epoch; written only once the PRECEDING epoch's
                    # stats prove finite, so a NaN-poisoned state (budget
                    # exhaustion is detected one epoch late) never reaches disk
                    ckpt_cand = (g0 + epoch, key,
                                 device_copy((params, opt_state)))
                key, rng = jax.random.split(key)
                # train + eval re-forward + stats in ONE dispatch (build_fns)
                params, opt_state, st_dev = epoch_step(params, opt_state, rng)
                # fetch the PREVIOUS epoch's stats now: its transfer overlapped
                # with this epoch's compute, hiding the ~30 ms tunnel round trip
                resume = drain_pending()
                if resume is not None:
                    epoch = resume
                    continue
                if cand is not None:
                    elastic.snapshot(*cand, copy=False)
                    cand = None
                if ckpt_cand is not None:
                    gstep, ckey, (cp, cs) = ckpt_cand
                    save_checkpoint(args.ckpt_dir, gstep, cp, cs,
                                    extra={"key": np.asarray(ckey),
                                           "rows": [list(r) for r in rows]})
                    ckpt_cand = None
                pending = (epoch, st_dev, time.time() - t_epoch)
                epoch += 1
            resume = drain_pending()
            if resume is not None:
                epoch = resume
                continue
            break
        print("Optimization Finished!")
        t_total = time.time() - t_start
        print("Total time elapsed: {:.4f}s".format(t_total))

        logits = eval_logits(params)
        loss_test, acc_test = metrics(logits, idx_test)
        if not np.isfinite(loss_test):
            # final params are one step past the last monitored epoch; a NaN
            # here means that last step exhausted the budget — say so rather
            # than silently recording a NaN row
            print("[warn] final test eval is non-finite (step budget "
                  "exhausted on the last step?); row recorded as-is",
                  flush=True)
        print("Test set results:", "loss= {:.4f}".format(loss_test),
              "accuracy= {:.4f}".format(acc_test))
        rows.append((t_total, loss_test, acc_test, 0.0))
        if fout is not None:
            fout.write("{:.5f}\t{:.5f}\t{:.5f}\t{:.5f}\n".format(*rows[-1]))
            fout.flush()
        if args.ckpt_dir and np.isfinite(loss_test):
            # iter-boundary checkpoint: the completed ITER's row is durable, so
            # an interruption between ITERs resumes at the next one (and a
            # fully-finished run resumes past the loop entirely)
            save_checkpoint(args.ckpt_dir, g0 + args.epochs, params, opt_state,
                            extra={"key": np.asarray(key),
                                   "rows": [list(r) for r in rows]})

    total = time.time() - t_very_beginning
    print("DONE!\nTotal time: {:.4f}s;\n".format(total))

    summary: Dict[str, Any] = {"rows": rows, "total_time": total, "fname": fname,
                               "elastic_retries": elastic.total_rollbacks}
    if args.export:
        # the LAST iter's trained params become the serving model
        from ndcn_tpu.serve import export_ndcn, save_artifact

        blob = export_ndcn(params, op, vt_model, features.shape,
                           terminal=True, no_control=no_control,
                           rtol=args.rtol, atol=args.atol, method=args.method,
                           max_steps=1 << 14)
        save_artifact(args.export, blob)
        print(f"exported serving artifact ({len(blob):,} bytes) -> "
              f"{args.export}")
        summary["export"] = args.export
    if args.dump and rows:
        fout.close()
        accs = np.array([r[2] for r in rows])
        steps = np.array([r[3] for r in rows])
        summary.update(acc_mean=float(accs.mean()),
                       acc_std=float(accs.std(ddof=1)) if len(accs) > 1 else 0.0,
                       acc_median=float(np.median(accs)),
                       acc_min=float(accs.min()), acc_max=float(accs.max()))
        print(vars(args).__str__())
        print("results: {:.3f}% +/- {:.3f}%, {:.3f}% (Median);".format(
            summary["acc_mean"] * 100, summary["acc_std"] * 100,
            summary["acc_median"] * 100))
        print("Min_Acc: {:.3f}%, Max_Acc: {:.3f}%".format(
            summary["acc_min"] * 100, summary["acc_max"] * 100))
        print("Time_Step: {:.5f};".format(float(steps.mean())))
    return summary


def main(argv=None) -> Dict[str, Any]:
    args, _ = build_parser().parse_known_args(argv)
    return run(args)


if __name__ == "__main__":
    main()
