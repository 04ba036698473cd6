"""Isolate the --mesh train step's end-to-end overhead (VERDICT r4 weak #6).

The committed records show the sharded SpMV microbench costs ~nothing extra
(9.27 vs 9.04 ms, results/microbench_sharded_spmv_200k.json) while the FULL
sharded train step runs 2.6x slower than unsharded at 200k nodes (0.90 vs
2.33 steps/s, results/scale_200k_heat_mesh.json). This tool bisects where the
tax lives by building the exact demo step (examples/large_graph.py) in four
variants and timing / HLO-profiling each on the same chip:

  step_u    unsharded operator, unsharded arrays        (the 2.33 baseline)
  step_s    sharded operator + sharded x0/target        (the 0.90 mesh run)
  step_so   sharded operator, UNSHARDED x0/target       -> is the tax in the
            shard_map SpMV itself or in solver arithmetic on sharded states?
  fwd_u/s   value-only (no grad) objective              -> fwd vs bwd split

First TPU run (r5, /tmp/mesh_tax.log): step_u 436.8 ms ~ the committed 2.33
steps/s record, but step_s 439.2 ms — NO tax under this harness, contradicting
the demo's 0.90. The demo's step differs from the plain jit above in exactly
two ways (examples/large_graph.py:423-437): the big float tile vals ride as
jit ARGUMENTS re-inserted via _replace inside the jit (the axon ~256 MB
compile-request cap forces this at 1M; 200k inherits it), and
donate_argnums=(0, 1). The *_d variants replicate that builder and bisect:

  step_ud / step_sd    demo builder exactly (hoist + donate)
  step_sdh             hoist only (no donation)
  step_sdd             donation only (op fully closure-captured)

VERDICT (results/mesh_tax_bisect_200k.json, TPU v5 lite): steady-state
sharded == unsharded in every pairing — step_sd 414.4 vs step_ud 415.6 ms,
fwd_s 206.8 vs fwd_u 210.3 ms (plain-jit variants within the same band,
436-496 ms across runs). The donating variants' FIRST timed rep captures the
culprit on the chip: step_sdd rep1 = 38,958 ms — the ~40 s mid-loop
RECOMPILE caused by threading a mesh-committed output state into a call
keyed on optax's uncommitted int32 step counter (step_sd's rep1 is 6.8 s
only because it hit the persistent compile cache). That one recompile inside
the 60-iter timed loop is the whole 0.90-vs-2.33 story; the demo now commits
the opt state up front (examples/large_graph.py) and
tests/test_parallel.py::test_mesh_threaded_step_compiles_once guards it.
Donation+hoist is otherwise ~5% FASTER than the plain jit (buffer reuse).

Usage (idle host; detached with a generous timeout — axon tunnel rules):
  python tools/analyze_mesh_tax.py --n 200000 --kernel_precision bf16 \
      --time --reps 3 --out /tmp/mesh_tax.json
  python tools/analyze_mesh_tax.py --n 200000 --hlo /tmp/hlo --variants step_u,step_s

--hlo writes each variant's optimized HLO text and prints an op histogram
(copies / all-gathers / fusions, with the largest buffer shapes) plus the
compiled memory_analysis — enough to see a per-eval layout round-trip that a
wall-clock number can't localize.
"""

import argparse
import json
import re
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser("analyze_mesh_tax")
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--deg", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hidden", type=int, default=20)
    ap.add_argument("--time_tick", type=int, default=40)
    ap.add_argument("--T", type=float, default=5.0)
    ap.add_argument("--max_steps", type=int, default=8)
    ap.add_argument("--kernel_precision", default="bf16",
                    choices=["split2", "bf16"])
    ap.add_argument("--variants", default="step_u,step_s,step_so,fwd_u,fwd_s")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hlo", type=str, default=None,
                    help="prefix: write <prefix>_<variant>.hlo.txt + histogram")
    ap.add_argument("--out", type=str, default=None)
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

    from examples.large_graph import build_sparse_graph
    from ndcn_tpu.graph.operators import normalized_laplacian_sparse
    from ndcn_tpu.graph.sparse import as_operator
    from ndcn_tpu.models import init_ndcn, ndcn_forward
    from ndcn_tpu.train.losses import l1_loss, relative_l1
    from ndcn_tpu.train.optim import make_sgd_step, torch_adam
    from ndcn_tpu.train.sampling import sample_times

    n = args.n
    adj = build_sparse_graph(n, args.deg, args.seed)
    op_u = as_operator(normalized_laplacian_sparse(adj), sparse=True,
                       format="coo")
    splits = sample_times(args.T, args.time_tick, "irregular", seed=args.seed)
    t_train = jnp.asarray(splits.t[splits.id_train])
    rng = np.random.RandomState(args.seed)
    x0_u = jnp.asarray(rng.uniform(0.0, 25.0, size=(n, 1)).astype(np.float32))
    # synthetic target: the step count is data-independent of the target (the
    # forward solve never reads it), so any same-shape target times the same
    # program the committed record ran
    target_u = jnp.asarray(rng.uniform(0.0, 25.0, size=(
        len(splits.id_train), n, 1)).astype(np.float32))
    params = init_ndcn(jax.random.PRNGKey(args.seed), 1, args.hidden, 1)
    opt = torch_adam(0.01, 1e-3)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from ndcn_tpu.parallel.mesh import make_mesh, node_sharding, replicated
    from ndcn_tpu.parallel.sweep import shard_operator

    mesh = make_mesh(data_divides=1, model_divides=n)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}",
          file=sys.stderr)
    op_s = shard_operator(mesh, op_u)
    x0_s = jax.device_put(x0_u, node_sharding(mesh))
    target_s = jax.device_put(target_u, NamedSharding(mesh, P(None, "model",
                                                              None)))
    params_r = jax.tree_util.tree_map(
        lambda l: jax.device_put(l, replicated(mesh)), params)

    def objective_with(op_, x0_, target_):
        def objective(p, _rng):
            out, stats = ndcn_forward(p, op_, t_train, x0_, rtol=0.01,
                                      atol=0.001, method="dopri5",
                                      max_steps=args.max_steps)
            loss = l1_loss(out, target_)
            return (jnp.where(stats.success, loss, jnp.nan),
                    relative_l1(out, target_))
        return objective

    def make_step(op_, x0_, target_):
        return jax.jit(make_sgd_step(opt, objective_with(op_, x0_, target_)))

    def make_fwd(op_, x0_, target_):
        return jax.jit(objective_with(op_, x0_, target_))

    def make_demo_step(op_, x0_, target_, hoist=True, donate=True):
        """The demo's build_step (examples/large_graph.py:423-437): tile vals
        as jit args re-inserted via _replace, params/opt-state donated."""
        has_tiles = getattr(op_, "tiles", None) is not None and hoist

        def step_fn(p, s, k, fl, x0a, ta):
            tv, tvt = fl
            opx = op_._replace(tiles=op_.tiles._replace(vals=tv),
                               tiles_t=op_.tiles_t._replace(vals=tvt)) \
                if has_tiles else op_
            return make_sgd_step(opt, objective_with(opx, x0a, ta))(p, s, k)

        wrapped = jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())
        fl = ((op_.tiles.vals, op_.tiles_t.vals) if has_tiles
              else (None, None))

        def step(p, s, k):
            return wrapped(p, s, k, fl, x0_, target_)
        return step

    builders = {
        "step_u": lambda: (make_step(op_u, x0_u, target_u), "step"),
        "step_s": lambda: (make_step(op_s, x0_s, target_s), "step"),
        "step_so": lambda: (make_step(op_s, x0_u, target_u), "step"),
        "fwd_u": lambda: (make_fwd(op_u, x0_u, target_u), "fwd"),
        "fwd_s": lambda: (make_fwd(op_s, x0_s, target_s), "fwd"),
        "step_ud": lambda: (make_demo_step(op_u, x0_u, target_u), "step_nd"),
        "step_sd": lambda: (make_demo_step(op_s, x0_s, target_s), "step_nd"),
        "step_sdh": lambda: (make_demo_step(op_s, x0_s, target_s,
                                            donate=False), "step"),
        "step_sdd": lambda: (make_demo_step(op_s, x0_s, target_s,
                                            hoist=False), "step_nd"),
    }
    wanted = [v.strip() for v in args.variants.split(",") if v.strip()]
    results = {}

    from ndcn_tpu.train.elastic import device_copy

    for name in wanted:
        fn, kind = builders[name]()
        p_in = params if name in ("step_u", "step_so", "fwd_u", "step_ud") \
            else params_r
        if kind == "step":
            call = lambda k, f=fn, p=p_in: f(p, opt.init(p), k)
            block = lambda o: jax.block_until_ready(o[2])
        elif kind == "step_nd":
            # donating step: thread the returned state exactly like the
            # demo's timed loop (donation invalidates the inputs), running on
            # device copies so later variants keep the original params
            state = {"p": device_copy(p_in), "s": None}
            state["s"] = opt.init(state["p"])

            def call(k, f=fn, st=state):
                out = f(st["p"], st["s"], k)
                st["p"], st["s"] = out[0], out[1]
                return out
            block = lambda o: jax.block_until_ready(o[2])
        else:
            call = lambda k, f=fn, p=p_in: f(p, k)
            block = lambda o: jax.block_until_ready(o[0])

        if args.hlo and kind == "step_nd":
            print(f"[{name}] --hlo unsupported for donating demo variants",
                  file=sys.stderr)
        if args.hlo and kind != "step_nd":
            lowered = (fn.lower(p_in, opt.init(p_in), jax.random.PRNGKey(2))
                       if kind == "step"
                       else fn.lower(p_in, jax.random.PRNGKey(2)))
            compiled = lowered.compile()
            txt = compiled.as_text()
            path = f"{args.hlo}_{name}.hlo.txt"
            with open(path, "w") as f:
                f.write(txt)
            hist = hlo_histogram(txt)
            ma = compiled.memory_analysis()
            mem = None
            if ma is not None:
                mem = {"args_gb": round(ma.argument_size_in_bytes / 1e9, 3),
                       "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
                       "out_gb": round(ma.output_size_in_bytes / 1e9, 3)}
            results[name] = {"hlo": path, "ops": hist, "memory": mem}
            print(f"[{name}] {path}\n  mem={mem}", file=sys.stderr)
            for op, (cnt, gb) in sorted(hist.items(),
                                        key=lambda kv: -kv[1][1])[:12]:
                print(f"  {op:<28s} x{cnt:<5d} {gb:8.3f} GB", file=sys.stderr)

        if args.time:
            k0 = jax.random.PRNGKey(2)
            t0 = time.time()
            block(call(k0))
            compile_s = time.time() - t0
            times = []
            for r in range(args.reps):
                k0, k = jax.random.split(k0)
                t0 = time.time()
                block(call(k))
                times.append(time.time() - t0)
            ms = sorted(times)[len(times) // 2] * 1e3
            results.setdefault(name, {})
            results[name].update({"ms_median": round(ms, 1),
                                  "ms_all": [round(t * 1e3, 1) for t in times],
                                  "compile_s": round(compile_s, 1)})
            print(f"[{name}] {ms:.1f} ms median of {args.reps} "
                  f"(compile+first {compile_s:.1f}s)", file=sys.stderr)

    out = {"n": n, "nnz": int(adj.nnz), "max_steps": args.max_steps,
           "kernel_precision": args.kernel_precision,
           "device": str(jax.devices()[0].device_kind)
           if jax.devices() else "?",
           "variants": results}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


_SHAPE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]")


def _bytes_of(line: str) -> float:
    """Sum the byte sizes of every shape literal on an HLO line (rough but
    monotone — enough to rank op classes by traffic)."""
    total = 0
    for dt, dims in _SHAPE.findall(line):
        item = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "s8": 1, "u8": 1, "pred": 1}[dt]
        numel = 1
        for d in dims.split(","):
            if d:
                numel *= int(d)
        total += numel * item
    return total


def hlo_histogram(txt: str):
    """op-class -> (count, GB of shapes on those lines) for the expensive
    movement ops; fusions are bucketed by kind."""
    hist = {}
    for line in txt.splitlines():
        s = line.strip()
        m = re.match(r"%?[\w.\-]+ = [\w\[\],\d{} ]+ ([a-z\-]+)\(", s)
        if not m:
            continue
        op = m.group(1)
        if op == "fusion":
            km = re.search(r'kind=(\w+)', s)
            op = f"fusion.{km.group(1) if km else '?'}"
        if op not in ("copy", "all-gather", "all-reduce", "transpose",
                      "dynamic-update-slice", "dynamic-slice", "reshape",
                      "bitcast", "custom-call", "while", "convert", "pad",
                      "slice", "concatenate", "gather", "scatter", "dot") \
                and not op.startswith("fusion"):
            continue
        cnt, gb = hist.get(op, (0, 0.0))
        hist[op] = (cnt + 1, gb + _bytes_of(s) / 1e9)
    return {k: (c, round(g, 3)) for k, (c, g) in hist.items()}


if __name__ == "__main__":
    main()
