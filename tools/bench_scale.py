"""Reproducible scale-record capture: estimate + measured run in one artifact.

Runs examples/large_graph.py twice in subprocesses — once with --estimate on
the CPU backend (shape-derived HBM prediction, no compile) and once for real
on the default device — and writes a single JSON record combining both to
results/scale_{n}_{dynamics}.json. This is how the committed scale evidence is
produced, so a kernel/remat/budget regression shows up as a diff against a
machine-readable artifact instead of against PARITY prose (VERDICT r3 weak #3).

Usage:
    python tools/bench_scale.py --n 200000 --dynamics heat \
        [--out results/scale_200k_heat.json] [passthrough large_graph flags...]

Everything after the script's own flags passes through to large_graph.py
(e.g. --gt_cache, --emission_precision bf16, --iters 40).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "examples", "large_graph.py")


def run_demo(argv, timeout_s):
    """Run large_graph.py with argv; return the last stdout line as JSON."""
    cmd = [sys.executable, DEMO] + argv
    print(f"[bench_scale] + {' '.join(cmd)}", file=sys.stderr, flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout_s)
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        raise SystemExit(f"large_graph.py failed (rc {r.returncode}); "
                         f"stdout tail: {r.stdout[-500:]}")
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def main(argv=None):
    ap = argparse.ArgumentParser("bench_scale")
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--dynamics", type=str, default="heat")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--timeout", type=int, default=7200,
                    help="per-subprocess wall-clock bound (the 1M ground "
                         "truth takes ~15 min on CPU; tunnel compiles are "
                         "minutes)")
    ap.add_argument("--skip_estimate", action="store_true")
    args, passthrough = ap.parse_known_args(argv)

    base = ["--n", str(args.n), "--dynamics", args.dynamics] + passthrough
    est = None
    if not args.skip_estimate:
        est = run_demo(base + ["--estimate", "--platform", "cpu"],
                       args.timeout)
        print(f"[bench_scale] estimate: {est['estimate_gb']} GB "
              f"(fits={est['fits']}, layout={est['layout']})",
              file=sys.stderr, flush=True)

    t0 = time.time()
    measured = run_demo(base, args.timeout)
    record = {
        "measured": measured,
        "estimate": est,
        "argv": base,
        "wall_s": round(time.time() - t0, 1),
    }
    out = args.out or os.path.join(
        REPO, "results",
        f"scale_{args.n // 1000}k_{args.dynamics}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1)
    os.replace(tmp, out)
    print(f"[bench_scale] wrote {out}", file=sys.stderr, flush=True)
    print(json.dumps({"out": out,
                      "train_steps_per_sec": measured["train_steps_per_sec"],
                      "rel_loss_final": measured["rel_loss_final"],
                      "device": measured["device"],
                      "hbm_peak_gb": measured.get("hbm_peak_gb"),
                      "estimate_gb": est["estimate_gb"] if est else None}))


if __name__ == "__main__":
    main()
