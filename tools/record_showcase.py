"""Record a dgnn showcase run (reference README.md:64-72 recipe) as a
committed JSON artifact, regression-guarded by tests/test_data_and_experiments.py.

The reference publishes the cora differential_gcn headline (83.18% ± 0.76,
README.md:67-72) and reports citeseer only in the paper; PARITY quotes our
citeseer accuracy, so the artifact for it must exist too (VERDICT r4 weak #5).

Usage:
    python tools/record_showcase.py [--dataset cora|citeseer|pubmed]
        [--iter 5] [--epochs 100] [--batch_iters] [--platform cpu] [--out ...]

--batch_iters trains the --iter replicas as ONE vmapped program (independent
models; the TPU-native sweep) — this is how results/showcase_cora_100.json was
captured (100 replicas, v5e-1). Without it, the reference's sequential --iter
accumulation loop runs instead.
"""

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_PUBLISHED = {
    # the only in-repo number (README.md:67-72); other datasets: paper-only
    "cora": {"acc_mean": 0.83180, "acc_std": 0.00756, "acc_median": 0.830,
             "five_iter_wall_s": 772.385, "source": "README.md:67-72"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cora",
                    choices=["cora", "citeseer", "pubmed"])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--iter", type=int, default=5)
    ap.add_argument("--batch_iters", action="store_true",
                    help="train the replicas as one vmapped program "
                         "(independent models) instead of the reference's "
                         "sequential accumulation loop")
    ap.add_argument("--out", default=None,
                    help="output path (default results/showcase_<dataset>"
                         "[_<iter> if batched].json)")
    args = ap.parse_args()

    from ndcn_tpu.experiments import dgnn

    # the README.md:64 recipe, with --dataset swapped in (docs/PARITY.md
    # applies the same hyperparameters to citeseer)
    recipe = ["--dataset", args.dataset, "--model", "differential_gcn",
              "--iter", str(args.iter), "--dropout", "0", "--hidden", "256",
              "--T", "1.2", "--time_tick", "16", "--epochs", str(args.epochs),
              "--weight_decay", "0.024", "--no_control", "--method", "dopri5",
              "--alpha", "0", "--seed", "0", "--fastmode"]
    if args.batch_iters:
        recipe += ["--batch_iters"]
    else:
        recipe += ["--dump"]
    if args.platform:
        recipe += ["--platform", args.platform]
    summary = dgnn.main(recipe)

    out = {
        "experiment": f"reference README.md:64 recipe on {args.dataset}: "
                      f"differential_gcn, {args.iter} "
                      + ("INDEPENDENT vmapped replicas" if args.batch_iters
                         else "sequential iters"),
        "recipe": recipe,
        "reference_published": REFERENCE_PUBLISHED.get(
            args.dataset,
            {"note": "no in-repo reference number for this dataset "
                     "(README.md publishes cora only)"}),
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "n_models": args.iter,
        "per_iter_acc": [row[2] for row in summary["rows"]],
        "acc_mean": summary.get("acc_mean"),
        "acc_std": summary.get("acc_std"),
        "acc_median": summary.get("acc_median"),
        "acc_min": summary.get("acc_min"), "acc_max": summary.get("acc_max"),
        "total_time_s": summary["total_time"],
    }
    default_name = (f"results/showcase_{args.dataset}_{args.iter}.json"
                    if args.batch_iters
                    else f"results/showcase_{args.dataset}.json")
    path = args.out or default_name
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
