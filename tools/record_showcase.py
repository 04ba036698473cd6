"""Record the dgnn cora showcase run (reference README.md:64-72 recipe) as a
committed JSON artifact, regression-guarded by tests/test_data_and_experiments.py.

Usage:  python tools/record_showcase.py [--platform cpu] [--epochs 100] [--iter 5]
Writes: results/showcase_cora.json
"""

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--iter", type=int, default=5)
    args = ap.parse_args()

    from ndcn_tpu.experiments import dgnn

    recipe = ["--dataset", "cora", "--model", "differential_gcn",
              "--iter", str(args.iter), "--dropout", "0", "--hidden", "256",
              "--T", "1.2", "--time_tick", "16", "--epochs", str(args.epochs),
              "--weight_decay", "0.024", "--no_control", "--method", "dopri5",
              "--alpha", "0", "--seed", "0", "--dump", "--fastmode"]
    if args.platform:
        recipe += ["--platform", args.platform]
    summary = dgnn.main(recipe)

    out = {
        "recipe": recipe,
        "reference_published": {"acc_mean": 0.83180, "acc_std": 0.00756,
                                "acc_median": 0.830, "source": "README.md:67-72"},
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "per_iter_acc": [row[2] for row in summary["rows"]],
        "acc_mean": summary.get("acc_mean"),
        "acc_std": summary.get("acc_std"),
        "acc_median": summary.get("acc_median"),
        "acc_min": summary.get("acc_min"), "acc_max": summary.get("acc_max"),
        "total_time_s": summary["total_time"],
    }
    os.makedirs("results", exist_ok=True)
    with open("results/showcase_cora.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
