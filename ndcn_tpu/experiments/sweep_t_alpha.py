"""T × alpha accuracy grid for the differential GCN (reference: plot_time_and_alpha.py).

The reference builds these grids by scraping printed stdout logs of many manual
runs (plot_time_and_alpha.py:17-43). Here the sweep is a first-class experiment:
it runs dgnn for every (T, alpha) cell, collects test accuracy, writes a CSV
matrix, and (optionally) a heatmap.

Usage:
    python -m ndcn_tpu.experiments.sweep_t_alpha --dataset cora \
        --T_values 0.6 1.2 1.8 --alpha_values 0 0.5 1.0 --epochs 50
"""

from __future__ import annotations

import argparse
import copy
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from ndcn_tpu.experiments.dgnn import build_parser as dgnn_parser
    p = dgnn_parser()
    p.add_argument("--T_values", type=float, nargs="+",
                   default=[0.6, 0.9, 1.2, 1.5, 1.8])
    p.add_argument("--alpha_values", type=float, nargs="+",
                   default=[0.0, 0.25, 0.5, 0.75, 1.0])
    p.add_argument("--out_csv", type=str, default="results/t_alpha_grid.csv")
    p.add_argument("--heatmap", action="store_true")
    return p


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    args.model = "differential_gcn"
    from ndcn_tpu.experiments.dgnn import run

    grid = np.zeros((len(args.T_values), len(args.alpha_values)))
    for i, t_val in enumerate(args.T_values):
        for j, alpha in enumerate(args.alpha_values):
            cell_args = copy.deepcopy(args)
            cell_args.T = float(t_val)
            cell_args.alpha = float(alpha)
            cell_args.dump = False
            out = run(cell_args)
            # multi-replica runs (--batch_iters / --iter > 1) report the mean
            # accuracy; rows[-1][2] would be one arbitrary replica's number
            grid[i, j] = out.get("acc_mean") or out["rows"][-1][2]
            print(f"[sweep] T={t_val} alpha={alpha} acc={grid[i, j]:.4f}",
                  flush=True)

    os.makedirs(os.path.dirname(args.out_csv) or ".", exist_ok=True)
    header = "T\\alpha," + ",".join(str(a) for a in args.alpha_values)
    rows = [f"{t}," + ",".join(f"{v:.4f}" for v in grid[i])
            for i, t in enumerate(args.T_values)]
    with open(args.out_csv, "w") as f:
        f.write(header + "\n" + "\n".join(rows) + "\n")
    print(f"[sweep] wrote {args.out_csv}")

    if args.heatmap:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            im = ax.imshow(grid, cmap="viridis", aspect="auto")
            ax.set_xticks(range(len(args.alpha_values)),
                          [str(a) for a in args.alpha_values])
            ax.set_yticks(range(len(args.T_values)),
                          [str(t) for t in args.T_values])
            ax.set_xlabel("alpha")
            ax.set_ylabel("T")
            fig.colorbar(im)
            fig.savefig(args.out_csv.replace(".csv", ".png"))
            print(f"[sweep] wrote {args.out_csv.replace('.csv', '.png')}")
        except Exception as e:  # pragma: no cover
            print(f"[sweep] heatmap skipped: {e}")
    return grid


if __name__ == "__main__":
    main()
