"""Legacy discrete-GCN entry point (reference: train.py).

A thin front over the dgnn driver with the legacy surface: models restricted to
the discrete zoo and --delta feeding the operator's alpha (the reference passes
args.delta as load_data's alpha and always loads cora regardless of --dataset,
train.py:66 — the dataset flag is honored here, the alpha mapping kept).

Usage: python -m ndcn_tpu.experiments.train_gcn --model GCN --epochs 200
"""

from ndcn_tpu.experiments import dgnn

LEGACY_MODELS = ("DeepGCN", "GCN", "DeepGCN2", "DeepGCN3", "DeepGCN4")


def main(argv=None):
    args, _ = dgnn.build_parser().parse_known_args(argv)
    if args.model not in LEGACY_MODELS:
        raise SystemExit(f"train_gcn supports {LEGACY_MODELS}; got {args.model}")
    args.alpha = args.delta  # legacy: delta doubles as the operator alpha
    return dgnn.run(args)


if __name__ == "__main__":
    main()
