"""Legacy residual/ODE-GCN entry point (reference: train_resGCN.py).

Same surface as train_gcn plus resGCN/odeGCN with --normalize / --Euler.

Usage: python -m ndcn_tpu.experiments.train_resgcn --model resGCN -nhl 2 --Euler
"""

from ndcn_tpu.experiments import dgnn

LEGACY_MODELS = ("DeepGCN", "GCN", "DeepGCN2", "DeepGCN3", "DeepGCN4",
                 "resGCN", "odeGCN")


def main(argv=None):
    args, _ = dgnn.build_parser().parse_known_args(argv)
    if args.model not in LEGACY_MODELS:
        raise SystemExit(f"train_resgcn supports {LEGACY_MODELS}; got {args.model}")
    args.alpha = args.delta
    return dgnn.run(args)


if __name__ == "__main__":
    main()
