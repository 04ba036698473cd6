"""Training loops, losses, torch-parity optimizers, sampling, checkpointing."""

from ndcn_tpu.train import losses, optim, sampling  # noqa: F401
