"""Dataset loading: Planetoid citation networks."""

from ndcn_tpu.data.planetoid import DATASETS, Planetoid, load_planetoid  # noqa: F401
