"""Results artifacts, aggregation, and visualization."""

from ndcn_tpu.report import results  # noqa: F401
