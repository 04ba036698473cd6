"""Test configuration: CPU-only with a virtual 8-device mesh.

Must run before the first jax import anywhere in the test session (the reference
keeps everything CPU-runnable via --gpu -1, heat_dynamics.py:65-68; we keep that
property so tests never need a TPU, and get 8 virtual devices to exercise the
multi-chip sharding paths).
"""

import os
import sys

# Force-override: the ambient environment may export JAX_PLATFORMS=axon (TPU
# tunnel), whose remote compiles are far too slow for a unit-test loop.
os.environ["JAX_PLATFORMS"] = "cpu"
# strip any ambient device-count flag (e.g. =4 left over from a dryrun
# experiment) and set OUR 8 — a substring check would keep the wrong value
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(_flags)

# repo root on sys.path so `import ndcn_tpu` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The ambient sitecustomize may import jax and register the axon TPU plugin before
# this file runs, making the env vars above moot — force the platform via config
# too (safe as long as no computation has been dispatched yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
