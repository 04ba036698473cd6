"""Where should a Pallas kernel run: compiled (TPU) or interpret (anything else)?

``jax.default_backend()`` alone is the wrong test: it reports the process-level
backend (tpu) even inside a ``jax.default_device(cpu)`` scope — which is
exactly how the drivers' step-budget probes run their solves (CPU compiles are
seconds; TPU-tunnel compiles are minutes, train/budget.py). A compiled-mode
pallas_call traced under that scope then fails with "Only interpret mode is
supported on CPU backend". Consult the default-device override first.
"""

from __future__ import annotations

import jax


def pallas_interpret() -> bool:
    """True when pallas_call must run in interpret mode (non-TPU execution)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax accepts a Device OR a platform string ('cpu') here
        return getattr(dev, "platform", dev) != "tpu"
    return jax.default_backend() != "tpu"
