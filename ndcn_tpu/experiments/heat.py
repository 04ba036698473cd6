"""Heat-diffusion dynamics experiment (reference: heat_dynamics.py).

Usage: python -m ndcn_tpu.experiments.heat --network grid --baseline ndcn ...
"""

from ndcn_tpu.experiments.dynamics import main

if __name__ == "__main__":
    main("heat", "Heat Diffusion Dynamic Case")
