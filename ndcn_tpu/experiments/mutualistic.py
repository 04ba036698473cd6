"""Mutualistic-interaction dynamics experiment (reference: mutualistic_dynamics.py).

Usage: python -m ndcn_tpu.experiments.mutualistic --network power_law ...
"""

from ndcn_tpu.experiments.dynamics import main

if __name__ == "__main__":
    main("mutualistic", "Neural Dynamics on Graphs: Mutualistic Dynamic Case")
