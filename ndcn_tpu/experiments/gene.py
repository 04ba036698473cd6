"""Gene-regulation dynamics experiment (reference: gene_dynamics.py).

Usage: python -m ndcn_tpu.experiments.gene --network grid ...
"""

from ndcn_tpu.experiments.dynamics import main

if __name__ == "__main__":
    main("gene", "Gene Regulation Dynamic Case")
