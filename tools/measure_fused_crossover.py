"""Measure the fused-vs-unfused RHS crossover on the current default device.

Sweeps hidden width x {dense fused, dense unfused, BSR fused, BSR unfused}
at the 2000-node size docs/PARITY.md discusses, timing the full learned RHS
relu((A h) W + b) inside a chained scan (data-dependent, so async dispatch
cannot fake device time). The results feed models.ndcn.fused_profitable —
the dispatch table fused='auto' consults.

Usage: python tools/measure_fused_crossover.py [n] [reps]
Prints one JSON line; diagnostics on stderr.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ndcn_jax_cache")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


K = 50  # chained RHS evals per timed call


def chain_time(step, init, reps=3):
    import jax

    @jax.jit
    def run(h):
        return jax.lax.fori_loop(0, K, lambda i, hh: step(hh), h)

    jax.block_until_ready(run(init))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from ndcn_tpu.graph.sparse import as_operator, from_dense
    from ndcn_tpu.models.nn import linear_init

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rng = np.random.RandomState(0)
    dense_np = (rng.rand(n, n) * (rng.rand(n, n) < 0.05)).astype(np.float32)
    op_dense = from_dense(dense_np)
    op_bsr = as_operator(sp.csr_matrix(dense_np), sparse=True, format="bsr")
    log(f"device={jax.devices()[0]} n={n}")

    results = {"n": n, "device": str(jax.devices()[0]), "us_per_eval": {}}
    for hidden in (64, 128, 256, 512, 1024):
        params = {"wt": linear_init(jax.random.PRNGKey(1), hidden, hidden)}
        h0 = jnp.asarray(rng.rand(n, hidden).astype(np.float32))
        w, b = params["wt"]["w"], params["wt"]["b"]

        def unfused_dense(h):
            out = jax.nn.relu(jnp.matmul(op_dense.mat, h) @ w + b)
            return out / jnp.maximum(jnp.abs(out).max(), 1.0)

        def fused_dense(h):
            from ndcn_tpu.kernels.fused_rhs import fused_graph_rhs
            out = fused_graph_rhs(op_dense.mat, h, w, b)
            return out / jnp.maximum(jnp.abs(out).max(), 1.0)

        def unfused_bsr(h):
            from ndcn_tpu.kernels.bsr_spmm import bsr_spmm_raw
            out = jax.nn.relu(bsr_spmm_raw(op_bsr.fwd, h) @ w + b)
            return out / jnp.maximum(jnp.abs(out).max(), 1.0)

        def fused_bsr(h):
            from ndcn_tpu.kernels.bsr_spmm import bsr_fused_rhs_raw
            out = bsr_fused_rhs_raw(op_bsr.fwd, h, w, b)
            return out / jnp.maximum(jnp.abs(out).max(), 1.0)

        row = {}
        for name, fn in (("dense_unfused", unfused_dense),
                         ("dense_fused", fused_dense),
                         ("bsr_unfused", unfused_bsr),
                         ("bsr_fused", fused_bsr)):
            try:
                t = chain_time(fn, h0)
                row[name] = round(t * 1e6, 1)
            except Exception as e:
                row[name] = f"error: {str(e)[:120]}"
        log(f"hidden={hidden}: {row}")
        results["us_per_eval"][hidden] = row

    print(json.dumps(results))


if __name__ == "__main__":
    main()
