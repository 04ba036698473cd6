"""Tune the sliced-tile COO kernel: (R, E) grid shape x split count.

Sweeps tile height R, slice width E, and the number of explicit bf16 splits
of the contrib operand (the one-hot operand is exact in bf16, so k splits
leave ~2^-(8k) relative error; 3 splits = exact f32). Measures the chained
end-to-end SpMV and the reduction alone on the current device, with max-abs
relative error vs a float64 numpy oracle.

Measures BOTH call forms: the nd (n, d) entry (`tiled_spmv_raw`, pays a
per-call (n, d) <-> (d_sub, n) relayout — the sub-500k `layout='nd'` path) and
the feature-major `_spmv_T` (d_sub, n) form the million-node solves run
(models/ndcn.py layout='feature_major'); at scale the relayout tax dominates
the nd number, so tune against the `T_ms` column for large-n decisions.

Usage: python tools/tune_coo_kernel.py [n] [d]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ndcn_jax_cache")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


K = 30


def chain_time(step, init, reps=3):
    import jax

    @jax.jit
    def run(y):
        return jax.lax.fori_loop(0, K, lambda i, yy: step(yy), y)

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

    from ndcn_tpu.kernels import coo_spmv

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    deg = 11
    rng = np.random.RandomState(0)
    nnz = n * deg
    rows = np.sort(rng.randint(0, n, size=nnz)).astype(np.int32)
    cols = rng.randint(0, n, size=nnz).astype(np.int32)
    vals = rng.rand(nnz).astype(np.float32)
    x = rng.rand(n, d).astype(np.float32)
    log(f"device={jax.devices()[0]} n={n} nnz={nnz} d={d}")

    ref = np.zeros((n, d), np.float64)
    np.add.at(ref, rows, vals[:, None].astype(np.float64)
              * x[cols].astype(np.float64))
    x_j = jnp.asarray(x)

    results = {"n": n, "nnz": nnz, "d": d, "device": str(jax.devices()[0]),
               "configs": []}
    d_sub = coo_spmv.sublane_pad(d)
    xT_j = jnp.asarray(np.pad(x, ((0, 0), (0, d_sub - d))).T)  # (d_sub, n)

    for R, E in ((128, 2048), (256, 2048), (256, 4096), (512, 2048),
                 (512, 4096), (512, 8192), (1024, 4096), (1024, 8192)):
        tiles = coo_spmv.pack_tiles(rows, cols, vals, n, tile_rows=R,
                                    slice_edges=E)
        S = int(tiles.tile_of.shape[0])
        pad = S * E / nnz
        # splits=3 (exact-f32) is a parity mode, not a tuning candidate — the
        # production trade is 1 (bf16, ~4e-3) vs 2 (~2e-6); dropping it bounds
        # the remote-compile cost of big-shape sweeps
        for splits in (1, 2):
            coo_spmv.N_SPLITS = splits
            try:
                def step(y):
                    out = coo_spmv.tiled_spmv_raw(tiles, y)
                    return out / jnp.maximum(jnp.abs(out).max(), 1.0)

                def step_T(yT):
                    out = coo_spmv._spmv_T(tiles, yT)
                    return out / jnp.maximum(jnp.abs(out).max(), 1.0)

                t = chain_time(step, x_j)
                t_T = chain_time(step_T, xT_j)
                got = np.asarray(jax.block_until_ready(
                    jax.jit(lambda y: coo_spmv.tiled_spmv_raw(tiles, y))(x_j)))
                err = float(np.abs(got - ref).max() / np.abs(ref).max())
                row = dict(R=R, E=E, S=S, pad=round(pad, 2), splits=splits,
                           ms=round(t * 1e3, 2), T_ms=round(t_T * 1e3, 2),
                           rel_err=err)
                log(row)
                results["configs"].append(row)
            except Exception as ex:
                log(f"R={R} E={E} splits={splits} FAILED: {str(ex)[:200]}")
    coo_spmv.N_SPLITS = 2
    print(json.dumps(results))


if __name__ == "__main__":
    main()
