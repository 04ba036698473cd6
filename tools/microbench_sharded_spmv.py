"""Microbenchmark: the SHARDED COO SpMV paths on the current default device.

Compares, at the 200k-node scale-demo shape (n=200k, nnz~2.2M, d=20):
1. single-chip Pallas sliced-tile kernel (kernels/coo_spmv.tiled_spmv) — the
   measured 9.5 ms baseline from docs/PARITY.md;
2. the tiled kernel UNDER shard_map (parallel/coo_shard, ShardedCooTiles) —
   what a multi-chip run now executes per device;
3. the old XLA row-block shard_map formulation (gather + sorted segment_sum)
   — what the sharded path ran before, measured scatter-bound.

On this host only a 1-device mesh is possible (one real chip), so the numbers
quantify the shard_map + kernel plumbing overhead and the kernel-vs-scatter
gap per device; N-device numerical parity is proven separately by the dryrun.
Chained data-dependent iterations inside one jit, like microbench_sparse.py.

Prints one JSON line to stdout.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ndcn_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(step, init, reps=3):
    import jax

    @jax.jit
    def run(y):
        return jax.lax.fori_loop(0, K, lambda i, y: step(y), y)

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

    from ndcn_tpu.graph.sparse import from_scipy_coo, matvec
    from ndcn_tpu.parallel.coo_shard import (_rs_apply, _rs_tiled_apply,
                                             shard_coo_rows)
    from ndcn_tpu.parallel.mesh import make_mesh

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    deg, d = 11, 20
    rng = np.random.RandomState(0)
    nnz = n * deg
    mat = sp.coo_matrix(
        (rng.rand(nnz).astype(np.float32) / deg,
         (np.sort(rng.randint(0, n, size=nnz)).astype(np.int32),
          rng.randint(0, n, size=nnz).astype(np.int32))), shape=(n, n)).tocsr()
    coo = from_scipy_coo(mat, tiled=True)
    x = jnp.asarray(rng.rand(n, d).astype(np.float32))
    dev = jax.devices()[0]
    log(f"device={dev} n={n:,} nnz={nnz:,} d={d}")

    t_single = chain_time(lambda y: matvec(coo, y), x)
    log(f"single-chip tiled kernel:   {t_single * 1e3:8.2f} ms/SpMV")

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, axis_names=("data", "model"),
                     model_divides=None) if n_dev > 1 else make_mesh(1)
    with mesh:
        rs = shard_coo_rows(coo, mesh, tiled=True)
        t_tiled = chain_time(
            lambda y: _rs_tiled_apply(rs, rs.tiles, y), x)
        log(f"shard_map tiled kernel:     {t_tiled * 1e3:8.2f} ms/SpMV "
            f"({int(mesh.devices.size)} device(s))")
        t_xla = chain_time(
            lambda y: _rs_apply(rs, rs.local_rows, rs.cols, rs.vals, y), x)
        log(f"shard_map XLA row-block:    {t_xla * 1e3:8.2f} ms/SpMV")

    print(json.dumps({
        "n": n, "nnz": int(nnz), "d": d, "device": str(dev),
        "mesh_devices": int(mesh.devices.size),
        "single_chip_tiled_ms": round(t_single * 1e3, 2),
        "sharded_tiled_ms": round(t_tiled * 1e3, 2),
        "sharded_xla_rowblock_ms": round(t_xla * 1e3, 2),
        "tiled_speedup_vs_xla": round(t_xla / t_tiled, 2),
    }))


if __name__ == "__main__":
    main()
