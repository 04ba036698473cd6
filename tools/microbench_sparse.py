"""Microbenchmark: sparse SpMV building blocks on the current default device.

Measures candidate strategies for the element-sparse A@X path at the
200k-node scale-demo shape (n=200k, nnz~2.2M, d=20). Each measurement runs
K data-DEPENDENT iterations inside one jitted lax.fori_loop (the output feeds
the next iteration), so async dispatch / tunnel batching cannot fake the
device time.

Prints one line per measurement to stderr and a JSON summary to stdout.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ndcn_jax_cache")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


K = 30  # chained iterations per timed call


def chain_time(make_step, init, reps=3):
    """Time K data-dependent applications of step inside one jit."""
    import jax

    @jax.jit
    def run(y):
        def body(i, y):
            return make_step(y)
        return jax.lax.fori_loop(0, K, body, y)

    out = jax.block_until_ready(run(init))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(init))
        best = min(best, time.perf_counter() - t0)
    return best / K, out


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    deg = 11
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rng = np.random.RandomState(0)
    nnz = n * deg
    rows = np.sort(rng.randint(0, n, size=nnz)).astype(np.int32)
    cols = rng.randint(0, n, size=nnz).astype(np.int32)
    vals = rng.rand(nnz).astype(np.float32)
    x = rng.rand(n, d).astype(np.float32)

    dev = jax.devices()[0]
    log(f"device={dev} n={n} nnz={nnz} d={d} chainK={K}")
    results = {"n": n, "nnz": nnz, "d": d, "device": str(dev)}

    rows_j = jnp.asarray(rows)
    cols_j = jnp.asarray(cols)
    vals_j = jnp.asarray(vals)
    x_j = jnp.asarray(x)
    xT_j = jnp.asarray(x.T.copy())   # (d, n)

    # reference output for correctness checks
    ref = np.zeros((n, d), np.float32)
    np.add.at(ref, rows, vals[:, None] * x[cols])

    # 1. current path: take + sorted segment_sum, chained via out -> x
    def step_current(y):
        contrib = vals_j[:, None] * jnp.take(y, cols_j, axis=0)
        out = jax.ops.segment_sum(contrib, rows_j, num_segments=n,
                                  indices_are_sorted=True)
        return out / jnp.maximum(jnp.abs(out).max(), 1.0)  # keep finite

    t, out = chain_time(step_current, x_j)
    log(f"[1] take+segsum (n,{d}): {t*1e3:.3f} ms  ({nnz/t/1e6:,.0f}M edges/s)")
    results["take_segsum_ms"] = t * 1e3

    # 2a. gather major only (chained: gather then fold back to (n,d) by slicing)
    def step_gather(y):
        g = jnp.take(y, cols_j, axis=0)          # (nnz, d)
        return y + 1e-12 * g[:n]

    t, _ = chain_time(step_gather, x_j)
    log(f"[2a] gather major (nnz,{d}): {t*1e3:.3f} ms ({nnz/t/1e6:,.0f}M rows/s)")
    results["gather_major_ms"] = t * 1e3

    # 2b. gather major at d=128
    x128 = jnp.asarray(rng.rand(n, 128).astype(np.float32))

    def step_gather128(y):
        g = jnp.take(y, cols_j, axis=0)
        return y + 1e-12 * g[:n]

    t, _ = chain_time(step_gather128, x128)
    log(f"[2b] gather major (nnz,128): {t*1e3:.3f} ms ({nnz/t/1e6:,.0f}M rows/s)")
    results["gather_major_128_ms"] = t * 1e3

    # 3. gather minor axis from (d, n)
    def step_gather_minor(yT):
        g = jnp.take(yT, cols_j, axis=1)         # (d, nnz)
        return yT + 1e-12 * g[:, :n]

    t, _ = chain_time(step_gather_minor, xT_j)
    log(f"[3] gather minor ({d},nnz): {t*1e3:.3f} ms ({nnz/t/1e6:,.0f}M cols/s)")
    results["gather_minor_ms"] = t * 1e3

    # 3b. gather minor, column-SORTED indices — the locality upper bound.
    # The sliced-tile kernel's segment-sum is order-invariant WITHIN a row
    # tile, so pack-time column sorting per tile can recover a fraction of
    # whatever this wins. MEASURED on v5e at 1M/11M: [3b] == [3] to 0.01 ms
    # (90.36 vs 90.37, sorted marginally SLOWER —
    # results/microbench_sparse_1m.json) — the gather is per-slot issue-rate
    # bound and locality work is pointless; pack_tiles(sort_cols=) stays off.
    cols_sorted = jnp.asarray(np.sort(cols))

    def step_gather_minor_sorted(yT):
        g = jnp.take(yT, cols_sorted, axis=1)    # (d, nnz)
        return yT + 1e-12 * g[:, :n]

    t, _ = chain_time(step_gather_minor_sorted, xT_j)
    log(f"[3b] gather minor SORTED ({d},nnz): {t*1e3:.3f} ms "
        f"({nnz/t/1e6:,.0f}M cols/s)")
    results["gather_minor_sorted_ms"] = t * 1e3

    # 4. sorted segment_sum only (chained via contrib scale)
    contrib0 = jnp.asarray((vals[:, None] * x[cols]).astype(np.float32))

    def step_segsum(cb):
        out = jax.ops.segment_sum(cb, rows_j, num_segments=n,
                                  indices_are_sorted=True)
        return cb + 1e-12 * jnp.take(out, cols_j, axis=0) * 0.0 + cb * 0.0 + cb \
            if False else cb * (1.0 + 1e-12 * out[0, 0])

    t, _ = chain_time(step_segsum, contrib0)
    log(f"[4] sorted segsum (nnz,{d}): {t*1e3:.3f} ms ({nnz/t/1e6:,.0f}M rows/s)")
    results["segsum_ms"] = t * 1e3

    # 4b. UNSORTED scatter-add (what autodiff's gather-VJP produces)
    perm = rng.permutation(nnz)
    rows_u = jnp.asarray(rows[perm])

    def step_unsorted(cb):
        out = jax.ops.segment_sum(cb, rows_u, num_segments=n,
                                  indices_are_sorted=False)
        return cb * (1.0 + 1e-12 * out[0, 0])

    t, _ = chain_time(step_unsorted, contrib0)
    log(f"[4b] UNSORTED segsum (nnz,{d}): {t*1e3:.3f} ms ({nnz/t/1e6:,.0f}M rows/s)")
    results["segsum_unsorted_ms"] = t * 1e3

    # ------------------------------------------------------------------ Pallas
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 128          # rows per output tile
    E = 2048         # edge slots per slice
    T = -(-n // R)
    n_pad = T * R
    starts = np.searchsorted(rows, np.arange(T) * R)
    ends = np.searchsorted(rows, (np.arange(T) + 1) * R)
    slices = []
    for tile in range(T):
        lo = starts[tile]
        if lo == ends[tile]:
            slices.append((tile, lo, lo))
            continue
        while lo < ends[tile]:
            hi = min(lo + E, ends[tile])
            slices.append((tile, lo, hi))
            lo = hi
    S = len(slices)
    tile_of = np.array([s[0] for s in slices], np.int32)
    first = np.zeros(S, np.int32)
    seen = set()
    for i, (tl, _, _) in enumerate(slices):
        if tl not in seen:
            first[i] = 1
            seen.add(tl)
    lr = np.zeros((S, E), np.int32)
    vv = np.zeros((S, E), np.float32)
    cc = np.zeros((S, E), np.int32)
    for i, (tl, lo, hi) in enumerate(slices):
        lr[i, : hi - lo] = rows[lo:hi] - tl * R
        vv[i, : hi - lo] = vals[lo:hi]
        # pad slots: col 0, val 0 -> contribute 0
        cc[i, : hi - lo] = cols[lo:hi]
    log(f"[6] packing: T={T} S={S} E={E} pad_ratio={(S*E)/max(nnz,1):.2f}")
    d_sub = -(-d // 8) * 8

    tile_j = jnp.asarray(tile_of)
    first_j = jnp.asarray(first)
    # lr/vv as (S, E) arrays with (1, E) blocks: E is a multiple of 128 and the
    # sublane block of 1 equals... not allowed; reshape to (S, 8, E//8)? Use
    # block = full rows of 8? Simplest legal layout: (S, E) with block (8, E)
    # would mix slices. Instead store lr/vv as (S*E,) flat and block (E,)?
    # 1-D blocks: last dim must be divisible by 128 -> E ok.
    lr_flat = jnp.asarray(lr.reshape(-1))
    vv_flat = jnp.asarray(vv.reshape(-1))
    cc_flat = jnp.asarray(cc.reshape(-1))

    def seg_kernel(tile_ref, first_ref, lr_ref, vv_ref, contrib_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(first_ref[s] == 1)
        def _zero():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        lr_row = lr_ref[:].reshape(E, 1)
        onehot = (lr_row == jax.lax.broadcasted_iota(
            jnp.int32, (E, R), 1)).astype(jnp.float32)
        contrib = contrib_ref[:, :] * vv_ref[:].reshape(1, E)
        out_ref[:, :] += jnp.dot(contrib, onehot,
                                 preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((E,), lambda s, tile, first: (s,)),
            pl.BlockSpec((E,), lambda s, tile, first: (s,)),
            pl.BlockSpec((d_sub, E), lambda s, tile, first: (0, s)),
        ],
        out_specs=pl.BlockSpec((d_sub, R), lambda s, tile, first: (0, tile[s])),
    )

    pallas_reduce = pl.pallas_call(
        seg_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_sub, n_pad), jnp.float32),
    )

    def pallas_spmv_T(yT):        # yT (d_sub, n) -> (d_sub, n) output
        gathered = jnp.take(yT, cc_flat, axis=1)          # (d_sub, S*E)
        out = pallas_reduce(tile_j, first_j, lr_flat, vv_flat, gathered)
        return out[:, :n]

    xT_pad = jnp.pad(xT_j, ((0, d_sub - d), (0, 0)))

    try:
        def step_pallas(yT):
            out = pallas_spmv_T(yT)
            return out / jnp.maximum(jnp.abs(out).max(), 1.0)

        t, _ = chain_time(step_pallas, xT_pad)
        log(f"[6] pallas sliced-ELL spmv e2e (T layout): {t*1e3:.3f} ms "
            f"({nnz/t/1e6:,.0f}M edges/s)")
        results["pallas_spmv_ms"] = t * 1e3

        got = np.asarray(jax.block_until_ready(
            jax.jit(pallas_spmv_T)(xT_pad)))[:d].T
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        log(f"[6] pallas abs rel err vs numpy oracle: {err:.2e}")
        results["pallas_err"] = float(err)

        # 6b: reduction only, pre-gathered input
        gathered0 = jax.block_until_ready(jax.jit(
            lambda yT: jnp.take(yT, cc_flat, axis=1))(xT_pad))

        def step_reduce(g):
            out = pallas_reduce(tile_j, first_j, lr_flat, vv_flat, g)
            return g * (1.0 + 1e-12 * out[0, 0])

        t, _ = chain_time(step_reduce, gathered0)
        log(f"[6b] pallas reduction only: {t*1e3:.3f} ms")
        results["pallas_reduce_ms"] = t * 1e3
    except Exception as e:
        log(f"[6] pallas sliced-ELL FAILED: {type(e).__name__}: {str(e)[:400]}")
        results["pallas_spmv_error"] = str(e)[:400]

    # 7. in-kernel jnp.take viability (gather from VMEM, sublane axis)
    def take_kernel(idx_ref, x_ref, out_ref):
        out_ref[:, :] = jnp.take(x_ref[:, :], idx_ref[:, 0], axis=0)

    m, kk = 1024, 128
    idx_small = jnp.asarray(rng.randint(0, m, size=512).astype(np.int32)
                            ).reshape(512, 1)
    x_small = jnp.asarray(rng.rand(m, kk).astype(np.float32))
    try:
        out = pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((512, kk), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx_small, x_small)
        ok = np.allclose(np.asarray(out),
                         np.asarray(x_small)[np.asarray(idx_small[:, 0])])
        log(f"[7] in-kernel jnp.take(axis=0): works, correct={ok}")
        results["inkernel_take"] = bool(ok)
    except Exception as e:
        log(f"[7] in-kernel jnp.take FAILED: {type(e).__name__}: {str(e)[:300]}")
        results["inkernel_take"] = False

    print(json.dumps(results))


if __name__ == "__main__":
    main()
