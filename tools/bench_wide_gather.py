"""Measure the wide-gather SpMV mode against the narrow feature-major one.

The wide mode (kernels/coo_spmv.GATHER_WIDE) gathers from a row-major
(n, 128) lane-padded table — 512-byte rows issue at ~2x the narrow slot rate
on v5e (results/microbench_sparse_1m.json [2b] vs [3]) — and reduces the
(E, 128) blocks straight to feature-major output tiles. This tool times both
modes' `_spmv_T` (the exact call the feature-major solve makes) at the
shipped (R, E) packing, in split2 and bf16 precision, on the current device.

Recorded verdict (results/microbench_wide_gather_1m.json, v5e, 1M/11M/d=20):
wide is SLOWER end to end — 154.1 vs 105.9 ms split2, 146.6 vs 125.1 bf16 —
the reduce's 6.4x-wider per-tile VMEM DMA repays the gather saving with
interest. GATHER_WIDE stays a tested null knob.

Usage: python tools/bench_wide_gather.py [n] [d] [out.json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ndcn_jax_cache")

import numpy as np

from tune_coo_kernel import chain_time, log


def main():
    import jax
    import jax.numpy as jnp

    from ndcn_tpu.kernels import coo_spmv

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
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
    ref_scale = np.abs(ref).max()

    d_sub = coo_spmv.sublane_pad(d)
    xT_j = jnp.asarray(np.pad(x, ((0, 0), (0, d_sub - d))).T)  # (d_sub, n)
    tiles = coo_spmv.pack_tiles(rows, cols, vals, n)

    results = {"n": n, "nnz": nnz, "d": d, "device": str(jax.devices()[0]),
               "R": tiles.R, "E": tiles.E, "modes": []}

    # NOTE: an earlier revision tried to time the wide mode's relayout tax in
    # isolation ((d_sub, n) -> materialized (n, 128) table and back). That row
    # measured nothing: with only a slice of the table consumed, XLA elides
    # the 512 MB pad+transpose write even across an optimization_barrier
    # (recorded 0.00 ms at 1M nodes — physically impossible). There is no
    # reliable slice-free consumer short of a Pallas call, and the END-TO-END
    # wide timings below already pay the true relayout cost because the Pallas
    # gather's operand is materialized at the custom-call boundary — so the
    # standalone row is dropped rather than kept misleading.
    for wide in (False, True):
        for precision in ("split2", "bf16"):
            coo_spmv.GATHER_WIDE = wide
            coo_spmv.GATHER_BF16 = precision == "bf16"
            coo_spmv.N_SPLITS = 2

            def step_T(yT):
                out = coo_spmv._spmv_T(tiles, yT)
                return out / jnp.maximum(jnp.abs(out).max(), 1.0)

            try:
                t = chain_time(step_T, xT_j)
                got = np.asarray(jax.block_until_ready(
                    jax.jit(lambda y: coo_spmv._spmv_T(tiles, y))(xT_j)))
                err = float(np.abs(got[:d].T - ref).max() / ref_scale)
                row = dict(mode="wide" if wide else "narrow",
                           precision=precision,
                           ms=round(t * 1e3, 2), rel_err=err)
                log(row)
                results["modes"].append(row)
            except Exception as ex:
                log(f"wide={wide} {precision} FAILED: {str(ex)[:300]}")
    coo_spmv.GATHER_WIDE = coo_spmv.GATHER_BF16 = False
    coo_spmv.N_SPLITS = 2
    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
