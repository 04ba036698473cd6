"""Probe: does Mosaic support a vectorized sublane gather from VMEM?

If yes, the tiled-COO SpMV can hold the whole (n, d_sub) bf16 state resident
in VMEM (9.6 MB at 200k x 24) and gather per-slice columns INSIDE the kernel,
eliminating the XLA gather's HBM round-trip — the current SpMV bound
(562M rows/s, docs/PARITY.md). Tries four lowering forms and times whichever
compiles.
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


def main():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    m, k, E = 4096, 128, 2048
    x = jnp.asarray(rng.rand(m, k).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, m, E).astype(np.int32))
    ref = np.asarray(x)[np.asarray(idx)]
    results = {}

    def k_take(idx_ref, x_ref, out_ref):
        out_ref[:, :] = jnp.take(x_ref[:, :], idx_ref[:], axis=0)

    def k_index(idx_ref, x_ref, out_ref):
        out_ref[:, :] = x_ref[idx_ref[:], :]

    def k_take_along(idx_ref, x_ref, out_ref):
        ii = idx_ref[:].reshape(E, 1)
        # take_along_axis needs operands of equal rank; broadcast idx over k.
        # x is (m, k) with m != E, so pad/align via explicit gather semantics.
        out_ref[:, :] = jnp.take_along_axis(
            x_ref[:, :], jnp.broadcast_to(ii, (E, k)), axis=0, mode="clip")

    def k_fori(idx_ref, x_ref, out_ref):
        def body(e, _):
            out_ref[pl.ds(e, 1), :] = x_ref[pl.ds(idx_ref[e], 1), :]
            return 0
        jax.lax.fori_loop(0, E, body, 0)

    for name, body in (("take", k_take), ("index", k_index),
                       ("take_along", k_take_along), ("fori", k_fori)):
        try:
            f = pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct((E, k), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            out = f(idx, x)
            ok = bool(np.allclose(np.asarray(out), ref))
            log(f"[{name}] compiles, correct={ok}")
            if not ok:
                results[name] = "wrong"
                continue

            @jax.jit
            def run(ii, xx, f=f):
                def b(i, acc):
                    return acc + f(ii, xx)[0, 0]
                return jax.lax.fori_loop(0, 100, b, 0.0)

            jax.block_until_ready(run(idx, x))
            t0 = time.perf_counter()
            jax.block_until_ready(run(idx, x))
            dt = (time.perf_counter() - t0) / 100
            log(f"[{name}] {dt*1e6:.1f} us / {E}-row gather "
                f"({E/dt/1e6:.0f}M rows/s)")
            results[name] = round(E / dt / 1e6, 1)
        except Exception as e:
            log(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:160]}")
            results[name] = f"error: {str(e)[:120]}"

    print(json.dumps(results))


if __name__ == "__main__":
    main()
