"""Device meshes and sharding layouts.

The reference is strictly single-process single-device (SURVEY.md §2: no
torch.distributed / NCCL / MPI anywhere); scaling here is designed in from the
start via jax.sharding over a named Mesh:

- axis "data"  — embarrassingly parallel experiment replicas (the reference runs
  its --iter 100 dgnn repeats and 15 dynamics×graph sweeps sequentially; here a
  vmapped replica batch shards across this axis).
- axis "model" — the graph node dimension: the operator's rows and all node-major
  activations are row-sharded; A·X becomes a local (n/p, n) × (n, d) matmul after
  an all-gather of X over ICI (the standard 1-D row-parallel SpMM layout).

XLA/GSPMD inserts the collectives from the shardings alone — no hand-written
communication.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data", "model"),
              data_divides: Optional[int] = None,
              model_divides: Optional[int] = None) -> Mesh:
    """A 2-D mesh over the first n devices; the data axis gets the larger factor
    (model = largest divisor of n that is <= sqrt(n), of any parity).

    Sharding a global array axis requires the mesh axis size to divide it:
    - ``data_divides``: the replica count — a (B, ...) batch sharded P('data')
      needs data | B (8 devices × 2 replicas → data=2, model=4, not 4×2).
    - ``model_divides``: the node count — P('model')-sharded operators/states
      need model | n_nodes (dense operators are placed unpadded).
    Among admissible factorizations the device count, then the data axis, is
    maximized (replicas are embarrassingly parallel). ``data=1, model=1``
    always satisfies both, so when the constraints rule out every full-device
    factorization the mesh SHRINKS to the largest admissible device count
    (e.g. 1 replica × 2708 nodes × 8 devices → a 1×4 mesh on 4 devices, since
    8 ∤ 2708).
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if len(devices) < n:
        # fail loudly here rather than with an opaque numpy reshape error:
        # the factorization below uses the REQUESTED n while devices[:n]
        # would silently hold fewer (the exact MULTICHIP_r01 crash mode)
        raise ValueError(
            f"make_mesh needs {n} devices but the "
            f"{jax.default_backend()} platform has {len(devices)}; for a "
            f"virtual mesh set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before "
            f"JAX initializes (see __graft_entry__.dryrun_multichip)")
    devices = np.asarray(devices[:n])
    if data_divides is not None or model_divides is not None:
        best = (1, 1)
        for data in range(1, n + 1):
            if data_divides is not None and data_divides % data != 0:
                continue
            for model in range(1, n // data + 1):
                if model_divides is not None and model_divides % model != 0:
                    continue
                if (data * model, data) > (best[0] * best[1], best[0]):
                    best = (data, model)
        data, model = best
    else:
        model = 1
        for cand in range(1, int(np.sqrt(n)) + 1):
            if n % cand == 0:
                model = cand
        data = n // model
    return Mesh(devices[: data * model].reshape(data, model),
                axis_names=tuple(axis_names))


def replica_sharding(mesh: Mesh) -> NamedSharding:
    """Leading replica axis over 'data', rest replicated (per-replica params)."""
    return NamedSharding(mesh, P("data"))


def node_sharding(mesh: Mesh, batched: bool = False) -> NamedSharding:
    """Node-major arrays: rows over 'model'; with a leading replica axis over 'data'."""
    return NamedSharding(mesh, P("data", "model") if batched else P("model"))


def operator_sharding(mesh: Mesh) -> NamedSharding:
    """(n, n) dense operator: row-sharded over 'model', columns replicated."""
    return NamedSharding(mesh, P("model", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_per_replica(mesh: Mesh, params):
    """Place a stacked (B, ...) parameter pytree replica-sharded over 'data'."""
    sh = replica_sharding(mesh)
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, sh), params)
