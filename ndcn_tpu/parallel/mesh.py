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
              data_divides: Optional[int] = None) -> Mesh:
    """A 2-D mesh over the first n devices; the data axis gets the larger factor
    (model = largest divisor of n that is <= sqrt(n), of any parity).

    ``data_divides`` constrains the data axis to divide that value (a replica
    count): a (B, ...) batch sharded P('data') requires data | B, so callers
    sweeping B replicas pass B here and the factorization adapts (e.g. 8 devices
    with 2 replicas → data=2, model=4 instead of the default 4×2).
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = np.asarray(devices[:n])
    if data_divides is not None:
        # replicas are embarrassingly parallel — maximize the data axis among
        # factorizations whose data size divides the replica count
        data = max(c for c in range(1, n + 1)
                   if n % c == 0 and data_divides % c == 0)
    else:
        model = 1
        for cand in range(1, int(np.sqrt(n)) + 1):
            if n % cand == 0:
                model = cand
        data = n // model
    return Mesh(devices.reshape(data, n // data), axis_names=tuple(axis_names))


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
