"""Batched experiment sweeps: vmap over replicas, sharded over the device mesh.

The concrete win at this workload's scale (SURVEY.md §5): the reference repeats
dgnn --iter 100 times and runs 15 dynamics×graph combos sequentially on one
device; here independent replicas train simultaneously — vmap makes one program
of B replicas, the 'data' mesh axis spreads them over chips, and the 'model'
axis row-shards the (shared) graph operator and node-major activations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ndcn_tpu.graph.sparse import DenseGraph
from ndcn_tpu.models import init_ndcn, ndcn_forward
from ndcn_tpu.parallel import mesh as mesh_lib
from ndcn_tpu.train.losses import l1_loss
from ndcn_tpu.train.optim import torch_adam


def batched_init(init_fn: Callable, key, n_replicas: int):
    """Stack per-replica params along a new leading axis: vmap of init."""
    keys = jax.random.split(key, n_replicas)
    return jax.vmap(init_fn)(keys)


def make_sharded_ndcn_train_step(mesh, op, vt, x0, target, *,
                                 rtol=0.01, atol=0.001, method="dopri5",
                                 lr=0.01, weight_decay=1e-3, max_steps=64,
                                 hidden=20):
    """A jitted multi-replica NDCN training step with dp + node (tensor) sharding.

    Returns (init_fn, step_fn):
      init_fn(key, n_replicas) -> (params_B, opt_state_B) placed on the mesh
      step_fn(params_B, opt_state_B) -> (params_B, opt_state_B, losses_B)

    ``op`` is any GraphOperator — a DenseGraph (rows sharded over 'model' by
    place_problem_on_mesh) or a parallel.coo_shard.RowShardedCoo (shard_map
    row-block SpMV). Shardings: params/opt_state replica-sharded over 'data';
    x0/target row-sharded over 'model'. XLA inserts the all-gather of the hidden
    state that row-parallel A·X needs.

    ``mesh=None`` builds the identical step with no shardings at all — the
    single-device reference the sharded run is parity-checked against.
    """
    opt = torch_adam(lr, weight_decay)
    in_dim = x0.shape[-1]

    def init_one(key):
        return init_ndcn(key, in_dim, hidden, in_dim)

    def loss_one(params):
        out, _ = ndcn_forward(params, op, vt, x0, rtol=rtol, atol=atol,
                              method=method, max_steps=max_steps)
        return l1_loss(out, target)

    def step_one(params, opt_state):
        loss, grads = jax.value_and_grad(loss_one)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
        return params, opt_state, loss

    if mesh is None:
        def init_fn(key, n_replicas: int):
            params = batched_init(init_one, key, n_replicas)
            return params, jax.vmap(opt.init)(params)

        return init_fn, jax.jit(jax.vmap(step_one))

    rep = mesh_lib.replica_sharding(mesh)

    def init_fn(key, n_replicas: int):
        params = batched_init(init_one, key, n_replicas)
        opt_state = jax.vmap(opt.init)(params)
        params = jax.tree_util.tree_map(lambda l: jax.device_put(l, rep), params)
        opt_state = jax.tree_util.tree_map(lambda l: jax.device_put(l, rep), opt_state)
        return params, opt_state

    vstep = jax.vmap(step_one)
    step_fn = jax.jit(vstep,
                      in_shardings=(rep, rep),
                      out_shardings=(rep, rep, rep))
    return init_fn, step_fn


def shard_operator(mesh, op):
    """Shard a graph operator over the mesh's 'model' (node-row) axis: dense
    rows via GSPMD, COO via the shard_map row-block layout. Other layouts stay
    replicated (ELL/BSR have no mesh placement yet) with a notice. Dense
    placement requires model | n_nodes — pass model_divides=n to make_mesh."""
    from ndcn_tpu.graph.sparse import CooGraph
    model = int(mesh.shape["model"])
    if isinstance(op, DenseGraph):
        if op.n_nodes % model != 0:
            raise ValueError(
                f"dense operator with {op.n_nodes} nodes cannot row-shard over "
                f"a model axis of {model}; build the mesh with "
                f"make_mesh(model_divides={op.n_nodes})")
        return DenseGraph(mat=jax.device_put(op.mat,
                                             mesh_lib.operator_sharding(mesh)))
    if isinstance(op, CooGraph):
        from ndcn_tpu.parallel.coo_shard import shard_coo_rows
        return shard_coo_rows(op, mesh)
    print(f"mesh: {type(op).__name__} operator has no 'model'-axis placement; "
          f"leaving it replicated")
    return op


def shard_replica_problem(mesh, params_b, opt_state_b, op, node_arrays):
    """Shared --mesh placement for replica sweeps: the (B, ...) params/opt
    state shard over 'data', the operator and every (n, ...) entry of
    ``node_arrays`` (a dict) over 'model'. Training closures that late-bind
    these names see the sharded arrays; GSPMD/shard_map insert the collectives.
    """
    rep = mesh_lib.replica_sharding(mesh)
    node = mesh_lib.node_sharding(mesh)
    params_b = jax.tree_util.tree_map(lambda l: jax.device_put(l, rep), params_b)
    opt_state_b = jax.tree_util.tree_map(lambda l: jax.device_put(l, rep),
                                         opt_state_b)
    op = shard_operator(mesh, op)
    node_arrays = {k: jax.device_put(v, node) for k, v in node_arrays.items()}
    return params_b, opt_state_b, op, node_arrays


def place_problem_on_mesh(mesh, op, x0, target, vt):
    """Shard the shared problem data: operator rows and node-major arrays over
    'model', time grid replicated. A CooGraph becomes a RowShardedCoo (row-block
    shard_map SpMV); a DenseGraph is row-sharded for GSPMD."""
    node_sh = mesh_lib.node_sharding(mesh)
    repl = mesh_lib.replicated(mesh)
    op = shard_operator(mesh, op)
    x0 = jax.device_put(x0, node_sh)
    target = jax.device_put(target, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "model", None)))
    vt = jax.device_put(vt, repl)
    return op, x0, target, vt
