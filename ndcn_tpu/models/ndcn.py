"""NDCN: encoder → graph-ODE block → decoder, with ablation switches.

Capability parity with the reference model family (neural_dynamics.py):
- ``ODEFunc``   (:8-39)   → ``ode_func``: h' = relu(dropout(W·(A h)+b)) with
                             ``no_graph`` / ``no_control`` switches
- ``ODEBlock``  (:42-79)  → ``ode_block``: odeint over a per-call time grid, with
                             ``terminal`` selecting final state vs trajectory and an
                             ``adjoint`` switch
- ``NDCN``      (:122-160) → init/apply pair; ``no_embed`` skips the encoder;
                             encoder depth 2 for dynamics, 1 for the dgnn
                             ``differential_gcn`` stack (dgnn.py:173-182)

The whole forward pass is one jittable pure function; the ODE solve uses the
differentiable bounded-scan path, so training backprops through the solver like
the reference's default (non-adjoint) path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ndcn_tpu.graph.sparse import GraphOperator, matvec
from ndcn_tpu.models import nn
from ndcn_tpu.ode import odeint_with_stats
from ndcn_tpu.ode.adjoint import odeint_adjoint


def fused_profitable(kind: str, width: int) -> bool:
    """Measured fused-vs-unfused winner per (operator kind, hidden width) on
    TPU v5e-1 — the crossover table in docs/PARITY.md (fused-kernel section).
    The dense fused kernel wins across widths (the A·h round-trip it saves
    grows with n·width); the BSR fused epilogue only beats the unfused
    spmm+XLA-matmul once the control matmul is wide enough to dominate the
    block-gather DMAs."""
    if kind == "dense":
        return True
    return width >= 512


def ode_func(params: Dict[str, Any], op: GraphOperator, t, h,
             no_graph: bool = False, no_control: bool = False,
             drop_mask: Optional[jnp.ndarray] = None,
             fused=False, residual_dtype=None) -> jnp.ndarray:
    """The learned RHS. ``drop_mask`` is a fixed inverted-dropout mask (see
    models/nn.dropout_mask for why it is not resampled per eval).

    ``fused`` routes the full relu((A h) W + b) through a Pallas kernel
    (control on, no dropout; dense or BSR operator), keeping the propagated
    hidden state in VMEM between the two matmuls:
    - False: never fuse.
    - True: FORCE the fused kernel; the configuration must be fusable
      (ValueError otherwise — a silently-unfused run would spend 100% of
      training off the requested path).
    - "auto": fuse when fusable AND measured-profitable per (kind, width)
      (``fused_profitable``); silently run the standard path otherwise. This
      is what the drivers' --fused_kernel flag passes."""
    if fused:
        from ndcn_tpu.graph.sparse import BsrGraph, DenseGraph

        fusable = not no_graph and not no_control and drop_mask is None
        dense_ok = fusable and isinstance(op, DenseGraph)
        bsr_ok = fusable and isinstance(op, BsrGraph)
        if fused is not True and fused != "auto":
            raise ValueError(f"fused must be False, True or 'auto'; got {fused!r}")
        if fused is True and not (dense_ok or bsr_ok):
            # an explicitly requested-but-impossible fused path fails at trace
            # time (like as_operator's dtype check)
            raise ValueError(
                "fused=True requires a dense or BSR operator with control on "
                f"and dropout 0 (got {type(op).__name__}, no_graph={no_graph}, "
                f"no_control={no_control}, "
                f"dropout={'on' if drop_mask is not None else 'off'}); "
                "use fused='auto' (or drop the flag) for the standard path")
        width = h.shape[-1]
        if dense_ok and (fused is True or fused_profitable("dense", width)):
            from ndcn_tpu.kernels.fused_rhs import fused_ode_rhs

            return fused_ode_rhs(op.mat, h, params["wt"]["w"], params["wt"]["b"])
        if bsr_ok and (fused is True or fused_profitable("bsr", width)):
            from ndcn_tpu.kernels.bsr_spmm import bsr_fused_rhs

            return bsr_fused_rhs(op.fwd, op.bwd, h, params["wt"]["w"],
                                 params["wt"]["b"])
    if not no_graph:
        # checkpoint_name: under the training scan's remat policy
        # (ode/adaptive.solve_scan), the SpMV output is SAVED for the
        # backward instead of re-running the forward kernel per step.
        # residual_dtype=bf16 halves those saved residuals — the largest
        # remat-saved tensors at scale (nfe × n·d per solve; 4.6 GB at 1M
        # nodes in f32): the forward consumes the ROUNDED value, so fwd and
        # bwd see identical numbers and gradients stay consistent (~4e-3
        # RHS noise, same order as --kernel_precision bf16).
        from jax.ad_checkpoint import checkpoint_name

        h = checkpoint_name(matvec(op, h)
                            if residual_dtype is None
                            else matvec(op, h).astype(residual_dtype),
                            "ndcn_spmv").astype(h.dtype)
    if not no_control:
        h = nn.linear_apply(params["wt"], h)
    if drop_mask is not None:
        h = h * drop_mask
    return jax.nn.relu(h)


def ode_block(func, h0, vt, rtol: float, atol: float, method: str,
              terminal: bool = False, adjoint: bool = False,
              params=None, max_steps: int = 256, nondiff: bool = False,
              emission_dtype=None, emission_readout=None):
    """odeint wrapper mirroring ODEBlock semantics; returns (out, stats).

    With ``adjoint=True`` gradients use the continuous adjoint (O(1) memory);
    ``params`` must then be the pytree the RHS closes over.
    """
    if adjoint:
        if params is None:
            raise ValueError("adjoint=True requires the params pytree")
        sol = odeint_adjoint(lambda t, h, p: func(p, t, h), h0, vt, params,
                             rtol=rtol, atol=atol, method=method,
                             options={"max_steps": max_steps})
        stats = None
    else:
        options = {"max_steps": max_steps, "differentiable": not nondiff}
        # the emission options exist only on the adaptive scan path — the
        # option validator rejects them for fixed-grid/vcabm methods, so a
        # caller passing them with e.g. method='euler' (the reference's
        # dynamics default) gets a silent no-op, not a ValueError
        adaptive_scan = method in ("dopri5", "tsit5") and not nondiff
        if emission_dtype is not None and adaptive_scan:
            options["emission_dtype"] = emission_dtype
        if emission_readout is not None and adaptive_scan:
            options["emission_readout"] = emission_readout
        sol, stats = odeint_with_stats(func if params is None
                                       else (lambda t, h: func(params, t, h)),
                                       h0, vt, rtol=rtol, atol=atol, method=method,
                                       options=options)
    return (jax.tree_util.tree_map(lambda b: b[-1], sol) if terminal else sol), stats


def init_ndcn(key, input_size: int, hidden_size: int, num_classes: int,
              no_embed: bool = False, no_control: bool = False,
              encoder_layers: int = 2) -> Dict[str, Any]:
    """Parameter pytree for NDCN. With ``no_embed`` the ODE runs in input space
    (the reference passes hidden_size=input_size there, heat_dynamics.py:252)."""
    keys = jax.random.split(key, 4)
    width = input_size if no_embed else hidden_size
    params: Dict[str, Any] = {}
    if not no_embed:
        params["enc1"] = nn.linear_init(keys[0], input_size, hidden_size)
        if encoder_layers == 2:
            params["enc2"] = nn.linear_init(keys[1], hidden_size, hidden_size)
    if not no_control:
        params["wt"] = nn.linear_init(keys[2], width, width)
    params["dec"] = nn.linear_init(keys[3], width, num_classes)
    return params


# Above this node count 'auto' picks the feature-major layout: the decisive
# factor is MEMORY, not speed — the (n, d) layout's remat-saved SpMV outputs
# tile to (n, 128) lanes (6.4x at d=20: 14.7 GB instead of 2.3 at 1M nodes),
# while the (d_sub, n) layout keeps the node dim minor and pads nothing.
_FEATURE_MAJOR_AUTO_NODES = 500_000


def _feature_major_ok(op, h, no_graph, no_control, dropout, fused) -> bool:
    """Layout-eligibility predicate: the feature-major (d_sub, n) solve
    applies when the operator serves the Pallas tiled-COO kernel and the
    hidden width pays lane padding in the (n, d) layout. Excludes ablations /
    dropout / fused (those paths are written for (n, d)).

    'auto' selects it only above _FEATURE_MAJOR_AUTO_NODES (memory: the padded
    remat residuals of the (n, d) layout exceed HBM there). BELOW that,
    measured head-to-head at 200k nodes (docs/PARITY.md), feature-major ties
    the (n, d) layout — the SpMV is bound by the XLA gather's row rate
    (~560M rows/s), and the padded elementwise traffic the transposed state
    would save hides under it — so 'auto' keeps 'nd' and its reference
    error-norm semantics. The layout stays available explicitly.

    A tile-packed RowShardedCoo qualifies too: the feature-major solve then
    composes with the mesh — per-device kernel row blocks, (d_sub, n) state
    column-sharded over the model axis (parallel/coo_shard.rs_spmv_T)."""
    from ndcn_tpu.graph.sparse import CooGraph, use_tiled_kernel

    tiled = isinstance(op, CooGraph) and op.tiles is not None
    if not tiled:
        from ndcn_tpu.parallel.coo_shard import RowShardedCoo

        tiled = isinstance(op, RowShardedCoo) and op.tiles is not None
    return (tiled
            and not (no_graph or no_control or dropout > 0.0 or fused)
            and h.ndim == 2 and h.shape[1] > 1 and h.shape[1] % 128 != 0
            and use_tiled_kernel())


def ode_func_T(params: Dict[str, Any], op, t, hT,
               residual_dtype=None) -> jnp.ndarray:
    """The learned RHS in FEATURE-MAJOR form: hT (d_sub, n), rows >= d zero.

    relu((A h) W + b) transposes to relu(Wᵀ (A h)ᵀ + b[:, None]); the SpMV
    runs the tiled kernel natively (no per-eval transposes) and every
    intermediate keeps the huge node dim minor. Zero pad rows stay zero:
    Wᵀ_pad has zero pad rows and b pads with zeros, so relu leaves them 0.

    A RowShardedCoo operator routes the SpMV through the sharded feature-major
    kernel (parallel/coo_shard.rs_spmv_T): same math, output column-sharded
    over the mesh's model axis."""
    from jax.ad_checkpoint import checkpoint_name

    from ndcn_tpu.kernels.coo_spmv import spmv_T
    from ndcn_tpu.parallel.coo_shard import RowShardedCoo, rs_spmv_T

    d_sub = hT.shape[0]
    w = params["wt"]["w"]
    d = w.shape[0]
    ahT = (rs_spmv_T(op, hT) if isinstance(op, RowShardedCoo)
           else spmv_T(op.tiles, op.tiles_t, hT))
    # bf16 residual save: see ode_func — the saved tensor is the rounded one,
    # so fwd and bwd consume identical values
    ahT = checkpoint_name(ahT if residual_dtype is None
                          else ahT.astype(residual_dtype),
                          "ndcn_spmv").astype(hT.dtype)
    wT_p = jnp.zeros((d_sub, d_sub), w.dtype).at[:d, :d].set(w.T)
    b_p = jnp.zeros((d_sub, 1), w.dtype).at[:d, 0].set(params["wt"]["b"])
    return jax.nn.relu(
        jnp.matmul(wT_p, ahT, preferred_element_type=ahT.dtype) + b_p)


def ndcn_forward(params: Dict[str, Any], op: GraphOperator, vt: jnp.ndarray,
                 x: jnp.ndarray, *, rtol: float = 0.01, atol: float = 0.001,
                 method: str = "dopri5", terminal: bool = False,
                 no_embed: bool = False, no_graph: bool = False,
                 no_control: bool = False, dropout: float = 0.0,
                 rng: Optional[jax.Array] = None, adjoint: bool = False,
                 max_steps: int = 256, nondiff: bool = False,
                 fused: bool = False, layout: str = "auto",
                 emission_dtype=None, residual_dtype=None):
    """Full NDCN forward. Returns (output, stats).

    output: (T, n, num_classes) trajectory, or (n, num_classes) if terminal.

    ``layout``: 'nd' solves with the (n, d) state; 'feature_major' transposes
    the ODE state to (d_sub, n) for the solve — the TPU-native layout for
    tiled-COO operators at scale (the node dim rides the 128-lane minor
    position, so solver arithmetic stops paying the 128/d padding tax and the
    kernel needs no per-eval transposes). 'auto' resolves to 'nd' below
    _FEATURE_MAJOR_AUTO_NODES (measured tie at 200k nodes — the SpMV is
    gather-row-rate bound — and 'nd' keeps the reference error-norm
    semantics) and to 'feature_major' at/above it when eligible (memory: the
    (n, d) layout's remat-saved residuals pay the 128-lane pad, which is
    what OOMs million-node steps).
    NB feature_major widens the
    error-norm element count by d_sub/d (the zero pad rows contribute zero
    error), equivalent to scaling rtol by ~(d_sub/d)^(1/2) ≈ 1.05 at d=20 —
    fine for training tolerances, excluded from parity fixtures.

    ``emission_dtype`` (scan path only): store the solver's dense-output
    emission buffers — the dominant training residual at scale — in e.g.
    bf16 (~4e-3 on interpolated observations; solver steps unaffected). See
    ode.adaptive.solve_scan.

    ``residual_dtype``: store the remat-SAVED SpMV outputs (the largest
    per-step residuals of the training scan: nfe × n·d per solve) in e.g.
    bf16. Unlike emission_dtype this rounds the RHS the solver integrates
    (fwd and bwd consume the same rounded value), ~4e-3 — pair it with
    training tolerances, not parity runs.
    """
    h = x
    if not no_embed:
        h = jnp.tanh(nn.linear_apply(params["enc1"], h))
        if "enc2" in params:
            h = nn.linear_apply(params["enc2"], h)

    if layout not in ("auto", "nd", "feature_major"):
        raise ValueError(f"unknown layout {layout!r}")
    feature_major = layout == "feature_major"
    if (layout == "auto" and x.shape[0] >= _FEATURE_MAJOR_AUTO_NODES
            and _feature_major_ok(op, h, no_graph, no_control, dropout,
                                  fused)):
        feature_major = True
    if feature_major and layout != "auto" \
            and not _feature_major_ok(op, h, no_graph, no_control,
                                      dropout, fused):
        raise ValueError("layout='feature_major' requires a tile-packed COO "
                         "operator on TPU with the full RHS (graph + control "
                         "on, dropout 0, unfused) and a lane-padded hidden "
                         "width")

    drop_mask = None
    if dropout > 0.0 and rng is not None:
        drop_mask = nn.dropout_mask(rng, h.shape, dropout, h.dtype)

    ode_params = {k: params[k] for k in ("wt",) if k in params}
    if feature_major:
        if no_control or no_graph or drop_mask is not None:
            raise ValueError("layout='feature_major' requires the full RHS "
                             "(graph + control on, dropout 0)")
        from ndcn_tpu.kernels.coo_spmv import sublane_pad

        d = h.shape[1]
        d_sub = sublane_pad(d)
        hT = jnp.pad(h, ((0, 0), (0, d_sub - d))).T      # (d_sub, n)

        def func(p, t, hh):
            return ode_func_T(p, op, t, hh, residual_dtype=residual_dtype)

        # Decode IN feature-major form, then transpose the small (T, c, n)
        # result: transposing the trajectory first would materialize a
        # (T, n, d) buffer (plus its backward mirror) that at 1M nodes is
        # 2.6 GB each — the node dim stays minor through the readout. On the
        # differentiable path the LINEAR part of the decoder goes further and
        # rides as the solver's emission_readout (exact — linearity commutes
        # with dense-output interpolation), so even the (T, d_sub, n) hidden
        # trajectory and its backward mirror (2×3.1 GB at 1M nodes) never
        # materialize; the bias joins after.
        w = params["dec"]["w"]                           # (d, c)
        # only the adaptive scan path implements emission_readout; fixed-grid
        # and vcabm methods ignore the option and return the full trajectory
        use_readout = (not terminal) and (not nondiff) and (not adjoint) \
            and method in ("dopri5", "tsit5")
        readout = ((lambda s: jnp.einsum("dc,dn->cn", w, s[:d]))
                   if use_readout else None)
        sol_T, stats = ode_block(func, hT, vt, rtol, atol, method,
                                 terminal=terminal, adjoint=adjoint,
                                 params=ode_params, max_steps=max_steps,
                                 nondiff=nondiff, emission_dtype=emission_dtype,
                                 emission_readout=readout)
        if terminal:
            hvx = sol_T[:d].T                            # (n, d)
        else:
            out_T = (sol_T if use_readout
                     else jnp.einsum("dc,tdn->tcn", w, sol_T[:, :d, :]))
            if "b" in params["dec"]:
                out_T = out_T + params["dec"]["b"][:, None]
            return jnp.transpose(out_T, (0, 2, 1)), stats   # (T, n, c)
    else:
        def func(p, t, hh):
            return ode_func(p, op, t, hh, no_graph=no_graph,
                            no_control=no_control, drop_mask=drop_mask,
                            fused=fused, residual_dtype=residual_dtype)

        # Fold the linear part of the decoder through the solver's emissions
        # on the differentiable adaptive path (exact — linearity commutes
        # with dense-output interpolation, ode.adaptive.solve_scan): the
        # emitted buffers and their backward cotangents shrink from
        # (S, C, n, d) to (S, C, n, c) — d/c x less of the training scan's
        # dominant residual, and d/c x less emission HBM traffic per step.
        # The bias joins after (an affine offset does not commute).
        use_readout = (not terminal) and (not nondiff) and (not adjoint) \
            and method in ("dopri5", "tsit5")
        if use_readout:
            w_dec = params["dec"]["w"]
            sol, stats = ode_block(func, h, vt, rtol, atol, method,
                                   terminal=False, adjoint=False,
                                   params=ode_params, max_steps=max_steps,
                                   nondiff=False,
                                   emission_dtype=emission_dtype,
                                   emission_readout=lambda s: s @ w_dec)
            if "b" in params["dec"]:
                sol = sol + params["dec"]["b"]
            return sol, stats
        hvx, stats = ode_block(func, h, vt, rtol, atol, method,
                               terminal=terminal, adjoint=adjoint,
                               params=ode_params, max_steps=max_steps,
                               nondiff=nondiff, emission_dtype=emission_dtype)
    out = nn.linear_apply(params["dec"], hvx)
    return out, stats
