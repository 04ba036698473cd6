"""Pallas TPU kernel: sorted-COO segment-sum SpMV (sliced row tiles, MXU reduce).

The scalable element-sparse A@X path. The XLA formulation (gather + sorted
segment_sum, graph/sparse._coo_apply) is scatter-bound on TPU: the scatter
walks ~100M rows/s and every (nnz, d) intermediate with a small feature dim
pays the (8, 128) lane-padding tax (128/d x HBM traffic). It capped the
200k-node scale demo at 0.35 train steps/s (docs/PARITY.md). This kernel is
the SURVEY §7 stage-3 "Pallas segment-sum SpMV", shaped by those two ceilings:

- **feature-major layout**: everything flows as (d, edges) — the feature dim
  sits in SUBLANES (pads 20 -> 24, a 1.2x tax) and the huge edge dim in lanes
  (no padding), instead of (edges, d)'s 6.4x lane blowup at d=20.
- **no scatter anywhere**: edges are row-sorted and pre-sliced on the host
  into (row-tile, <=E edges) slices; each kernel step builds the slice's
  one-hot row-selection matrix IN VMEM (never in HBM) and reduces with one
  MXU pass: out[tile] += contrib (d, E) @ onehot (E, R). The output row tile
  stays resident in VMEM across its slices (grid ordered slice-major).
- hub rows split across slices of the same tile (bounded padding on power-law
  graphs: total slots <= nnz + T*E, never max_degree-dependent like ELL).
- the matmul runs at Precision.HIGH (3-pass bf16): the one-hot operand is
  EXACT in bf16, so only the contrib split matters — measured agreement with
  the f32 XLA segment-sum is ~1e-7 relative (tests/test_kernels.py).

The gather side (x[cols]) stays in XLA, on the transposed (d, n) operand, so
its output is already feature-major. Reference capability this scales:
torch.sparse.mm (/root/reference/neural_dynamics.py:28-31).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ndcn_tpu.kernels.platform import pallas_interpret

# Defaults from the v5e-1 sweep (tools/tune_coo_kernel.py, 200k nodes /
# 2.2M edges / d=20): R=512, E=2048 won at 9.5 ms e2e vs 10.7 for R=128 —
# larger tiles aggregate more edges per slice, cutting both slice-padding
# (1.09x vs 1.46x, which the gather pays for directly) and grid-step count.
R_TILE = 512          # rows per output tile (lane multiple)
E_SLICE = 2048        # edge slots per slice (lane multiple)

# Explicit bf16 splits of the contrib operand in the reduction matmul. The
# one-hot operand is exactly representable in bf16, so k splits leave a
# ~2^-(8k) relative error: 1 = raw bf16 (~4e-3), 2 = ~1.9e-6, 3 = 1e-7.
# Explicit because Mosaic IGNORES the Precision hint on this dot_general
# (measured 1.2e-3 error at Precision.HIGH on v5e). Trace-time constant.
N_SPLITS = 2

# Fast mode: gather x[cols] in bf16, halving the dominant SpMV cost (the
# gathered (d, slots) tensor's HBM write+read — the 200k-node train step is
# ~85% SpMV and the SpMV ~45% gather). Implies 1-split numerics (~4e-3 rel);
# sound for SGD training at the drivers' rtol=0.01 but NOT for parity runs.
# Trace-time constant; the scale demo exposes it as --kernel_precision bf16.
GATHER_BF16 = False

# Wide-gather mode — a MEASURED NULL KNOB, kept as the verified record of a
# probed dead end (like pack_tiles(sort_cols=)). Hypothesis: the TPU gather
# is per-slot ISSUE-RATE bound and full-lane 512-byte rows issue at 2× the
# narrow-slot rate (235M vs 122M slots/s at 1M nodes / 11M edges,
# results/microbench_sparse_1m.json), so gathering x[cols] from a row-major
# (n, 128) lane-padded table should buy back ~43 of the narrow gather's
# ~90 ms. Measured end to end (results/microbench_wide_gather_1m.json, with
# the table materialization barrier in place): the SpMV got SLOWER — 154.1 ms
# vs narrow's 105.9 (split2), 146.6 vs 125.1 (bf16). The gather saving is
# repaid with interest in the reduce: every Pallas tile must DMA an (E, 128)
# contrib block into VMEM — 6.4× the narrow (d_sub, E) traffic at d=20 — and
# the MXU contraction is lane-padded either way, so there is nothing to win
# back. Correctness is pinned by tests (forward, VJP, sharded compose); not
# exposed as a driver flag. Trace-time constant.
GATHER_WIDE = False
D_WIDE = 128          # lane width of the wide-gather table


class CooTiles(NamedTuple):
    """Host-packed sliced row tiles of a row-sorted COO matrix.

    Slice s covers up to E edges, all with rows in [tile_of[s]*R,
    (tile_of[s]+1)*R); slices of one tile are consecutive. ``first[s]`` marks
    the tile's first slice (the kernel zeroes the output block there). Pad
    slots carry val=0 / col=0 / local_row=0 and contribute exactly zero.
    """
    tile_of: jnp.ndarray      # (S,) int32: output row-tile per slice
    first: jnp.ndarray        # (S,) int32: 1 on a tile's first slice
    local_rows: jnp.ndarray   # (S*E,) int32: row - tile*R, in [0, R)
    cols: jnp.ndarray         # (S*E,) int32
    vals: jnp.ndarray         # (S*E,) float32
    n: int = 0
    n_pad: int = 0
    R: int = R_TILE
    E: int = E_SLICE


jax.tree_util.register_pytree_node(
    CooTiles,
    lambda t: ((t.tile_of, t.first, t.local_rows, t.cols, t.vals),
               (t.n, t.n_pad, t.R, t.E)),
    lambda aux, ch: CooTiles(*ch, *aux),
)


def pack_tiles(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, n: int,
               tile_rows: int = R_TILE, slice_edges: int = E_SLICE,
               sort_cols: bool = False) -> CooTiles:
    """Vectorized host-side packing of row-SORTED triplets into sliced tiles.

    ``sort_cols`` reorders each tile's edges by COLUMN before slicing — legal
    because the kernel's one-hot segment-sum is order-invariant within a tile
    (local_rows ride per-slot). MEASURED NULL RESULT on v5e at 1M nodes /
    11M edges: column-sorted gather == random gather (90.36 vs 90.37 ms,
    sorted marginally SLOWER — results/microbench_sparse_1m.json,
    tools/microbench_sparse.py [3b] vs [3]) — the gather is per-slot
    issue-rate bound (~122M slots/s), not locality bound, so this knob is
    off by default and kept only as the documented experiment."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    assert rows.ndim == 1 and np.all(np.diff(rows) >= 0), "rows must be sorted"
    R, E = int(tile_rows), int(slice_edges)
    T = max(1, -(-n // R))
    n_pad = T * R
    nnz = rows.shape[0]

    if sort_cols and nnz:
        order = np.lexsort((cols, rows // R))  # (tile, col): stable, tiles stay
        rows, cols, vals = rows[order], cols[order], vals[order]

    tile_starts = np.searchsorted(rows // R * R, np.arange(T) * R)  # (T,)
    counts = np.diff(np.append(tile_starts, nnz))              # edges per tile
    s_count = np.maximum(1, -(-counts // E))                   # slices per tile
    slice_base = np.concatenate([[0], np.cumsum(s_count)[:-1]])
    S = int(s_count.sum())

    tile_of = np.repeat(np.arange(T, dtype=np.int32),
                        s_count.astype(np.int64))
    first = np.zeros(S, np.int32)
    first[slice_base] = 1

    # flat slot of every edge: its tile's slice_base plus position within tile
    owner = np.repeat(np.arange(T), counts.astype(np.int64))    # tile per edge
    pos = np.arange(nnz, dtype=np.int64) - tile_starts[owner]   # idx in tile
    flat = (slice_base[owner] + pos // E) * E + pos % E

    lr = np.zeros(S * E, np.int32)
    cc = np.zeros(S * E, np.int32)
    vv = np.zeros(S * E, np.float32)
    lr[flat] = (rows - owner * R).astype(np.int32)
    cc[flat] = cols.astype(np.int32)
    vv[flat] = vals.astype(np.float32)

    return CooTiles(tile_of=jnp.asarray(tile_of), first=jnp.asarray(first),
                    local_rows=jnp.asarray(lr), cols=jnp.asarray(cc),
                    vals=jnp.asarray(vv), n=int(n), n_pad=n_pad, R=R, E=E)


def _make_kernel(E: int, R: int):
    import jax.experimental.pallas as pl

    def seg_kernel(tile_ref, first_ref, lr_ref, vv_ref, g_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(first_ref[s] == 1)
        def _zero():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        lr = lr_ref[:].reshape(1, E)
        # one-hot row selection lives only in VMEM; [r, e] = (local_row[e] == r)
        sel = jax.lax.broadcasted_iota(jnp.int32, (R, E), 0) == lr
        if GATHER_BF16:
            # fast mode folds vals INTO the selection matrix (one VPU select
            # instead of onehot-build + contrib multiply); vals ride bf16,
            # consistent with this mode's ~4e-3 1-split numerics
            onehot_t = jnp.where(sel, vv_ref[:].reshape(1, E), 0.0
                                 ).astype(jnp.bfloat16)
            contrib = g_ref[:, :]
        else:
            onehot_t = sel.astype(jnp.bfloat16)
            contrib = g_ref[:, :] * vv_ref[:].reshape(1, E)
        # explicit bf16 split-accumulation (see N_SPLITS): each pass multiplies
        # a bf16 slice of contrib against the EXACT bf16 one-hot, accumulating
        # in f32 — the Precision hint is ignored by Mosaic here, so the splits
        # are spelled out
        acc = None
        rem = contrib
        n_splits = 1 if GATHER_BF16 else N_SPLITS
        for _ in range(n_splits):
            hi = rem.astype(jnp.bfloat16)
            # precision is pinned to DEFAULT: numerics are controlled by the
            # explicit bf16 splits above, and a global HIGHEST default (set by
            # --precision float32 parity runs) makes Mosaic reject the bf16
            # operands outright ("Bad lhs type": fp32 contract precision on a
            # bf16 tpu.matmul)
            part = jax.lax.dot_general(
                hi, onehot_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc = part if acc is None else acc + part
            rem = rem - hi.astype(jnp.float32)
        out_ref[:, :] += acc

    return seg_kernel


def _make_kernel_wide(E: int, R: int, d_sub: int):
    """Wide-gather reduction: contribs arrive ROW-major (E, D_WIDE) straight
    from the (n, 128)-table gather; the MXU pass contracts the edge dim
    against the one-hot and emits the output tile FEATURE-major (d_sub, R),
    so only the gather operand changes layout, never the SpMV result."""
    import jax.experimental.pallas as pl

    def seg_kernel(tile_ref, first_ref, lr_ref, vv_ref, g_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(first_ref[s] == 1)
        def _zero():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        lr = lr_ref[:].reshape(1, E)
        sel = jax.lax.broadcasted_iota(jnp.int32, (R, E), 0) == lr
        if GATHER_BF16:
            onehot_t = jnp.where(sel, vv_ref[:].reshape(1, E), 0.0
                                 ).astype(jnp.bfloat16)
            contrib = g_ref[:, :]
        else:
            onehot_t = sel.astype(jnp.bfloat16)
            contrib = g_ref[:, :] * vv_ref[:].reshape(E, 1)
        acc = None
        rem = contrib
        n_splits = 1 if GATHER_BF16 else N_SPLITS
        for _ in range(n_splits):
            hi = rem.astype(jnp.bfloat16)
            # (D_WIDE, R) = contribᵀ @ one-hotᵀ: contract the edge dim of the
            # (E, D_WIDE) contrib block against the (R, E) selection — same
            # explicit-split numerics as the narrow kernel (see _make_kernel)
            part = jax.lax.dot_general(
                hi, onehot_t, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc = part if acc is None else acc + part
            rem = rem - hi.astype(jnp.float32)
        out_ref[:, :] += acc[:d_sub, :]

    return seg_kernel


def _reduce_call_wide(tiles: CooTiles, gathered: jnp.ndarray,
                      d_sub: int) -> jnp.ndarray:
    """gathered: (S*E, D_WIDE) row-major gather output; returns feature-major
    (d_sub, n_pad)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = tiles.tile_of.shape[0]
    E, R = tiles.E, tiles.R
    dM = gathered.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((E,), lambda s, tile, first: (s,)),
            pl.BlockSpec((E,), lambda s, tile, first: (s,)),
            pl.BlockSpec((E, dM), lambda s, tile, first: (s, 0)),
        ],
        out_specs=pl.BlockSpec((d_sub, R), lambda s, tile, first: (0, tile[s])),
    )
    return pl.pallas_call(
        _make_kernel_wide(E, R, d_sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_sub, tiles.n_pad), jnp.float32),
        interpret=pallas_interpret(),
    )(tiles.tile_of, tiles.first, tiles.local_rows, tiles.vals, gathered)


def _spmv_T_wide(tiles: CooTiles, xT: jnp.ndarray) -> jnp.ndarray:
    """A @ X, feature-major in and out, via the wide row-major gather."""
    d_sub, n = xT.shape
    assert d_sub <= D_WIDE, (d_sub, D_WIDE)
    xM = jnp.pad(xT.T, ((0, 0), (0, D_WIDE - d_sub)))   # (n, 128) table
    if GATHER_BF16:
        xM = xM.astype(jnp.bfloat16)
    # the barrier forces the table to MATERIALIZE: without it XLA fuses the
    # pad+transpose into the gather, and every gathered slot then reads the
    # strided (d_sub, n) layout — the exact slow path this mode exists to
    # avoid (the 235M rows/s wide rate was measured on a real table)
    xM = jax.lax.optimization_barrier(xM)
    gathered = jnp.take(xM, tiles.cols, axis=0)          # (S*E, 128)
    return _reduce_call_wide(tiles, gathered, d_sub)[:, : tiles.n]


def _reduce_call(tiles: CooTiles, gathered: jnp.ndarray) -> jnp.ndarray:
    """gathered: (d_sub, S*E) feature-major contrib inputs (pre-multiplied by
    nothing — vals ride in as a kernel operand); returns (d_sub, n_pad)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d_sub = gathered.shape[0]
    S = tiles.tile_of.shape[0]
    E, R = tiles.E, tiles.R

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_of, first
        grid=(S,),
        in_specs=[
            pl.BlockSpec((E,), lambda s, tile, first: (s,)),
            pl.BlockSpec((E,), lambda s, tile, first: (s,)),
            pl.BlockSpec((d_sub, E), lambda s, tile, first: (0, s)),
        ],
        out_specs=pl.BlockSpec((d_sub, R), lambda s, tile, first: (0, tile[s])),
    )
    return pl.pallas_call(
        _make_kernel(E, R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_sub, tiles.n_pad), jnp.float32),
        interpret=pallas_interpret(),
    )(tiles.tile_of, tiles.first, tiles.local_rows, tiles.vals, gathered)


def _spmv_T(tiles: CooTiles, xT: jnp.ndarray) -> jnp.ndarray:
    """A @ X in feature-major form: xT (d_sub, n) -> (d_sub, n), f32."""
    if GATHER_WIDE:
        return _spmv_T_wide(tiles, xT)
    if GATHER_BF16:
        xT = xT.astype(jnp.bfloat16)
    gathered = jnp.take(xT, tiles.cols, axis=1)       # (d_sub, S*E)
    return _reduce_call(tiles, gathered)[:, : tiles.n]


def sublane_pad(d: int) -> int:
    """The feature-major (d_sub, n) solve's padded feature count: d rounded up
    to the 8-sublane tile. THE single definition — ndcn_forward must produce
    exactly the d_sub that spmv_T / the dynamics' feature-major paths consume,
    or shapes mismatch at trace time."""
    return max(8, -(-d // 8) * 8)


def tiled_spmv_raw(tiles: CooTiles, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x for x (n, d); feature-major padding/transposes inside."""
    n, d = x.shape
    d_sub = sublane_pad(d)
    xT = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, d_sub - d))).T
    out = _spmv_T(tiles, xT)
    return out[:d].T.astype(x.dtype)


@jax.custom_vjp
def spmv_T(tiles: CooTiles, tiles_t: CooTiles, xT: jnp.ndarray):
    """Feature-major differentiable SpMV: xT (d_sub, n) -> (A @ X)ᵀ (d_sub, n).

    The native form of the kernel — no per-call transposes; callers that keep
    the whole ODE state feature-major (models/ndcn.py layout='feature_major')
    pay the (n, d) <-> (d_sub, n) relayout once per solve instead of once per
    RHS eval, and every solver elementwise op runs on an unpadded layout
    (a (n, 20) f32 array pads 6.4x under the (8, 128) tiling; (24, n) pads
    1.2x). Constant operator: NaN-poisoned cotangents."""
    return _spmv_T(tiles, xT)


def _spmv_T_fwd(tiles, tiles_t, xT):
    return _spmv_T(tiles, xT), (tiles, tiles_t)


def _spmv_T_bwd(res, gT):
    tiles, tiles_t = res
    dxT = _spmv_T(tiles_t, gT)
    return _poison_tiles(tiles), _poison_tiles(tiles_t), dxT


@jax.custom_vjp
def tiled_spmv(tiles: CooTiles, tiles_t: CooTiles, x: jnp.ndarray):
    """Differentiable (in x) tiled COO SpMV; ``tiles_t`` packs A-transpose so
    the backward is the same kernel (sorted, scatter-free). The operator is a
    CONSTANT: its float cotangents are NaN-poisoned so a learned-sparse-
    operator model fails loudly (policy of graph.sparse._coo_matvec)."""
    return tiled_spmv_raw(tiles, x)


def _poison_tiles(t: CooTiles) -> CooTiles:
    from ndcn_tpu.graph.sparse import _nan_cotangent

    return CooTiles(tile_of=_nan_cotangent(t.tile_of),
                    first=_nan_cotangent(t.first),
                    local_rows=_nan_cotangent(t.local_rows),
                    cols=_nan_cotangent(t.cols),
                    vals=_nan_cotangent(t.vals),
                    n=t.n, n_pad=t.n_pad, R=t.R, E=t.E)


def _fwd(tiles, tiles_t, x):
    return tiled_spmv_raw(tiles, x), (tiles, tiles_t)


def _bwd(res, g):
    tiles, tiles_t = res
    dx = tiled_spmv_raw(tiles_t, g)
    return _poison_tiles(tiles), _poison_tiles(tiles_t), dx


tiled_spmv.defvjp(_fwd, _bwd)
spmv_T.defvjp(_spmv_T_fwd, _spmv_T_bwd)
