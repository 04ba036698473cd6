"""Pytree algebra for ODE states.

The solver library operates on arbitrary pytrees of arrays (the reference operates on
tuples of tensors; cf. /root/reference/torchdiffeq/_impl/misc.py:22-31). All helpers
are shape-polymorphic and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

tree_map = jax.tree_util.tree_map


def tree_add(a, b):
    return tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return tree_map(jnp.subtract, a, b)


def tree_scale(s, x):
    """s * x with a scalar s (cast to each leaf's dtype)."""
    return tree_map(lambda l: jnp.asarray(s, l.dtype) * l, x)


def tree_axpy(a, x, y):
    """a * x + y for scalar a."""
    return tree_map(lambda x_, y_: jnp.asarray(a, y_.dtype) * x_ + y_, x, y)


def tree_zeros_like(x):
    return tree_map(jnp.zeros_like, x)


def tree_where(pred, a, b):
    """Select a where pred else b, leafwise (pred is a scalar bool)."""
    return tree_map(lambda a_, b_: jnp.where(pred, a_, b_), a, b)


def tree_dot(xs, ys):
    """Sum of elementwise products across two pytrees, as a scalar.

    Accumulates in the leaves' own (promoted) dtype — hard-casting to f32
    would silently degrade the adjoint's time-gradient term in float64 parity
    runs (the reference computes it in the tensors' dtype, adjoint.py:70-75).
    """
    leaves = tree_map(lambda x, y: jnp.sum(x * y), xs, ys)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_numel(x):
    return sum(int(jnp.size(l)) for l in jax.tree_util.tree_leaves(x))


def tree_rms_norm(x):
    """RMS norm over the whole pytree: ||x||_2 / sqrt(numel).

    Mirrors the reference ``_norm`` (misc.py:71-76), which for tuples computes
    sqrt(sum ||x_i||^2 / sum numel_i).
    """
    leaves = jax.tree_util.tree_leaves(x)
    sq = sum(jnp.sum(jnp.square(l)) for l in leaves)
    n = sum(int(jnp.size(l)) for l in leaves)
    return jnp.sqrt(sq / n)


def scaled_dot_product(scale, coeffs, stacked):
    """scale * sum_i coeffs[i] * stacked[i] along the leading stage axis.

    ``stacked`` is a pytree whose leaves carry a leading stage dimension; ``coeffs``
    is a 1-D sequence of python floats (folded to constants under jit). Mirrors
    ``_scaled_dot_product`` (misc.py:22-25), skipping exact-zero coefficients.
    """

    def per_leaf(k):
        c = jnp.asarray(list(coeffs), k.dtype)
        out = jnp.tensordot(c, k[: len(coeffs)], axes=1)
        return jnp.asarray(scale, k.dtype) * out

    return tree_map(per_leaf, stacked)


def tree_stack(trees):
    """Stack a list of same-structure pytrees along a new leading axis."""
    return tree_map(lambda *ls: jnp.stack(ls, axis=0), *trees)


def tree_index(tree, i):
    """tree[i] along the leading axis of each leaf."""
    return tree_map(lambda l: l[i], tree)
