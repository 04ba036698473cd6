"""Differentiable ODE solvers for TPU (pytree states, lax control flow).

Public surface mirrors the reference library (/root/reference/torchdiffeq/__init__.py):
``odeint``, ``odeint_adjoint``, plus ``odeint_with_stats`` (first-class NFE /
step accounting) and the solver registry ``SOLVERS``.
"""

from ndcn_tpu.ode.api import SOLVERS, odeint, odeint_with_stats  # noqa: F401
from ndcn_tpu.ode.adjoint import odeint_adjoint  # noqa: F401
from ndcn_tpu.ode.adaptive import SolveStats  # noqa: F401
