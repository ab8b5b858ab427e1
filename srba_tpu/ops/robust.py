"""Robust kernels — analog of the reference's optional pseudo-Huber weighting
(``TSRBAParameters::use_robust_kernel`` / ``kernel_param``; SURVEY.md §3
"Robust kernel").

Applied as an IRLS-style scalar weight on each *whitened* residual row group:
for squared norm ``s = |r|^2`` the pseudo-Huber cost is
``rho(s) = 2 b^2 (sqrt(1 + s / b^2) - 1)`` and the row weight used in the
normal equations is ``w = rho'(s) = 1 / sqrt(1 + s / b^2)``; rows get scaled
by ``sqrt(w)`` so that ``J^T J`` / ``J^T r`` pick up the weight once.
"""

from __future__ import annotations

import jax.numpy as jnp


def pseudo_huber_weight(sq_norm, kernel_param):
    """Per-observation IRLS weight ``rho'(|r|^2)`` for pseudo-Huber."""
    b2 = kernel_param * kernel_param
    return 1.0 / jnp.sqrt(1.0 + sq_norm / b2)


def pseudo_huber_cost(sq_norm, kernel_param):
    """Robustified total cost contribution for a squared residual norm."""
    b2 = kernel_param * kernel_param
    return 2.0 * b2 * (jnp.sqrt(1.0 + sq_norm / b2) - 1.0)
