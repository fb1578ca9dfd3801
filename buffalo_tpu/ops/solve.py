"""Batched dense linear solvers for per-row normal equations.

TPU-native counterpart of the reference's per-row ``_leastsquare``
dispatch (``lib/algo.cc:39-131``): where the C++ core solves one d x d
system per row inside an OpenMP loop with a selectable Eigen solver,
here a whole padded batch of rows is solved at once with batched
Cholesky factorization or vectorized conjugate gradient, keeping the
MXU busy with (B, d, d) einsums instead of scalar loops.

Solver mapping (reference optimizer names, ``options.py:90-91``):
  llt / ldlt                              -> batched Cholesky
  manual_cg / eigen_cg / eigen_bicg /
  eigen_gmres / eigen_dgmres / eigen_minres -> batched warm-start CG
  ialspp                                  -> blockwise subspace CG
                                             (ops/ialspp.py)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

CHOLESKY_SOLVERS = ("llt", "ldlt")
CG_SOLVERS = ("manual_cg", "eigen_cg", "eigen_bicg", "eigen_gmres",
              "eigen_dgmres", "eigen_minres")


def solve_cholesky(A: jax.Array, y: jax.Array) -> jax.Array:
    """Solve ``A x = y`` for a batch: A (B, d, d) SPD, y (B, d)."""
    L = jnp.linalg.cholesky(A)
    # forward/backward substitution, batched
    z = jax.scipy.linalg.solve_triangular(L, y[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), z, lower=False)
    return x[..., 0]


def solve_cg(A: jax.Array, y: jax.Array, x0: jax.Array,
             num_iters: int = 3, tolerance: float = 1e-10) -> jax.Array:
    """Batched un-preconditioned CG with the reference's warm-start rule.

    Mirrors ``Algorithm::_leastsquare``'s ``manual_cg`` branch
    (``algo.cc:58-81``): start from the current row ``x0`` unless the
    zero start has a smaller residual (``|y| < |y - A x0|``), run at
    most ``num_iters`` steps, stop early when the squared residual
    drops below ``tolerance``.  All rows in the batch advance in
    lockstep; converged rows keep their solution via masking.
    """
    Ax0 = jnp.einsum("bij,bj->bi", A, x0)
    r_warm = y - Ax0
    use_zero = (jnp.sum(y * y, axis=-1) < jnp.sum(r_warm * r_warm, axis=-1))
    x = jnp.where(use_zero[:, None], 0.0, x0)
    r = jnp.where(use_zero[:, None], y, r_warm)

    def body(_, carry):
        x, r, p, rsold, active = carry
        Ap = jnp.einsum("bij,bj->bi", A, p)
        pAp = jnp.sum(p * Ap, axis=-1)
        alpha = jnp.where(active, rsold / jnp.maximum(pAp, 1e-30), 0.0)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * Ap
        rsnew = jnp.sum(r * r, axis=-1)
        active = active & (rsnew >= tolerance)
        beta = jnp.where(rsold > 0, rsnew / jnp.maximum(rsold, 1e-30), 0.0)
        p = r + beta[:, None] * p
        return x, r, p, rsnew, active

    rsold = jnp.sum(r * r, axis=-1)
    active = rsold >= tolerance
    p = r
    x, *_ = jax.lax.fori_loop(0, num_iters, body,
                              (x, r, p, rsold, active))
    return x


def solve(A: jax.Array, y: jax.Array, x0: jax.Array, optimizer: str,
          num_iters: int = 3, tolerance: float = 1e-10) -> jax.Array:
    if optimizer in CHOLESKY_SOLVERS:
        return solve_cholesky(A, y)
    if optimizer in CG_SOLVERS:
        return solve_cg(A, y, x0, num_iters=num_iters, tolerance=tolerance)
    raise ValueError(f"Unknown optimizer: {optimizer}")
