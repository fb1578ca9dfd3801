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


def cg_warm_start(matvec, y: jax.Array, x0: jax.Array):
    """The reference's warm-start rule (``algo.cc:62-67``): start from
    the current row ``x0`` unless the zero start has a smaller
    residual.  Returns (x, r = y - A x)."""
    r_warm = y - matvec(x0)
    use_zero = (jnp.sum(y * y, axis=-1)
                < jnp.sum(r_warm * r_warm, axis=-1))
    x = jnp.where(use_zero[:, None], 0.0, x0)
    r = jnp.where(use_zero[:, None], y, r_warm)
    return x, r


def cg_loop(matvec, x: jax.Array, r: jax.Array, num_iters: int,
            tolerance: float, unroll: bool = False) -> jax.Array:
    """Batched un-preconditioned CG steps (``algo.cc:58-81``).

    Starts from ``(x, r = y - A x)``, runs at most ``num_iters``
    lockstep steps, freezing rows whose squared residual drops below
    ``tolerance``.  The ONE implementation behind ``solve_cg``, the
    matrix-free ALS path and the iALS++ block solve — only the matvec
    (and ``unroll``, which the per-batch callers use to keep their
    straight-line bodies) differs.
    """
    def body(_, carry):
        x, r, p, rsold, active = carry
        Ap = matvec(p)
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
    carry = (x, r, r, rsold, rsold >= tolerance)
    if unroll:
        for _ in range(num_iters):
            carry = body(0, carry)
        return carry[0]
    x, *_ = jax.lax.fori_loop(0, num_iters, body, carry)
    return x


def solve_cg(A: jax.Array, y: jax.Array, x0: jax.Array,
             num_iters: int = 3, tolerance: float = 1e-10) -> jax.Array:
    """Batched CG over dense (B, d, d) systems with the reference's
    warm-start rule (``Algorithm::_leastsquare`` ``manual_cg`` branch,
    ``algo.cc:58-81``)."""
    def matvec(v):
        return jnp.einsum("bij,bj->bi", A, v)

    x, r = cg_warm_start(matvec, y, x0)
    return cg_loop(matvec, x, r, num_iters, tolerance)


def solve(A: jax.Array, y: jax.Array, x0: jax.Array, optimizer: str,
          num_iters: int = 3, tolerance: float = 1e-10) -> jax.Array:
    if optimizer in CHOLESKY_SOLVERS:
        return solve_cholesky(A, y)
    if optimizer in CG_SOLVERS:
        return solve_cg(A, y, x0, num_iters=num_iters, tolerance=tolerance)
    raise ValueError(f"Unknown optimizer: {optimizer}")
