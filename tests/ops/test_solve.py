"""Solver op tests: batched Cholesky vs CG vs numpy reference."""
import numpy as np

import jax.numpy as jnp

from buffalo_tpu.ops.solve import solve_cg, solve_cholesky


def _spd_batch(B, d, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, d, d)).astype(np.float32)
    A = M @ np.swapaxes(M, 1, 2) + 0.5 * np.eye(d, dtype=np.float32)
    y = rng.normal(size=(B, d)).astype(np.float32)
    return A, y


def test_cholesky_matches_numpy():
    A, y = _spd_batch(16, 12)
    x = np.asarray(solve_cholesky(jnp.asarray(A), jnp.asarray(y)))
    expected = np.stack([np.linalg.solve(A[b], y[b]) for b in range(16)])
    np.testing.assert_allclose(x, expected, rtol=2e-3, atol=2e-3)


def test_cg_converges_with_enough_iters():
    A, y = _spd_batch(8, 6, seed=1)
    x0 = np.zeros((8, 6), dtype=np.float32)
    x = np.asarray(solve_cg(jnp.asarray(A), jnp.asarray(y),
                            jnp.asarray(x0), num_iters=30))
    expected = np.stack([np.linalg.solve(A[b], y[b]) for b in range(8)])
    np.testing.assert_allclose(x, expected, rtol=1e-2, atol=1e-2)


def test_cg_warm_start_helps():
    A, y = _spd_batch(4, 8, seed=2)
    exact = np.stack([np.linalg.solve(A[b], y[b]) for b in range(4)])
    # warm start at the solution -> residual already ~0, stays there
    x = np.asarray(solve_cg(jnp.asarray(A), jnp.asarray(y),
                            jnp.asarray(exact), num_iters=3))
    np.testing.assert_allclose(x, exact, rtol=1e-3, atol=1e-3)


def test_cg_prefers_zero_start_when_warm_is_bad():
    A, y = _spd_batch(4, 8, seed=3)
    bad = 1e4 * np.ones((4, 8), dtype=np.float32)
    x_bad = np.asarray(solve_cg(jnp.asarray(A), jnp.asarray(y),
                                jnp.asarray(bad), num_iters=3))
    x_zero = np.asarray(solve_cg(jnp.asarray(A), jnp.asarray(y),
                                 jnp.zeros((4, 8), jnp.float32), num_iters=3))
    np.testing.assert_allclose(x_bad, x_zero, rtol=1e-5, atol=1e-5)


def test_gramian_chunked_matches_direct():
    import jax.numpy as jnp
    import numpy as np

    from buffalo_tpu.ops.als_kernels import gramian

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(1037, 12)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(gramian(X, chunk=128)),
        np.asarray(X.T @ X), rtol=1e-4, atol=1e-4)
