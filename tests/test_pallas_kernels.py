"""Pallas lane-batched SPD kernels (interpret mode on the CPU mesh) vs
float64 numpy oracles, including the padding paths."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.ops.pallas_kernels import spd_factor, spd_factor_solve, spd_solve


def _spd(rng, B, n):
    A = rng.standard_normal((B, n, n))
    return A @ A.transpose(0, 2, 1) + n * np.eye(n)


@pytest.mark.parametrize("B,n", [(1, 4), (5, 31), (130, 16), (3, 33)])
def test_spd_solve_batched(B, n):
    rng = np.random.default_rng(B * 100 + n)
    M = jnp.asarray(_spd(rng, B, n), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    x = jax.vmap(spd_solve)(M, rhs)
    x_ref = np.linalg.solve(np.asarray(M, np.float64),
                            np.asarray(rhs, np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=5e-5)


def test_factor_then_solve_two_rhs():
    rng = np.random.default_rng(7)
    B, n = 9, 31
    M = jnp.asarray(_spd(rng, B, n), jnp.float32)
    r1 = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)

    def fs(M, a, b):
        L = spd_factor(M)
        return spd_factor_solve(L, a), spd_factor_solve(L, b)

    x1, x2 = jax.vmap(fs)(M, r1, r2)
    for r, x in ((r1, x1), (r2, x2)):
        x_ref = np.linalg.solve(np.asarray(M, np.float64),
                                np.asarray(r, np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=5e-5)


def test_unbatched_fallback():
    rng = np.random.default_rng(3)
    M = jnp.asarray(_spd(rng, 1, 12)[0], jnp.float64)
    rhs = jnp.asarray(rng.standard_normal(12), jnp.float64)
    x = spd_solve(M, rhs)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(np.asarray(M), np.asarray(rhs)),
                               atol=1e-10)
