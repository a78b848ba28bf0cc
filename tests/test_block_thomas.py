"""Batched block-tridiagonal solver vs dense reference."""
import numpy as np
import jax.numpy as jnp

from mpp_tpu.ops.block_thomas import block_thomas, block_tridiag_matvec


def _dense(L, D, U):
    B, n, m, _ = D.shape
    A = np.zeros((B, n * m, n * m))
    for b in range(B):
        for k in range(n):
            A[b, k * m:(k + 1) * m, k * m:(k + 1) * m] = D[b, k]
            if k > 0:
                A[b, k * m:(k + 1) * m, (k - 1) * m:k * m] = L[b, k]
            if k < n - 1:
                A[b, k * m:(k + 1) * m, (k + 1) * m:(k + 2) * m] = U[b, k]
    return A


def _random_system(B=3, n=7, m=4, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(B, n, m, m))
    U = rng.normal(size=(B, n, m, m))
    D = rng.normal(size=(B, n, m, m)) + 6.0 * np.eye(m)  # diag dominant
    b = rng.normal(size=(B, n, m))
    return L, D, U, b


def test_block_thomas_matches_dense():
    L, D, U, b = _random_system()
    x = np.asarray(block_thomas(jnp.asarray(L), jnp.asarray(D),
                                jnp.asarray(U), jnp.asarray(b)))
    A = _dense(L, D, U)
    x_ref = np.linalg.solve(A, b.reshape(b.shape[0], -1, 1))[..., 0]
    np.testing.assert_allclose(x.reshape(x.shape[0], -1), x_ref,
                               rtol=1e-11, atol=1e-11)


def test_block_tridiag_matvec_roundtrip():
    L, D, U, b = _random_system(seed=1)
    x = block_thomas(jnp.asarray(L), jnp.asarray(D), jnp.asarray(U),
                     jnp.asarray(b))
    y = np.asarray(block_tridiag_matvec(jnp.asarray(L), jnp.asarray(D),
                                        jnp.asarray(U), x))
    np.testing.assert_allclose(y, b, rtol=1e-10, atol=1e-10)


def test_block_thomas_m1_matches_scalar_thomas():
    from mpp_tpu.ops.tridiag import thomas
    rng = np.random.default_rng(2)
    B, n = 4, 9
    dl = rng.normal(size=(B, n))
    du = rng.normal(size=(B, n))
    d = rng.normal(size=(B, n)) + 5.0
    b = rng.normal(size=(B, n))
    x_scalar = np.asarray(thomas(jnp.asarray(dl), jnp.asarray(d),
                                 jnp.asarray(du), jnp.asarray(b)))
    x_block = np.asarray(block_thomas(
        jnp.asarray(dl)[..., None, None], jnp.asarray(d)[..., None, None],
        jnp.asarray(du)[..., None, None], jnp.asarray(b)[..., None]))
    np.testing.assert_allclose(x_block[..., 0], x_scalar, rtol=1e-12,
                               atol=1e-12)
